"""Separable 3-pass resampler vs the general trilinear gather.

The separable path must be numerically equivalent to trilinear_border for
every axis-separable geometry (signed scaled permutations, with and without
divergence), and the engine must fall back to the general path otherwise."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.geometry.transforms import (
    FanFromIdxTransform, np_affine, np_idx,
)
from raytracedicom_tpu.ops.resample import (
    fan_from_idx_plan, row_lerp, separable_resample,
)
from raytracedicom_tpu.ops.trace import ray_start_inc
from raytracedicom_tpu.physics.interp import trilinear_border


def _general(vol, t, ray_dims, steps):
    start, inc, _ = ray_start_inc(t, ray_dims)
    kk = jnp.arange(steps, dtype=jnp.float32)
    pos = start[None] + kk[:, None, None, None] * inc[None]
    return trilinear_border(vol, pos)


ROT90 = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)   # x<-z, z<--x
ROT180 = np.diag(np.array([-1, -1, 1], np.float32))
SCALED = np.diag(np.array([0.5, 2.0, -0.8], np.float32))


@pytest.mark.parametrize("m,source", [
    (np.eye(3, dtype=np.float32), (np.inf, np.inf)),
    (np.eye(3, dtype=np.float32), (900.0, 1100.0)),   # divergent
    (ROT90, (np.inf, np.inf)),
    (ROT90, (950.0, 950.0)),
    (ROT180, (np.inf, np.inf)),
    (SCALED, (800.0, np.inf)),
])
def test_separable_matches_general(m, source):
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(40, 44, 48).astype(np.float32))
    t = FanFromIdxTransform(
        np_idx([1.3, 0.9, -1.1], [-9.0, -7.0, 30.0]),
        np.asarray(source, np.float32),
        np_affine(m * 0.9, [20.0, 22.0, 24.0]),
    )
    ray_dims, steps = (16, 24), 48
    plan = fan_from_idx_plan(t, ray_dims, steps)
    assert plan is not None, "geometry should be separable"
    perm, make_coords, scales = plan
    c0, c1, c2 = make_coords()
    out = separable_resample(jnp.transpose(vol, perm), c0, c1, c2)
    ref = _general(vol, t, ray_dims, steps)
    # atol covers fp32 floor()-boundary cell flips (coordinate lands within
    # one ulp of an integer and the two computation orders disagree)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=5e-6)


def test_non_separable_returns_none():
    th = np.deg2rad(30.0)
    rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                    [-np.sin(th), 0, np.cos(th)]], np.float32)
    t = FanFromIdxTransform(
        np_idx([1.0, 1.0, -1.0], [0.0, 0.0, 10.0]),
        np.asarray([np.inf, np.inf], np.float32),
        np_affine(rot, [0.0, 0.0, 0.0]),
    )
    assert fan_from_idx_plan(t, (8, 8), 16) is None


def test_row_lerp_border_and_grad():
    rng = np.random.RandomState(1)
    rows = jnp.asarray(rng.rand(12, 20).astype(np.float32))
    coords = jnp.asarray((rng.rand(12, 9) * 26.0 - 3.0).astype(np.float32))
    out = row_lerp(rows, coords)
    # reference computation
    ref = np.zeros((12, 9), np.float32)
    r_np, c_np = np.asarray(rows), np.asarray(coords)
    for i in range(12):
        for j in range(9):
            c = c_np[i, j]
            i0 = int(np.floor(c))
            f = c - i0
            v0 = r_np[i, i0] if 0 <= i0 < 20 else 0.0
            v1 = r_np[i, i0 + 1] if 0 <= i0 + 1 < 20 else 0.0
            ref[i, j] = v0 * (1 - f) + v1 * f
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)

    # gradient w.r.t. rows vs finite differences
    f = lambda r: jnp.sum(row_lerp(r, coords) ** 2)
    g = jax.grad(f)(rows)
    eps = 1e-3
    for (a, b) in [(3, 5), (0, 0), (11, 19)]:
        rp = rows.at[a, b].add(eps)
        rm = rows.at[a, b].add(-eps)
        fd = (f(rp) - f(rm)) / (2 * eps)
        np.testing.assert_allclose(float(g[a, b]), float(fd), rtol=2e-2, atol=1e-3)


@pytest.mark.parametrize("m,source", [
    (np.eye(3, dtype=np.float32), (np.inf, np.inf)),
    (np.eye(3, dtype=np.float32), (900.0, 1100.0)),
    (ROT90, (950.0, 950.0)),
    (SCALED, (800.0, np.inf)),
])
def test_tent_transpose_matches_scatter_vjp(m, source):
    """The banded tent-gather backward (taps=...) must equal the scatter-add
    backward (taps=None) — both are the transpose of the same linear map."""
    from raytracedicom_tpu.ops.resample import taps_from_scales

    rng = np.random.RandomState(7)
    vol = jnp.asarray(rng.rand(40, 44, 48).astype(np.float32))
    t = FanFromIdxTransform(
        np_idx([1.3, 0.9, -1.1], [-9.0, -7.0, 30.0]),
        np.asarray(source, np.float32),
        np_affine(m * 0.9, [20.0, 22.0, 24.0]),
    )
    ray_dims, steps = (16, 24), 48
    perm, make_coords, scales = fan_from_idx_plan(t, ray_dims, steps)
    taps = taps_from_scales(scales)
    assert taps is not None
    c0, c1, c2 = make_coords()
    g_out = jnp.asarray(rng.randn(steps, ray_dims[1], ray_dims[0]).astype(np.float32))

    def f(v, tp):
        return jnp.sum(separable_resample(jnp.transpose(v, perm),
                                          c0, c1, c2, taps=tp) * g_out)

    # forward values identical regardless of taps
    np.testing.assert_array_equal(np.asarray(jax.jit(lambda v: f(v, taps))(vol)),
                                  np.asarray(jax.jit(lambda v: f(v, None))(vol)))
    g_tent = jax.jit(jax.grad(lambda v: f(v, taps)))(vol)
    g_scat = jax.jit(jax.grad(lambda v: f(v, None)))(vol)
    scale = float(jnp.max(jnp.abs(g_scat))) + 1e-30
    np.testing.assert_allclose(np.asarray(g_tent), np.asarray(g_scat),
                               rtol=1e-5, atol=1e-6 * scale)


@pytest.mark.parametrize("R,I,n_out", [(5, 37, 53), (8, 64, 72), (3, 130, 41)])
def test_row_tent_pallas_interpret_matches_jnp(R, I, n_out):
    """The TPU tent-transpose kernel (in-kernel affine reconstruction,
    padding, lane-group select-merge) vs the jnp mirror, via the Pallas TPU
    interpreter — so the kernel logic is CPU-testable on padded/unaligned
    shapes, not only via TPU benchmark runs."""
    from jax.experimental.pallas import tpu as pltpu
    from raytracedicom_tpu.ops.resample import (
        _row_tent_jnp, _row_tent_pallas, tent_taps,
    )
    rng = np.random.RandomState(R * 100 + I)
    scale = n_out / (I * 1.07)
    a = 1.0 / scale
    b = rng.uniform(-2.0, 2.0, (R, 1)).astype(np.float32)
    coords = (a * np.arange(I, dtype=np.float32)[None, :] + b).astype(np.float32)
    g = rng.uniform(-1, 1, (R, I)).astype(np.float32)
    taps = tent_taps(scale)

    want = np.asarray(_row_tent_jnp(jnp.asarray(g), jnp.asarray(coords),
                                    n_out, taps))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(_row_tent_pallas(jnp.asarray(g), jnp.asarray(coords),
                                          n_out, taps))
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-6 * (np.abs(want).max() + 1e-30))
