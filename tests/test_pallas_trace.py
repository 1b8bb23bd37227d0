"""Fused K1 trace tail (ops/pallas_trace.py): the Pallas kernel vs the jnp
mirror via the TPU interpreter (CPU-testable on padded/unaligned shapes),
plus the VJP rule. On-hardware agreement is additionally a committed
artifact (tools/pallas_adjoint_check.out, check_fused_trace_tail)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from raytracedicom_tpu.ops import pallas_trace as pt


def _inputs(S, J, D2, I, seed=0):
    rng = np.random.RandomState(seed)
    B = jnp.asarray(rng.uniform(0, 2000, (S, J, D2)).astype(np.float32))
    c2 = jnp.asarray(rng.uniform(-3, D2 + 2, (S, I)).astype(np.float32))
    sl = jnp.asarray(rng.uniform(0.9, 1.2, (J, I)).astype(np.float32))
    dlut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 300)).astype(np.float32))
    slut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 170)).astype(np.float32))
    return B, c2, sl, dlut, jnp.float32(0.12), slut, jnp.float32(0.05)


@pytest.mark.parametrize("S,J,D2,I", [(19, 16, 96, 72), (33, 24, 130, 40)])
def test_fused_tail_interpret_matches_mirror(S, J, D2, I):
    from jax.experimental.pallas import tpu as pltpu
    args = _inputs(S, J, D2, I)
    want = pt._tail_jnp(*args, 150.0)
    with pltpu.force_tpu_interpret_mode():
        got = pt.fused_trace_tail_pallas(*args, 150.0)
    for name, w, g in zip(("density", "cumul_sp", "fi", "fo"), want, got):
        w, g = np.asarray(w), np.asarray(g)
        if w.dtype.kind == "i":
            np.testing.assert_array_equal(g, w, err_msg=name)
        else:
            np.testing.assert_allclose(
                g, w, rtol=1e-5, atol=1e-5 * np.abs(w).max(), err_msg=name)


def test_fused_tail_vjp_matches_autodiff_of_mirror():
    """The custom VJP (mirror-based) must agree with direct autodiff of the
    mirror — guards the output-arity plumbing (int outputs carry no grads)."""
    args = _inputs(9, 8, 40, 24, seed=3)
    g_den = jnp.asarray(np.random.RandomState(5).uniform(
        -1, 1, (9, 8, 24)).astype(np.float32))

    def via_op(B, sl, dlut):
        den, csp, _, _ = pt.fused_trace_tail(
            B, args[1], sl, dlut, args[4], args[5], args[6], 150.0)
        return jnp.sum(den * g_den) + jnp.sum(csp)

    def via_mirror(B, sl, dlut):
        den, csp, _, _ = pt._tail_jnp(
            B, args[1], sl, dlut, args[4], args[5], args[6], 150.0)
        return jnp.sum(den * g_den) + jnp.sum(csp)

    got = jax.grad(via_op, argnums=(0, 1, 2))(args[0], args[2], args[3])
    want = jax.grad(via_mirror, argnums=(0, 1, 2))(args[0], args[2], args[3])
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5,
                                   atol=1e-6 * (np.abs(w).max() + 1e-30))


def test_fused_tail_analytic_vjp_matches_autodiff():
    """The taps2 analytic adjoint (reverse cumsum + LUT slopes + tent
    transpose — the TPU-speed d-dose/d-CT path) vs direct autodiff of the
    mirror, on an affine fan-like c2 lattice."""
    from raytracedicom_tpu.ops.resample import tent_taps

    rng = np.random.RandomState(11)
    S, J, D2, I = 14, 8, 64, 40
    B = jnp.asarray(rng.uniform(0, 2000, (S, J, D2)).astype(np.float32))
    scale2 = 1.3
    base = rng.uniform(-2.0, 4.0, (S, 1)).astype(np.float32)
    c2 = jnp.asarray(base + scale2 * np.arange(I, dtype=np.float32)[None, :])
    sl = jnp.asarray(rng.uniform(0.9, 1.2, (J, I)).astype(np.float32))
    dlut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 90)).astype(np.float32))
    slut = jnp.asarray(np.cumsum(rng.uniform(0, 1, 70)).astype(np.float32))
    dsc, ssc = jnp.float32(0.04), jnp.float32(0.03)
    taps2 = tent_taps(scale2)
    g_den = jnp.asarray(rng.uniform(-1, 1, (S, J, I)).astype(np.float32))
    g_csp = jnp.asarray(rng.uniform(-1, 1, (S, J, I)).astype(np.float32))

    def via_op(B, sl, dlut, dsc, slut, ssc):
        den, csp, _, _ = pt.fused_trace_tail(B, c2, sl, dlut, dsc, slut, ssc,
                                             150.0, taps2)
        return jnp.sum(den * g_den) + jnp.sum(csp * g_csp)

    def via_mirror(B, sl, dlut, dsc, slut, ssc):
        den, csp, _, _ = pt._tail_jnp(B, c2, sl, dlut, dsc, slut, ssc, 150.0)
        return jnp.sum(den * g_den) + jnp.sum(csp * g_csp)

    got = jax.grad(via_op, argnums=(0, 1, 2, 3, 4, 5))(
        B, sl, dlut, dsc, slut, ssc)
    want = jax.grad(via_mirror, argnums=(0, 1, 2, 3, 4, 5))(
        B, sl, dlut, dsc, slut, ssc)
    for name, g, w in zip(("B", "step_len", "dlut", "dscale", "slut",
                           "sscale"), got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-5,
            atol=2e-5 * (np.abs(np.asarray(w)).max() + 1e-30), err_msg=name)
