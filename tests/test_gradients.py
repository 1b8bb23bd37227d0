"""Autodiff through the full engine: dose gradients w.r.t. spot weights,
layer energies, and the HU grid (the BASELINE.json differentiability
targets), checked as directional derivatives against central finite
differences (per-element FD is below the fp32 noise floor of the loss)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import (
    BeamInputs, DoseEngine, compute_beam_dose,
)
from raytracedicom_tpu.physics.tables import load_physics_tables
from tests.test_engine import _mini_beam


@pytest.fixture(scope="module")
def setup():
    tables = load_physics_tables(water_cube=True)
    beam = _mini_beam(tables)
    ct = jnp.full((72, 72, 72), 1000.0, jnp.float32)
    cfg = EngineConfig(ray_weight_cutoff=0.0)
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct.shape)
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    target = jax.jit(lambda c, i: compute_beam_dose(
        c, jnp.zeros(static.dose_shape, jnp.float32), i, eng.table_arrays,
        static, cfg))(ct, inputs)
    target = target * 1.1

    def dose_fn(ct_, weights, energies):
        i = inputs._replace(spot_weights=weights, energies=energies)
        return compute_beam_dose(
            ct_, jnp.zeros(static.dose_shape, jnp.float32), i,
            eng.table_arrays, static, cfg)

    def loss(ct_, weights, energies):
        dose = dose_fn(ct_, weights, energies)
        return jnp.sum((dose - target) ** 2) * 1e12   # scale into fp32 range

    dose_jit = jax.jit(dose_fn)
    target_np = np.asarray(target, np.float64)

    def loss_f64(ct_, weights, energies):
        """fp32 dose, fp64 reduction: removes the fp32 sum noise that
        otherwise swamps small directional derivatives."""
        d = np.asarray(dose_jit(ct_, weights, energies), np.float64)
        return float(np.sum((d - target_np) ** 2) * 1e12)

    return loss_f64, jax.jit(jax.grad(loss, argnums=(0, 1, 2))), ct, inputs


def _directional_fd(loss, args, idx, direction, eps):
    a = [jnp.asarray(x) for x in args]
    ap = list(a); ap[idx] = a[idx] + eps * direction
    am = list(a); am[idx] = a[idx] - eps * direction
    return (float(loss(*ap)) - float(loss(*am))) / (2 * eps)


@pytest.mark.slow
def test_grad_spot_weights(setup):
    loss, grad, ct, inputs = setup
    _, g_w, _ = grad(ct, inputs.spot_weights, inputs.energies)
    assert np.isfinite(np.asarray(g_w)).all()
    assert float(jnp.max(jnp.abs(g_w))) > 0
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randn(*g_w.shape).astype(np.float32))
    fd = _directional_fd(loss, (ct, inputs.spot_weights, inputs.energies), 1, v, 0.25)
    got = float(jnp.vdot(g_w, v))
    assert abs(got - fd) < 0.03 * max(abs(fd), 1e-3), (got, fd)


def test_freeze_sigma_grad_preserves_weight_gradients():
    """freeze_sigma_grad (the spot-weight-only fast backward) must leave
    d-dose/d-weights identical: r_sigma_eff does not depend on the
    weights, so cutting its adjoint chain changes nothing."""
    import dataclasses
    tables = load_physics_tables(water_cube=True)
    beam = _mini_beam(tables)
    ct = jnp.full((72, 72, 72), 1000.0, jnp.float32)
    cfg = EngineConfig(ray_weight_cutoff=0.0)
    cfg_f = dataclasses.replace(cfg, freeze_sigma_grad=True)
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct.shape)
    inputs = BeamInputs(jnp.asarray(beam.spot_weights),
                        jnp.asarray(beam.energies),
                        jnp.asarray(beam.spot_sigmas))

    def gw(c):
        def loss(w):
            i = inputs._replace(spot_weights=w)
            dose = compute_beam_dose(
                ct, jnp.zeros(static.dose_shape, jnp.float32), i,
                eng.table_arrays, static, c)
            return jnp.sum(dose ** 2) * 1e10
        return jax.jit(jax.grad(loss))(inputs.spot_weights)

    g_full = np.asarray(gw(cfg))
    g_frozen = np.asarray(gw(cfg_f))
    assert np.abs(g_full).max() > 0
    np.testing.assert_array_equal(g_frozen, g_full)


def test_grad_energies(setup):
    """Energy gradient vs central FD over several directions.

    The dose is piecewise-linear in energy (every LUT lookup is a linear
    interp), so a large eps straddles kinks and measures segment averages:
    at eps = 0.02 MeV individual directions disagree by up to ~80%, while at
    eps = 0.002 the FD converges to < 1% (measured r3 on the CPU backend) —
    the f64 loss reduction keeps the fp32 dose noise below that."""
    loss, grad, ct, inputs = setup
    _, _, g_e = grad(ct, inputs.spot_weights, inputs.energies)
    assert np.isfinite(np.asarray(g_e)).all()
    assert float(jnp.max(jnp.abs(g_e))) > 0
    rng = np.random.RandomState(0)
    for _ in range(3):
        v = jnp.asarray(rng.randn(*np.shape(g_e)).astype(np.float32))
        fd = _directional_fd(loss, (ct, inputs.spot_weights, inputs.energies),
                             2, v, 0.002)
        got = float(jnp.vdot(g_e, v))
        assert abs(got - fd) < 0.05 * max(abs(fd), 1e-2), (got, fd)


def test_grad_hu_grid_finite_and_nonzero(setup):
    """End-to-end dose is only piecewise-smooth in HU (the Bragg-cutoff and
    patient-entry steps are integer-valued, kernel_wrapper.cu:174-186,
    309-312), so FD cannot validate the full path — assert the gradient
    exists, is finite, and concentrates on the beam path."""
    loss, grad, ct, inputs = setup
    g_ct, _, _ = grad(ct, inputs.spot_weights, inputs.energies)
    g_np = np.asarray(g_ct)
    assert np.isfinite(g_np).all()
    assert np.abs(g_np).max() > 0
    # gradient energy should be inside the irradiated column, not the corners
    on_beam = np.abs(g_np[:, 24:48, 24:48]).sum()
    corners = np.abs(g_np[:, :12, :12]).sum()
    assert on_beam > 10 * corners


def test_grad_ct_through_resample():
    """Validate the custom VJPs on the CT pathway two ways:
    (a) the separable 3-pass resample's gradient (row_lerp custom_vjp) must
        equal the general trilinear gather's gradient (pure-jnp autodiff);
    (b) the resample is LINEAR in the volume, so a directional FD is exact
        at any epsilon.

    (End-to-end FD through the engine is impossible: the patient-entry and
    Bragg-cutoff step indices are integer-valued in HU by design, and the
    density/SP tables have a slope kink at exactly HU=1000 where the water
    phantom sits.)"""
    from raytracedicom_tpu.ops.resample import fan_from_idx_plan, separable_resample
    from raytracedicom_tpu.ops.trace import ray_start_inc
    from raytracedicom_tpu.physics.interp import trilinear_border
    from raytracedicom_tpu.geometry.transforms import (
        FanFromIdxTransform, np_affine, np_idx,
    )

    t = FanFromIdxTransform(
        np_idx([1.3, 0.9, -1.1], [-9.0, -7.0, 30.0]),
        np.asarray([np.inf, np.inf], np.float32),
        np_affine(np.eye(3, dtype=np.float32) * 0.9, [20.3, 22.2, 24.1]),
    )
    ray_dims, steps = (16, 24), 48
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(40, 44, 48).astype(np.float32))
    perm, mk, _ = fan_from_idx_plan(t, ray_dims, steps)
    c0, c1, c2 = mk()

    def f_sep(v):
        return jnp.sum(separable_resample(jnp.transpose(v, perm), c0, c1, c2) ** 2)

    def f_gen(v):
        start, inc, _ = ray_start_inc(t, ray_dims)
        kk = jnp.arange(steps, dtype=jnp.float32)
        pos = start[None] + kk[:, None, None, None] * inc[None]
        return jnp.sum(trilinear_border(v, pos) ** 2)

    g_sep = jax.jit(jax.grad(f_sep))(vol)
    g_gen = jax.jit(jax.grad(f_gen))(vol)
    scale = float(jnp.max(jnp.abs(g_gen)))
    np.testing.assert_allclose(np.asarray(g_sep), np.asarray(g_gen),
                               rtol=1e-4, atol=1e-4 * scale)

    # (b) linearity: exact directional FD of the resample itself
    def h(v):
        return jnp.sum(separable_resample(jnp.transpose(v, perm), c0, c1, c2)
                       * jnp.asarray(rng2_w))
    rng2 = np.random.RandomState(5)
    rng2_w = rng2.randn(steps, ray_dims[1], ray_dims[0]).astype(np.float32)
    gh = jax.jit(jax.grad(h))(vol)
    dv = jnp.asarray(rng2.randn(40, 44, 48).astype(np.float32))
    hj = jax.jit(h)
    fd = (float(hj(vol + dv)) - float(hj(vol - dv))) / 2.0
    got = float(jnp.vdot(gh, dv))
    assert abs(got - fd) < 2e-3 * max(abs(fd), 1.0), (got, fd)


def test_grad_spot_sigmas(setup):
    """Spot sigmas reach dose through the erf-diff pre-convolution and the
    entry-sigma term of the lateral spread — both smooth."""
    _, _, ct, inputs = setup
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import DoseEngine
    from raytracedicom_tpu.physics.tables import load_physics_tables
    from tests.test_engine import _mini_beam

    tables = load_physics_tables(water_cube=True)
    beam = _mini_beam(tables)
    cfg = EngineConfig(ray_weight_cutoff=0.0)
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, (72, 72, 72))

    def loss(sig):
        i = inputs._replace(spot_sigmas=sig)
        d = compute_beam_dose(ct, jnp.zeros(static.dose_shape, jnp.float32),
                              i, eng.table_arrays, static, cfg)
        return jnp.sum(d ** 2) * 1e12

    g = jax.jit(jax.grad(loss))(inputs.spot_sigmas)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


def test_lut2d_scalar_row_vjp_matches_generic():
    """The hand-derived VJP of lut2d_scalar_row_fast (ops/pallas_lut.py) vs
    jax.vjp of the generic lut2d path on random tables: the (x, y) cotangents
    must agree to float tolerance (the table is stop_gradient'd by contract,
    so its cotangent is compared against zero)."""
    from raytracedicom_tpu.ops.pallas_lut import lut2d_scalar_row_fast
    from raytracedicom_tpu.physics.interp import lut2d

    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.uniform(-1, 3, (11, 97)).astype(np.float32))
    # y stays off the exact clamp kink at rows-1, where jax.clip splits the
    # subgradient 50/50 while the fast path takes the interior branch
    for seed, y0 in [(1, 4.3), (2, 0.1), (3, 9.5), (4, -0.5), (5, 11.7)]:
        r = np.random.RandomState(seed)
        x = jnp.asarray(r.uniform(-5, 105, (6, 17)).astype(np.float32))
        y = jnp.float32(y0)
        g = jnp.asarray(r.uniform(-1, 1, (6, 17)).astype(np.float32))

        out, vjp = jax.vjp(lambda xx, yy: lut2d_scalar_row_fast(table, xx, yy),
                           x, y)
        gx, gy = vjp(g)
        ref_out, ref_vjp = jax.vjp(
            lambda xx, yy: lut2d(table, xx, jnp.broadcast_to(yy, xx.shape)),
            x, y)
        rx, ry = ref_vjp(g)

        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(gy), float(ry), rtol=1e-5, atol=1e-5)

        # table cotangent is zero by the stop_gradient contract
        gt = jax.grad(lambda t: jnp.sum(lut2d_scalar_row_fast(t, x, y) * g))(table)
        assert float(jnp.abs(gt).max()) == 0.0
