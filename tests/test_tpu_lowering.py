"""TPU-lowering (Mosaic) checks without TPU hardware.

jax.export with platforms=["tpu"] runs the full StableHLO lowering,
including pallas_call -> Mosaic, on any host. This catches the class of
kernel bugs that only surface at TPU compile time (block-shape divisibility,
memory-space rules, unsupported ops) even when the device tunnel is down —
interpret-mode tests do not exercise that path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _lower_tpu(fn, *avals):
    return jax.export.export(jax.jit(fn), platforms=["tpu"])(*avals)


def test_superposition_kernels_lower():
    from raytracedicom_tpu.ops.pallas_superposition import (
        effective_sem_radii, superpose_bwd_pallas, superpose_pallas_raw,
    )
    S, Y, X, R, P = 6, 16, 64, 5, 8
    a = jax.ShapeDtypeStruct((S, Y, X), jnp.float32)

    def fwd(idd, rs):
        rads = effective_sem_radii(rs, 3.0, R)
        return superpose_pallas_raw(idd, rs, rads, R, P)

    _lower_tpu(fwd, a, a)

    def bwd(idd, rs, g):
        rads = effective_sem_radii(rs, 3.0, R)
        return superpose_bwd_pallas(idd, rs, g, rads, R, P)

    _lower_tpu(bwd, a, a, jax.ShapeDtypeStruct((S, Y + 2 * P, X + 2 * P),
                                               jnp.float32))


def test_fused_scan_and_trace_tail_lower():
    from raytracedicom_tpu.ops import pallas_scan, pallas_trace
    S, Y, X, C = 12, 16, 128, 3
    a = jax.ShapeDtypeStruct((S, Y, X), jnp.float32)
    v = jax.ShapeDtypeStruct((C, S, Y, X), jnp.float32)
    _lower_tpu(lambda t, p, u, vv, val: pallas_scan._fused_fwd_pallas(
        t, p, u, vv, val), a, a, a, v, a)

    B = jax.ShapeDtypeStruct((S, Y, 96), jnp.float32)
    c2 = jax.ShapeDtypeStruct((S, 72), jnp.float32)
    sl = jax.ShapeDtypeStruct((Y, 72), jnp.float32)
    lut = jax.ShapeDtypeStruct((300,), jnp.float32)
    sc = jax.ShapeDtypeStruct((), jnp.float32)
    _lower_tpu(lambda b, c, s, d, ds, sp, ss: pallas_trace.fused_trace_tail_pallas(
        b, c, s, d, ds, sp, ss, 150.0), B, c2, sl, lut, sc, lut, sc)


def test_oblique_gather_lowers_with_shifts():
    from raytracedicom_tpu.ops.pallas_gather3d import (
        oblique_gather, oblique_gather_shifted, pack_lattice_coords,
        plan_oblique,
    )
    rng = np.random.RandomState(0)
    th = np.deg2rad(30.0)
    R = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                  [-np.sin(th), 0, np.cos(th)]], np.float32)
    ii = (np.arange(24) - 12) * 0.9
    jj = (np.arange(16) - 8) * 0.9
    kk = (np.arange(20) - 10) * 1.0
    gx, gy, gz = np.meshgrid(ii, jj, kk, indexing="ij")
    g = np.stack([gx, gy, gz], -1).astype(np.float32)
    p = g @ R.T + np.array([20, 22, 24], np.float32)
    pos = np.stack([p[..., 2], p[..., 1], p[..., 0]], -1).transpose(2, 1, 0, 3)
    rows, info = pack_lattice_coords(pos)
    plan = plan_oblique(rows, (48, 44, 40), vmem_budget=2 * 2 ** 20)
    assert plan is not None
    va = jax.ShapeDtypeStruct((plan.d0, plan.d1, plan.d2), jnp.float32)
    ca = jax.ShapeDtypeStruct((rows.shape[0], 128), jnp.float32)
    _lower_tpu(lambda v, c0, c1, c2: oblique_gather(v, c0, c1, c2, plan),
               va, ca, ca, ca)
    sa = jax.ShapeDtypeStruct((), jnp.float32)
    _lower_tpu(lambda v, c0, c1, c2, s0, s1, s2: oblique_gather_shifted(
        v, c0, c1, c2, s0, s1, s2, plan), va, ca, ca, ca, sa, sa, sa)


@pytest.mark.slow
def test_full_beam_programs_lower():
    """Whole-beam programs — the GENUINE TPU programs, forced via
    RTD_FORCE_TPU_KERNELS so every Pallas path is taken — lower for TPU:
    axis-aligned (incl. value_and_grad) and oblique. The ultimate
    no-hardware compile gate."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_oblique import _oblique_mini_beam
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import (
        BeamInputs, compute_beam_dose, precompute_beam_static, TableArrays,
    )
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    cfg = EngineConfig()
    tabs = TableArrays.from_tables(tables)

    os.environ["RTD_FORCE_TPU_KERNELS"] = "1"
    try:
        for angles in ((0.0, 0.0), (30.0, 15.0)):
            ct, beam = _oblique_mini_beam(tables, *angles, dim=48, steps=64)
            static = precompute_beam_static(beam, tables, cfg, ct.shape,
                                            ct_shape=ct.shape)

            def fn(c, d, w, beam=beam, static=static):
                inp = BeamInputs(w, jnp.asarray(beam.energies),
                                 jnp.asarray(beam.spot_sigmas))
                return compute_beam_dose(c, d, inp, tabs, static, cfg)

            sh = jax.ShapeDtypeStruct(ct.shape, jnp.float32)
            wsh = jax.ShapeDtypeStruct(beam.spot_weights.shape, jnp.float32)
            _lower_tpu(fn, sh, sh, wsh)
            if angles == (0.0, 0.0):
                _lower_tpu(jax.grad(
                    lambda c, d, w: jnp.sum(fn(c, d, w) ** 2),
                    argnums=2), sh, sh, wsh)
    finally:
        del os.environ["RTD_FORCE_TPU_KERNELS"]
