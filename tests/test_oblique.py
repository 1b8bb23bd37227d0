"""General-angle (oblique) gather kernel + engine wiring.

The reference is rotation-agnostic through tex3D (kernel_wrapper.cu:130-187,
:69-97); these tests gate the TPU equivalent:

1. kernel parity: the band-walk Pallas gather (interpret mode) must equal
   the reference jnp gather bit-for-bit-ish (f32) at arbitrary angles;
2. wiring parity: trace/transfer through the kernel path (RTD_FORCE_OBLIQUE
   + interpret mode) must match their XLA-gather fallbacks, including the
   transfer's traced depth-origin shift;
3. end-to-end parity: the engine at gantry 30 / couch 15 vs the float64
   sequential oracle (golden_beam_dose is angle-agnostic).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracedicom_tpu.geometry.transforms import np_affine, np_idx
from raytracedicom_tpu.ops.pallas_gather3d import (
    _gather_ref_jnp, oblique_gather, pack_lattice_coords,
    pack_lattice_coords_jnp, plan_oblique, unpack_lattice_rows,
)


def _rot(gantry_deg, couch_deg):
    from raytracedicom_tpu.dicom.rtplan import gantry_rotation
    return gantry_rotation(gantry_deg, couch_deg).astype(np.float32)


def _fan_lattice(theta, couch, S, J, I, D, spacing=0.9, seed=0):
    rng = np.random.RandomState(seed)
    vol = rng.rand(*D).astype(np.float32)
    R = _rot(theta, couch)
    ctr = np.array([D[2] / 2, D[1] / 2, D[0] / 2], np.float32)
    ii = (np.arange(I) - I / 2) * spacing
    jj = (np.arange(J) - J / 2) * spacing
    kk = (np.arange(S) - S / 2) * 1.0
    gx, gy, gz = np.meshgrid(ii, jj, kk, indexing="ij")
    g = np.stack([gx, gy, gz], -1).astype(np.float32)
    p = g @ R.T + ctr
    pos = np.stack([p[..., 2], p[..., 1], p[..., 0]], -1).transpose(2, 1, 0, 3)
    return vol, pos                                  # (S, J, I, 3) (z,y,x)


@pytest.mark.parametrize("angles", [(30.0, 15.0), (45.0, 45.0), (0.5, 0.0),
                                    (10.0, 80.0), (270.0, 30.0)])
def test_kernel_matches_reference_gather(angles):
    theta, couch = angles
    vol, pos = _fan_lattice(theta, couch, S=40, J=24, I=20, D=(48, 44, 40))
    rows, info = pack_lattice_coords(pos)
    plan = plan_oblique(rows, vol.shape, vmem_budget=2 * 2 ** 20)
    assert plan is not None
    c0, c1, c2 = pack_lattice_coords_jnp(jnp.asarray(pos), info, plan.perm)
    volp = jnp.asarray(vol.transpose(plan.perm))
    with pltpu.force_tpu_interpret_mode():
        out_rows = oblique_gather(volp, c0, c1, c2, plan)
    got = np.asarray(unpack_lattice_rows(out_rows, info))
    want = np.asarray(unpack_lattice_rows(
        _gather_ref_jnp(volp, c0, c1, c2), info))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)
    assert np.abs(want).max() > 0.1


def test_kernel_backward_is_reference_vjp():
    vol, pos = _fan_lattice(30.0, 15.0, S=16, J=16, I=16, D=(30, 28, 26))
    rows, info = pack_lattice_coords(pos)
    plan = plan_oblique(rows, vol.shape, vmem_budget=2 * 2 ** 20)
    c0, c1, c2 = pack_lattice_coords_jnp(jnp.asarray(pos), info, plan.perm)
    volp = jnp.asarray(vol.transpose(plan.perm))
    g = jnp.asarray(np.random.RandomState(1).randn(
        plan.r_pad, 128).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(lambda v: jnp.vdot(
            oblique_gather(v, c0, c1, c2, plan), g[:plan.r_pad]))(volp)
    gr = jax.grad(lambda v: jnp.vdot(
        _gather_ref_jnp(v, c0, c1, c2),
        g[:c0.shape[0]]))(volp)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def _oblique_mini_beam(tables, gantry, couch, dim=64, n_layers=3, n_spots=6,
                       steps=None):
    """Small rotated watercube for wiring/e2e parity."""
    from raytracedicom_tpu.plan import Beam, rotate_beam

    ct = np.full((dim, dim, dim), 1000.0, np.float32)
    im_idx_to_world = np_affine(np.eye(3, dtype=np.float32),
                                [-dim / 2.0, -dim / 2.0, -dim + 26.0])
    world_to_im = np_affine(np.eye(3, dtype=np.float32),
                            [dim / 2.0, dim / 2.0, dim - 26.0])
    energies = np.linspace(70.0, 82.0, n_layers).astype(np.float32)
    peaks = np.interp(energies, tables.energies, tables.peak_depths)
    sig = (2.3 + 290.0 / (peaks + 15.0)).astype(np.float32)
    rng = np.random.RandomState(5)
    weights = rng.uniform(90.0, 110.0,
                          (n_layers, n_spots, n_spots)).astype(np.float32)
    inf = float("inf")
    half = 1.5 * (n_spots - 1)
    beam = Beam(
        spot_weights=weights,
        energies=energies,
        spot_sigmas=np.stack([sig, sig], 1),
        ray_spacing=(2.5, 2.5),
        steps=96,
        source_dist=(inf, inf),
        spot_idx_to_gantry=np_idx([3.0, 3.0, -1.0], [-half, -half, 30.0]),
        gantry_to_im_idx=world_to_im,
        gantry_to_dose_idx=world_to_im,
    )
    return np.asarray(ct), rotate_beam(beam, gantry, couch, im_idx_to_world,
                                       ct.shape, steps=steps)


def test_trace_wiring_kernel_vs_fallback():
    """trace_density_and_sp through the oblique kernel (forced + interpret)
    must equal the XLA-gather fallback."""
    from raytracedicom_tpu.engine import precompute_beam_static
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.ops import trace
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    ct, beam = _oblique_mini_beam(tables, 30.0, 15.0, dim=48, steps=64)
    static = precompute_beam_static(beam, tables, EngineConfig(), ct.shape)
    args = (jnp.asarray(ct), static.ray_to_im, static.grid.ray_dims, 64,
            jnp.asarray(tables.density), jnp.asarray(tables.density_scale),
            jnp.asarray(tables.sp), jnp.asarray(tables.sp_scale))

    want = trace.trace_density_and_sp(*args)
    os.environ["RTD_FORCE_OBLIQUE"] = "1"
    try:
        with pltpu.force_tpu_interpret_mode():
            got = trace.trace_density_and_sp(*args)
    finally:
        del os.environ["RTD_FORCE_OBLIQUE"]
    np.testing.assert_allclose(np.asarray(got.density),
                               np.asarray(want.density), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.cumul_sp),
                               np.asarray(want.cumul_sp), rtol=2e-6,
                               atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.first_inside),
                                  np.asarray(want.first_inside))
    np.testing.assert_array_equal(np.asarray(got.first_outside),
                                  np.asarray(want.first_outside))
    assert float(jnp.max(got.density)) > 0.5


def test_transfer_wiring_kernel_vs_fallback_with_shift():
    """transfer_vals through the oblique kernel with a traced z origin
    (the -beamFirstInside shift) must equal the fallback, including the
    slid-window coverage."""
    from raytracedicom_tpu.engine import precompute_beam_static
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.ops import transfer
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    ct, beam = _oblique_mini_beam(tables, 30.0, 15.0, dim=48, steps=64)
    static = precompute_beam_static(beam, tables, EngineConfig(), ct.shape)
    W = 40
    rng = np.random.RandomState(7)
    nrx, nry = static.grid.ray_dims
    bev = jnp.asarray(rng.rand(
        W, nry + 2 * static.pad, nrx + 2 * static.pad).astype(np.float32))

    for zsh in (0.0, -4.0, -20.0):
        z_shift = jnp.asarray(zsh, jnp.float32)
        want = transfer.transfer_vals(
            bev, static.d2f, static.bbox_min, static.bbox_max,
            z_shift=z_shift)
        os.environ["RTD_FORCE_OBLIQUE"] = "1"
        try:
            with pltpu.force_tpu_interpret_mode():
                got = transfer.transfer_vals(
                    bev, static.d2f, static.bbox_min, static.bbox_max,
                    z_shift=z_shift, shift_span=(64 - W, 0))
        finally:
            del os.environ["RTD_FORCE_OBLIQUE"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-6, err_msg=f"zsh={zsh}")
    assert float(jnp.max(want)) > 0.1


@pytest.mark.slow
def test_engine_oblique_parity_vs_oracle():
    """End-to-end engine dose at gantry 30 / couch 15 vs the float64
    sequential oracle (the oracle's trace_golden_numpy and transfer golden
    are transform-agnostic). Runs the engine's XLA fallback paths on CPU;
    the kernel itself is gated by the wiring tests above and the TPU bench.

    Tolerance: oblique entry goes through partial-volume boundary voxels,
    so fp32-vs-fp64 quantization flips (superposition radius classes, WEPL
    cutoffs) redistribute ~0.1% of local dose — measured 1.2e-3 of max
    with gamma(0.5%, 0.5 voxel) == 1.0 (no structural disagreement). Gate
    at 2.5e-3 + integral 1e-3 + full gamma pass. Also gates the z_window
    entry-spread sizing (engine._entry_spread_steps): without it late-
    entering rays lose their distal dose (5% error)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from golden_pipeline import golden_beam_dose
    from compare_dose import gamma_pass_rate
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import DoseEngine
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    cfg = EngineConfig()
    ct, beam = _oblique_mini_beam(tables, 30.0, 15.0, dim=64, steps=None)

    eng = DoseEngine(tables, cfg)
    got = np.asarray(eng.compute_dose(jnp.asarray(ct), [beam]), np.float64)
    want = golden_beam_dose(ct, beam, tables, cfg, ct.shape)

    assert want.max() > 0, "oracle produced zero dose"
    rel = np.abs(got - want).max() / want.max()
    assert rel < 2.5e-3, f"max |engine - oracle| = {100 * rel:.3f}% of max"
    assert abs(got.sum() - want.sum()) / want.sum() < 1e-3
    rate, _ = gamma_pass_rate(want, got, spacing_mm=1.0, dd_percent=0.5,
                              dta_mm=0.5, cutoff_frac=0.1)
    assert rate == 1.0, f"gamma 0.5%/0.5mm pass rate {rate:.4f} < 1"
