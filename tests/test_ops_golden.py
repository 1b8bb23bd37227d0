"""Golden-model tests: each kernel op vs a literal numpy transcription of the
reference's sequential CUDA semantics (SURVEY.md §4 test strategy)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.geometry.transforms import (
    FanFromIdxTransform, np_affine, np_idx,
)
from raytracedicom_tpu.ops import trace as tr
from raytracedicom_tpu.ops import spot_conv as sc
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import superposition as sup


def _small_setup(divergent=True):
    rng = np.random.default_rng(7)
    ct = rng.uniform(0, 2000, size=(24, 20, 18)).astype(np.float32)
    src = (900.0, 1100.0) if divergent else (float("inf"), float("inf"))
    fan = np_idx([1.5, 1.2, -1.0], [-5.0, -4.0, 20.0])
    g2i = np_affine(
        np.array([[1.0, 0.05, 0.0], [0.0, 1.1, 0.02], [0.01, 0.0, -1.0]], np.float32),
        [8.0, 9.0, 21.0],
    )
    t = FanFromIdxTransform(fan, np.asarray(src, np.float32), g2i)
    lut = np.linspace(0.001, 2.0, 64).astype(np.float32)
    sp_lut = np.linspace(0.002, 1.8, 64).astype(np.float32)
    return ct, t, lut, sp_lut


@pytest.mark.parametrize("divergent", [True, False])
def test_trace_matches_golden(divergent):
    ct, t, dlut, slut = _small_setup(divergent)
    dims, steps = (8, 8), 24
    scale = np.float32(0.02)
    got = tr.trace_density_and_sp(
        jnp.asarray(ct), t, dims, steps, jnp.asarray(dlut), scale,
        jnp.asarray(slut), scale,
    )
    gd, gc, gfi, gfo, gsl = tr.trace_golden_numpy(
        ct, t, dims, steps, dlut, scale, slut, scale
    )
    # fp32 tolerance: the golden model accumulates positions sequentially
    # (pos += step) while the parallel version computes start + k*step, so
    # trilinear fractions differ in the last bits
    np.testing.assert_allclose(got.density, gd, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(got.cumul_sp, gc, rtol=2e-3, atol=1e-3)
    np.testing.assert_array_equal(got.first_inside, gfi)
    np.testing.assert_array_equal(got.first_outside, gfo)
    np.testing.assert_allclose(got.step_len, gsl, rtol=1e-6)


def _conv_golden(spots, sigmas, n_out_x, n_out_y, spot_delta, spot_offset,
                 ray_delta, ray_offset, px_mult, cutoff=3.0):
    """Literal transcription of x/yConvGathResampGpu (gpu_convolution_2d.cu:16-59)."""
    from scipy.special import erf
    L, sy, sx = spots.shape
    interm = np.zeros((L, sy, n_out_x), np.float64)
    out = np.zeros((L, n_out_y, n_out_x), np.float64)
    iod_x = spot_delta[0] / ray_delta[0]
    ioo_x = (spot_offset[0] - ray_offset[0]) / ray_delta[0]
    iod_y = spot_delta[1] / ray_delta[1]
    ioo_y = (spot_offset[1] - ray_offset[1]) / ray_delta[1]
    for l in range(L):
        se = sigmas[l, 0] / (ray_delta[0] * px_mult[0])
        rs = (1 / np.sqrt(2)) / se
        for y in range(sy):
            for u in range(n_out_x):
                res = 0.0
                cx = int(np.ceil((u - (cutoff * se + 0.5) - ioo_x) / iod_x))
                d = cx * iod_x + ioo_x - u
                while d < cutoff * se + 0.5:
                    if 0 <= cx < sx:
                        res += 0.5 * (erf((d + 0.5) * rs) - erf((d - 0.5) * rs)) * spots[l, y, cx]
                    cx += 1
                    d = cx * iod_x + ioo_x - u
                interm[l, y, u] = res
        se = sigmas[l, 1] / (ray_delta[1] * px_mult[1])
        rs = (1 / np.sqrt(2)) / se
        for u in range(n_out_x):
            for v in range(n_out_y):
                res = 0.0
                cy = int(np.ceil((v - (cutoff * se + 0.5) - ioo_y) / iod_y))
                d = cy * iod_y + ioo_y - v
                while d < cutoff * se + 0.5:
                    if 0 <= cy < sy:
                        res += 0.5 * (erf((d + 0.5) * rs) - erf((d - 0.5) * rs)) * interm[l, cy, u]
                    cy += 1
                    d = cy * iod_y + ioo_y - v
                out[l, v, u] = res
    return out.astype(np.float32)


def test_spot_conv_matches_golden():
    rng = np.random.default_rng(11)
    spots = rng.uniform(50, 150, size=(2, 5, 4)).astype(np.float32)
    sigmas = np.array([[4.0, 5.0], [6.5, 3.5]], np.float32)
    spot_delta, spot_offset = (3.0, 3.0), (-6.0, -6.0)
    ray_delta, ray_offset = (1.0, 1.0), (-10.0, -9.0)
    px_mult = np.array([0.95, 1.0], np.float32)
    got = sc.spot_to_ray_weights(
        jnp.asarray(spots), jnp.asarray(sigmas), (24, 24),
        spot_delta, spot_offset, ray_delta, ray_offset, jnp.asarray(px_mult),
    )
    want = _conv_golden(spots, sigmas, 24, 24, spot_delta, spot_offset,
                        ray_delta, ray_offset, px_mult)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fill_idd_and_sigma_matches_golden():
    rng = np.random.default_rng(13)
    S, Y, X = 40, 4, 4
    # water-ish densities with an air gap for mass-epsilon coverage
    density = np.full((S, Y, X), 1.0, np.float32)
    density[:6] = 0.0012
    density[20:22, 0, 0] = 0.001  # air cavity in one ray
    step_len = 1.0
    sp = np.where(density > 0.5, 1.0, 0.001).astype(np.float32)
    cumul_sp = np.cumsum(sp * step_len, axis=0).astype(np.float32)
    ray_weights = rng.uniform(0.5, 120, size=(Y, X)).astype(np.float32)
    first_inside = np.full((Y, X), 6, np.int32)
    first_outside = np.full((Y, X), S, np.int32)
    first_outside[1, 1] = 18
    first_step = 4
    cidd = np.cumsum(rng.uniform(0.5, 1.5, size=(3, 64)), axis=1).astype(np.float32)
    rrl_lut = np.linspace(0.01, 0.03, 64).astype(np.float32)

    peak = np.float32(25.0)
    energy_idx = np.float32(1.3)
    energy_scale = np.float32(1.7)
    after_last = np.int32(36)
    # air-div coefficients for delta_z=-1, corner_z=20 (nozzle on)
    a = 0.00270 / (peak - 4.50)
    b = -4.39 / (peak - 3.86)
    air_quad = np.float32(a * 1.0)
    air_lin = np.float32(2.0 * a * (-1.0) * 20.0 + b * (-1.0))
    half_vw = np.full(S, 1.0, np.float32)
    step_vol = np.full(S, 1.0, np.float32)

    geom = isig.StepGeometry(
        half_vw_sum=jnp.asarray(half_vw),
        step_vol=jnp.asarray(step_vol),
        step_length=jnp.float32(step_len),
        delta_z=jnp.float32(-1.0),
        corner_z=jnp.float32(20.0),
    )
    layer = isig.LayerScalars(
        energy_idx=jnp.float32(energy_idx),
        energy_scale=jnp.float32(energy_scale),
        peak_depth=jnp.float32(peak),
        after_last=jnp.int32(after_last),
        air_lin=jnp.float32(air_lin),
        air_quad=jnp.float32(air_quad),
        entry_sigma_sq=jnp.float32(0.0),
    )
    got = isig.fill_idd_and_sigma(
        jnp.asarray(density), jnp.asarray(cumul_sp), jnp.asarray(ray_weights),
        jnp.asarray(first_inside), jnp.asarray(first_outside),
        jnp.int32(first_step), layer, geom,
        jnp.asarray(cidd), jnp.asarray(rrl_lut), jnp.float32(30.0),
    )
    g_idd, g_rsig, g_fp = isig.fill_golden_numpy(
        density, cumul_sp, ray_weights, first_inside, first_outside, first_step,
        energy_idx, energy_scale, peak, after_last,
        air_lin, air_quad, step_len, half_vw, step_vol,
        cidd, rrl_lut, 30.0,
    )
    np.testing.assert_allclose(got.idd, g_idd, rtol=2e-4, atol=1e-5)
    live = np.asarray(got.r_sigma_eff) < 1e9
    golden_live = g_rsig < 1e9
    np.testing.assert_array_equal(live, golden_live)
    np.testing.assert_allclose(
        np.asarray(got.r_sigma_eff)[live], g_rsig[live], rtol=5e-4, atol=1e-5
    )
    np.testing.assert_array_equal(got.first_passive, g_fp)


def test_superposition_matches_golden():
    rng = np.random.default_rng(17)
    S, Y, X = 3, 10, 12
    idd = np.zeros((S, Y, X), np.float32)
    idd[rng.uniform(size=(S, Y, X)) > 0.6] = 1.0
    idd *= rng.uniform(0.5, 2.0, size=(S, Y, X)).astype(np.float32)
    rsig = rng.uniform(0.4, 3.0, size=(S, Y, X)).astype(np.float32)
    rsig[idd == 0] = 1e10
    radius, pad = 4, 6
    got = sup.superpose(jnp.asarray(idd), jnp.asarray(rsig), radius, pad, chunk_z=2)
    want = sup.superpose_golden_numpy(idd, rsig, radius, pad)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_superposition_conserves_dose():
    # with radius covering the whole grid and interior sources, the summed
    # dose is conserved up to the erf tail
    idd = np.zeros((1, 16, 16), np.float32)
    idd[0, 8, 8] = 5.0
    rsig = np.full((1, 16, 16), 0.9, np.float32)
    out = sup.superpose(jnp.asarray(idd), jnp.asarray(rsig), 6, 8)
    assert abs(float(jnp.sum(out)) - 5.0) < 1e-3


def test_fill_nuclear_matches_golden():
    """Nuclear-halo split (fillIddAndSigma NUCLEAR_CORR branch,
    kernel_wrapper.cu:320-341): primary scaled by (1-nucWeight), halo dose
    and reciprocal sigma vs the sequential golden model."""
    rng = np.random.default_rng(23)
    S, Y, X = 40, 4, 4
    density = np.full((S, Y, X), 1.0, np.float32)
    density[:6] = 0.0012
    step_len = 1.0
    sp = np.where(density > 0.5, 1.0, 0.001).astype(np.float32)
    cumul_sp = np.cumsum(sp * step_len, axis=0).astype(np.float32)
    ray_weights = rng.uniform(0.5, 120, size=(Y, X)).astype(np.float32)
    first_inside = np.full((Y, X), 6, np.int32)
    first_outside = np.full((Y, X), S, np.int32)
    first_step = 4
    cidd = np.cumsum(rng.uniform(0.5, 1.5, size=(3, 64)), axis=1).astype(np.float32)
    rrl_lut = np.linspace(0.01, 0.03, 64).astype(np.float32)
    nuc_w = np.clip(rng.uniform(0.0, 0.4, size=(3, 64)), 0, 1).astype(np.float32)
    nuc_sq = rng.uniform(1.0, 40.0, size=(3, 64)).astype(np.float32)

    peak = np.float32(25.0)
    energy_idx = np.float32(1.3)
    energy_scale = np.float32(1.7)
    after_last = np.int32(36)
    a = 0.00270 / (peak - 4.50)
    b = -4.39 / (peak - 3.86)
    air_quad = np.float32(a * 1.0)
    air_lin = np.float32(2.0 * a * (-1.0) * 20.0 + b * (-1.0))
    half_vw = np.full(S, 1.0, np.float32)
    step_vol = np.full(S, 1.0, np.float32)
    spot_dist = 3.0
    entry_sq = 4.5

    geom = isig.StepGeometry(
        half_vw_sum=jnp.asarray(half_vw),
        step_vol=jnp.asarray(step_vol),
        step_length=jnp.float32(step_len),
        delta_z=jnp.float32(-1.0),
        corner_z=jnp.float32(20.0),
    )
    layer = isig.LayerScalars(
        energy_idx=jnp.float32(energy_idx),
        energy_scale=jnp.float32(energy_scale),
        peak_depth=jnp.float32(peak),
        after_last=jnp.int32(after_last),
        air_lin=jnp.float32(air_lin),
        air_quad=jnp.float32(air_quad),
        entry_sigma_sq=jnp.float32(entry_sq),
    )
    got = isig.fill_idd_and_sigma(
        jnp.asarray(density), jnp.asarray(cumul_sp), jnp.asarray(ray_weights),
        jnp.asarray(first_inside), jnp.asarray(first_outside),
        jnp.int32(first_step), layer, geom,
        jnp.asarray(cidd), jnp.asarray(rrl_lut), jnp.float32(30.0),
        nuclear_mode="fluka",
        nuc_weight_tab=jnp.asarray(nuc_w),
        nuc_sq_sigma_tab=jnp.asarray(nuc_sq),
        spot_dist=spot_dist,
    )
    g_idd, g_rsig, g_fp, g_nidd, g_nrsig = isig.fill_golden_numpy(
        density, cumul_sp, ray_weights, first_inside, first_outside, first_step,
        energy_idx, energy_scale, peak, after_last,
        air_lin, air_quad, step_len, half_vw, step_vol,
        cidd, rrl_lut, 30.0,
        nuclear_mode="fluka",
        nuc_weight_tab=nuc_w, nuc_sq_sigma_tab=nuc_sq,
        spot_dist=spot_dist, entry_sigma_sq=entry_sq,
    )
    np.testing.assert_allclose(got.idd, g_idd, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(got.nuc_idd_unit, g_nidd, rtol=2e-4, atol=1e-5)
    live = np.asarray(got.nuc_r_sigma_eff) < 1e9
    np.testing.assert_array_equal(live, g_nrsig < 1e9)
    np.testing.assert_allclose(
        np.asarray(got.nuc_r_sigma_eff)[live], g_nrsig[live], rtol=5e-4, atol=1e-5
    )
    np.testing.assert_array_equal(got.first_passive, g_fp)
