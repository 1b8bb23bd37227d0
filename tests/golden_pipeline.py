"""Independent end-to-end golden pipeline (float64 numpy, sequential).

Composes the per-op golden models (trace_golden_numpy, the erf-diff
convolution transcription, fill_golden_numpy, superpose_golden_numpy) plus
independent numpy transcriptions of the orchestrator's per-layer preparation
(cudaWrapperProtons, kernel_wrapper.cu:781-1056) and the BEV->dose transfer
(primTransfDiv, kernel_wrapper.cu:69-97) into one full-pipeline dose oracle.

Nothing here shares code with the engine's compute path: the engine is
fp32 XLA/Pallas with cumsum-restructured recurrences, depth windowing and
separable resampling; this oracle is float64 numpy with the reference's
literal sequential semantics. A systematic transcription error in any one
engine stage, or a composition error (windowing, padding, transform wiring),
shows up as a dose mismatch in tests/test_parity.py.

Tolerance policy (documented per VERDICT round-1 item 1): the engine runs
fp32 with restructured-but-exact math; measured agreement on the mini
watercube (96^3 CT, 8x8 spots, 4 layers, 133k significant voxels) is
4.9e-6 of the dose maximum and 4.5e-8 on the dose integral. Tests gate at
5e-4 of max (headroom for the TPU A&S-erf approximation) plus a
0.5%/0.5-voxel gamma pass rate of 1.0.
"""
from __future__ import annotations

import numpy as np
from scipy.special import erf

from raytracedicom_tpu.config import EngineConfig, SCATTER_CONSTANTS
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import superposition as sup
from raytracedicom_tpu.ops import trace as tr
from raytracedicom_tpu.plan import Beam, compute_ray_grid
from raytracedicom_tpu.geometry.transforms import FanFromIdxTransform


# ---------------------------------------------------------------------------
# K3 golden: literal transcription of x/yConvGathResampGpu
# (gpu_convolution_2d.cu:16-59). Moved here from test_ops_golden so the
# composed pipeline and the per-op test share one transcription.
# ---------------------------------------------------------------------------

def conv_golden(spots, sigmas, n_out_x, n_out_y, spot_delta, spot_offset,
                ray_delta, ray_offset, px_mult, cutoff=3.0):
    L, sy, sx = spots.shape
    interm = np.zeros((L, sy, n_out_x), np.float64)
    out = np.zeros((L, n_out_y, n_out_x), np.float64)
    iod_x = spot_delta[0] / ray_delta[0]
    ioo_x = (spot_offset[0] - ray_offset[0]) / ray_delta[0]
    iod_y = spot_delta[1] / ray_delta[1]
    ioo_y = (spot_offset[1] - ray_offset[1]) / ray_delta[1]
    for layer in range(L):
        sig_x = sigmas[layer, 0] / (ray_delta[0] * px_mult[0])
        rs_x = 1.0 / (np.sqrt(2.0) * sig_x)
        bound_x = cutoff * sig_x + 0.5
        for u in range(n_out_x):
            first = int(np.ceil((u - bound_x - ioo_x) / iod_x))
            x = max(first, 0)
            while x < sx:
                dist = x * iod_x + ioo_x - u
                if dist >= bound_x:
                    break
                w = 0.5 * (erf((dist + 0.5) * rs_x) - erf((dist - 0.5) * rs_x))
                interm[layer, :, u] += w * spots[layer, :, x]
                x += 1
        sig_y = sigmas[layer, 1] / (ray_delta[1] * px_mult[1])
        rs_y = 1.0 / (np.sqrt(2.0) * sig_y)
        bound_y = cutoff * sig_y + 0.5
        for v in range(n_out_y):
            first = int(np.ceil((v - bound_y - ioo_y) / iod_y))
            y = max(first, 0)
            while y < sy:
                dist = y * iod_y + ioo_y - v
                if dist >= bound_y:
                    break
                w = 0.5 * (erf((dist + 0.5) * rs_y) - erf((dist - 0.5) * rs_y))
                out[layer, v, :] += w * interm[layer, y, :]
                y += 1
    return out


# ---------------------------------------------------------------------------
# Host-prep transcriptions (kernel_wrapper.cu:781-849 + vector_find.h)
# ---------------------------------------------------------------------------

def _first_larger_ordered(ordered, value):
    """findFirstLargerOrdered (vector_find.h:62-82), clamped to the last index."""
    idx = int(np.searchsorted(ordered, value, side="right"))
    return min(idx, len(ordered) - 1)


def _step_geometry_np(fan_delta, fan_offset, source_dist, steps):
    """FillIddAndSigmaParams voxelWidth / stepVol (fill_idd_and_sigma_params.cu:23-46)."""
    dx, dy, dz = (float(v) for v in fan_delta)
    cz = float(fan_offset[2])
    sd = np.asarray(source_dist, np.float64)
    rdx = 0.0 if np.isinf(sd[0]) else 1.0 / sd[0]
    rdy = 0.0 if np.isinf(sd[1]) else 1.0 / sd[1]
    kk = np.arange(steps, dtype=np.float64)
    vwx = dx * (1.0 - (cz + kk * dz) * rdx)
    vwy = dy * (1.0 - (cz + kk * dz) * rdy)
    half_vw_sum = 0.5 * (vwx + vwy)
    base = abs(dx * dy * dz)
    vol_const = base * (1.0 - cz * rdx - cz * rdy + (cz * cz + dz * dz / 12.0) * rdx * rdy)
    vol_lin = base * dz * (-rdx - rdy + 2.0 * cz * rdx * rdy)
    vol_sq = base * dz * dz * rdx * rdy
    step_vol = vol_const + kk * vol_lin + kk * kk * vol_sq
    return half_vw_sum, step_vol, abs(dz), dz, cz


def _band_radius_rows(rs_slice, ks_cutoff, max_radius):
    """The engine's truncation semantics, transcribed: tileRadCalc's radius
    formula (kernel_wrapper.cuh:303) per 32x8 tile, rounded UP to the
    kernel's static class set (batching sparse classes into the next-larger
    kernel, kernel_wrapper.cu:968-976). Returns (Y, X) per-source radii,
    -1 for sources of an all-dead tile."""
    classes = [0, 1, 2, 3, 4, 5, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32]
    classes = sorted({c for c in classes if c < max_radius} | {max_radius})
    Y, X = rs_slice.shape
    st = 8 if Y % 8 == 0 else Y
    sx = 32 if X % 32 == 0 else X
    out = np.empty((Y, X), np.int64)
    for b in range(Y // st):
        for g in range(X // sx):
            min_rs = float(np.min(rs_slice[b * st:(b + 1) * st,
                                           g * sx:(g + 1) * sx]))
            if min_rs > 1e8:
                rad = -1
            else:
                rad = min(int(ks_cutoff / (np.sqrt(2.0) * min_rs) + 0.5),
                          max_radius)
                rad = next(c for c in classes if c >= rad)
            out[b * st:(b + 1) * st, g * sx:(g + 1) * sx] = rad
    return out


def _transfer_golden(dose, bev, beam, grid, pad, bbox_min, bbox_max):
    """primTransfDiv transcription (kernel_wrapper.cu:69-97 +
    transfer_param_struct_div3.cu:22-34): dose idx -> gantry -> divergence
    division -> fan idx (+pad lateral shift), trilinear border-zero sample of
    the padded BEV slab, += into the dose grid. Vectorized float64 numpy."""
    m = np.asarray(beam.gantry_to_dose_idx.m, np.float64)
    v = np.asarray(beam.gantry_to_dose_idx.v, np.float64)
    minv = np.linalg.inv(m)
    sd = np.asarray(beam.source_dist, np.float64)
    (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max
    xs = np.arange(x0, x1 + 1, dtype=np.float64)
    ys = np.arange(y0, y1 + 1, dtype=np.float64)
    zs = np.arange(z0, z1 + 1, dtype=np.float64)
    gz, gy, gx = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    gant = (pts - v) @ minv.T
    div_x = 1.0 if np.isinf(sd[0]) else 1.0 - gant[:, 2] / sd[0]
    div_y = 1.0 if np.isinf(sd[1]) else 1.0 - gant[:, 2] / sd[1]
    fan_x = gant[:, 0] / div_x
    fan_y = gant[:, 1] / div_y
    res = np.asarray(grid.ray_res, np.float64)
    off = np.asarray(grid.ray_offset, np.float64)
    ci = fan_x / res[0] - off[0] / res[0] + pad
    cj = fan_y / res[1] - off[1] / res[1] + pad
    ck = (gant[:, 2] - off[2]) / res[2]

    S, Yp, Xp = bev.shape
    vals = np.zeros(len(pts), np.float64)
    i0 = np.floor(ci).astype(np.int64)
    j0 = np.floor(cj).astype(np.int64)
    k0 = np.floor(ck).astype(np.int64)
    fi, fj, fk = ci - i0, cj - j0, ck - k0
    for dk in (0, 1):
        for dj in (0, 1):
            for di in (0, 1):
                ii, jj, kk = i0 + di, j0 + dj, k0 + dk
                inside = ((ii >= 0) & (ii < Xp) & (jj >= 0) & (jj < Yp)
                          & (kk >= 0) & (kk < S))
                w = ((fi if di else 1 - fi) * (fj if dj else 1 - fj)
                     * (fk if dk else 1 - fk))
                iic = np.clip(ii, 0, Xp - 1)
                jjc = np.clip(jj, 0, Yp - 1)
                kkc = np.clip(kk, 0, S - 1)
                vals += np.where(inside, w * bev[kkc, jjc, iic], 0.0)
    nz = len(zs)
    nyd = len(ys)
    nxd = len(xs)
    dose[z0:z1 + 1, y0:y1 + 1, x0:x1 + 1] += vals.reshape(nz, nyd, nxd)
    return dose


# ---------------------------------------------------------------------------
# The composed oracle
# ---------------------------------------------------------------------------

def golden_beam_dose(ct: np.ndarray, beam: Beam, tables,
                     cfg: EngineConfig, dose_shape, max_radius=None,
                     verbose=False) -> np.ndarray:
    """Full-pipeline float64 dose for one beam; sequential reference
    semantics. Covers the plain mode and the nuclear-halo modes
    (NUCLEAR_CORR: halo split in the fill, spot-grid halo gather,
    halo superposition + nucTransfDiv transfer,
    kernel_wrapper.cu:320-374 and :100-128)."""
    nuclear_on = cfg.nuclear_enabled
    if nuclear_on and tables.nuclear is None:
        raise ValueError("nuclear oracle needs nuclear tables")
    grid = compute_ray_grid(beam, cfg.conv_sigma_cutoff, cfg.superp_tile)
    nrx, nry = grid.ray_dims
    S = beam.steps
    L = int(beam.spot_weights.shape[0])
    pad = cfg.max_superp_radius

    ray_to_im = FanFromIdxTransform(
        grid.ray_idx_to_gantry(),
        np.asarray(beam.source_dist, np.float32),
        beam.gantry_to_im_idx,
    )

    # K1 (sequential golden)
    density, cumul_sp, first_in, first_out, _ = tr.trace_golden_numpy(
        np.asarray(ct, np.float32), ray_to_im, grid.ray_dims, S,
        np.asarray(tables.density), float(tables.density_scale),
        np.asarray(tables.sp), float(tables.sp_scale),
    )

    # K7 reductions (kernel_wrapper.cu:781-790)
    beam_first_inside = int(first_in.min())
    beam_first_outside = int(first_out.max())
    wepl_min = cumul_sp.min(axis=(1, 2))

    # per-layer prep (kernel_wrapper.cu:792-849)
    energies = np.asarray(beam.energies, np.float64)
    tab_e = np.asarray(tables.energies, np.float64)
    scale_facts = np.interp(energies, tab_e, np.asarray(tables.scale_facts, np.float64))
    peak_depths = np.interp(energies, tab_e, np.asarray(tables.peak_depths, np.float64))
    energy_idcs = np.interp(energies, tab_e, np.arange(len(tab_e), dtype=np.float64))

    res_z, off_z = grid.ray_res[2], grid.ray_offset[2]
    entry_z = beam_first_inside * res_z + off_z
    if cfg.nozzle:
        a_air = 0.00270 / (peak_depths - 4.50)
        b_air = -4.39 / (peak_depths - 3.86)
    else:
        a_air = np.zeros(L)
        b_air = np.zeros(L)
    entry_var = a_air * entry_z * entry_z + b_air * entry_z
    spot_sigmas = np.asarray(beam.spot_sigmas, np.float64)
    entry_sigmas = np.sqrt(entry_var[:, None] + spot_sigmas ** 2)
    if cfg.nuclear == "gauss_fit":
        entry_sigmas = 0.97 * entry_sigmas
    sd = np.asarray(beam.source_dist, np.float64)
    px_mult = np.array([
        1.0 if np.isinf(sd[0]) else 1.0 - entry_z / sd[0],
        1.0 if np.isinf(sd[1]) else 1.0 - entry_z / sd[1],
    ])

    max_peak = float(np.interp(energies.max(), tab_e,
                               np.asarray(tables.peak_depths, np.float64)))
    first_guaranteed_passive = min(
        _first_larger_ordered(wepl_min, cfg.bp_depth_cutoff * max_peak),
        beam_first_outside,
    )
    after_lasts = [
        min(_first_larger_ordered(wepl_min, cfg.bp_depth_cutoff * peak_depths[l]),
            first_guaranteed_passive)
        for l in range(L)
    ]

    # K3 (erf-diff convolution transcription)
    ray_weights = conv_golden(
        np.asarray(beam.spot_weights, np.float64), entry_sigmas, nrx, nry,
        np.asarray(beam.spot_idx_to_gantry.delta, np.float64)[:2],
        np.asarray(beam.spot_idx_to_gantry.offset, np.float64)[:2],
        (grid.ray_res[0], grid.ray_res[1]),
        (grid.ray_offset[0], grid.ray_offset[1]),
        px_mult, cfg.conv_sigma_cutoff,
    )

    half_vw_sum, step_vol, step_length, dz, cz = _step_geometry_np(
        grid.ray_res, grid.ray_offset, beam.source_dist, S)

    if max_radius is None:
        max_radius = pad

    # nuclear-halo statics (engine orchestration transcription; the
    # reference builds the coarse spot grid + nearest-primary-ray map in
    # kernel_wrapper.cu:665-667,884-908)
    if nuclear_on:
        sy_n, sx_n = beam.spot_weights.shape[1:]
        tile = cfg.superp_tile
        nx_n = -(-sx_n // tile[0]) * tile[0]
        ny_n = -(-sy_n // tile[1]) * tile[1]
        sdp = np.asarray(beam.spot_idx_to_gantry.delta, np.float64)
        sop = np.asarray(beam.spot_idx_to_gantry.offset, np.float64)
        map_x = np.round(
            (sop[0] + np.arange(sx_n) * sdp[0] - grid.ray_offset[0])
            / grid.ray_res[0]).astype(np.int64)
        map_y = np.round(
            (sop[1] + np.arange(sy_n) * sdp[1] - grid.ray_offset[1])
            / grid.ray_res[1]).astype(np.int64)
        spot_dist = float(sdp[0] / beam.ray_spacing[0])
        nuc_sq_max = float(np.max(tables.nuclear.sq_sigma))
        px_w = 0.5 * (grid.ray_res[0] + grid.ray_res[1])
        sigma_bound = np.sqrt(
            (1.4 * 0.0294 * max_peak ** 0.896) ** 2 + nuc_sq_max
            + float(np.max(spot_sigmas)) ** 2)
        spot_px = px_w * spot_dist
        nuc_radius = max(1, min(
            int(cfg.ks_sigma_cutoff * sigma_bound / spot_px + 0.5) + 1,
            cfg.max_superp_radius))
        nuc_bev = np.zeros((S, ny_n + 2 * pad, nx_n + 2 * pad), np.float64)

    # layer loop: K2 fill + per-band-radius K5 superposition
    bev = np.zeros((S, nry + 2 * pad, nrx + 2 * pad), np.float64)
    for l in range(L):
        air_quad = a_air[l] * dz * dz
        air_lin = 2.0 * a_air[l] * dz * cz + b_air[l] * dz
        fill_out = isig.fill_golden_numpy(
            density, cumul_sp, np.asarray(ray_weights[l], np.float32),
            first_in, first_out, beam_first_inside,
            float(energy_idcs[l]), float(scale_facts[l]),
            float(peak_depths[l]), after_lasts[l],
            float(air_lin), float(air_quad), float(step_length),
            half_vw_sum.astype(np.float32), step_vol.astype(np.float32),
            np.asarray(tables.cidd), np.asarray(tables.rrl),
            float(tables.rrl_scale),
            dose_to_water=cfg.dose_to_water, nuclear_mode=cfg.nuclear,
            bp_depth_cutoff=cfg.bp_depth_cutoff,
            ray_weight_cutoff=cfg.ray_weight_cutoff,
            nuc_weight_tab=(np.asarray(tables.nuclear.weight)
                            if nuclear_on else None),
            nuc_sq_sigma_tab=(np.asarray(tables.nuclear.sq_sigma)
                              if nuclear_on else None),
            spot_dist=spot_dist if nuclear_on else 1.0,
            entry_sigma_sq=float(entry_sigmas[l, 0] ** 2),
        )
        if nuclear_on:
            idd, rsig, _, nuc_idd_unit, nuc_rsig = fill_out
        else:
            idd, rsig, _ = fill_out
        if verbose:
            print(f"golden layer {l}: idd max {idd.max():.4g}")
        for s in range(S):
            if not np.any(idd[s] > 0):
                continue
            rad_rows = _band_radius_rows(rsig[s], cfg.ks_sigma_cutoff,
                                         max_radius)
            if rad_rows.max() < 0:
                continue
            bev[s] += sup.superpose_golden_numpy(
                idd[s:s + 1], rsig[s:s + 1], max_radius, pad,
                rad_rows=rad_rows[None])[0]
        if nuclear_on:
            # spot-grid halo gather (extendAndPadd + nucRayWeights,
            # kernel_wrapper.cu:858-864,327-341): each spot reads its
            # nearest primary ray's unit halo, scaled by the raw weight
            w_l = np.asarray(beam.spot_weights[l], np.float64)
            n_idd = np.zeros((S, ny_n, nx_n), np.float32)
            n_rs = np.full((S, ny_n, nx_n), np.float32(isig.BIG_RSIGMA))
            n_idd[:, :sy_n, :sx_n] = (
                nuc_idd_unit[:, map_y][:, :, map_x]
                * w_l[None, :, :]).astype(np.float32)
            n_rs[:, :sy_n, :sx_n] = nuc_rsig[:, map_y][:, :, map_x]
            for s in range(S):
                if not np.any(n_idd[s] > 0):
                    continue
                rad_rows = _band_radius_rows(n_rs[s], cfg.ks_sigma_cutoff,
                                             nuc_radius)
                if rad_rows.max() < 0:
                    continue
                nuc_bev[s] += sup.superpose_golden_numpy(
                    n_idd[s:s + 1], n_rs[s:s + 1], nuc_radius, pad,
                    rad_rows=rad_rows[None])[0]

    # K6 transfer
    from raytracedicom_tpu.ops import transfer as xfer
    ray_to_dose = FanFromIdxTransform(
        grid.ray_idx_to_gantry(),
        np.asarray(beam.source_dist, np.float32),
        beam.gantry_to_dose_idx,
    )
    bbox_min, bbox_max = xfer.dose_bbox(ray_to_dose, grid.ray_dims, pad,
                                        (0, S), dose_shape)
    dose = np.zeros(dose_shape, np.float64)
    dose = _transfer_golden(dose, bev, beam, grid, pad, bbox_min, bbox_max)
    if nuclear_on:
        # halo transfer on the spot-grid fan (nucTransfDiv,
        # kernel_wrapper.cu:100-128)
        from types import SimpleNamespace
        nuc_grid = SimpleNamespace(
            ray_res=tuple(float(v) for v in beam.spot_idx_to_gantry.delta),
            ray_offset=tuple(float(v) for v in beam.spot_idx_to_gantry.offset),
        )
        nuc_to_dose = FanFromIdxTransform(
            beam.spot_idx_to_gantry,
            np.asarray(beam.source_dist, np.float32),
            beam.gantry_to_dose_idx,
        )
        nb_min, nb_max = xfer.dose_bbox(nuc_to_dose, (nx_n, ny_n), pad,
                                        (0, S), dose_shape)
        dose = _transfer_golden(dose, nuc_bev, beam, nuc_grid, pad,
                                nb_min, nb_max)
    return dose
