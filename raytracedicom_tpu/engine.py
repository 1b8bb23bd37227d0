"""The dose engine: composes the kernel chain for full beams.

TPU-native equivalent of the reference orchestrator ``cudaWrapperProtons``
(kernel_wrapper.cu:381-1369). Where the reference interleaves host syncs
(scalar reductions copied to the CPU to size the next launch), this engine
compiles each beam to a single XLA program: every data-dependent quantity
(patient entry step, per-layer death bounds, per-region superposition radii)
stays on device as a traced value or mask, and all shapes are static,
derived on the host from the plan geometry alone.

Pipeline per beam (reference stage in parens):
  1. trace_density_and_sp            (K1  fillBevDensityAndSp)
  2. entry/exit/WEPL reductions      (K7  sliceMin/MaxVar)
  3. per-layer energy interpolation + entry sigmas + nozzle model
                                     (host loop kernel_wrapper.cu:829-849)
  4. spot_to_ray_weights             (K3  gpuConvolution2D)
  5. scan over energy layers: fill_idd_and_sigma -> effective_sem_radii +
     superpose_adaptive (per-band-radius bucketed Pallas kernel or MXU
     banded matmuls; jnp mirror on CPU)  (K2, K4, K5)
  6. transfer_bev_to_dose            (K6  primTransfDiv)
plus the nuclear-halo branch when enabled (NUCLEAR_CORR).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig, SCATTER_CONSTANTS
from .geometry.transforms import (
    FanFromIdxTransform,
    invert_and_shift_fan_from_idx,
)
from .ops import idd_sigma as isig
from .ops import spot_conv, superposition, trace, transfer
from .ops.pallas_superposition import (
    SEM_TY,
    effective_sem_radii,
    superpose_adaptive,
)
from .physics.interp import interp_at_index, interp_decimal_index
from .plan import Beam, RayGridGeometry, compute_ray_grid

Array = jnp.ndarray


class BeamInputs(NamedTuple):
    """Differentiable per-beam inputs."""

    spot_weights: Array   # (L, Sy, Sx)
    energies: Array       # (L,)
    spot_sigmas: Array    # (L, 2)


class TableArrays(NamedTuple):
    """Device-side physics tables (subset of PhysicsTables as jnp arrays)."""

    energies: Array
    peak_depths: Array
    scale_facts: Array
    cidd: Array
    density: Array
    density_scale: Array
    sp: Array
    sp_scale: Array
    rrl: Array
    rrl_scale: Array
    nuc_weight: Optional[Array]
    nuc_sq_sigma: Optional[Array]

    @staticmethod
    def from_tables(t) -> "TableArrays":
        return TableArrays(
            energies=jnp.asarray(t.energies),
            peak_depths=jnp.asarray(t.peak_depths),
            scale_facts=jnp.asarray(t.scale_facts),
            cidd=jnp.asarray(t.cidd),
            density=jnp.asarray(t.density),
            density_scale=jnp.asarray(t.density_scale),
            sp=jnp.asarray(t.sp),
            sp_scale=jnp.asarray(t.sp_scale),
            rrl=jnp.asarray(t.rrl),
            rrl_scale=jnp.asarray(t.rrl_scale),
            nuc_weight=None if t.nuclear is None else jnp.asarray(t.nuclear.weight),
            nuc_sq_sigma=None if t.nuclear is None else jnp.asarray(t.nuclear.sq_sigma),
        )


@dataclasses.dataclass(frozen=True)
class BeamStatic:
    """Host-computed static geometry for one beam (shapes and constants)."""

    grid: RayGridGeometry
    steps: int
    n_layers: int
    pad: int
    max_radius: int
    z_window: int                       # live-depth window length (steps)
    dose_shape: Tuple[int, int, int]    # (Zd, Yd, Xd)
    bbox_min: Tuple[int, int, int]
    bbox_max: Tuple[int, int, int]
    ray_to_im: FanFromIdxTransform      # numpy-leaf transform pytrees
    ray_to_dose: FanFromIdxTransform
    d2f: object                         # static FanToIdxTransform (pad-shifted)
    spot_delta: Tuple[float, float]     # spotIdxToGantry lateral delta/offset
    spot_offset: Tuple[float, float]
    # nuclear-halo statics (None when the mode is off; kernel_wrapper.cu:665-667,884-908)
    nuc_dims: Optional[Tuple[int, int]] = None   # tile-rounded spot grid (nx, ny)
    nuc_map_x: Optional[np.ndarray] = None       # (Sx,) primary ray idx per spot
    nuc_map_y: Optional[np.ndarray] = None       # (Sy,)
    nuc_radius: int = 0
    spot_dist: float = 1.0                       # spot spacing in ray units
    nuc_d2f: object = None
    nuc_bbox_min: Optional[Tuple[int, int, int]] = None
    nuc_bbox_max: Optional[Tuple[int, int, int]] = None


def _entry_spread_steps(ray_to_im: FanFromIdxTransform, ray_dims, steps,
                        ct_shape) -> int:
    """Geometric bound on the spread of patient-entry depths across the fan
    (in tracer steps): per-ray slab intersection of the ray with the CT
    box. Zero for a face-on axis-aligned beam (every ray enters the same
    plane); ~lateral_extent*tan(obliquity) for rotated gantries — the
    live-depth window must cover entry spread + Bragg range, or late-
    entering rays lose their distal dose (VERDICT r4 item 1 wiring)."""
    start, inc, _ = (np.asarray(a, np.float64)
                     for a in trace.np_ray_start_inc(ray_to_im, ray_dims))
    zd, yd, xd = ct_shape
    dims = np.array([xd - 1, yd - 1, zd - 1], np.float64)
    t_lo = np.zeros(start.shape[:2])
    t_hi = np.full(start.shape[:2], float(steps - 1))
    for a in range(3):
        ia = inc[..., a]
        sa = start[..., a]
        with np.errstate(divide="ignore", invalid="ignore"):
            t0 = (0.0 - sa) / ia
            t1 = (dims[a] - sa) / ia
        lo = np.minimum(t0, t1)
        hi = np.maximum(t0, t1)
        para = np.abs(ia) < 1e-12
        inside = (sa >= 0.0) & (sa <= dims[a])
        lo = np.where(para, np.where(inside, -np.inf, np.inf), lo)
        hi = np.where(para, np.where(inside, np.inf, -np.inf), hi)
        t_lo = np.maximum(t_lo, lo)
        t_hi = np.minimum(t_hi, hi)
    valid = t_hi >= t_lo
    if not valid.any():
        return 0
    ent = np.clip(t_lo[valid], 0.0, float(steps - 1))
    return int(np.ceil(float(ent.max() - ent.min())))


def precompute_beam_static(beam: Beam, tables, cfg: EngineConfig,
                           dose_shape: Tuple[int, int, int],
                           ct_shape: Optional[Tuple[int, int, int]] = None) -> BeamStatic:
    ct_shape = tuple(ct_shape or dose_shape)
    grid = compute_ray_grid(beam, cfg.conv_sigma_cutoff, cfg.superp_tile)
    ray_to_im = FanFromIdxTransform(
        grid.ray_idx_to_gantry(),
        np.asarray(beam.source_dist, np.float32),
        beam.gantry_to_im_idx,
    )
    ray_to_dose = FanFromIdxTransform(
        grid.ray_idx_to_gantry(),
        np.asarray(beam.source_dist, np.float32),
        beam.gantry_to_dose_idx,
    )
    # worst-case peak depth from the plan energies (host estimate; only
    # affects static bounds, never dose values)
    max_peak = float(np.interp(np.max(beam.energies), tables.energies,
                               tables.peak_depths))
    px_w = 0.5 * (grid.ray_res[0] + grid.ray_res[1])
    _, sigma_delta = SCATTER_CONSTANTS[cfg.nuclear]
    max_r = superposition.estimate_radius(
        float(np.max(beam.spot_sigmas)), max_peak, px_w,
        cfg.ks_sigma_cutoff, sigma_delta, cfg.max_superp_radius,
    )
    pad = cfg.max_superp_radius

    # live-depth window: from the earliest patient entry to the deepest
    # possible Bragg cutoff, with 25% margin for slow WEPL accrual plus the
    # fan's entry-depth spread (oblique gantries enter the volume at
    # laterally-varying depths); clamped to the trace
    z_window = int(np.ceil(cfg.bp_depth_cutoff * max_peak
                           / abs(grid.ray_res[2]) * 1.25))
    z_window += _entry_spread_steps(ray_to_im, grid.ray_dims, beam.steps,
                                    ct_shape)
    z_window = min(beam.steps, -(-z_window // cfg.superp_chunk_z) * cfg.superp_chunk_z)

    bbox_min, bbox_max = transfer.dose_bbox(
        ray_to_dose, grid.ray_dims, pad, (0, beam.steps), dose_shape
    )
    # static inverse transform for K6 (eager host computation, concrete
    # leaves — required by the separable-geometry detection at trace time)
    d2f = invert_and_shift_fan_from_idx(
        ray_to_dose, np.asarray([float(pad), float(pad), 0.0], np.float32)
    )
    d2f = jax.tree_util.tree_map(np.asarray, d2f)

    # nuclear-halo statics: the halo lives on the (tile-rounded) spot grid;
    # each spot maps to the nearest primary ray (kernel_wrapper.cu:884-894)
    nuc_kwargs = {}
    if cfg.nuclear_enabled:
        if tables.nuclear is None:
            raise ValueError(f"nuclear mode {cfg.nuclear!r} needs nuclear tables")
        sy, sx = beam.spot_weights.shape[1:]
        tile = cfg.superp_tile
        nuc_dims = (-(-sx // tile[0]) * tile[0], -(-sy // tile[1]) * tile[1])
        sd = np.asarray(beam.spot_idx_to_gantry.delta, np.float64)
        so = np.asarray(beam.spot_idx_to_gantry.offset, np.float64)
        nuc_map_x = np.round(
            (so[0] + np.arange(sx) * sd[0] - grid.ray_offset[0]) / grid.ray_res[0]
        ).astype(np.int32)
        nuc_map_y = np.round(
            (so[1] + np.arange(sy) * sd[1] - grid.ray_offset[1]) / grid.ray_res[1]
        ).astype(np.int32)
        spot_dist = float(sd[0] / beam.ray_spacing[0])
        nuc_to_dose = FanFromIdxTransform(
            beam.spot_idx_to_gantry,
            np.asarray(beam.source_dist, np.float32),
            beam.gantry_to_dose_idx,
        )
        nuc_d2f = invert_and_shift_fan_from_idx(
            nuc_to_dose, np.asarray([float(pad), float(pad), 0.0], np.float32)
        )
        nuc_d2f = jax.tree_util.tree_map(np.asarray, nuc_d2f)
        nuc_bbox_min, nuc_bbox_max = transfer.dose_bbox(
            nuc_to_dose, nuc_dims, pad, (0, beam.steps), dose_shape
        )
        # halo radius upper bound: MCS + worst tabulated halo sigma + entry
        # sigma, in spot-grid pixels (reference formula kernel_wrapper.cuh:303)
        nuc_sq_max = float(np.max(tables.nuclear.sq_sigma))
        sigma_bound = math.sqrt(
            (1.4 * 0.0294 * max_peak ** 0.896) ** 2 + nuc_sq_max
            + float(np.max(beam.spot_sigmas)) ** 2
        )
        spot_px = px_w * spot_dist
        nuc_radius = max(1, min(int(cfg.ks_sigma_cutoff * sigma_bound / spot_px + 0.5) + 1,
                                cfg.max_superp_radius))
        nuc_kwargs = dict(
            nuc_dims=nuc_dims, nuc_map_x=nuc_map_x, nuc_map_y=nuc_map_y,
            nuc_radius=nuc_radius, spot_dist=spot_dist, nuc_d2f=nuc_d2f,
            nuc_bbox_min=nuc_bbox_min, nuc_bbox_max=nuc_bbox_max,
        )
    return BeamStatic(
        grid=grid,
        steps=beam.steps,
        n_layers=int(beam.spot_weights.shape[0]),
        pad=pad,
        max_radius=max_r,
        z_window=z_window,
        dose_shape=dose_shape,
        bbox_min=bbox_min,
        bbox_max=bbox_max,
        ray_to_im=ray_to_im,
        ray_to_dose=ray_to_dose,
        d2f=d2f,
        spot_delta=(float(beam.spot_idx_to_gantry.delta[0]),
                    float(beam.spot_idx_to_gantry.delta[1])),
        spot_offset=(float(beam.spot_idx_to_gantry.offset[0]),
                     float(beam.spot_idx_to_gantry.offset[1])),
        **nuc_kwargs,
    )


def first_larger_ordered(ordered: Array, value: Array) -> Array:
    """Index of the first element > value in a nondecreasing array, clamped
    to the last index (reference: findFirstLargerOrdered, vector_find.h:62-82)."""
    idx = jnp.searchsorted(ordered, value, side="right")
    return jnp.minimum(idx, ordered.shape[0] - 1).astype(jnp.int32)


def _ray_shard_info(ray_sharding, nry: int):
    """(mesh, axis_name, n_ray, y_loc) for the shard_map overlap-add path,
    or None when the sharding cannot drive it (unsharded ray axis, or rows
    not divisible).

    Why shard_map instead of plain GSPMD annotations: the SPMD partitioner
    cannot see inside pallas_call, so it replicates the superposition — an
    all-gather of every (S, Ry, Rx) slab per layer and fully redundant
    compute (measured: 170 slab all-gathers on the watercube program). Under
    shard_map each ray shard superposes only its own rows into a locally
    padded slab; because a source ray only ever scatters within +-pad of
    itself, the global padded slab is exactly the overlap-add of the shard
    slabs, which the transfer stage folds into the dose grid with one psum
    per beam — no per-layer communication at all.
    """
    if ray_sharding is None:
        return None
    spec = ray_sharding.spec
    if len(spec) < 2 or spec[1] is None:
        return None
    axis = spec[1]
    if isinstance(axis, tuple):
        if len(axis) != 1:
            return None
        axis = axis[0]
    mesh = ray_sharding.mesh
    n_ray = mesh.shape[axis]
    if nry % n_ray:
        return None
    y_loc = nry // n_ray
    # the per-8-row-band truncation radii must tile identically in the
    # sharded and unsharded programs: each shard must consist of whole
    # bands, or lie entirely inside one band
    st = SEM_TY if nry % SEM_TY == 0 else nry
    if y_loc % st and st % y_loc:
        return None
    return mesh, axis, n_ray, y_loc


def compute_beam_dose(
    ct: Array,
    dose: Array,
    inputs: BeamInputs,
    tables: TableArrays,
    static: BeamStatic,
    cfg: EngineConfig,
    ray_sharding=None,
) -> Array:
    """Add one beam's dose into ``dose`` (both (Z, Y, X), HU+1000 CT).

    ``ray_sharding``: optional ``jax.sharding.NamedSharding`` whose spec
    partitions axis 1 (ray-grid Y) of the (S, Ry, Rx) BEV slabs. Rays are
    embarrassingly parallel through trace/fill (SURVEY.md §2.4a); the
    superposition halo (≤ pad pixels) becomes an XLA-inserted collective
    permute, and the final transfer gathers from the resharded BEV dose.
    """
    grid = static.grid
    nrx, nry = grid.ray_dims
    S = static.steps
    L = static.n_layers

    def constrain(x):
        if ray_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, ray_sharding)

    # ---- K1: trace ----
    tr = trace.trace_density_and_sp(
        ct, static.ray_to_im, grid.ray_dims, S,
        tables.density, tables.density_scale, tables.sp, tables.sp_scale,
    )
    tr = tr._replace(density=constrain(tr.density), cumul_sp=constrain(tr.cumul_sp))

    # ---- K7 reductions (kernel_wrapper.cu:781-790) ----
    beam_first_inside = jnp.min(tr.first_inside)
    beam_first_outside = jnp.max(tr.first_outside)
    wepl_min = jnp.min(tr.cumul_sp, axis=(1, 2))       # (S,)

    # ---- per-layer scalars (kernel_wrapper.cu:792-849) ----
    res_z = jnp.asarray(grid.ray_res[2], ct.dtype)
    off_z = jnp.asarray(grid.ray_offset[2], ct.dtype)
    entry_z = beam_first_inside.astype(ct.dtype) * res_z + off_z

    energy_idcs = interp_decimal_index(tables.energies, inputs.energies)   # (L,)
    scale_facts = interp_at_index(tables.scale_facts, energy_idcs)
    peak_depths = interp_at_index(tables.peak_depths, energy_idcs)

    a_air, b_air = isig.sigma_sq_air_coefs(peak_depths, cfg.nozzle)
    entry_var = a_air * entry_z * entry_z + b_air * entry_z               # (L,)
    entry_sigmas = jnp.sqrt(entry_var[:, None] + inputs.spot_sigmas ** 2)  # (L,2)
    if cfg.nuclear == "gauss_fit":
        entry_sigmas = 0.97 * entry_sigmas

    src = np.asarray(static.ray_to_im.source_dist, np.float64)
    px_sp_mult = jnp.asarray(
        [0.0 if np.isinf(src[0]) else 1.0, 0.0 if np.isinf(src[1]) else 1.0],
        ct.dtype,
    )
    px_sp_mult = 1.0 - px_sp_mult * entry_z / jnp.asarray(
        np.where(np.isinf(src), 1.0, src), ct.dtype
    )

    # ---- layer death bounds (kernel_wrapper.cu:792-798, 922-924) ----
    max_peak = interp_at_index(
        tables.peak_depths, interp_decimal_index(tables.energies, jnp.max(inputs.energies))
    )
    first_past_cutoff_all = first_larger_ordered(wepl_min, cfg.bp_depth_cutoff * max_peak)
    beam_first_guaranteed_passive = jnp.minimum(first_past_cutoff_all, beam_first_outside)
    layer_after_last = jnp.minimum(
        first_larger_ordered(wepl_min, cfg.bp_depth_cutoff * peak_depths),
        beam_first_guaranteed_passive,
    ).astype(jnp.int32)                                                   # (L,)

    # ---- K3: spot->ray weights for all layers ----
    ray_weights = spot_conv.spot_to_ray_weights(
        inputs.spot_weights, entry_sigmas, grid.ray_dims,
        static.spot_delta, static.spot_offset,
        (grid.ray_res[0], grid.ray_res[1]),
        (grid.ray_offset[0], grid.ray_offset[1]),
        px_sp_mult, cfg.conv_sigma_cutoff,
    )                                                                      # (L, Ry, Rx)

    # ---- layer loop: K2 fill + K4/K5 superposition ----
    geom = isig.step_geometry(
        grid.ray_res, grid.ray_offset, static.ray_to_im.source_dist, S
    )
    layers = isig.LayerScalars(
        energy_idx=energy_idcs,
        energy_scale=scale_facts,
        peak_depth=peak_depths,
        after_last=layer_after_last,
        air_lin=2.0 * a_air * geom.delta_z * geom.corner_z + b_air * geom.delta_z,
        air_quad=a_air * geom.delta_z * geom.delta_z,
        entry_sigma_sq=entry_sigmas[:, 0] ** 2,
    )

    W = static.z_window
    z0 = jnp.clip(beam_first_inside, 0, S - W).astype(jnp.int32)
    nuclear_on = cfg.nuclear_enabled and static.nuc_dims is not None

    # ---- depth-window the per-layer inputs: every step before z0 is
    # outside the patient (z0 <= beamFirstInside) and every step after
    # z0+W is past the deepest Bragg cutoff, so the layer loop only ever
    # touches W of the S traced steps ----
    dens_w = jax.lax.dynamic_slice(tr.density, (z0, 0, 0), (W, nry, nrx))
    csp_w = jax.lax.dynamic_slice(tr.cumul_sp, (z0, 0, 0), (W, nry, nrx))
    geom_w = geom._replace(
        half_vw_sum=jax.lax.dynamic_slice(geom.half_vw_sum, (z0,), (W,)),
        step_vol=jax.lax.dynamic_slice(geom.step_vol, (z0,), (W,)),
    )
    first_inside_rel = tr.first_inside - z0
    first_outside_rel = tr.first_outside - z0
    first_step_rel = beam_first_inside - z0

    # layer-independent: density / radiation length (hoisted out of the
    # per-layer loop — the reference recomputes it per layer per step,
    # kernel_wrapper.cu:293-297, because it has no cross-layer reuse)
    r_rl = dens_w * isig.lut1d_fast(tables.rrl, dens_w * tables.rrl_scale)

    def superpose(idd_w, rs_w, max_r, pad):
        # MXU banded matmuls when the layer's live rays share per-slice
        # sigmas, per-source bucketed Pallas/jnp kernel otherwise (runtime
        # lax.cond); truncation is per (slice, 8-row band) — K4 parity
        rads = effective_sem_radii(rs_w, cfg.ks_sigma_cutoff, max_r)
        return superpose_adaptive(idd_w, rs_w, rads, max_r, pad)

    rsh = _ray_shard_info(ray_sharding, nry)

    def superpose_primary(idd_w, rs_w):
        """Primary-beam superposition; under ray sharding, returns the
        per-shard locally-padded slabs stacked on a leading mesh axis
        (n_ray, W, y_loc + 2*pad, Rx + 2*pad) instead of the global slab."""
        max_r, pad = static.max_radius, static.pad
        # truncation radii stay a GLOBAL per-(slice, band) quantity so the
        # sharded and unsharded programs are numerically identical
        rads = effective_sem_radii(rs_w, cfg.ks_sigma_cutoff, max_r)
        if rsh is None:
            return superpose_adaptive(idd_w, rs_w, rads, max_r, pad)
        mesh, axis, n_ray, y_loc = rsh
        st = SEM_TY if nry % SEM_TY == 0 else nry
        n8_loc = max(1, y_loc // st)
        P = jax.sharding.PartitionSpec

        def body(idd_loc, rs_loc, rads_g):
            # shard k's rows start at global band (k*y_loc)//st; a shard is
            # either whole bands or inside one band (_ray_shard_info)
            k = jax.lax.axis_index(axis)
            rads_loc = jax.lax.dynamic_slice(
                rads_g, (0, (k * y_loc) // st, 0),
                (rads_g.shape[0], n8_loc, rads_g.shape[2]))
            out = superpose_adaptive(idd_loc, rs_loc, rads_loc, max_r, pad)
            return out[None]

        # check_vma=False: the varying-manual-axes checker rejects mixing
        # the replicated band radii with ray-varying slabs inside lax.cond
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(None, axis, None), P(None, axis, None), P()),
            out_specs=P(axis, None, None, None), check_vma=False,
        )(idd_w, rs_w, rads)

    def _fill_call(dens, csp, rw, layer, rrl_dens):
        return isig.fill_idd_and_sigma(
            dens, csp, rw, first_inside_rel, first_outside_rel,
            first_step_rel, layer, geom_w,
            tables.cidd, tables.rrl, tables.rrl_scale,
            dose_to_water=cfg.dose_to_water,
            nuclear_mode=cfg.nuclear,
            bp_depth_cutoff=cfg.bp_depth_cutoff,
            ray_weight_cutoff=cfg.ray_weight_cutoff,
            nuc_weight_tab=tables.nuc_weight if nuclear_on else None,
            nuc_sq_sigma_tab=tables.nuc_sq_sigma if nuclear_on else None,
            spot_dist=static.spot_dist,
            r_rl=rrl_dens,
            first_step_abs=beam_first_inside,
        )

    fill_fn = _fill_call
    if cfg.remat_fill and not cfg.remat_layers:
        fill_fn = jax.checkpoint(_fill_call)

    def layer_body(acc, per_layer):
        layer, rw, spot_w = per_layer
        layer = layer._replace(
            after_last=jnp.clip(layer.after_last - z0, 0, W).astype(jnp.int32))
        fill = fill_fn(dens_w, csp_w, rw, layer, r_rl)
        bev_acc, nuc_acc = acc
        idd_w = constrain(fill.idd)
        rs_w = constrain(fill.r_sigma_eff)
        if cfg.freeze_sigma_grad:
            # spot-weight-only optimization: r_sigma_eff does not depend
            # on the weights, so cutting its adjoint chain (the dominant
            # backward path) leaves d-dose/d-weights bit-identical
            rs_w = jax.lax.stop_gradient(rs_w)
        bev_acc = bev_acc + superpose_primary(idd_w, rs_w)

        if nuclear_on:
            # gather halo outputs onto the (tile-rounded) spot grid and scale
            # by the raw spot weights (extendAndPadd + nucRayWeights,
            # kernel_wrapper.cu:858-864,327-341)
            nx_n, ny_n = static.nuc_dims
            sy, sx = spot_w.shape
            map_y = jnp.asarray(static.nuc_map_y)
            map_x = jnp.asarray(static.nuc_map_x)
            n_idd = jnp.take(jnp.take(fill.nuc_idd_unit, map_y, axis=1),
                             map_x, axis=2) * spot_w[None]
            n_rs = jnp.take(jnp.take(fill.nuc_r_sigma_eff, map_y, axis=1),
                            map_x, axis=2)
            if cfg.freeze_sigma_grad:
                n_rs = jax.lax.stop_gradient(n_rs)
            n_idd = jnp.pad(n_idd, ((0, 0), (0, ny_n - sy), (0, nx_n - sx)))
            n_rs = jnp.pad(n_rs, ((0, 0), (0, ny_n - sy), (0, nx_n - sx)),
                           constant_values=isig.BIG_RSIGMA)
            nuc_acc = nuc_acc + superpose(n_idd, n_rs, static.nuc_radius,
                                          static.pad)
        return (bev_acc, nuc_acc), fill.first_passive

    body = layer_body
    if cfg.remat_layers:
        body = jax.checkpoint(layer_body)

    if rsh is None:
        bev0 = jnp.zeros((W, nry + 2 * static.pad, nrx + 2 * static.pad),
                         ct.dtype)
    else:
        bev0 = jnp.zeros((rsh[2], W, rsh[3] + 2 * static.pad,
                          nrx + 2 * static.pad), ct.dtype)
        bev0 = jax.lax.with_sharding_constraint(
            bev0, jax.sharding.NamedSharding(
                rsh[0], jax.sharding.PartitionSpec(rsh[1]))
        )
    if nuclear_on:
        nuc0 = jnp.zeros((W, static.nuc_dims[1] + 2 * static.pad,
                          static.nuc_dims[0] + 2 * static.pad), ct.dtype)
    else:
        nuc0 = jnp.zeros((), ct.dtype)
    (bev_dose, nuc_dose), first_passives = jax.lax.scan(
        body, (bev0, nuc0), (layers, ray_weights, inputs.spot_weights))

    # ---- K6: transfer (window z origin folded into the traced z shift, like
    # the reference's invertAndShift(maxR, maxR, -beamFirstInside)) ----
    if rsh is None:
        dose = transfer.transfer_bev_to_dose(
            dose, bev_dose, static.d2f, static.bbox_min, static.bbox_max,
            z_shift=-z0.astype(ct.dtype), shift_span=(S - W, 0),
        )
    else:
        # overlap-add: each shard transfers its local slab (global padded
        # rows [k*y_loc, k*y_loc + y_loc + 2*pad)) and the partial bbox
        # values are combined with ONE psum per beam
        mesh, axis, n_ray, y_loc = rsh
        P = jax.sharding.PartitionSpec
        def tbody(bev_loc, zsh):
            k = jax.lax.axis_index(axis)
            vals = transfer.transfer_vals(
                bev_loc[0], static.d2f, static.bbox_min, static.bbox_max,
                z_shift=zsh, y_shift=(-k * y_loc).astype(ct.dtype),
                shift_span=(S - W, nry - y_loc),
            )
            return jax.lax.psum(vals, axis)

        vals = jax.shard_map(
            tbody, mesh=mesh, in_specs=(P(axis, None, None, None), P()),
            out_specs=P(), check_vma=False,
        )(bev_dose, -z0.astype(ct.dtype))
        (x0, y0, zz0), (x1, y1, zz1) = static.bbox_min, static.bbox_max
        dose = dose.at[zz0:zz1 + 1, y0:y1 + 1, x0:x1 + 1].add(vals)
    if nuclear_on:
        # halo transfer on the spot-grid fan (nucTransfDiv, kernel_wrapper.cu:100-128)
        dose = transfer.transfer_bev_to_dose(
            dose, nuc_dose, static.nuc_d2f, static.nuc_bbox_min,
            static.nuc_bbox_max, z_shift=-z0.astype(ct.dtype),
            shift_span=(S - W, 0),
        )
    return dose


def _static_key(static: BeamStatic) -> str:
    """Compiled-kernel cache key: every value baked into the traced program
    must participate — two beams with equal shapes but different gantry
    transforms are different programs."""
    import hashlib

    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(
        (static.ray_to_im, static.ray_to_dose, static.d2f, static.nuc_d2f)
    ):
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    for m in (static.nuc_map_x, static.nuc_map_y):
        if m is not None:
            h.update(np.ascontiguousarray(m).tobytes())
    h.update(repr((
        static.grid, static.steps, static.n_layers, static.pad,
        static.max_radius,
        static.z_window, static.dose_shape, static.bbox_min, static.bbox_max,
        static.spot_delta, static.spot_offset, static.nuc_dims,
        static.nuc_radius, static.spot_dist, static.nuc_bbox_min,
        static.nuc_bbox_max,
    )).encode())
    return h.hexdigest()


class DoseEngine:
    """User-facing engine: holds tables + config, jits one kernel per beam
    geometry (the reference's cudaWrapperProtons equivalent, minus the
    explicit memory management XLA does for us)."""

    def __init__(self, tables, cfg: EngineConfig = EngineConfig(),
                 ray_sharding=None):
        self.tables = tables
        self.cfg = cfg
        self.ray_sharding = ray_sharding
        self.table_arrays = TableArrays.from_tables(tables)
        self._kernels = {}

    def beam_static(self, beam: Beam, dose_shape, ct_shape=None) -> BeamStatic:
        return precompute_beam_static(beam, self.tables, self.cfg, dose_shape,
                                      ct_shape=ct_shape)

    def _kernel(self, static: BeamStatic):
        key = _static_key(static)
        if key not in self._kernels:
            cfg = self.cfg
            ray_sharding = self.ray_sharding

            @functools.partial(jax.jit, donate_argnums=(1,))
            def kernel(ct, dose, inputs, tabs):
                return compute_beam_dose(ct, dose, inputs, tabs, static, cfg,
                                         ray_sharding=ray_sharding)

            self._kernels[key] = kernel
        return self._kernels[key]

    def describe_beam(self, beam: Beam, dose_shape, stream=None) -> str:
        """Per-beam diagnostics — the reference's per-layer stdout echo
        (kernel_wrapper.cu:1017-1019: energy idx, peak depth, entry sigmas,
        max radius) from the host-computed statics."""
        static = self.beam_static(beam, tuple(dose_shape))
        t = self.tables
        lines = [
            f"ray grid {static.grid.ray_dims} @ {static.grid.ray_res[:2]} mm, "
            f"{static.steps} steps (live window {static.z_window})",
            f"superposition max radius {static.max_radius} (pad {static.pad}); "
            f"dose bbox {static.bbox_min}..{static.bbox_max}",
        ]
        energies = np.asarray(beam.energies)
        eidx = np.interp(energies, t.energies, np.arange(len(t.energies)))
        peaks = np.interp(energies, t.energies, t.peak_depths)
        for li, (e, ei, pk) in enumerate(zip(energies, eidx, peaks)):
            lines.append(
                f"  layer {li}: E={e:.2f} MeV (idx {ei:.2f}), peak depth "
                f"{pk:.1f} mm, spot sigma {np.asarray(beam.spot_sigmas)[li]}"
            )
        if self.cfg.nuclear_enabled and static.nuc_dims is not None:
            lines.append(f"nuclear: mode {self.cfg.nuclear}, grid "
                         f"{static.nuc_dims}, radius {static.nuc_radius}, "
                         f"spot dist {static.spot_dist:.2f} rays")
        out = "\n".join(lines)
        if stream is not None:
            print(out, file=stream)
        return out

    def compute_dose(self, ct, beams, dose_shape=None) -> Array:
        """Multi-beam dose (the reference only supports one beam per run,
        main.cu:117-120; summing fields is the natural extension)."""
        ct = jnp.asarray(ct)
        dose_shape = tuple(dose_shape or ct.shape)
        dose = jnp.zeros(dose_shape, ct.dtype)
        for beam in beams:
            static = self.beam_static(beam, dose_shape, ct_shape=ct.shape)
            inputs = BeamInputs(
                spot_weights=jnp.asarray(beam.spot_weights),
                energies=jnp.asarray(beam.energies),
                spot_sigmas=jnp.asarray(beam.spot_sigmas),
            )
            dose = self._kernel(static)(ct, dose, inputs, self.table_arrays)
        return dose
