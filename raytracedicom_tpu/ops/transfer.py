"""K6 — BEV dose -> dose-grid resampling with divergence correction.

Reference: primTransfDiv / nucTransfDiv (kernel_wrapper.cu:69-128) with
TransferParamStructDiv3 (transfer_param_struct_div3.cu:22-34): one CUDA
thread per dose-grid column walks z, converts each dose-grid index to a fan
index with a perspective division, trilinearly samples the padded BEV dose
texture and accumulates into the global dose grid.

TPU-native restructure: generate the full (bounding-box) lattice of dose-grid
indices at once, map them through the inverse fan transform (pure batched
math), and perform one large border-zero trilinear gather — then add into the
dose volume with a single static-slice update. The reference's host-side
corner-transform bounding box (kernel_wrapper.cu:1187-1210) is reproduced on
the host in ``dose_bbox`` so the gather extent stays static.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.transforms import (
    FanFromIdxTransform,
    FanToIdxTransform,
    apply_fan_to_idx,
    np_apply_fan_from_idx,
)
from ..physics.interp import trilinear_border

Array = jnp.ndarray


def dose_bbox(
    ray_idx_to_dose_idx: FanFromIdxTransform,
    ray_dims: Tuple[int, int],
    pad: int,
    z_range: Tuple[int, int],
    dose_shape: Tuple[int, int, int],
    align_x: int = 32,
) -> Tuple[Tuple[int, int, int], Tuple[int, int, int]]:
    """Static bounding box of the beam in dose-grid indices.

    Transforms the 8 corners of the padded BEV slab (x,y in
    [-pad, dims+pad-1], z in z_range) exactly like kernel_wrapper.cu:1187-1210,
    floors/ceils, clamps to the dose grid, and aligns min x down to
    ``align_x``. Returns ((x0,y0,z0), (x1,y1,z1)) inclusive.
    """
    xs = (-float(pad), float(ray_dims[0] + pad - 1))
    ys = (-float(pad), float(ray_dims[1] + pad - 1))
    zs = (float(z_range[0]), float(z_range[1] - 1))
    pts = np.array([[x, y, z] for z in zs for y in ys for x in xs], np.float32)
    out = np_apply_fan_from_idx(ray_idx_to_dose_idx, pts)
    mn = out.min(axis=0)
    mx = out.max(axis=0)
    zd, yd, xd = dose_shape
    x0 = max((int(np.floor(mn[0])) // align_x) * align_x, 0)
    y0 = max(int(np.floor(mn[1])), 0)
    z0 = max(int(np.floor(mn[2])), 0)
    x1 = min(int(np.ceil(mx[0])), xd - 1)
    y1 = min(int(np.ceil(mx[1])), yd - 1)
    z1 = min(int(np.ceil(mx[2])), zd - 1)
    return (x0, y0, z0), (x1, y1, z1)


def oblique_transfer_plan(dose_idx_to_fan_idx: FanToIdxTransform,
                          bbox_min, bbox_max, bev_shape,
                          shift_span: Tuple[int, int] = (0, 0)):
    """Host plan for the general-angle K6 gather: build the dose-bbox ->
    fan-index lattice in float32 numpy (mirroring apply_fan_to_idx) and
    measure the gather windows on it. ``shift_span`` widens the window
    sizing by the maximum traced shift magnitude along the BEV (k, j) axes
    (the -beamFirstInside depth origin / the sharded row origin), so the
    slid windows stay covering. Returns (ObliquePlan, pack info, swapped)
    or None."""
    from .pallas_gather3d import plan_lattice_best

    t = dose_idx_to_fan_idx
    m = np.asarray(t.im_idx_to_gantry.m, np.float32)
    v = np.asarray(t.im_idx_to_gantry.v, np.float32)
    sd = np.asarray(t.source_dist, np.float32)
    delta = np.asarray(t.fan_to_fan_idx.delta, np.float32)
    off = np.asarray(t.fan_to_fan_idx.offset, np.float32)
    (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max
    xs = np.arange(x0, x1 + 1, dtype=np.float32)
    ys = np.arange(y0, y1 + 1, dtype=np.float32)
    zs = np.arange(z0, z1 + 1, dtype=np.float32)
    gz, gy, gx = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], axis=-1)
    gant = pts @ m.T + v
    div_x = np.float32(1.0) if np.isinf(sd[0]) else 1.0 - gant[..., 2] / sd[0]
    div_y = np.float32(1.0) if np.isinf(sd[1]) else 1.0 - gant[..., 2] / sd[1]
    ci = (gant[..., 0] / div_x) * delta[0] + off[0]
    cj = (gant[..., 1] / div_y) * delta[1] + off[1]
    ck = gant[..., 2] * delta[2] + off[2]
    pos = np.stack([ck, cj, ci], axis=-1).astype(np.float32)
    span = (bev_shape[0] + int(shift_span[0]),
            bev_shape[1] + int(shift_span[1]), bev_shape[2])
    return plan_lattice_best(pos, tuple(bev_shape), span_dims=span,
                             vmem_budget=5 * 2 ** 20)


def transfer_vals(
    bev_dose: Array,               # (S, Yp, Xp) padded BEV dose slab
    dose_idx_to_fan_idx: FanToIdxTransform,
    bbox_min: Tuple[int, int, int],
    bbox_max: Tuple[int, int, int],
    z_shift: Array = None,
    y_shift: Array = None,
    shift_span: Tuple[int, int] = (0, 0),
) -> Array:
    """Resampled BEV dose over the static bbox, (nz, ny, nx).

    ``z_shift`` carries the traced fan-depth origin (the reference's
    -beamFirstInside shift, kernel_wrapper.cu:1181-1183); ``y_shift`` a
    traced lateral fan origin — used by the ray-sharded overlap-add path,
    where each shard's slab covers padded rows [k*Yloc, k*Yloc + Yloc + 2pad)
    of the global slab (y_shift = -k*Yloc). ``shift_span`` bounds the shift
    magnitudes for the oblique-kernel window planning.
    """
    from .resample import fan_to_idx_plan, separable_resample, taps_from_scales

    (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max
    zshift = jnp.asarray(0.0, bev_dose.dtype) if z_shift is None else z_shift
    yshift = jnp.asarray(0.0, bev_dose.dtype) if y_shift is None else y_shift

    plan = fan_to_idx_plan(dose_idx_to_fan_idx, bbox_min, bbox_max)
    if plan is not None:
        _, make_coords, scales = plan
        c0, c1, c2 = make_coords()
        return separable_resample(bev_dose, c0 + zshift, c1 + yshift, c2,
                                  taps=taps_from_scales(scales))

    from .pallas_gather3d import force_oblique
    from .pallas_lut import on_tpu
    obl = None
    if on_tpu() or force_oblique():
        obl = oblique_transfer_plan(dose_idx_to_fan_idx, bbox_min, bbox_max,
                                    bev_dose.shape, shift_span)
    if obl is not None:
        # general-angle fast path (nucTransfDiv/primTransfDiv at arbitrary
        # rotation, kernel_wrapper.cu:69-128) — see ops/pallas_gather3d.py
        from .pallas_gather3d import (
            oblique_gather_shifted, pack_lattice_coords_jnp,
            unpack_lattice_rows,
        )
        plan3, info, axes = obl
        tz = bev_dose.ravel()[0] * 0
        xs = jnp.arange(x0, x1 + 1, dtype=bev_dose.dtype)
        ys = jnp.arange(y0, y1 + 1, dtype=bev_dose.dtype)
        zs = jnp.arange(z0, z1 + 1, dtype=bev_dose.dtype)
        gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        pts = jnp.stack([gx, gy, gz], axis=-1)       # (nz, ny, nx, 3) (x,y,z)
        fan = apply_fan_to_idx(dose_idx_to_fan_idx, pts)
        pos = fan[..., ::-1] + tz                    # channels -> (k, j, i)
        pos = jnp.transpose(pos, axes + (3,))
        cc0, cc1, cc2 = pack_lattice_coords_jnp(pos, info, plan3.perm)
        sv = (zshift, yshift, jnp.zeros_like(zshift))
        s0, s1, s2 = (sv[plan3.perm[0]], sv[plan3.perm[1]], sv[plan3.perm[2]])
        rows = oblique_gather_shifted(
            jnp.transpose(bev_dose, plan3.perm), cc0, cc1, cc2, s0, s1, s2,
            plan3)
        return jnp.transpose(unpack_lattice_rows(rows, info),
                             tuple(np.argsort(axes)))   # (nz, ny, nx)

    xs = jnp.arange(x0, x1 + 1, dtype=bev_dose.dtype)
    ys = jnp.arange(y0, y1 + 1, dtype=bev_dose.dtype)
    zs = jnp.arange(z0, z1 + 1, dtype=bev_dose.dtype)
    grid = jnp.stack(
        jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
    )  # (nx, ny, nz, 3) ordered (x, y, z)
    fan = apply_fan_to_idx(dose_idx_to_fan_idx, grid)
    fan = fan + jnp.stack([jnp.zeros_like(zshift), yshift, zshift])
    vals = trilinear_border(bev_dose, fan)          # (nx, ny, nz)
    return jnp.transpose(vals, (2, 1, 0))           # -> (nz, ny, nx)


def transfer_bev_to_dose(
    dose: Array,                   # (Zd, Yd, Xd) dose grid to accumulate into
    bev_dose: Array,               # (S, Yp, Xp) padded BEV dose slab
    dose_idx_to_fan_idx: FanToIdxTransform,
    bbox_min: Tuple[int, int, int],
    bbox_max: Tuple[int, int, int],
    z_shift: Array = None,
    shift_span: Tuple[int, int] = (0, 0),
) -> Array:
    """Accumulate the resampled BEV dose into ``dose`` over the static bbox.

    ``dose_idx_to_fan_idx`` must already include the (static) lateral padding
    shift (invert_and_shift_fan_from_idx with (pad, pad, 0)) and must have
    concrete (non-traced) leaves so the separable-geometry detection can run
    at trace time.
    """
    (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max
    vals = transfer_vals(bev_dose, dose_idx_to_fan_idx, bbox_min, bbox_max,
                         z_shift=z_shift, shift_span=shift_span)
    return dose.at[z0 : z1 + 1, y0 : y1 + 1, x0 : x1 + 1].add(vals)
