"""K1 — density and stopping-power ray march through the CT volume.

Reference: fillBevDensityAndSp (kernel_wrapper.cu:130-187) with the ray
start/increment closed forms of DensityAndSpTracerParams
(density_and_sp_tracer_params.cu:15-36).

TPU-native restructure: the reference marches each ray serially with one CUDA
thread. Every per-step quantity here is a pure function of the step index
(ray positions are affine in (i, j, k)), and the only loop-carried state —
cumulative WEPL and the cumulative-HU patient-entry test — are prefix sums.
The whole kernel therefore becomes one big batched trilinear gather plus
cumulative sums along the depth axis: no scan, no sequential dependency,
fully differentiable w.r.t. the CT volume and the LUTs.

Axis convention: arrays are (steps, nRaysY, nRaysX) = (S, Y, X) so the last
two (lane/sublane) axes hold the wide, tile-aligned ray grid.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

from ..geometry.transforms import FanFromIdxTransform
from ..physics.interp import lut1d, trilinear_border
from .pallas_lut import lut1d_fast

Array = jnp.ndarray


class TraceResult(NamedTuple):
    density: Array         # (S, Y, X) mass density at voxel centre
    cumul_sp: Array        # (S, Y, X) WEPL to far end of each step
    first_inside: Array    # (Y, X) int32: first step where ray is inside patient
    first_outside: Array   # (Y, X) int32: step after last step inside patient
    step_len: Array        # (Y, X) oblique step length [mm]


def ray_start_inc(
    t: FanFromIdxTransform, ray_dims: Tuple[int, int]
) -> Tuple[Array, Array, Array]:
    """Per-ray start position, per-step increment (both in image-index space)
    and oblique step length.

    Closed forms from DensityAndSpTracerParams (density_and_sp_tracer_params.cu:15-36):
      start(i,j) = i*mT0*dx*(1-cz/Dx) + j*mT1*dy*(1-cz/Dy) + transl
      inc(i,j)   = (mT2 - i*mT0*dx/Dx - j*mT1*dy/Dy) * dz
      stepLen(i,j) = |dz| * sqrt(1 + ((cx+i*dx)/Dx)^2 + ((cy+j*dy)/Dy)^2)
    with mTk = k-th row of gantryToImIdx^T (i.e. k-th column of the matrix),
    (dx,dy,dz) the fan deltas, (cx,cy,cz) the fan corner offset, D the source
    distances. Infinite source distance reduces to a parallel beam.
    """
    nx, ny = ray_dims
    delta = jnp.asarray(t.fan_idx_to_fan.delta)
    corner = jnp.asarray(t.fan_idx_to_fan.offset)
    dist = jnp.asarray(t.source_dist)
    m = jnp.asarray(t.gantry_to_im_idx.m)
    v = jnp.asarray(t.gantry_to_im_idx.v)

    col0, col1, col2 = m[:, 0], m[:, 1], m[:, 2]  # rows of m^T
    rdx = jnp.where(jnp.isinf(dist[0]), 0.0, 1.0 / dist[0])
    rdy = jnp.where(jnp.isinf(dist[1]), 0.0, 1.0 / dist[1])

    coef_i = col0 * delta[0]
    coef_j = col1 * delta[1]
    coef_offset = col2 - col0 * corner[0] * rdx - col1 * corner[1] * rdy
    transl = (
        v
        + col2 * corner[2]
        + col0 * corner[0] * (1.0 - corner[2] * rdx)
        + col1 * corner[1] * (1.0 - corner[2] * rdy)
    )

    ii = jnp.arange(nx, dtype=delta.dtype)            # (X,)
    jj = jnp.arange(ny, dtype=delta.dtype)            # (Y,)
    i_grid = ii[None, :, None]                        # (1, X, 1)
    j_grid = jj[:, None, None]                        # (Y, 1, 1)

    start = (
        i_grid * (coef_i * (1.0 - corner[2] * rdx))
        + j_grid * (coef_j * (1.0 - corner[2] * rdy))
        + transl
    )                                                 # (Y, X, 3)
    inc = (coef_offset - i_grid * (coef_i * rdx) - j_grid * (coef_j * rdy)) * delta[2]

    dxs = (corner[0] + ii * delta[0]) * rdx           # (X,)
    dys = (corner[1] + jj * delta[1]) * rdy           # (Y,)
    step_len = jnp.abs(delta[2]) * jnp.sqrt(
        1.0 + dxs[None, :] ** 2 + dys[:, None] ** 2
    )                                                 # (Y, X)
    return start, inc, step_len


def trace_density_and_sp(
    ct_vol: Array,
    t: FanFromIdxTransform,
    ray_dims: Tuple[int, int],
    steps: int,
    density_lut: Array,
    density_scale: Array,
    sp_lut: Array,
    sp_scale: Array,
    entry_threshold: float = 150.0,
) -> TraceResult:
    """Trace all rays at once.

    ``ct_vol`` is the (Z, Y, X) HU+1000 volume. Positions sampled with
    border-zero trilinear interpolation (imVolTex semantics), densities and
    stopping powers via clamped 1D LUTs (kernel_wrapper.cu:152-172). The
    patient-entry heuristics (kernel_wrapper.cu:174-186):
      first_inside  = 1 + (last step with cumulative HU < 150)
      first_outside = 1 + (last step with HU > 150)
    become mask counts / reversed argmax over precomputed arrays.
    """
    from .pallas_lut import on_tpu
    from .pallas_trace import fused_trace_tail
    from .resample import (fan_from_idx_plan, separable_pass12,
                           separable_resample, taps_from_scales)

    plan = fan_from_idx_plan(t, ray_dims, steps)
    if plan is not None:
        # axis-separable gantry (signed scaled permutation): exact 3-pass
        # trilinear resample — bandwidth-bound instead of gather-bound
        perm, make_coords, scales = plan
        c0, c1, c2 = make_coords()
        _, _, step_len = ray_start_inc(t, ray_dims)
        if on_tpu():
            # fused tail: pass 3 + LUTs + cumsums + entry reductions in one
            # Pallas sweep (HBM: read B once, write density/cumul once).
            # taps2 enables the analytic TPU-native VJP (tent transpose),
            # so d-dose/d-CT stays at kernel speed (pallas_trace._ftt_bwd)
            taps = taps_from_scales(scales)
            B = separable_pass12(jnp.transpose(ct_vol, perm), c0, c1)
            density, cumul_sp, first_inside, first_outside = fused_trace_tail(
                B, c2, step_len, density_lut, density_scale, sp_lut, sp_scale,
                entry_threshold, None if taps is None else taps[2])
            return TraceResult(
                density=density, cumul_sp=cumul_sp, first_inside=first_inside,
                first_outside=first_outside, step_len=step_len,
            )
        hu = separable_resample(jnp.transpose(ct_vol, perm), c0, c1, c2,
                                taps=taps_from_scales(scales))
    else:
        start, inc, step_len = ray_start_inc(t, ray_dims)
        obl = None
        from .pallas_gather3d import force_oblique
        if on_tpu() or force_oblique():
            obl = oblique_trace_plan(t, ray_dims, steps, ct_vol.shape)
        if obl is not None:
            # general-angle fast path: band-walk Pallas gather over the
            # oblique fan lattice (tex3D along any direction,
            # kernel_wrapper.cu:151-184) — see ops/pallas_gather3d.py
            from .pallas_gather3d import (
                oblique_gather, pack_lattice_coords_jnp, unpack_lattice_rows,
            )
            plan3, info, axes = obl
            # the tiny traced zero keeps the (S,Y,X,3) lattice a runtime
            # computation instead of a 100 MB compile-time constant
            tz = ct_vol.ravel()[0] * 0
            kk = jnp.arange(steps, dtype=start.dtype) + tz
            pos = start[None] + kk[:, None, None, None] * inc[None]
            pos = pos[..., ::-1]                    # channels -> (z, y, x)
            pos = jnp.transpose(pos, axes + (3,))
            cc0, cc1, cc2 = pack_lattice_coords_jnp(pos, info, plan3.perm)
            rows = oblique_gather(jnp.transpose(ct_vol, plan3.perm),
                                  cc0, cc1, cc2, plan3)
            hu = jnp.transpose(unpack_lattice_rows(rows, info),
                               tuple(np.argsort(axes)))
        else:
            kk = jnp.arange(steps, dtype=start.dtype)
            # (S, Y, X, 3) sample positions at voxel centres
            pos = start[None] + kk[:, None, None, None] * inc[None]
            hu = trilinear_border(ct_vol, pos)                  # (S, Y, X)
    density = lut1d_fast(density_lut, hu * density_scale)
    sp = lut1d_fast(sp_lut, hu * sp_scale)
    cumul_sp = jnp.cumsum(sp * step_len[None], axis=0)
    cumul_hu = jnp.cumsum(hu, axis=0)

    thr = jnp.asarray(entry_threshold, hu.dtype)
    # cumul_hu is nondecreasing (HU+1000 >= 0): count of prefix steps below thr
    first_inside = jnp.sum(cumul_hu < thr, axis=0).astype(jnp.int32)
    inside = hu > thr
    any_inside = jnp.any(inside, axis=0)
    last_inside = (steps - 1) - jnp.argmax(inside[::-1], axis=0)
    first_outside = jnp.where(any_inside, last_inside + 1, 0).astype(jnp.int32)

    return TraceResult(
        density=density,
        cumul_sp=cumul_sp,
        first_inside=first_inside,
        first_outside=first_outside,
        step_len=step_len,
    )


def np_ray_start_inc(t: FanFromIdxTransform, ray_dims: Tuple[int, int]):
    """Numpy float32 mirror of ray_start_inc — host planning must stay
    numpy-pure: under cross-platform lowering (jax.export for "tpu" from a
    CPU host) eager jnp ops become tracers, and the gather planner needs
    concrete coordinates."""
    nx, ny = ray_dims
    f32 = np.float32
    delta = np.asarray(t.fan_idx_to_fan.delta, f32)
    corner = np.asarray(t.fan_idx_to_fan.offset, f32)
    dist = np.asarray(t.source_dist, f32)
    m = np.asarray(t.gantry_to_im_idx.m, f32)
    v = np.asarray(t.gantry_to_im_idx.v, f32)
    col0, col1, col2 = m[:, 0], m[:, 1], m[:, 2]
    rdx = f32(0.0) if np.isinf(dist[0]) else f32(1.0) / dist[0]
    rdy = f32(0.0) if np.isinf(dist[1]) else f32(1.0) / dist[1]
    coef_i = col0 * delta[0]
    coef_j = col1 * delta[1]
    coef_offset = col2 - col0 * corner[0] * rdx - col1 * corner[1] * rdy
    transl = (v + col2 * corner[2]
              + col0 * corner[0] * (f32(1.0) - corner[2] * rdx)
              + col1 * corner[1] * (f32(1.0) - corner[2] * rdy))
    ii = np.arange(nx, dtype=f32)
    jj = np.arange(ny, dtype=f32)
    i_grid = ii[None, :, None]
    j_grid = jj[:, None, None]
    start = (i_grid * (coef_i * (f32(1.0) - corner[2] * rdx))
             + j_grid * (coef_j * (f32(1.0) - corner[2] * rdy)) + transl)
    inc = (coef_offset - i_grid * (coef_i * rdx)
           - j_grid * (coef_j * rdy)) * delta[2]
    dxs = (corner[0] + ii * delta[0]) * rdx
    dys = (corner[1] + jj * delta[1]) * rdy
    step_len = np.abs(delta[2]) * np.sqrt(
        f32(1.0) + dxs[None, :] ** 2 + dys[:, None] ** 2)
    return start, inc, step_len


def oblique_trace_plan(t: FanFromIdxTransform, ray_dims: Tuple[int, int],
                       steps: int, vol_shape):
    """Host plan for the general-angle K1 gather: build the (S, Y, X, 3)
    sample lattice in float32 numpy (the same closed forms the traced path
    evaluates) and measure the gather windows on it. Returns
    (ObliquePlan, pack info, swapped) or None (fall back to the XLA
    gather)."""
    from .pallas_gather3d import plan_lattice_best

    start, inc, _ = np_ray_start_inc(t, ray_dims)
    kk = np.arange(steps, dtype=np.float32)
    pos = start[None] + kk[:, None, None, None] * inc[None]
    return plan_lattice_best(pos[..., ::-1], tuple(vol_shape))


# ---------------------------------------------------------------------------
# Golden model: literal transcription of the reference's sequential per-ray
# loop in numpy, used only by tests to validate the parallel restructure.
# ---------------------------------------------------------------------------

def trace_golden_numpy(ct_vol, t, ray_dims, steps, density_lut, density_scale,
                       sp_lut, sp_scale, entry_threshold=150.0):
    import numpy as np

    def tex3d(vol, x, y, z):
        zd, yd, xd = vol.shape
        x0, y0, z0 = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
        fx, fy, fz = x - x0, y - y0, z - z0
        acc = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
                    if 0 <= xi < xd and 0 <= yi < yd and 0 <= zi < zd:
                        w = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                             * (fz if dz else 1 - fz))
                        acc += w * vol[zi, yi, xi]
        return acc

    def tex1d(tab, c):
        c = min(max(c, 0.0), len(tab) - 1.0)
        i = min(int(np.floor(c)), len(tab) - 2)
        f = c - i
        return tab[i] * (1 - f) + tab[i + 1] * f

    start, inc, step_len = (np.asarray(a) for a in ray_start_inc(t, ray_dims))
    nx, ny = ray_dims
    density = np.zeros((steps, ny, nx), np.float32)
    cumul = np.zeros((steps, ny, nx), np.float32)
    first_in = np.zeros((ny, nx), np.int32)
    first_out = np.zeros((ny, nx), np.int32)
    for j in range(ny):
        for i in range(nx):
            p = start[j, i].copy()
            s = inc[j, i]
            c_sp = 0.0
            c_hu = 0.0
            before_first_inside = -1
            last_inside = -1
            for k in range(steps):
                hu = tex3d(ct_vol, p[0], p[1], p[2])
                c_hu += hu
                density[k, j, i] = tex1d(density_lut, hu * density_scale)
                c_sp += step_len[j, i] * tex1d(sp_lut, hu * sp_scale)
                if c_hu < entry_threshold:
                    before_first_inside = k
                if hu > entry_threshold:
                    last_inside = k
                cumul[k, j, i] = c_sp
                p = p + s
            first_in[j, i] = before_first_inside + 1
            first_out[j, i] = last_inside + 1
    return density, cumul, first_in, first_out, step_len
