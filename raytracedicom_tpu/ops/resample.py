"""Separable 3-pass trilinear resampling for fan-lattice geometries.

The two hot trilinear gathers in the pipeline — K1's CT sampling along the
diverging rays (fillBevDensityAndSp, kernel_wrapper.cu:151-184) and K6's
BEV-dose sampling per dose voxel (primTransfDiv, kernel_wrapper.cu:76-96) —
are arbitrary 3D gathers in the reference because CUDA texture units make
them cheap. XLA lowers them to scalar fetches (~1 s per beam each on v5e).

TPU-native restructure: both gathers sample a volume on a *fan lattice*: the
sample coordinate along each volume axis depends on at most ONE lateral
output axis plus the shared depth axis, whenever the gantry/couch rotation
matrix is a signed scaled permutation (all the reference benchmark
geometries: watercube G000 and any 90-degree multiple; see dose_bbox callers).
Trilinear interpolation then factorises EXACTLY into three 1D linear
interpolation passes:

  pass 1 (volume axis p0):  A[s, :, :] = lerp_axis0(vol, c0[s])
  pass 2 (volume axis p1):  B[s, j, :] = lerp_axis1(A,  c1[s, j])
  pass 3 (volume axis p2):  C[s, j, i] = lerp_axis2(B,  c2[s, i])

with border-zero masks per pass (products of per-axis masks == the 8-corner
border test of trilinear_border). Passes 1-2 are contiguous-slice gathers
XLA handles at bandwidth; pass 3 is a per-row lane gather implemented as a
Pallas kernel (Mosaic's tpu.dynamic_gather works within 128 lanes, so rows
are processed in 128-wide groups with select-merge, like pallas_lut).

Non-separable rotations fall back to the general gather (interp.trilinear_border).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry.transforms import FanFromIdxTransform, FanToIdxTransform

Array = jnp.ndarray

LANES = 128
_ROW_BLOCK = 256


# ---------------------------------------------------------------------------
# Pass 3: per-row gather + lerp (Pallas lane-gather kernel)
# ---------------------------------------------------------------------------

def _row_lerp_kernel(rows_ref, coord_ref, out_ref, *, c_in: int, groups: int,
                     tiles: int):
    rows = rows_ref[:]                                # (BR, c_in)
    for t in range(tiles):
        c_raw = coord_ref[:, t * LANES:(t + 1) * LANES]   # (BR, 128)
        i0 = jnp.floor(c_raw).astype(jnp.int32)
        f = c_raw - i0.astype(c_raw.dtype)
        in0 = (i0 >= 0) & (i0 <= c_in - 1)
        in1 = (i0 >= -1) & (i0 <= c_in - 2)
        i0c = jnp.clip(i0, 0, c_in - 1)
        i1c = jnp.clip(i0 + 1, 0, c_in - 1)
        hi0, lo0 = i0c // LANES, i0c % LANES
        hi1, lo1 = i1c // LANES, i1c % LANES
        v0 = jnp.zeros(c_raw.shape, c_raw.dtype)
        v1 = jnp.zeros(c_raw.shape, c_raw.dtype)
        for g in range(groups):
            grp = rows[:, g * LANES:(g + 1) * LANES]
            v0 = jnp.where(hi0 == g, jnp.take_along_axis(grp, lo0, axis=1), v0)
            v1 = jnp.where(hi1 == g, jnp.take_along_axis(grp, lo1, axis=1), v1)
        v0 = jnp.where(in0, v0, 0.0)
        v1 = jnp.where(in1, v1, 0.0)
        out_ref[:, t * LANES:(t + 1) * LANES] = v0 + (v1 - v0) * f


def _row_lerp_pallas(rows: Array, coords: Array) -> Array:
    """rows (R, C); coords (R, I): out[r, i] = border-zero lerp of rows[r]
    at coords[r, i]."""
    R, C = rows.shape
    _, I = coords.shape
    c_pad = -(-C // LANES) * LANES
    i_pad = -(-I // LANES) * LANES
    r_pad = -(-R // _ROW_BLOCK) * _ROW_BLOCK
    rows_p = jnp.pad(rows, ((0, r_pad - R), (0, c_pad - C)))
    coords_p = jnp.pad(coords, ((0, r_pad - R), (0, i_pad - I)),
                       constant_values=-2.0)
    kern = functools.partial(_row_lerp_kernel, c_in=C,
                             groups=c_pad // LANES, tiles=i_pad // LANES)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r_pad, i_pad), rows.dtype),
        grid=(r_pad // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, c_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_BLOCK, i_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, i_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(rows_p, coords_p)
    return out[:R, :I]


def _row_lerp_jnp(rows: Array, coords: Array) -> Array:
    C = rows.shape[1]
    i0 = jnp.floor(coords).astype(jnp.int32)
    f = coords - i0.astype(coords.dtype)
    in0 = (i0 >= 0) & (i0 <= C - 1)
    in1 = (i0 >= -1) & (i0 <= C - 2)
    v0 = jnp.take_along_axis(rows, jnp.clip(i0, 0, C - 1), axis=1)
    v1 = jnp.take_along_axis(rows, jnp.clip(i0 + 1, 0, C - 1), axis=1)
    v0 = jnp.where(in0, v0, 0.0)
    v1 = jnp.where(in1, v1, 0.0)
    return v0 + (v1 - v0) * f


@jax.custom_vjp
def row_lerp(rows: Array, coords: Array) -> Array:
    from .pallas_lut import on_tpu
    if on_tpu():
        return _row_lerp_pallas(rows, coords)
    return _row_lerp_jnp(rows, coords)


def _row_lerp_fwd(rows, coords):
    return row_lerp(rows, coords), (rows.shape[1], coords)


def _row_lerp_bwd(res, g):
    c_in, coords = res
    i0 = jnp.floor(coords).astype(jnp.int32)
    f = coords - i0.astype(coords.dtype)
    in0 = (i0 >= 0) & (i0 <= c_in - 1)
    in1 = (i0 >= -1) & (i0 <= c_in - 2)
    drows = jnp.zeros((coords.shape[0], c_in), g.dtype)
    drows = drows.at[
        jnp.arange(coords.shape[0])[:, None], jnp.clip(i0, 0, c_in - 1)
    ].add(jnp.where(in0, g * (1.0 - f), 0.0))
    drows = drows.at[
        jnp.arange(coords.shape[0])[:, None], jnp.clip(i0 + 1, 0, c_in - 1)
    ].add(jnp.where(in1, g * f, 0.0))
    return drows, None


row_lerp.defvjp(_row_lerp_fwd, _row_lerp_bwd)


# ---------------------------------------------------------------------------
# The separable 3-pass resample
# ---------------------------------------------------------------------------

def separable_resample(vol: Array, c0: Array, c1: Array, c2: Array,
                       taps: Optional[Tuple[int, int, int]] = None) -> Array:
    """Sample ``vol`` (D0, D1, D2) with border-zero trilinear interpolation at
    the separable lattice (c0[s], c1[s, j], c2[s, i]); returns (S, J, I).

    ``taps``: static per-axis tap counts for the tent-transpose backward
    (from ``tent_taps`` on the plan's static scales). When given, the
    coordinates MUST be affine along their lattice axis (true for every fan
    plan) and the VJP runs as banded gathers — the exact transpose of the
    three linear passes — instead of XLA scatter-adds (measured 217 -> ~35 ms
    for the watercube K6 adjoint). Coordinate cotangents are defined as zero
    under ``taps`` (all engine coordinate inputs are geometry statics or
    integer-derived shifts)."""
    if taps is not None:
        return _separable_resample_tent(vol, c0, c1, c2, taps)
    return _separable_resample_impl(vol, c0, c1, c2)


def separable_pass12(vol: Array, c0: Array, c1: Array) -> Array:
    """Passes 1-2 of the separable resample: (D0, D1, D2) -> (S, J, D2).
    Exposed so the fused K1 trace tail (ops/pallas_trace.py) can take over
    from pass 3 onward on TPU."""
    D0, D1, D2 = vol.shape
    S = c0.shape[0]
    J = c1.shape[1]

    # pass 1: axis 0, coordinate depends on s only (contiguous slice takes)
    i0 = jnp.floor(c0).astype(jnp.int32)
    f0 = (c0 - i0.astype(c0.dtype))[:, None, None]
    m0a = ((i0 >= 0) & (i0 <= D0 - 1))[:, None, None]
    m0b = ((i0 >= -1) & (i0 <= D0 - 2))[:, None, None]
    va = jnp.where(m0a, jnp.take(vol, jnp.clip(i0, 0, D0 - 1), axis=0), 0.0)
    vb = jnp.where(m0b, jnp.take(vol, jnp.clip(i0 + 1, 0, D0 - 1), axis=0), 0.0)
    A = va + (vb - va) * f0                                   # (S, D1, D2)

    # pass 2: axis 1, coordinate (s, j) (contiguous row takes)
    i1 = jnp.floor(c1).astype(jnp.int32)
    f1 = (c1 - i1.astype(c1.dtype))[:, :, None]
    m1a = ((i1 >= 0) & (i1 <= D1 - 1))[:, :, None]
    m1b = ((i1 >= -1) & (i1 <= D1 - 2))[:, :, None]
    ga = jnp.where(
        m1a, jnp.take_along_axis(A, jnp.clip(i1, 0, D1 - 1)[:, :, None], axis=1), 0.0
    )
    gb = jnp.where(
        m1b, jnp.take_along_axis(A, jnp.clip(i1 + 1, 0, D1 - 1)[:, :, None], axis=1), 0.0
    )
    B = ga + (gb - ga) * f1                                   # (S, J, D2)
    return B


def _separable_resample_impl(vol: Array, c0: Array, c1: Array, c2: Array) -> Array:
    D2 = vol.shape[2]
    S = c0.shape[0]
    J = c1.shape[1]
    I = c2.shape[1]
    B = separable_pass12(vol, c0, c1)
    # pass 3: axis 2, coordinate (s, i) (Pallas lane gather)
    coords = jnp.broadcast_to(c2[:, None, :], (S, J, I)).reshape(S * J, I)
    C = row_lerp(B.reshape(S * J, D2), coords)
    return C.reshape(S, J, I)


# ---------------------------------------------------------------------------
# Tent-transpose backward: the adjoint of a linear-interp resample along one
# axis is a *tent-kernel gather* with the inverse (affine) index map —
# g_in[c] = sum_i max(0, 1 - |u_i - c|) * g_out[i] over the <= 2/|slope|+1
# outputs i whose sample position u_i lands within one cell of c. No
# scatter-adds anywhere; each pass stays a banded gather at bandwidth.
# ---------------------------------------------------------------------------

def tent_taps(scale: float) -> int:
    """Static tap count covering every output within one cell of an input
    for an affine lattice with |slope| >= scale (one index of slack for the
    floating-point reconstruction of the affine map from the coords)."""
    import math
    if scale <= 1e-6:
        raise ValueError(f"resample scale {scale} too small for tent taps")
    return 2 * (int(math.ceil(1.0 / scale)) + 1) + 1


def _affine_of_rows(coords: Array, n: int):
    """Per-row affine (a, b) reconstructed from affine-by-construction
    coords (R, n); a := 1 for degenerate n == 1 (window logic still covers
    the single input)."""
    if n > 1:
        a = (coords[:, n - 1:n] - coords[:, 0:1]) / (n - 1)
    else:
        a = jnp.ones_like(coords[:, 0:1])
    return a, coords[:, 0:1]


def _row_tent_kernel(g_ref, coord_ref, out_ref, *, n_in: int, n_out: int,
                     groups_in: int, tiles_out: int, taps: int):
    g_all = g_ref[:]                                   # (BR, I_pad)
    u_all = coord_ref[:]
    a, b = _affine_of_rows(u_all, n_in)
    inv_a = 1.0 / a
    for t in range(tiles_out):
        c = (jax.lax.broadcasted_iota(jnp.int32, (g_all.shape[0], LANES), 1)
             + t * LANES).astype(g_all.dtype)
        base = jnp.floor((c - b) * inv_a).astype(jnp.int32) - taps // 2
        acc = jnp.zeros(c.shape, g_all.dtype)
        for k in range(taps):
            idx = base + k
            valid = (idx >= 0) & (idx <= n_in - 1)
            idxc = jnp.clip(idx, 0, n_in - 1)
            hi, lo = idxc // LANES, idxc % LANES
            uv = jnp.zeros(c.shape, g_all.dtype)
            gv = jnp.zeros(c.shape, g_all.dtype)
            for gi in range(groups_in):
                m = hi == gi
                ug = u_all[:, gi * LANES:(gi + 1) * LANES]
                gg = g_all[:, gi * LANES:(gi + 1) * LANES]
                uv = jnp.where(m, jnp.take_along_axis(ug, lo, axis=1), uv)
                gv = jnp.where(m, jnp.take_along_axis(gg, lo, axis=1), gv)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(uv - c))
            acc = acc + jnp.where(valid, w * gv, 0.0)
        out_ref[:, t * LANES:(t + 1) * LANES] = acc


def _row_tent_pallas(g: Array, coords: Array, n_out: int, taps: int) -> Array:
    """Transpose of ``row_lerp``: g (R, I) cotangents of outputs that read
    ``coords`` (R, I, affine per row), returns (R, n_out) input cotangents."""
    R, I = g.shape
    i_pad = -(-I // LANES) * LANES
    c_pad = -(-n_out // LANES) * LANES
    r_pad = -(-R // _ROW_BLOCK) * _ROW_BLOCK
    g_p = jnp.pad(g, ((0, r_pad - R), (0, i_pad - I)))
    coords_p = jnp.pad(coords, ((0, r_pad - R), (0, i_pad - I)))
    kern = functools.partial(_row_tent_kernel, n_in=I, n_out=n_out,
                             groups_in=i_pad // LANES,
                             tiles_out=c_pad // LANES, taps=taps)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((r_pad, c_pad), g.dtype),
        grid=(r_pad // _ROW_BLOCK,),
        in_specs=[
            pl.BlockSpec((_ROW_BLOCK, i_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_BLOCK, i_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROW_BLOCK, c_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(g_p, coords_p)
    return out[:R, :n_out]


def _row_tent_jnp(g: Array, coords: Array, n_out: int, taps: int) -> Array:
    R, I = g.shape
    a, b = _affine_of_rows(coords, I)
    c = jnp.arange(n_out, dtype=g.dtype)[None, :]
    base = jnp.floor((c - b) / a).astype(jnp.int32) - taps // 2
    out = jnp.zeros((R, n_out), g.dtype)
    for k in range(taps):
        idx = base + k
        valid = (idx >= 0) & (idx <= I - 1)
        idxc = jnp.clip(idx, 0, I - 1)
        u = jnp.take_along_axis(coords, idxc, axis=1)
        gv = jnp.take_along_axis(g, idxc, axis=1)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(u - c))
        out = out + jnp.where(valid, w * gv, 0.0)
    return out


def row_tent(g: Array, coords: Array, n_out: int, taps: int) -> Array:
    from .pallas_lut import on_tpu
    if on_tpu():
        return _row_tent_pallas(g, coords, n_out, taps)
    return _row_tent_jnp(g, coords, n_out, taps)


def _separable_transpose(g: Array, c0: Array, c1: Array, c2: Array,
                         vol_shape, taps) -> Array:
    """Exact transpose of the 3-pass resample, applied in reverse order."""
    D0, D1, D2 = vol_shape
    S, J, I = g.shape
    t0, t1, t2 = taps

    # pass 3 transpose (lane axis, Pallas on TPU)
    coords2 = jnp.broadcast_to(c2[:, None, :], (S, J, I)).reshape(S * J, I)
    gB = row_tent(g.reshape(S * J, I), coords2, D2, t2).reshape(S, J, D2)

    # pass 2 transpose along axis 1 (contiguous row gathers)
    if J > 1:
        a1 = (c1[:, J - 1:J] - c1[:, 0:1]) / (J - 1)
    else:
        a1 = jnp.ones_like(c1[:, 0:1])
    b1 = c1[:, 0:1]
    q = jnp.arange(D1, dtype=g.dtype)[None, :]
    base = jnp.floor((q - b1) / a1).astype(jnp.int32) - t1 // 2   # (S, D1)
    gA = jnp.zeros((S, D1, D2), g.dtype)
    for k in range(t1):
        idx = base + k
        valid = (idx >= 0) & (idx <= J - 1)
        idxc = jnp.clip(idx, 0, J - 1)
        u = jnp.take_along_axis(c1, idxc, axis=1)                 # (S, D1)
        w = jnp.where(valid, jnp.maximum(0.0, 1.0 - jnp.abs(u - q)), 0.0)
        gv = jnp.take_along_axis(gB, idxc[:, :, None], axis=1)    # (S, D1, D2)
        gA = gA + w[:, :, None] * gv

    # pass 1 transpose along axis 0 (whole-slice takes)
    if S > 1:
        a0 = (c0[S - 1] - c0[0]) / (S - 1)
    else:
        a0 = jnp.ones_like(c0[0])
    d = jnp.arange(D0, dtype=g.dtype)
    base = jnp.floor((d - c0[0]) / a0).astype(jnp.int32) - t0 // 2  # (D0,)
    gvol = jnp.zeros((D0, D1, D2), g.dtype)
    for k in range(t0):
        idx = base + k
        valid = (idx >= 0) & (idx <= S - 1)
        idxc = jnp.clip(idx, 0, S - 1)
        u = c0[idxc]
        w = jnp.where(valid, jnp.maximum(0.0, 1.0 - jnp.abs(u - d)), 0.0)
        gvol = gvol + w[:, None, None] * gA[idxc]
    return gvol


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _separable_resample_tent(vol, c0, c1, c2, taps):
    return _separable_resample_impl(vol, c0, c1, c2)


def _srt_fwd(vol, c0, c1, c2, taps):
    out = _separable_resample_impl(vol, c0, c1, c2)
    return out, (vol.shape, c0, c1, c2)


def _srt_bwd(taps, res, g):
    vol_shape, c0, c1, c2 = res
    gvol = _separable_transpose(g, c0, c1, c2, vol_shape, taps)
    return gvol, jnp.zeros_like(c0), jnp.zeros_like(c1), jnp.zeros_like(c2)


_separable_resample_tent.defvjp(_srt_fwd, _srt_bwd)


# ---------------------------------------------------------------------------
# Separability detection + coordinate construction (host-side, static)
# ---------------------------------------------------------------------------

def _axis_assignment(m: np.ndarray) -> Optional[Tuple[int, int, int]]:
    """Given the 3x3 mixing matrix (rows = output coords x,y,z; effective
    column dependence on (i, j)), find coordinate axes (d, u, v) such that
    axis d has no i/j dependence, u has no j, v has no i. Returns indices
    into the (x, y, z) coordinate order, or None."""
    dep_i = np.abs(m[:, 0]) > 1e-12
    dep_j = np.abs(m[:, 1]) > 1e-12
    d = u = v = None
    for c in range(3):
        if not dep_i[c] and not dep_j[c] and d is None:
            d = c
        elif not dep_j[c] and u is None:
            u = c
        elif not dep_i[c] and v is None:
            v = c
    if d is None or u is None or v is None:
        return None
    return d, u, v


def _minabs_over_ends(v0: float, v1: float) -> float:
    """min |slope| over an affine range, 0 when the sign flips inside it."""
    if v0 * v1 <= 0.0:
        return 0.0
    return float(min(abs(v0), abs(v1)))


def taps_from_scales(scales) -> Optional[Tuple[int, int, int]]:
    """Static tent-transpose tap counts, or None when any axis scale is too
    small to bound the band (falls back to the scatter-add VJP)."""
    if scales is None or min(scales) < 0.05:
        return None
    return tuple(tent_taps(s) for s in scales)


def fan_from_idx_plan(t: FanFromIdxTransform, ray_dims: Tuple[int, int],
                      steps: int):
    """Static plan for K1: trace-lattice resample of the image volume.

    Returns (perm, make_coords, scales) where ``perm`` transposes the
    (Z, Y, X) volume so its axes are (d, v, u), ``make_coords()`` builds
    (c0 (S,), c1 (S, J), c2 (S, I)) in the permuted axis order, and
    ``scales`` are host floats bounding the per-axis |d coord / d index|
    from below (for ``taps_from_scales``) — or None if the geometry is not
    separable (general rotation)."""
    m = np.asarray(t.gantry_to_im_idx.m, np.float64)
    delta = np.asarray(t.fan_idx_to_fan.delta, np.float64)
    # effective dependence: coordinate c depends on i iff m[c,0]*dx != 0
    eff = m * delta[None, :]
    assign = _axis_assignment(eff)
    if assign is None:
        return None
    d, u, v = assign
    nx, ny = ray_dims

    def make_coords():
        mm = jnp.asarray(t.gantry_to_im_idx.m)
        vv = jnp.asarray(t.gantry_to_im_idx.v)
        dl = jnp.asarray(t.fan_idx_to_fan.delta)
        off = jnp.asarray(t.fan_idx_to_fan.offset)
        sd = np.asarray(t.source_dist, np.float64)
        kk = jnp.arange(steps, dtype=jnp.float32)
        ii = jnp.arange(nx, dtype=jnp.float32)
        jj = jnp.arange(ny, dtype=jnp.float32)
        gz = off[2] + kk * dl[2]                                     # (S,)
        one = jnp.ones_like(gz)
        sx = one if np.isinf(sd[0]) else 1.0 - gz / jnp.float32(sd[0])
        sy = one if np.isinf(sd[1]) else 1.0 - gz / jnp.float32(sd[1])
        gx_full = (off[0] + ii[None, :] * dl[0]) * sx[:, None]       # (S, I)
        gy_full = (off[1] + jj[None, :] * dl[1]) * sy[:, None]       # (S, J)
        gx_const = off[0] * sx                                       # (S,)
        gy_const = off[1] * sy

        # per assigned axis, the lateral gantry term either varies with its
        # own lateral index or reduces to the constant (S,) profile — the
        # assignment guarantees no coordinate mixes both lateral axes
        c0 = mm[d, 0] * gx_const + mm[d, 1] * gy_const + mm[d, 2] * gz + vv[d]
        c1 = (mm[v, 1] * gy_full
              + (mm[v, 0] * gx_const + mm[v, 2] * gz + vv[v])[:, None])
        c2 = (mm[u, 0] * gx_full
              + (mm[u, 1] * gy_const + mm[u, 2] * gz + vv[u])[:, None])
        return c0, c1, c2

    # static per-axis slope bounds for the tent-transpose backward
    mn = np.asarray(t.gantry_to_im_idx.m, np.float64)
    dln = np.asarray(t.fan_idx_to_fan.delta, np.float64)
    offn = np.asarray(t.fan_idx_to_fan.offset, np.float64)
    sdn = np.asarray(t.source_dist, np.float64)
    rsd = np.where(np.isinf(sdn), 0.0, 1.0 / sdn)
    # d sx/ds = -dl_z/sd_x (sx affine in s), likewise sy
    s0 = abs(mn[d, 0] * offn[0] * (-dln[2] * rsd[0])
             + mn[d, 1] * offn[1] * (-dln[2] * rsd[1]) + mn[d, 2] * dln[2])
    gz_ends = offn[2] + np.array([0.0, steps - 1.0]) * dln[2]
    sx_ends = 1.0 - gz_ends * rsd[0]
    sy_ends = 1.0 - gz_ends * rsd[1]
    s1 = _minabs_over_ends(*(mn[v, 1] * dln[1] * sy_ends))
    s2 = _minabs_over_ends(*(mn[u, 0] * dln[0] * sx_ends))
    scales = (float(s0), s1, s2)

    # volume (Z, Y, X): coordinate axis c corresponds to volume axis 2 - c
    perm = (2 - d, 2 - v, 2 - u)
    return perm, make_coords, scales


def fan_to_idx_plan(t: FanToIdxTransform, bbox_min, bbox_max):
    """Static plan for K6: dose-grid -> BEV-fan resample of the BEV volume.

    Output lattice is the dose bbox in (z, y, x) order: S = nz, J = ny,
    I = nx. The BEV volume is already (k, j, i)-ordered, so perm is fixed
    (0, 1, 2) with c0 = fan_k(z), c1 = fan_j(y, z), c2 = fan_i(x, z).
    Returns (perm, make_coords, scales) like ``fan_from_idx_plan``."""
    b = np.asarray(t.im_idx_to_gantry.m, np.float64)
    # gantry z must depend only on dose z; gantry x only on (x, z); y on (y, z)
    if (abs(b[2, 0]) > 1e-12 or abs(b[2, 1]) > 1e-12
            or abs(b[0, 1]) > 1e-12 or abs(b[1, 0]) > 1e-12):
        return None
    (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max

    def make_coords():
        mm = jnp.asarray(t.im_idx_to_gantry.m)
        vv = jnp.asarray(t.im_idx_to_gantry.v)
        dl = jnp.asarray(t.fan_to_fan_idx.delta)
        off = jnp.asarray(t.fan_to_fan_idx.offset)
        sd = np.asarray(t.source_dist, np.float64)
        xs = jnp.arange(x0, x1 + 1, dtype=jnp.float32)
        ys = jnp.arange(y0, y1 + 1, dtype=jnp.float32)
        zs = jnp.arange(z0, z1 + 1, dtype=jnp.float32)
        gz = mm[2, 2] * zs + vv[2]                                   # (S,)
        c0 = gz * dl[2] + off[2]
        gx = mm[0, 0] * xs[None, :] + mm[0, 2] * zs[:, None] + vv[0]  # (S, I)
        gy = mm[1, 1] * ys[None, :] + mm[1, 2] * zs[:, None] + vv[1]  # (S, J)
        if not np.isinf(sd[0]):
            gx = gx / (1.0 - gz / jnp.float32(sd[0]))[:, None]
        if not np.isinf(sd[1]):
            gy = gy / (1.0 - gz / jnp.float32(sd[1]))[:, None]
        c1 = gy * dl[1] + off[1]
        c2 = gx * dl[0] + off[0]
        return c0, c1, c2

    bn = np.asarray(t.im_idx_to_gantry.m, np.float64)
    vn = np.asarray(t.im_idx_to_gantry.v, np.float64)
    dln = np.asarray(t.fan_to_fan_idx.delta, np.float64)
    sdn = np.asarray(t.source_dist, np.float64)
    gz_ends = bn[2, 2] * np.array([float(z0), float(z1)]) + vn[2]
    den_x = np.ones(2) if np.isinf(sdn[0]) else 1.0 - gz_ends / sdn[0]
    den_y = np.ones(2) if np.isinf(sdn[1]) else 1.0 - gz_ends / sdn[1]
    s0 = abs(bn[2, 2] * dln[2])
    if den_y[0] * den_y[1] <= 0.0 or den_x[0] * den_x[1] <= 0.0:
        s1 = s2 = 0.0
    else:
        s1 = abs(bn[1, 1] * dln[1]) / float(np.max(np.abs(den_y)))
        s2 = abs(bn[0, 0] * dln[0]) / float(np.max(np.abs(den_x)))
    scales = (float(s0), float(s1), float(s2))

    return (0, 1, 2), make_coords, scales
