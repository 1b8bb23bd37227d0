"""Pallas TPU kernel for 1D LUT linear interpolation (texture-fetch replacement).

The reference reads all physics tables through CUDA 1D/2D textures with
linear filtering and clamp addressing (kernel_wrapper.cu:476-537). XLA lowers
the equivalent ``table[idx]`` gathers to scalar fetches (~17 ns/element on
v5e — 141 ms for one 512x128x128 lookup), which made the fill stage the
dominant cost of the whole engine.

TPU-native design: Mosaic supports a vectorized *lane* gather
(``tpu.dynamic_gather`` along axis 1) where each element of an (R, 128)
block picks one of the 128 lanes in its row. A table of N entries is split
into G = ceil(N/128) lane-groups; the kernel loops over groups, lane-gathers
each group broadcast to the block, and select-merges by the group id of each
index. Interpolation needs table[i] and table[i+1]: a second "next" table
(shifted by one, clamped) is gathered with the same lane index so the pair
never crosses a group boundary.

Cost: ~7 vector ops per group per (8,128) vreg — for the 3072-entry tables
that's ~170 vreg-ops per element block, ~3 ms per 8.4M lookups (50x faster
than the XLA gather). Differentiable via custom_vjp: the kernel also emits
the local slope, so the backward pass is one elementwise multiply
(clamped coordinates get zero gradient, matching texture clamp semantics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

LANES = 128


def _block_rows(groups: int) -> int:
    """Rows of 128 lanes per grid step. The unrolled group loop materializes
    one broadcast table tile per group on the Mosaic stack (2 tables x G x
    block x 128 x 4B), so the block shrinks as the table grows to stay
    inside the ~12 MB scoped-VMEM budget."""
    budget = 14 * 2 ** 20   # measured stack cost is (2G+6)*512B per row
    per_row = LANES * 4 * (2 * groups + 6)   # 2G broadcasts + 3 ios x2 buffers
    rows = budget // per_row
    return int(max(128, min(1024, (rows // 128) * 128)))


def _lut_kernel(tab_main_ref, tab_next_ref, coord_ref, val_ref, slope_ref,
                *, n: int, groups: int):
    c_raw = coord_ref[:]                                  # (BR, 128)
    c = jnp.clip(c_raw, 0.0, float(n - 1))
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    hi = i0 // LANES
    lo = i0 - hi * LANES

    shape = c.shape
    acc0 = jnp.zeros(shape, c.dtype)
    acc1 = jnp.zeros(shape, c.dtype)
    for g in range(groups):
        row_m = jnp.broadcast_to(tab_main_ref[g, :], shape)
        row_n = jnp.broadcast_to(tab_next_ref[g, :], shape)
        v0 = jnp.take_along_axis(row_m, lo, axis=1)
        v1 = jnp.take_along_axis(row_n, lo, axis=1)
        m = hi == g
        acc0 = jnp.where(m, v0, acc0)
        acc1 = jnp.where(m, v1, acc1)

    d = acc1 - acc0
    val_ref[:] = acc0 + d * f
    # clamp addressing: zero slope outside the table (texture semantics)
    in_range = (c_raw >= 0.0) & (c_raw <= float(n - 1))
    slope_ref[:] = jnp.where(in_range, d, 0.0)


def _prep_tables(table: Array):
    n = table.shape[0]
    groups = -(-n // LANES)
    padded = groups * LANES
    # main[i] = table[min(i, n-1)], next[i] = table[min(i+1, n-1)]
    idx = jnp.minimum(jnp.arange(padded), n - 1)
    main = table[idx].reshape(groups, LANES)
    nxt = table[jnp.minimum(idx + 1, n - 1)].reshape(groups, LANES)
    return main, nxt, n, groups


def _lut_interp_raw(table: Array, coords: Array):
    """Returns (values, slopes), both coords-shaped."""
    main, nxt, n, groups = _prep_tables(table)
    shape = coords.shape
    flat = coords.reshape(-1)
    total = flat.shape[0]
    block = _block_rows(groups)
    rows = -(-total // LANES)
    rows_pad = -(-rows // block) * block
    flat = jnp.pad(flat, (0, rows_pad * LANES - total))
    c2 = flat.reshape(rows_pad, LANES)

    kern = functools.partial(_lut_kernel, n=n, groups=groups)
    val, slope = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((rows_pad, LANES), coords.dtype),
            jax.ShapeDtypeStruct((rows_pad, LANES), coords.dtype),
        ),
        grid=(rows_pad // block,),
        in_specs=[
            pl.BlockSpec((groups, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((groups, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )(main, nxt, c2)
    val = val.reshape(-1)[:total].reshape(shape)
    slope = slope.reshape(-1)[:total].reshape(shape)
    return val, slope


@jax.custom_vjp
def lut_interp(table: Array, coords: Array) -> Array:
    """Linear interp of ``table`` at ``coords`` with clamp addressing —
    drop-in for physics.interp.lut1d, Pallas-accelerated on TPU."""
    val, _ = _lut_interp_raw(table, coords)
    return val


def _lut_fwd(table, coords):
    val, slope = _lut_interp_raw(table, coords)
    return val, (slope, table.shape[0], coords)


def _lut_bwd(res, g):
    slope, n, coords = res
    # table cotangent: scatter-add of the interpolation weights. Spot
    # optimization keeps tables constant, so compute it only when needed
    # via the (slow) XLA scatter path.
    c = jnp.clip(coords, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    dtab = jnp.zeros((n,), g.dtype)
    dtab = dtab.at[i0.reshape(-1)].add((g * (1.0 - f)).reshape(-1))
    dtab = dtab.at[(i0 + 1).reshape(-1)].add((g * f).reshape(-1))
    return dtab, g * slope


lut_interp.defvjp(_lut_fwd, _lut_bwd)


def on_tpu() -> bool:
    """True when the default backend drives real TPU hardware (the axon
    tunnel registers as its own platform name). RTD_FORCE_TPU_KERNELS=1
    overrides to True so the genuine TPU program can be cross-lowered from
    a CPU host (tests/test_tpu_lowering.py) or run under the Pallas
    interpreter."""
    import os
    if os.environ.get("RTD_FORCE_TPU_KERNELS", "") == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


def lut1d_fast(table: Array, coords: Array) -> Array:
    """Backend dispatch: Pallas kernel on TPU, plain jnp gather elsewhere
    (Pallas interpret mode on CPU is far slower than the XLA gather)."""
    if on_tpu():
        return lut_interp(table, coords)
    from ..physics.interp import lut1d
    return lut1d(table, coords)


def _lut1d_value_and_slope(table: Array, coords: Array):
    """(value, clamp-aware slope) of the 1D linear interp, Pallas on TPU."""
    if on_tpu():
        return _lut_interp_raw(table, coords)
    n = table.shape[0]
    c = jnp.clip(coords, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    d = table[i0 + 1] - table[i0]
    val = table[i0] + d * f
    in_range = (coords >= 0.0) & (coords <= float(n - 1))
    return val, jnp.where(in_range, d, 0.0)


def _lut1d_value(table: Array, coords: Array) -> Array:
    if on_tpu():
        return _lut_interp_raw(table, coords)[0]
    from ..physics.interp import lut1d
    return lut1d(table, coords)


def _row_blend(table2d: Array, y_scalar: Array):
    rows = table2d.shape[0]
    cy = jnp.clip(y_scalar, 0.0, rows - 1.0)
    iy = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, rows - 2)
    fy = (cy - iy.astype(table2d.dtype)).astype(table2d.dtype)
    in_range = (y_scalar >= 0.0) & (y_scalar <= float(rows - 1))
    return iy, fy, in_range


def lut2d_scalar_row_fast(table2d: Array, x: Array, y_scalar: Array) -> Array:
    """2D texture fetch where the row coordinate is a (traced) scalar —
    the cumulIddTex / nuclear-table access pattern (kernel_wrapper.cu:221,
    332): the energy index is fixed per layer while the WEPL coordinate
    varies per element. Blends the two bracketing rows once (O(cols)) and
    runs the hot per-element lookup through the 1D kernel.

    Differentiable in (x, y_scalar) only; the table is a calibration
    constant, made mechanical by the stop_gradient at this boundary (a
    table cotangent would need an XLA scatter-add of every element into
    ~1k bins per call — measured ~1.5 s of the watercube energy-gradient
    pass. The y cotangent needs only sum(g * interp(row_hi - row_lo, x)):
    one extra lane-gather.)"""
    return _lut2d_xy(jax.lax.stop_gradient(table2d), x, y_scalar)


@jax.custom_vjp
def _lut2d_xy(table2d: Array, x: Array, y_scalar: Array) -> Array:
    iy, fy, _ = _row_blend(table2d, y_scalar)
    row = table2d[iy] * (1.0 - fy) + table2d[iy + 1] * fy
    return _lut1d_value(row, x)


def _lut2d_fwd(table2d, x, y_scalar):
    iy, fy, in_range_y = _row_blend(table2d, y_scalar)
    row = table2d[iy] * (1.0 - fy) + table2d[iy + 1] * fy
    val, slope = _lut1d_value_and_slope(row, x)
    diff_row = table2d[iy + 1] - table2d[iy]
    return val, (slope, diff_row, x, in_range_y, table2d)


def _lut2d_bwd(res, g):
    slope, diff_row, x, in_range_y, table2d = res
    gx = g * slope
    # d val / d fy = interp(row_hi - row_lo, x); fy' = 1 inside the clamp
    gy = jnp.sum(g * _lut1d_value(diff_row, x))
    gy = jnp.where(in_range_y, gy, 0.0).astype(jnp.result_type(gy))
    return jnp.zeros_like(table2d), gx, gy


_lut2d_xy.defvjp(_lut2d_fwd, _lut2d_bwd)
