"""Texture-equivalent interpolated lookups.

The reference routes all interpolated reads through CUDA texture objects
(kernel_wrapper.cu:418-589): 1D/2D LUTs with linear filtering + clamp
addressing, and 3D volumes with linear filtering + border(0) addressing.
CUDA unnormalized texture fetch at coordinate ``u`` samples
``lerp(T[floor(u-0.5)], T[floor(u-0.5)+1], frac(u-0.5))``; every call site in
the reference adds ``+HALF`` to its coordinate, which exactly cancels the
``-0.5`` texel-center shift. These functions therefore take the *raw*
(pre-``+HALF``) coordinate and do plain linear interpolation, reproducing the
reference's sampling semantics (up to the 8-bit fraction the GPU filtering
hardware uses — we interpolate at full fp32 precision).

All functions are pure jnp, differentiable, and batched over arbitrary
coordinate shapes.
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def lut1d(table: Array, coord: Array) -> Array:
    """1D linear interp with clamp addressing (densityTex/stoppingPowerTex/
    rRadiationLengthTex semantics; kernel_wrapper.cu:476-537)."""
    n = table.shape[-1]
    c = jnp.clip(coord, 0.0, n - 1.0)
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    t0 = table[..., i0]
    t1 = table[..., i0 + 1]
    return t0 + (t1 - t0) * f


def lut2d(table: Array, x: Array, y: Array) -> Array:
    """2D linear interp with clamp addressing on both axes.

    ``table`` is (rows, cols) indexed [y, x] to match the cumulIddTex layout
    (nEnergies rows x nEnergySamples cols; kernel_wrapper.cu:453-474, fetched
    as tex2D(cumulIddTex, wepl*scale+HALF, energyIdx+HALF)).
    """
    rows, cols = table.shape[-2:]
    cx = jnp.clip(x, 0.0, cols - 1.0)
    cy = jnp.clip(y, 0.0, rows - 1.0)
    ix = jnp.clip(jnp.floor(cx).astype(jnp.int32), 0, cols - 2)
    iy = jnp.clip(jnp.floor(cy).astype(jnp.int32), 0, rows - 2)
    fx = cx - ix.astype(cx.dtype)
    fy = cy - iy.astype(cy.dtype)
    t00 = table[iy, ix]
    t01 = table[iy, ix + 1]
    t10 = table[iy + 1, ix]
    t11 = table[iy + 1, ix + 1]
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def trilinear_border(vol: Array, pos: Array) -> Array:
    """3D linear interp with border(0) addressing (imVolTex / bevPrimDoseTex
    semantics; kernel_wrapper.cu:429-451, 1115-1137).

    ``vol`` is (Z, Y, X) indexed [z, y, x]; ``pos`` is (..., 3) ordered
    (x, y, z) like the reference's tex3D(tex, pos.x, pos.y, pos.z) call with
    the ``+HALF`` voxel-center offset already cancelled (pass raw index-space
    coordinates). Samples outside the volume contribute exactly zero.
    """
    zdim, ydim, xdim = vol.shape[-3:]
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx = x - x0.astype(x.dtype)
    fy = y - y0.astype(y.dtype)
    fz = z - z0.astype(z.dtype)

    def corner(dz, dy, dx):
        xi, yi, zi = x0 + dx, y0 + dy, z0 + dz
        inside = (
            (xi >= 0) & (xi < xdim) & (yi >= 0) & (yi < ydim) & (zi >= 0) & (zi < zdim)
        )
        xi_c = jnp.clip(xi, 0, xdim - 1)
        yi_c = jnp.clip(yi, 0, ydim - 1)
        zi_c = jnp.clip(zi, 0, zdim - 1)
        val = vol[zi_c, yi_c, xi_c]
        return jnp.where(inside, val, 0.0)

    wx0, wx1 = 1.0 - fx, fx
    wy0, wy1 = 1.0 - fy, fy
    wz0, wz1 = 1.0 - fz, fz

    return (
        wz0 * (wy0 * (wx0 * corner(0, 0, 0) + wx1 * corner(0, 0, 1))
               + wy1 * (wx0 * corner(0, 1, 0) + wx1 * corner(0, 1, 1)))
        + wz1 * (wy0 * (wx0 * corner(1, 0, 0) + wx1 * corner(1, 0, 1))
                 + wy1 * (wx0 * corner(1, 1, 0) + wx1 * corner(1, 1, 1)))
    )


def interp_decimal_index(ordered: Array, value: Array) -> Array:
    """Fractional index of ``value`` in ascending ``ordered`` (reference:
    findDecimalOrdered, vector_find.h:119-144). Clamps to [0, n-1];
    differentiable w.r.t. ``value``."""
    n = ordered.shape[-1]
    idx = jnp.searchsorted(ordered, value, side="right") - 1
    idx = jnp.clip(idx, 0, n - 2)
    denom = ordered[idx + 1] - ordered[idx]
    frac = (value - ordered[idx]) / denom
    out = idx.astype(value.dtype) + frac
    return jnp.clip(out, 0.0, n - 1.0)


def interp_at_index(table: Array, idx: Array) -> Array:
    """Linear interpolation of ``table`` at fractional index (reference:
    vectorInterpolate, vector_interpolate.h:19-30)."""
    return lut1d(table, idx)
