"""Fused K1 trace tail: resample pass 3 + density/SP LUTs + depth cumsums
+ patient-entry reductions in ONE sequential Pallas sweep.

Reference: fillBevDensityAndSp (kernel_wrapper.cu:130-187) does all of this
inside one serial per-ray loop. The TPU restructure in ops/trace.py made
every stage a separate bandwidth pass over the (S, Y, X) slab: pass-3 lane
gather, two LUT sweeps, two XLA cumsums and the entry reductions — ~9 HBM
round trips of the full slab. This kernel reads the pass-2 intermediate
once and writes (density, cumul_sp) once, carrying the four running
quantities (cumulative WEPL, cumulative HU, the below-threshold count and
the last-inside step) in VMEM scratch across the sequential TPU grid:

  hu        = border-zero lerp of B rows at c2        (pass 3)
  density   = lut(density_lut, hu * density_scale)
  cumul_sp += lut(sp_lut, hu * sp_scale) * step_len
  cumul_hu += hu;  first_inside  = #steps with cumul_hu < thr
  inside    = hu > thr;  first_outside = last inside step + 1

Backward: when the caller supplies the pass-3 tent tap count (``taps2``,
from the separable plan's static scales) the VJP is an analytic TPU-native
composition — reverse depth cumsum, clamp-aware LUT slopes (the Pallas
lut_interp machinery) and the banded tent-transpose row gather
(resample.row_tent) — so d-dose/d-CT runs at kernel speed on TPU instead
of the XLA scatter adjoint (VERDICT r4 item 8). Without taps2 the jnp
mirror's VJP is used (CPU fallback / non-affine lattices). Coordinate
cotangents are zero by the library-wide contract (geometry statics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_lut import _prep_tables

Array = jnp.ndarray

LANES = 128


def _lut_tile(main_ref, next_ref, coords, n, groups):
    """Clamped linear interp of a (groups, 128) VMEM table at ``coords``."""
    c = jnp.clip(coords, 0.0, float(n - 1))
    i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, n - 2)
    f = c - i0.astype(c.dtype)
    hi = i0 // LANES
    lo = i0 - hi * LANES
    acc0 = jnp.zeros(coords.shape, coords.dtype)
    acc1 = jnp.zeros(coords.shape, coords.dtype)
    for g in range(groups):
        row_m = jnp.broadcast_to(main_ref[g, :], coords.shape)
        row_n = jnp.broadcast_to(next_ref[g, :], coords.shape)
        m = hi == g
        acc0 = jnp.where(m, jnp.take_along_axis(row_m, lo, axis=1), acc0)
        acc1 = jnp.where(m, jnp.take_along_axis(row_n, lo, axis=1), acc1)
    return acc0 + (acc1 - acc0) * f


def _tail_kernel(scales_ref, b_ref, c2_ref, sl_ref, dm_ref, dn_ref, sm_ref,
                 sn_ref, den_ref, csp_ref, fi_ref, fo_ref,
                 c_csp, c_chu, c_cnt, c_last, *,
                 cz, steps, ny, d2, ip, tiles, groups,
                 nd, gd, ns, gs, thr):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        c_csp[:] = jnp.zeros((ny, ip), jnp.float32)
        c_chu[:] = jnp.zeros((ny, ip), jnp.float32)
        c_cnt[:] = jnp.zeros((ny, ip), jnp.int32)
        c_last[:] = jnp.full((ny, ip), -1, jnp.int32)

    d_scale = scales_ref[0, 0]
    s_scale = scales_ref[0, 1]

    for s in range(cz):
        k_abs = step * cz + s
        live = k_abs < steps
        rows = b_ref[s]                                   # (ny, d2p)
        for t in range(tiles):
            tsl = pl.ds(t * LANES, LANES)
            c_raw = jnp.broadcast_to(c2_ref[pl.ds(s, 1), tsl], (ny, LANES))
            # pass-3 border-zero lerp (same math as resample._row_lerp_kernel)
            i0 = jnp.floor(c_raw).astype(jnp.int32)
            f = c_raw - i0.astype(c_raw.dtype)
            in0 = (i0 >= 0) & (i0 <= d2 - 1)
            in1 = (i0 >= -1) & (i0 <= d2 - 2)
            i0c = jnp.clip(i0, 0, d2 - 1)
            i1c = jnp.clip(i0 + 1, 0, d2 - 1)
            hi0, lo0 = i0c // LANES, i0c % LANES
            hi1, lo1 = i1c // LANES, i1c % LANES
            v0 = jnp.zeros(c_raw.shape, c_raw.dtype)
            v1 = jnp.zeros(c_raw.shape, c_raw.dtype)
            for g in range(groups):
                grp = rows[:, g * LANES:(g + 1) * LANES]
                v0 = jnp.where(hi0 == g,
                               jnp.take_along_axis(grp, lo0, axis=1), v0)
                v1 = jnp.where(hi1 == g,
                               jnp.take_along_axis(grp, lo1, axis=1), v1)
            v0 = jnp.where(in0, v0, 0.0)
            v1 = jnp.where(in1, v1, 0.0)
            hu = v0 + (v1 - v0) * f

            dens = _lut_tile(dm_ref, dn_ref, hu * d_scale, nd, gd)
            sp = _lut_tile(sm_ref, sn_ref, hu * s_scale, ns, gs)

            csp = c_csp[:, tsl] + sp * sl_ref[:, tsl]
            den_ref[s, :, tsl] = dens
            csp_ref[s, :, tsl] = csp
            chu = c_chu[:, tsl] + hu
            cnt = c_cnt[:, tsl] + jnp.where(
                live & (chu < thr), 1, 0).astype(jnp.int32)
            last = jnp.where(live & (hu > thr), k_abs, c_last[:, tsl])
            c_csp[:, tsl] = csp
            c_chu[:, tsl] = chu
            c_cnt[:, tsl] = cnt
            c_last[:, tsl] = last
            fi_ref[:, tsl] = cnt
            fo_ref[:, tsl] = last + 1


def _pick_cz(ny, d2p, ip, vmem_budget=5 * 2 ** 20):
    per_cz = (ny * d2p + 2 * ny * ip) * 4 * 2    # double-buffered blocks
    return max(1, min(8, vmem_budget // max(per_cz, 1)))


def fused_trace_tail_pallas(B: Array, c2: Array, step_len: Array,
                            density_lut: Array, density_scale: Array,
                            sp_lut: Array, sp_scale: Array,
                            thr: float):
    """B (S, J, D2) pass-2 intermediate; c2 (S, I) lane coords; step_len
    (J, I). Returns (density (S,J,I), cumul_sp (S,J,I), first_inside (J,I),
    first_outside (J,I))."""
    S, J, D2 = B.shape
    I = c2.shape[1]
    d2p = -(-D2 // LANES) * LANES
    ip = -(-I // LANES) * LANES
    cz = _pick_cz(J, d2p, ip)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    B_p = jnp.pad(B, ((0, s_pad - S), (0, 0), (0, d2p - D2)))
    c2_p = jnp.pad(c2, ((0, s_pad - S), (0, ip - I)), constant_values=-2.0)
    sl_p = jnp.pad(step_len, ((0, 0), (0, ip - I)))
    dm, dn, nd, gd = _prep_tables(density_lut)
    sm, sn, ns, gs = _prep_tables(sp_lut)
    scales = jnp.stack([density_scale.astype(jnp.float32),
                        sp_scale.astype(jnp.float32)]).reshape(1, 2)

    kern = functools.partial(
        _tail_kernel, cz=cz, steps=S, ny=J, d2=D2, ip=ip,
        tiles=ip // LANES, groups=d2p // LANES,
        nd=nd, gd=gd, ns=ns, gs=gs, thr=float(thr))
    const = lambda i: (0, 0)
    den, csp, fi, fo = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 2), const, memory_space=pltpu.SMEM),
            pl.BlockSpec((cz, J, d2p), lambda i: (i, 0, 0)),
            pl.BlockSpec((cz, ip), lambda i: (i, 0)),
            pl.BlockSpec((J, ip), const),
            pl.BlockSpec((gd, LANES), const),
            pl.BlockSpec((gd, LANES), const),
            pl.BlockSpec((gs, LANES), const),
            pl.BlockSpec((gs, LANES), const),
        ],
        out_specs=(
            pl.BlockSpec((cz, J, ip), lambda i: (i, 0, 0)),
            pl.BlockSpec((cz, J, ip), lambda i: (i, 0, 0)),
            pl.BlockSpec((J, ip), const),
            pl.BlockSpec((J, ip), const),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, J, ip), jnp.float32),
            jax.ShapeDtypeStruct((s_pad, J, ip), jnp.float32),
            jax.ShapeDtypeStruct((J, ip), jnp.int32),
            jax.ShapeDtypeStruct((J, ip), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((J, ip), jnp.float32),
            pltpu.VMEM((J, ip), jnp.float32),
            pltpu.VMEM((J, ip), jnp.int32),
            pltpu.VMEM((J, ip), jnp.int32),
        ],
    )(scales, B_p, c2_p, sl_p, dm, dn, sm, sn)
    return (den[:S, :, :I], csp[:S, :, :I], fi[:, :I], fo[:, :I])


def _tail_jnp(B, c2, step_len, density_lut, density_scale, sp_lut, sp_scale,
              thr):
    """The unfused composition — differentiation rule and CPU fallback."""
    from .resample import _row_lerp_jnp
    from ..physics.interp import lut1d
    S, J, D2 = B.shape
    I = c2.shape[1]
    coords = jnp.broadcast_to(c2[:, None, :], (S, J, I)).reshape(S * J, I)
    hu = _row_lerp_jnp(B.reshape(S * J, D2), coords).reshape(S, J, I)
    density = lut1d(density_lut, hu * density_scale)
    sp = lut1d(sp_lut, hu * sp_scale)
    cumul_sp = jnp.cumsum(sp * step_len[None], axis=0)
    cumul_hu = jnp.cumsum(hu, axis=0)
    first_inside = jnp.sum(cumul_hu < thr, axis=0).astype(jnp.int32)
    inside = hu > thr
    any_inside = jnp.any(inside, axis=0)
    last_inside = (S - 1) - jnp.argmax(inside[::-1], axis=0)
    first_outside = jnp.where(any_inside, last_inside + 1, 0).astype(jnp.int32)
    return density, cumul_sp, first_inside, first_outside


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_trace_tail(B, c2, step_len, density_lut, density_scale, sp_lut,
                     sp_scale, thr, taps2=None):
    from .pallas_lut import on_tpu
    if on_tpu():
        return fused_trace_tail_pallas(B, c2, step_len, density_lut,
                                       density_scale, sp_lut, sp_scale, thr)
    return _tail_jnp(B, c2, step_len, density_lut, density_scale, sp_lut,
                     sp_scale, thr)


def _ftt_fwd(B, c2, step_len, density_lut, density_scale, sp_lut, sp_scale,
             thr, taps2):
    out = fused_trace_tail(B, c2, step_len, density_lut, density_scale,
                           sp_lut, sp_scale, thr, taps2)
    return out, (B, c2, step_len, density_lut, density_scale, sp_lut,
                 sp_scale)


def _ftt_bwd(thr, taps2, res, g):
    B, c2, step_len, dlut, dscale, slut, sscale = res
    if taps2 is None:
        _, vjp = jax.vjp(lambda *a: _tail_jnp(*a, thr)[:2], *res)
        grads = vjp((g[0], g[1]))
        # coordinate cotangents are zero by contract (geometry statics)
        return (grads[0], jnp.zeros_like(c2)) + grads[2:]

    # analytic TPU-native adjoint (see module docstring): every stage of
    # the fused tail is linear-or-elementwise in its inputs, so the
    # transpose composes from the reverse cumsum, the clamp-aware LUT
    # slopes and the banded tent transpose of the pass-3 row lerp.
    from .pallas_lut import _lut1d_value_and_slope, lut1d_fast
    from .resample import row_lerp, row_tent

    g_den = g[0]
    g_csp = g[1]
    S, J, D2 = B.shape
    I = c2.shape[1]
    coords = jnp.broadcast_to(c2[:, None, :], (S, J, I)).reshape(S * J, I)
    hu = row_lerp(B.reshape(S * J, D2), coords).reshape(S, J, I)

    g_csum = jnp.cumsum(g_csp[::-1], axis=0)[::-1]          # d/d (sp*sl)
    g_sp = g_csum * step_len[None]
    sp_val, sp_slope = _lut1d_value_and_slope(slut, hu * sscale)
    _, den_slope = _lut1d_value_and_slope(dlut, hu * dscale)
    g_hu = g_den * den_slope * dscale + g_sp * sp_slope * sscale
    g_B = row_tent(g_hu.reshape(S * J, I), coords, D2,
                   taps2).reshape(S, J, D2)
    g_sl = jnp.sum(g_csum * sp_val, axis=0)

    # table + scale cotangents via the LUT vjp (hu is a closed-over
    # constant here, so d/d hu is not double-counted; XLA DCEs the table
    # scatter when the loss does not differentiate tables)
    _, vjp_d = jax.vjp(lambda t, sc: lut1d_fast(t, hu * sc), dlut, dscale)
    g_dlut, g_dscale = vjp_d(g_den)
    _, vjp_s = jax.vjp(lambda t, sc: lut1d_fast(t, hu * sc), slut, sscale)
    g_slut, g_sscale = vjp_s(g_sp)
    return (g_B, jnp.zeros_like(c2), g_sl, g_dlut, g_dscale, g_slut,
            g_sscale)


fused_trace_tail.defvjp(_ftt_fwd, _ftt_bwd)
