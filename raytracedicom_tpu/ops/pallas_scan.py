"""Fused depth-recurrence scan for the K2 fill (fillIddAndSigma's serial
per-ray loop, kernel_wrapper.cu:282-307).

The cumsum restructure of the sigma^2 recurrence needs five cumulative
quantities along depth, and the dose output needs a "carry the last valid
value" forward fill (the reference never resets ``res`` on sub-epsilon mass
steps, kernel_wrapper.cu:343-346). As separate XLA ops each cumsum costs
~0.45 ms on a (264,128,128) slab (~75 GB/s effective — the log-step
lowering) and the forward fill, as a log-depth ``associative_scan``, several
times that in residual traffic once differentiated. This kernel computes ALL
of them in ONE sequential sweep with the running state held in VMEM scratch
across grid steps (TPU grids execute in order):

  ucb  = cumsum(u) - u                  (air-divergence update count before)
  cub2 = cumsum(u * ucb)                (its first moment — lets the air
                                         scalars d0, aq stay OUTSIDE the
                                         kernel: sigma_sq_pre = -d0 + sspA
                                         + d0*(ucb+u) + 2*aq*cub2)
  ii   = cumsum(t)                      (incincScat after step)
  isa  = cumsum(u * ii)                 (incScat after step)
  sspA = cumsum(u * (isa - u*ii))       (the tick-dependent part of
                                         sigma_sq_pre's cumulative term)
  cpd  = cumsum(pd)                     (post-peak density, for the dip)
  res[c,s] = val[s] ? v[c,s] : res[c,s-1]   (forward fill, C channels;
                                         the caller forces val[0] = 1 so the
                                         s = 0 row needs no special case)

Only (t, pd, v) carry gradients (u and val are 0/1 masks); the custom VJP is
a single REVERSE sweep with 4 + C carried suffix sums:

  gs  = revcum(g_sspA)
  A2  = revcum(g_isa + u*gs)
  g_t = revcum(g_ii - u*gs + u*A2)
  g_pd= revcum(g_cpd)
  g_v[c,s] = val[s] * acc_c[s],  acc_c[s] = g_res[c,s] + (1-val[s+1])*acc_c[s+1]

The jnp mirror is the differentiation/CPU path and the test reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _forward_fill_jnp(v: Array, val: Array) -> Array:
    """res[..., s, :, :] = v at the last val-true step <= s (caller forces
    val[0] = 1). v: (C, S, Y, X), val: (S, Y, X)."""
    m = jnp.broadcast_to(val.astype(bool)[None], v.shape)

    def op(a, b):
        av, am = a
        bv, bm = b
        return jnp.where(bm, bv, av), am | bm

    res, _ = jax.lax.associative_scan(op, (v, m), axis=1)
    return res


def fused_depth_scans_jnp(t: Array, pd: Array, u: Array,
                          v: Array = None, val: Array = None):
    ii = jnp.cumsum(t, axis=0)
    isa = jnp.cumsum(u * ii, axis=0)
    sspA = jnp.cumsum(u * (isa - u * ii), axis=0)
    cpd = jnp.cumsum(pd, axis=0)
    cu = jnp.cumsum(u, axis=0)
    ucb = cu - u
    cub2 = jnp.cumsum(u * ucb, axis=0)
    if v is None:
        return ii, isa, sspA, cpd, ucb, cub2
    return ii, isa, sspA, cpd, ucb, cub2, _forward_fill_jnp(v, val)


def _fwd_kernel(t_ref, pd_ref, u_ref, v_ref, val_ref,
                ii_ref, isa_ref, sspA_ref, cpd_ref, ucb_ref, cub2_ref,
                res_ref, c_ref, *, cz, ny, nx, nchan):
    """c_ref: (6 + C, ny, nx) carries [ii, isa, sspA, cpd, uc, cub2,
    res_0..res_{C-1}]."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        c_ref[:] = jnp.zeros((6 + nchan, ny, nx), jnp.float32)

    for s in range(cz):
        u = u_ref[s]
        t = t_ref[s]
        pd = pd_ref[s]
        uc_before = c_ref[4]
        ii = c_ref[0] + t
        isa = c_ref[1] + u * ii
        sspA = c_ref[2] + u * (isa - u * ii)
        cpd = c_ref[3] + pd
        cub2 = c_ref[5] + u * uc_before
        ii_ref[s] = ii
        isa_ref[s] = isa
        sspA_ref[s] = sspA
        cpd_ref[s] = cpd
        ucb_ref[s] = uc_before
        cub2_ref[s] = cub2
        c_ref[0] = ii
        c_ref[1] = isa
        c_ref[2] = sspA
        c_ref[3] = cpd
        c_ref[4] = uc_before + u
        c_ref[5] = cub2
        val = val_ref[s]
        for c in range(nchan):
            res = val * v_ref[c, s] + (1.0 - val) * c_ref[6 + c]
            res_ref[c, s] = res
            c_ref[6 + c] = res


def _pick_cz(ny, nx, n_arrays, vmem_budget=6 * 2 ** 20):
    per_cz = n_arrays * ny * nx * 4 * 2
    return max(1, min(16, vmem_budget // per_cz))


def _fused_fwd_pallas(t, pd, u, v, val):
    S, Y, X = t.shape
    C = v.shape[0]
    # VMEM residents: inputs t, pd, u, val, v(C) plus 6+C outputs = 10+2C
    # block arrays (the (6+C, Y, X) carry scratch is amortized separately).
    cz = _pick_cz(Y, X, 10 + 2 * C)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        padw = ((0, s_pad - S), (0, 0), (0, 0))
        t, pd, u, val = (jnp.pad(a, padw) for a in (t, pd, u, val))
        v = jnp.pad(v, ((0, 0),) + padw)
    kern = functools.partial(_fwd_kernel, cz=cz, ny=Y, nx=X, nchan=C)
    blk = pl.BlockSpec((cz, Y, X), lambda i: (i, 0, 0))
    blkc = pl.BlockSpec((C, cz, Y, X), lambda i: (0, i, 0, 0))
    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[blk, blk, blk, blkc, blk],
        out_specs=(blk,) * 6 + (blkc,),
        out_shape=tuple(jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32)
                        for _ in range(6))
        + (jax.ShapeDtypeStruct((C, s_pad, Y, X), jnp.float32),),
        scratch_shapes=[pltpu.VMEM((6 + C, Y, X), jnp.float32)],
    )(t, pd, u, v, val)
    return tuple(o[:S] for o in outs[:6]) + (outs[6][:, :S],)


def _fused_bwd_pallas(u, val, g_ii, g_isa, g_sspA, g_cpd, g_res):
    S, Y, X = u.shape
    C = g_res.shape[0]
    cz = _pick_cz(Y, X, 8 + 2 * C)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        padw = ((0, s_pad - S), (0, 0), (0, 0))
        u, val, g_ii, g_isa, g_sspA, g_cpd = (
            jnp.pad(a, padw) for a in (u, val, g_ii, g_isa, g_sspA, g_cpd))
        g_res = jnp.pad(g_res, ((0, 0),) + padw)
    # reverse chunk order so the sequential grid walks depth backwards
    rev = pl.BlockSpec((cz, Y, X), lambda i: (pl.num_programs(0) - 1 - i, 0, 0))
    revc = pl.BlockSpec((C, cz, Y, X),
                        lambda i: (0, pl.num_programs(0) - 1 - i, 0, 0))

    def kern(u_ref, val_ref, gii_ref, gisa_ref, gsspA_ref, gcpd_ref, gres_ref,
             gt_ref, gpd_ref, gv_ref, c_ref, *, cz=cz, ny=Y, nx=X, nchan=C):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            c_ref[:] = jnp.zeros((4 + nchan, ny, nx), jnp.float32)

        for s in range(cz - 1, -1, -1):
            u_s = u_ref[s]
            gs = c_ref[0] + gsspA_ref[s]
            a2 = c_ref[1] + gisa_ref[s] + u_s * gs
            gt = c_ref[2] + gii_ref[s] - u_s * gs + u_s * a2
            gpd = c_ref[3] + gcpd_ref[s]
            gt_ref[s] = gt
            gpd_ref[s] = gpd
            c_ref[0] = gs
            c_ref[1] = a2
            c_ref[2] = gt
            c_ref[3] = gpd
            val = val_ref[s]
            for c in range(nchan):
                acc = gres_ref[c, s] + c_ref[4 + c]
                gv_ref[c, s] = val * acc
                c_ref[4 + c] = (1.0 - val) * acc

    gt, gpd, gv = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[rev] * 6 + [revc],
        out_specs=(rev, rev, revc),
        out_shape=(jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32),
                   jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32),
                   jax.ShapeDtypeStruct((C, s_pad, Y, X), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((4 + C, Y, X), jnp.float32)],
    )(u, val, g_ii, g_isa, g_sspA, g_cpd, g_res)
    return gt[:S], gpd[:S], gv[:, :S]


@jax.custom_vjp
def fused_depth_scans(t: Array, pd: Array, u: Array, v: Array, val: Array):
    """(t, pd, u 0/1 mask, v (C,S,Y,X), val 0/1 mask with val[0] == 1) ->
    (ii, isa, sspA, cpd, ucb, cub2, res); see module docstring. Pallas
    single-sweep on TPU, jnp cumsums + associative scan elsewhere."""
    from .pallas_lut import on_tpu
    if on_tpu():
        return _fused_fwd_pallas(t, pd, u, v, val)
    return fused_depth_scans_jnp(t, pd, u, v, val)


def _fds_fwd(t, pd, u, v, val):
    return fused_depth_scans(t, pd, u, v, val), (u, val)


def _revcum(x):
    return jnp.flip(jnp.cumsum(jnp.flip(x, 0), axis=0), 0)


def _fds_bwd(res, gs_out):
    u, val = res
    g_ii, g_isa, g_sspA, g_cpd, _g_ucb, _g_cub2, g_res = gs_out
    # ucb/cub2 are functions of the mask only: their cotangents do not reach
    # (t, pd). (Their downstream use carries the air scalars' gradients,
    # which XLA differentiates outside this op.)
    from .pallas_lut import on_tpu
    if on_tpu():
        g_t, g_pd, g_v = _fused_bwd_pallas(u, val, g_ii, g_isa, g_sspA,
                                           g_cpd, g_res)
    else:
        gs = _revcum(g_sspA)
        a2 = _revcum(g_isa + u * gs)
        g_t = _revcum(g_ii - u * gs + u * a2)
        g_pd = _revcum(g_cpd)
        # acc[s] = g_res[s] + (1 - val[s+1]) * acc[s+1]; g_v = val * acc.
        # Expressed with suffix products of (1 - val): acc = revcum(g_res / P)
        # is unstable, so use a small reverse lax.scan instead (CPU path).
        def body(carry, xs):
            g_s, val_s = xs
            acc = g_s + carry
            return (1.0 - val_s) * acc, val_s * acc

        _, g_v = jax.lax.scan(
            body, jnp.zeros_like(g_res[:, 0]),
            (jnp.moveaxis(g_res, 1, 0), val[:, None]), reverse=True)
        g_v = jnp.moveaxis(g_v, 0, 1)
    return g_t, g_pd, jnp.zeros_like(u), g_v, jnp.zeros_like(val)


fused_depth_scans.defvjp(_fds_fwd, _fds_bwd)
