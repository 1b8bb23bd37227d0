"""Fused depth-recurrence scan for the K2 fill (fillIddAndSigma's serial
per-ray loop, kernel_wrapper.cu:282-307).

The cumsum restructure of the sigma^2 recurrence needs five cumulative
quantities along depth. As separate XLA cumsums each costs ~0.45 ms on a
(264,128,128) slab (~75 GB/s effective — the log-step lowering); this
kernel computes ALL of them in ONE sequential sweep with the running state
held in VMEM scratch across grid steps (TPU grids execute in order):

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

Only (t, pd) carry gradients (u is a 0/1 mask); the custom VJP is a single
REVERSE sweep with four carried suffix sums:

  gs  = revcum(g_sspA)
  A2  = revcum(g_isa + u*gs)
  g_t = revcum(g_ii - u*gs + u*A2)
  g_pd= revcum(g_cpd)

The jnp mirror is the differentiation/CPU path and the test reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def fused_depth_scans_jnp(t: Array, pd: Array, u: Array):
    ii = jnp.cumsum(t, axis=0)
    isa = jnp.cumsum(u * ii, axis=0)
    sspA = jnp.cumsum(u * (isa - u * ii), axis=0)
    cpd = jnp.cumsum(pd, axis=0)
    cu = jnp.cumsum(u, axis=0)
    ucb = cu - u
    cub2 = jnp.cumsum(u * ucb, axis=0)
    return ii, isa, sspA, cpd, ucb, cub2


def _fwd_kernel(t_ref, pd_ref, u_ref, ii_ref, isa_ref, sspA_ref, cpd_ref,
                ucb_ref, cub2_ref, c_ref, *, cz, ny, nx):
    """c_ref: (5, ny, nx) carries [ii, isa, sspA, cpd, uc] + (1) cub2 row...
    carries packed as (6, ny, nx)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        c_ref[:] = jnp.zeros((6, ny, nx), jnp.float32)

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


def _pick_cz(ny, nx, n_arrays, vmem_budget=6 * 2 ** 20):
    per_cz = n_arrays * ny * nx * 4 * 2
    return max(1, min(16, vmem_budget // per_cz))


def _fused_fwd_pallas(t, pd, u):
    S, Y, X = t.shape
    cz = _pick_cz(Y, X, 9)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        padw = ((0, s_pad - S), (0, 0), (0, 0))
        t, pd, u = (jnp.pad(a, padw) for a in (t, pd, u))
    kern = functools.partial(_fwd_kernel, cz=cz, ny=Y, nx=X)
    blk = pl.BlockSpec((cz, Y, X), lambda i: (i, 0, 0))
    outs = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[blk, blk, blk],
        out_specs=(blk,) * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32)
                        for _ in range(6)),
        scratch_shapes=[pltpu.VMEM((6, Y, X), jnp.float32)],
    )(t, pd, u)
    return tuple(o[:S] for o in outs)


def _fused_bwd_pallas(u, g_ii, g_isa, g_sspA, g_cpd):
    S, Y, X = u.shape
    cz = _pick_cz(Y, X, 7)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        padw = ((0, s_pad - S), (0, 0), (0, 0))
        u, g_ii, g_isa, g_sspA, g_cpd = (
            jnp.pad(a, padw) for a in (u, g_ii, g_isa, g_sspA, g_cpd))
    # reverse chunk order so the sequential grid walks depth backwards
    rev = pl.BlockSpec((cz, Y, X), lambda i: (pl.num_programs(0) - 1 - i, 0, 0))

    def kern(u_ref, gii_ref, gisa_ref, gsspA_ref, gcpd_ref,
             gt_ref, gpd_ref, c_ref, *, cz=cz, ny=Y, nx=X):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            c_ref[:] = jnp.zeros((4, ny, nx), jnp.float32)

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

    gt, gpd = pl.pallas_call(
        kern,
        grid=(n_chunks,),
        in_specs=[rev] * 5,
        out_specs=(rev, rev),
        out_shape=(jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32),
                   jax.ShapeDtypeStruct((s_pad, Y, X), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((4, Y, X), jnp.float32)],
    )(u, g_ii, g_isa, g_sspA, g_cpd)
    return gt[:S], gpd[:S]


@jax.custom_vjp
def fused_depth_scans(t: Array, pd: Array, u: Array):
    """(t, pd, u 0/1 mask) -> (ii, isa, sspA, cpd, ucb, cub2); see module
    docstring. Pallas single-sweep on TPU, jnp cumsums elsewhere."""
    from .pallas_lut import on_tpu
    if on_tpu():
        return _fused_fwd_pallas(t, pd, u)
    return fused_depth_scans_jnp(t, pd, u)


def _fds_fwd(t, pd, u):
    return fused_depth_scans(t, pd, u), u


def _revcum(x):
    return jnp.flip(jnp.cumsum(jnp.flip(x, 0), axis=0), 0)


def _fds_bwd(u, gs_out):
    g_ii, g_isa, g_sspA, g_cpd, _g_ucb, _g_cub2 = gs_out
    # ucb/cub2 are functions of the mask only: their cotangents do not reach
    # (t, pd). (Their downstream use carries the air scalars' gradients,
    # which XLA differentiates outside this op.)
    from .pallas_lut import on_tpu
    if on_tpu():
        g_t, g_pd = _fused_bwd_pallas(u, g_ii, g_isa, g_sspA, g_cpd)
    else:
        gs = _revcum(g_sspA)
        a2 = _revcum(g_isa + u * gs)
        g_t = _revcum(g_ii - u * gs + u * a2)
        g_pd = _revcum(g_cpd)
    return g_t, g_pd, jnp.zeros_like(u)


fused_depth_scans.defvjp(_fds_fwd, _fds_bwd)
