"""Pallas TPU kernel for the K5 Gaussian kernel superposition.

Reference: kernelSuperposition<rad> (kernel_wrapper.cuh:432-489) — each BEV
ray scatters its step dose into a (2r+1)^2 neighbourhood with separable
erf-difference weights, accumulated in shared memory per tile and flushed
with atomicAdd.

TPU-native design: the XLA formulation (superposition.superpose) expresses
the same sum as (2r+1)^2 shifted whole-slab FMAs; XLA materialises partial
accumulators in HBM, costing ~178 ms/layer. This kernel keeps the entire
accumulation in VMEM and exploits the separability of the weights:

  pass 1 (x):  t[ky][y, x'] = sum_dx  (d * w[ky] * w[|dx|])[y, x' - dx]
  pass 2 (y):  out[y', x']  = sum_dy  t[|dy|][y' - dy, x']

which is exact (the per-source weight product factorises), and reduces the
op count from ~3*(2r+1)^2 to ~2*(r+1)*(2r+1) per element. Shifts are static
lane/sublane relayouts, all buffers VMEM scratch. One grid step per depth
slice; weights w[k] = 0.5*(erf(rs*(k+0.5)) - erf(rs*(k-0.5))) are computed
in-kernel from the reciprocal sigma (kernel_wrapper.cuh:459-467).

Backward pass goes through a custom_vjp whose residual-free cotangent is
computed by the plain-jnp reference implementation's vjp (correctness
first; a dedicated backward kernel is a later optimisation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7, the same accuracy
    class as CUDA's erff) — Mosaic has no native erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _superp_kernel(rad_ref, d_ref, rs_ref, out_ref, wcache, tbuf, *,
                   radius: int, pad: int, ny: int, nx: int, cz: int):
    """One chunk of ``cz`` depth slices. ``rad_ref`` (scalar-prefetched,
    (n_chunks,)) carries each chunk's required radius — the TPU analogue of
    the reference's per-tile radius classification (tileRadCalc,
    kernel_wrapper.cuh:256-313): offsets beyond the chunk radius are skipped
    by predication, so cost scales with the actual lateral spread instead of
    the worst case. Chunking amortizes the per-grid-step launch latency."""
    r = radius
    step = pl.program_id(0)
    rad = rad_ref[step]
    d = d_ref[:]                                     # (cz, Y, X)
    rs = rs_ref[:]

    out_ref[:] = jnp.zeros((cz, ny + 2 * pad, nx + 2 * pad), d.dtype)

    @pl.when(rad >= 0)
    def _():
        # weights w[k] = 0.5*(erf(rs*(k+0.5)) - erf(rs*(k-0.5)))
        # (kernel_wrapper.cuh:459-467); k=0 reduces to erf(rs/2)
        wcache[0] = _erf(0.5 * rs)
        for k in range(1, r + 1):
            @pl.when(k <= rad)
            def _(k=k):
                wcache[k] = 0.5 * (_erf(rs * (k + 0.5)) - _erf(rs * (k - 0.5)))

        # pass 1: x-scatter into t[ky] (cz, Y, X + 2*pad)
        px = pad
        for ky in range(r + 1):
            @pl.when(ky <= rad)
            def _(ky=ky):
                base = d * wcache[ky]
                tbuf[ky] = jnp.zeros((cz, ny, nx + 2 * pad), d.dtype)
                for dx in range(-r, r + 1):
                    @pl.when(abs(dx) <= rad)
                    def _(dx=dx):
                        tbuf[ky, :, :, px + dx: px + dx + nx] += base * wcache[abs(dx)]

        # pass 2: y-scatter into the padded output
        for dy in range(-r, r + 1):
            @pl.when(abs(dy) <= rad)
            def _(dy=dy):
                out_ref[:, pad + dy: pad + dy + ny, :] += tbuf[abs(dy)]


def step_radii(rs: Array, ks_sigma_cutoff: float, max_radius: int) -> Array:
    """Per-depth-slice superposition radius from the minimum reciprocal
    sigma, the reference's tile formula rad = KS_CUTOFF/(sqrt(2)*minR)+0.5
    (kernel_wrapper.cuh:303) applied per slice; -1 marks an all-dead slice
    (every offset skipped)."""
    min_rs = jnp.min(rs, axis=(1, 2))
    rad = (ks_sigma_cutoff / (jnp.sqrt(jnp.asarray(2.0, rs.dtype)) * min_rs)
           + 0.5).astype(jnp.int32)
    rad = jnp.minimum(rad, max_radius)
    dead = min_rs > 1e8
    return jnp.where(dead, -1, rad)


def _pick_chunk(radius: int, Y: int, X: int, pad: int,
                vmem_budget: int = 8 * 2 ** 20) -> int:
    """Depth slices per grid step. Measured on v5e: per-step launch latency
    is negligible while a chunk's max-radius costs every slice in it the
    radius of its widest neighbour (~5% on the watercube), so per-slice
    processing wins. Kept as a tunable for geometries with tiny slices."""
    del radius, Y, X, pad, vmem_budget
    return 1


def superpose_pallas_raw(idd: Array, rs: Array, rad_steps: Array,
                         radius: int, pad: int) -> Array:
    """(S, Y, X) -> (S, Y+2*pad, X+2*pad); per-chunk adaptive radius with
    static upper bound ``radius``."""
    if pad < radius:
        raise ValueError("pad must cover radius")
    S, Y, X = idd.shape
    cz = _pick_chunk(radius, Y, X, pad)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        idd = jnp.pad(idd, ((0, s_pad - S), (0, 0), (0, 0)))
        rs = jnp.pad(rs, ((0, s_pad - S), (0, 0), (0, 0)), constant_values=1e10)
        rad_steps = jnp.pad(rad_steps, (0, s_pad - S), constant_values=-1)
    chunk_rads = jnp.max(rad_steps.reshape(n_chunks, cz), axis=1)

    kern = functools.partial(_superp_kernel, radius=radius, pad=pad,
                             ny=Y, nx=X, cz=cz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((cz, Y + 2 * pad, X + 2 * pad),
                               lambda i, rad_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((radius + 1, cz, Y, X), idd.dtype),
            pltpu.VMEM((radius + 1, cz, Y, X + 2 * pad), idd.dtype),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((s_pad, Y + 2 * pad, X + 2 * pad), idd.dtype),
        grid_spec=grid_spec,
    )(chunk_rads, idd, rs)
    return out[:S]


def superpose_masked_jnp(idd: Array, rs: Array, rad_steps: Array,
                         radius: int, pad: int, chunk_z: int = 8) -> Array:
    """jnp mirror of the adaptive kernel: full-radius offset loop with
    weights zeroed beyond each slice's radius — used as the differentiation
    rule and as the CPU fallback (bitwise-equivalent truncation)."""
    from .superposition import erf_diff_weights
    S, Y, X = idd.shape
    w = erf_diff_weights(rs, radius)                 # (r+1, S, Y, X)
    ks = jnp.arange(radius + 1)[:, None, None, None]
    w = jnp.where(ks <= rad_steps[None, :, None, None], w, 0.0)
    out = jnp.zeros((S, Y + 2 * pad, X + 2 * pad), idd.dtype)
    for dy in range(-radius, radius + 1):
        contrib_y = idd * w[abs(dy)]
        for dx in range(-radius, radius + 1):
            out = out.at[:, pad + dy: pad + dy + Y, pad + dx: pad + dx + X].add(
                contrib_y * w[abs(dx)]
            )
    return out


def _superp_bwd_kernel(rad_ref, d_ref, rs_ref, g_ref, gd_ref, grs_ref,
                       wcache, dwcache, rj_buf, rpj_buf, *, radius: int,
                       pad: int, ny: int, nx: int, cz: int):
    """Backward of the superposition w.r.t. (idd, rs).

    In the adjoint the weights live at the DESTINATION index, so the sum
    factorizes without any per-source coupling:

      g_d[y,x]  = sum_{j,k} w[j] * w[k] * Q_{jk}[y,x]
      g_rs[y,x] = d[y,x] * sum_{j,k} (dw[j] w[k] + w[j] dw[k]) * Q_{jk}
      Q_{jk}    = sum of the <= 4 G-window reads at offsets (+-j, +-k)

    where dw_k = d w_k / d rs = (1/sqrt(pi)) * ((k+1/2) e_k - (k-1/2) e_{k-1})
    with e_k = exp(-(rs (k+1/2))^2). Per j: accumulate R_j = sum_k w[k] Q_jk
    and R'_j = sum_k dw[k] Q_jk, then g_d += w[j] R_j and
    g_rs_acc += dw[j] R_j + w[j] R'_j."""
    r = radius
    step = pl.program_id(0)
    rad = rad_ref[step]
    d = d_ref[:]
    rs = rs_ref[:]
    INV_SQRT_PI = 0.5641895835477563

    gd_ref[:] = jnp.zeros((cz, ny, nx), d.dtype)
    grs_ref[:] = jnp.zeros((cz, ny, nx), d.dtype)

    @pl.when(rad >= 0)
    def _():
        # weights + weight derivatives, k = 0..rad
        e_prev = jnp.exp(-(0.5 * rs) * (0.5 * rs))          # e_{-1} at |.|
        wcache[0] = _erf(0.5 * rs)
        dwcache[0] = INV_SQRT_PI * (0.5 * e_prev - (-0.5) * e_prev)
        for k in range(1, r + 1):
            @pl.when(k <= rad)
            def _(k=k):
                a_hi = rs * (k + 0.5)
                a_lo = rs * (k - 0.5)
                e_hi = jnp.exp(-a_hi * a_hi)
                e_lo = jnp.exp(-a_lo * a_lo)
                wcache[k] = 0.5 * (_erf(a_hi) - _erf(a_lo))
                dwcache[k] = INV_SQRT_PI * ((k + 0.5) * e_hi - (k - 0.5) * e_lo)

        def window(j, k):
            # sum of the G windows at y-offset +-j and x-offset +-k
            def win(dy, dx):
                return g_ref[:, pad + dy: pad + dy + ny, pad + dx: pad + dx + nx]
            q = win(j, k)
            if k > 0:
                q = q + win(j, -k)
            if j > 0:
                q = q + win(-j, k)
                if k > 0:
                    q = q + win(-j, -k)
            return q

        for j in range(r + 1):
            @pl.when(j <= rad)
            def _(j=j):
                rj_buf[:] = jnp.zeros((cz, ny, nx), d.dtype)
                rpj_buf[:] = jnp.zeros((cz, ny, nx), d.dtype)
                for k in range(r + 1):
                    @pl.when(k <= rad)
                    def _(k=k, j=j):
                        q = window(j, k)
                        rj_buf[:] += wcache[k] * q
                        rpj_buf[:] += dwcache[k] * q
                gd_ref[:] += wcache[j] * rj_buf[:]
                grs_ref[:] += dwcache[j] * rj_buf[:] + wcache[j] * rpj_buf[:]

        grs_ref[:] = grs_ref[:] * d


def superpose_bwd_pallas(idd: Array, rs: Array, g: Array, rad_steps: Array,
                         radius: int, pad: int):
    """Pallas adjoint: returns (g_idd, g_rs) given the padded output
    cotangent ``g`` (S, Y+2*pad, X+2*pad)."""
    S, Y, X = idd.shape
    # same chunking as the forward pass so per-chunk radii (and therefore
    # the weight truncation the adjoint differentiates) match exactly
    cz = _pick_chunk(radius, Y, X, pad)
    n_chunks = -(-S // cz)
    s_pad = n_chunks * cz
    if s_pad != S:
        idd = jnp.pad(idd, ((0, s_pad - S), (0, 0), (0, 0)))
        rs = jnp.pad(rs, ((0, s_pad - S), (0, 0), (0, 0)), constant_values=1e10)
        g = jnp.pad(g, ((0, s_pad - S), (0, 0), (0, 0)))
        rad_steps = jnp.pad(rad_steps, (0, s_pad - S), constant_values=-1)
    chunk_rads = jnp.max(rad_steps.reshape(n_chunks, cz), axis=1)

    kern = functools.partial(_superp_bwd_kernel, radius=radius, pad=pad,
                             ny=Y, nx=X, cz=cz)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
            pl.BlockSpec((cz, Y + 2 * pad, X + 2 * pad),
                         lambda i, rad_ref: (i, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
            pl.BlockSpec((cz, Y, X), lambda i, rad_ref: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((radius + 1, cz, Y, X), idd.dtype),
            pltpu.VMEM((radius + 1, cz, Y, X), idd.dtype),
            pltpu.VMEM((cz, Y, X), idd.dtype),
            pltpu.VMEM((cz, Y, X), idd.dtype),
        ],
    )
    gd, grs = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((s_pad, Y, X), idd.dtype),
            jax.ShapeDtypeStruct((s_pad, Y, X), idd.dtype),
        ),
        grid_spec=grid_spec,
    )(chunk_rads, idd, rs, g)
    return gd[:S], grs[:S]


def _effective_radii(rad_steps: Array, S: int, radius: int, pad: int,
                     Y: int, X: int) -> Array:
    """The truncation the chunked kernel actually applies: each slice uses
    its chunk's max radius (>= its own), so the backward mirror must mask
    with the same effective radii."""
    cz = _pick_chunk(radius, Y, X, pad)
    n_chunks = -(-S // cz)
    padded = jnp.pad(rad_steps, (0, n_chunks * cz - S), constant_values=-1)
    chunk_rads = jnp.max(padded.reshape(n_chunks, cz), axis=1)
    return jnp.repeat(chunk_rads, cz)[:S]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def superpose_pallas(idd: Array, rs: Array, rad_steps: Array,
                     radius: int, pad: int) -> Array:
    return superpose_pallas_raw(idd, rs, rad_steps, radius, pad)


def _sup_fwd(idd, rs, rad_steps, radius, pad):
    out = superpose_pallas_raw(idd, rs, rad_steps, radius, pad)
    S, Y, X = idd.shape
    eff = _effective_radii(rad_steps, S, radius, pad, Y, X)
    return out, (idd, rs, eff)


def _sup_bwd(radius, pad, res, g):
    """Adjoint dispatch mirrors the forward's adaptivity: an MXU banded-
    matmul transpose when every slice's live rays share one sigma (runtime
    lax.cond — homogeneous media, incl. the watercube benchmark), the
    per-source Pallas/jnp adjoint otherwise."""
    from .pallas_lut import on_tpu
    from .superposition import slice_uniform_rs, superpose_bwd_uniform_mxu

    idd, rs, eff = res
    rs_slice, all_uniform = slice_uniform_rs(idd, rs)

    def mxu(args):
        a, b, gg = args
        return superpose_bwd_uniform_mxu(a, b, rs_slice, gg, eff, radius, pad)

    def general(args):
        a, b, gg = args
        if on_tpu():
            return superpose_bwd_pallas(a, b, gg, eff, radius, pad)
        _, vjp = jax.vjp(
            lambda u, v: superpose_masked_jnp(u, v, eff, radius, pad), a, b
        )
        return vjp(gg)

    di, dr = jax.lax.cond(all_uniform, mxu, general, (idd, rs, g))
    return di, dr, None


superpose_pallas.defvjp(_sup_fwd, _sup_bwd)


# ---------------------------------------------------------------------------
# Adaptive dispatch: MXU banded matmuls when every slice's live rays share
# one sigma (homogeneous media — the watercube benchmark), per-source
# VPU kernel otherwise. The lax.cond predicate is a runtime value, so one
# compiled program serves both; only the taken branch executes on TPU.
# The backward is ALWAYS the per-source adjoint: on the uniform manifold the
# two forwards produce identical values, so the per-source VJP is the
# correct derivative regardless of which branch computed the primal.
# ---------------------------------------------------------------------------

def _superpose_general(idd, rs, rad_steps, radius, pad):
    from .pallas_lut import on_tpu
    if on_tpu():
        return superpose_pallas_raw(idd, rs, rad_steps, radius, pad)
    return superpose_masked_jnp(idd, rs, rad_steps, radius, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def superpose_adaptive(idd: Array, rs: Array, rad_steps: Array,
                       radius: int, pad: int) -> Array:
    """(S, Y, X) -> padded slab; picks the MXU or per-source path per call."""
    from .superposition import slice_uniform_rs, superpose_uniform_mxu
    rs_slice, all_uniform = slice_uniform_rs(idd, rs)
    return jax.lax.cond(
        all_uniform,
        lambda a: superpose_uniform_mxu(a[0], rs_slice, rad_steps, radius, pad),
        lambda a: _superpose_general(a[0], a[1], rad_steps, radius, pad),
        (idd, rs),
    )


def _sup_adaptive_fwd(idd, rs, rad_steps, radius, pad):
    out = superpose_adaptive(idd, rs, rad_steps, radius, pad)
    S, Y, X = idd.shape
    eff = _effective_radii(rad_steps, S, radius, pad, Y, X)
    return out, (idd, rs, eff)


superpose_adaptive.defvjp(_sup_adaptive_fwd, _sup_bwd)
