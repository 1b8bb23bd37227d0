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
                   radius: int, pad: int, ny: int, nx: int):
    """One depth slice. ``rad_ref`` (scalar-prefetched, (S,)) carries each
    slice's required radius — the TPU analogue of the reference's per-tile
    radius classification (tileRadCalc, kernel_wrapper.cuh:256-313): offsets
    beyond the slice radius are skipped by predication, so cost scales with
    the actual lateral spread instead of the worst case."""
    r = radius
    step = pl.program_id(0)
    rad = rad_ref[step]
    d = d_ref[0]                                     # (Y, X)
    rs = rs_ref[0]

    out_ref[0] = jnp.zeros((ny + 2 * pad, nx + 2 * pad), d.dtype)

    @pl.when(rad >= 0)
    def _():
        # weights w[k] = 0.5*(erf(rs*(k+0.5)) - erf(rs*(k-0.5)))
        # (kernel_wrapper.cuh:459-467); k=0 reduces to erf(rs/2)
        wcache[0] = _erf(0.5 * rs)
        for k in range(1, r + 1):
            @pl.when(k <= rad)
            def _(k=k):
                wcache[k] = 0.5 * (_erf(rs * (k + 0.5)) - _erf(rs * (k - 0.5)))

        # pass 1: x-scatter into t[ky] (Y, X + 2*pad)
        px = pad
        for ky in range(r + 1):
            @pl.when(ky <= rad)
            def _(ky=ky):
                base = d * wcache[ky]
                tbuf[ky] = jnp.zeros((ny, nx + 2 * pad), d.dtype)
                for dx in range(-r, r + 1):
                    @pl.when(abs(dx) <= rad)
                    def _(dx=dx):
                        tbuf[ky, :, px + dx: px + dx + nx] += base * wcache[abs(dx)]

        # pass 2: y-scatter into the padded output
        for dy in range(-r, r + 1):
            @pl.when(abs(dy) <= rad)
            def _(dy=dy):
                out_ref[0, pad + dy: pad + dy + ny, :] += tbuf[abs(dy)]


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


def superpose_pallas_raw(idd: Array, rs: Array, rad_steps: Array,
                         radius: int, pad: int) -> Array:
    """(S, Y, X) -> (S, Y+2*pad, X+2*pad); per-slice adaptive radius with
    static upper bound ``radius``."""
    if pad < radius:
        raise ValueError("pad must cover radius")
    S, Y, X = idd.shape
    kern = functools.partial(_superp_kernel, radius=radius, pad=pad, ny=Y, nx=X)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, Y, X), lambda i, rad_ref: (i, 0, 0)),
            pl.BlockSpec((1, Y, X), lambda i, rad_ref: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Y + 2 * pad, X + 2 * pad),
                               lambda i, rad_ref: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((radius + 1, Y, X), idd.dtype),
            pltpu.VMEM((radius + 1, Y, X + 2 * pad), idd.dtype),
        ],
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, Y + 2 * pad, X + 2 * pad), idd.dtype),
        grid_spec=grid_spec,
    )(rad_steps, idd, rs)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def superpose_pallas(idd: Array, rs: Array, rad_steps: Array,
                     radius: int, pad: int) -> Array:
    return superpose_pallas_raw(idd, rs, rad_steps, radius, pad)


def _sup_fwd(idd, rs, rad_steps, radius, pad):
    return superpose_pallas_raw(idd, rs, rad_steps, radius, pad), (idd, rs, rad_steps)


def _sup_bwd(radius, pad, res, g):
    idd, rs, rad_steps = res
    _, vjp = jax.vjp(
        lambda a, b: superpose_masked_jnp(a, b, rad_steps, radius, pad), idd, rs
    )
    di, dr = vjp(g)
    return di, dr, None


superpose_pallas.defvjp(_sup_fwd, _sup_bwd)
