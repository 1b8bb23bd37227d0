"""K5 — depth-sliced 2D Gaussian kernel superposition.

Reference: kernelSuperposition<rad> (kernel_wrapper.cuh:432-489) plus the
tile-radius classification / bucketing machinery (tileRadCalc,
kernel_wrapper.cuh:256-313; host batching kernel_wrapper.cu:959-1056). Each
BEV ray scatters its step dose into a (2r+1)^2 neighbourhood with separable
box-integrated Gaussian weights erfDiffs[i] = 0.5*(erf(rSigma*(i+0.5)) -
erf(rSigma*(i-0.5))), accumulated into a BEV dose grid padded by
maxSuperpR=32 on every side.

TPU-native restructure: CUDA needs 33 templated kernels, shared-memory tiles
and atomicAdd because scatter with variable radius is hard on a GPU. On TPU
we invert the control flow into *shifted whole-slab FMAs*: for each lateral
offset (dy, dx) the contribution of every ray to its (dy, dx) neighbour is
``dose * w(|dy|) * w(|dx|)``, an elementwise product over the whole
(S, Y, X) slab written into a statically-shifted window of the padded output
— uniform work, no atomics, no divergence, differentiable. The per-tile
radius bucketing disappears: a single static radius bounds the offset loop,
and because the erf-difference weights decay like a Gaussian, rays with
smaller sigma contribute ~0 beyond their own 3-sigma — the reference's
truncation-by-bucket is reproduced up to the <0.2% tail it cuts off.

The static radius is chosen per beam by ``estimate_radius`` from a
water-equivalent worst-case sigma, mirroring how the reference's radius
emerges from the sigma recurrence (KS_SIGMA_CUTOFF / (sqrt(2)*rSigmaEff),
kernel_wrapper.cuh:303).

Weight slabs for all offsets would need (R+2) full copies of the slab, so
the z-axis is processed in chunks: per chunk the R+2 erf values are
materialised once and every offset pair reuses them.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def erf_diff_weights(r_sigma_eff: Array, radius: int) -> Array:
    """(radius+1, *shape) separable weights; index k = |offset|
    (kernel_wrapper.cuh:459-467)."""
    ks = jnp.arange(radius + 1, dtype=r_sigma_eff.dtype)
    ks = ks.reshape((radius + 1,) + (1,) * r_sigma_eff.ndim)
    hi = jax.scipy.special.erf(r_sigma_eff[None] * (ks + 0.5))
    lo = jax.scipy.special.erf(r_sigma_eff[None] * (ks - 0.5))
    return 0.5 * (hi - lo)


def superpose(
    idd: Array,            # (S, Y, X) per-step ray dose
    r_sigma_eff: Array,    # (S, Y, X) reciprocal effective sigma (BIG if dead)
    radius: int,
    pad: int,
    chunk_z: int = 8,
) -> Array:
    """Returns the padded BEV dose slab (S, Y+2*pad, X+2*pad).

    ``pad`` plays the role of maxSuperpR: the output window every offset
    writes into; must satisfy pad >= radius.
    """
    if pad < radius:
        raise ValueError(f"pad ({pad}) must cover radius ({radius})")
    S, Y, X = idd.shape
    n_chunks = -(-S // chunk_z)
    s_padded = n_chunks * chunk_z
    if s_padded != S:
        zeros = jnp.zeros((s_padded - S, Y, X), idd.dtype)
        idd = jnp.concatenate([idd, zeros], axis=0)
        r_sigma_eff = jnp.concatenate(
            [r_sigma_eff, jnp.full((s_padded - S, Y, X), 1e10, r_sigma_eff.dtype)],
            axis=0,
        )

    idd_c = idd.reshape(n_chunks, chunk_z, Y, X)
    rs_c = r_sigma_eff.reshape(n_chunks, chunk_z, Y, X)

    def chunk_body(args):
        dose, rs = args                          # (chunk_z, Y, X)
        w = erf_diff_weights(rs, radius)         # (radius+1, chunk_z, Y, X)
        out = jnp.zeros((chunk_z, Y + 2 * pad, X + 2 * pad), dose.dtype)
        for dy in range(-radius, radius + 1):
            contrib_y = dose * w[abs(dy)]
            for dx in range(-radius, radius + 1):
                contrib = contrib_y * w[abs(dx)]
                out = out.at[:, pad + dy : pad + dy + Y, pad + dx : pad + dx + X].add(
                    contrib
                )
        return out

    out_c = jax.lax.map(chunk_body, (idd_c, rs_c))
    out = out_c.reshape(s_padded, Y + 2 * pad, X + 2 * pad)
    return out[:S]


def estimate_radius(
    max_entry_sigma_mm: float,
    max_peak_depth_mm: float,
    pixel_width_mm: float,
    ks_sigma_cutoff: float = 3.0,
    sigma_delta: float = 0.21,
    max_radius: int = 32,
) -> int:
    """Static worst-case superposition radius for a beam.

    Water-equivalent upper bound on the lateral sigma: the pre-convolution
    already handles the entry sigma, so the superposition sigma is only the
    accumulated MCS (Highland, ~0.0294*depth^0.896 mm in water for protons —
    fitted to the reference's recurrence on water) plus the post-peak
    empirical widening, with a 40% heterogeneity margin. Radius then follows
    the reference's formula rad = KS_CUTOFF*(sigma+sigmaDelta)/pixelWidth
    rounded like kernel_wrapper.cuh:303.
    """
    mcs_sigma = 0.0294 * max_peak_depth_mm ** 0.896
    sigma = 1.4 * mcs_sigma + sigma_delta
    rad = int(ks_sigma_cutoff * sigma / pixel_width_mm + 0.5) + 1
    return max(1, min(rad, max_radius))


# ---------------------------------------------------------------------------
# MXU banded-matmul form — exact when each depth slice's live rays share one
# r_sigma_eff (true for homogeneous media: every live watercube ray sees the
# identical density/WEPL history). The separable per-source weight product
# then factorises into two per-slice banded matrices and the whole slab
# superposition becomes two S-batched matmuls on the MXU instead of
# ~2(r+1)(2r+1) VPU shift-FMAs per element.
# ---------------------------------------------------------------------------

def slice_uniform_rs(idd: Array, rs: Array) -> tuple:
    """Per-slice live-masked reciprocal sigma + uniformity predicate.

    A ray participates in the superposition only if its step dose is > 0
    (dead rays write idd=0, kernel_wrapper.cu:352-360), so weights of dead
    rays never matter. Returns ``(rs_slice (S,), all_uniform ())`` where
    ``all_uniform`` is True iff in every slice all live rays carry exactly
    the same r_sigma_eff. Rays with zero dose but a finite sigma (possible
    when the cumulative IDD is locally flat) are included in the predicate:
    their forward weights are irrelevant, but the MXU adjoint derives their
    d(out)/d(idd) from the slice sigma, which is only exact if they share it.
    """
    live = (idd > 0) | (rs <= 1e8)
    big = jnp.asarray(3.4e38, rs.dtype)
    lo = jnp.min(jnp.where(live, rs, big), axis=(1, 2))     # (S,)
    hi = jnp.max(jnp.where(live, rs, -big), axis=(1, 2))
    any_live = jnp.any(live, axis=(1, 2))
    uniform = jnp.where(any_live, lo == hi, True)
    return lo, jnp.all(uniform)


def _band_matrix(w: Array, n: int, pad: int, radius: int) -> Array:
    """(S, n, n+2*pad) banded weight matrix B[s, i, j] = w[s, |j-pad-i|]
    (zero beyond ``radius``)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n + 2 * pad), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n + 2 * pad), 1)
    k = jnp.abs(j - pad - i)
    b = w[:, jnp.clip(k, 0, radius)]              # (S, n, n+2p)
    return jnp.where((k <= radius)[None], b, 0.0)


def superpose_uniform_mxu(idd: Array, rs_slice: Array, rad_steps: Array,
                          radius: int, pad: int) -> Array:
    """(S, Y, X) -> (S, Y+2*pad, X+2*pad) with one shared r_sigma_eff per
    slice. Matches superpose()/superpose_pallas exactly on slices whose live
    rays are uniform: the same erf-difference weights, truncated at each
    slice's ``rad_steps`` radius (-1 = dead slice -> all-zero weights)."""
    S, Y, X = idd.shape
    ks = jnp.arange(radius + 1, dtype=idd.dtype)
    hi = jax.scipy.special.erf(rs_slice[:, None] * (ks + 0.5))
    lo = jax.scipy.special.erf(rs_slice[:, None] * (ks - 0.5))
    w = 0.5 * (hi - lo)                                       # (S, r+1)
    w = jnp.where(jnp.arange(radius + 1)[None] <= rad_steps[:, None], w, 0.0)
    wy = _band_matrix(w, Y, pad, radius)
    wx = _band_matrix(w, X, pad, radius)
    # fp32 MXU passes: default bf16 matmul precision would cost ~3 digits
    t = jnp.einsum("syx,sxq->syq", idd, wx,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("syq,syp->spq", t, wy,
                      precision=jax.lax.Precision.HIGHEST)


_INV_SQRT_PI = 0.5641895835477563


def superpose_bwd_uniform_mxu(idd: Array, rs_full: Array, rs_slice: Array,
                              g: Array, rad_steps: Array, radius: int,
                              pad: int):
    """Adjoint of the per-source superposition evaluated on the uniform
    manifold (every live ray in a slice shares rs == rs_slice[s]):

      g_idd = Wy G Wx^T           (banded correlation — the matmul transpose)
      g_rs  = idd * (dWy G Wx^T + Wy G dWx^T)

    with dW[k]/drs = (1/sqrt(pi))*((k+1/2)e_hi - (k-1/2)e_lo). Six S-batched
    banded matmuls on the MXU instead of the per-source VPU window walk.
    Rays with idd == 0 carry rs = BIG (dead): their own weights collapse to
    the center tap, so g_idd is patched to the center window there (the
    engine masks those cotangents anyway, but this keeps the VJP exact)."""
    S, Y, X = idd.shape
    hp = jax.lax.Precision.HIGHEST
    ks = jnp.arange(radius + 1, dtype=idd.dtype)
    a_hi = rs_slice[:, None] * (ks + 0.5)
    a_lo = rs_slice[:, None] * (ks - 0.5)
    w = 0.5 * (jax.scipy.special.erf(a_hi) - jax.scipy.special.erf(a_lo))
    dw = _INV_SQRT_PI * ((ks + 0.5) * jnp.exp(-a_hi * a_hi)
                         - (ks - 0.5) * jnp.exp(-a_lo * a_lo))
    mask = jnp.arange(radius + 1)[None] <= rad_steps[:, None]
    w = jnp.where(mask, w, 0.0)
    dw = jnp.where(mask, dw, 0.0)
    wy = _band_matrix(w, Y, pad, radius)
    wx = _band_matrix(w, X, pad, radius)
    dwy = _band_matrix(dw, Y, pad, radius)
    dwx = _band_matrix(dw, X, pad, radius)
    t = jnp.einsum("syp,spq->syq", wy, g, precision=hp)
    g_idd = jnp.einsum("syq,sxq->syx", t, wx, precision=hp)
    td = jnp.einsum("syp,spq->syq", dwy, g, precision=hp)
    r1 = jnp.einsum("syq,sxq->syx", td, wx, precision=hp)
    r2 = jnp.einsum("syq,sxq->syx", t, dwx, precision=hp)
    g_rs = idd * (r1 + r2)
    # dead slices (rad_steps == -1) truncate even the center tap, so their
    # cotangent stays the (zero) matmul result
    center = g[:, pad:pad + Y, pad:pad + X]
    center_ok = (rs_full > 1e8) & (rad_steps >= 0)[:, None, None]
    g_idd = jnp.where(center_ok, center, g_idd)
    return g_idd, g_rs


# ---------------------------------------------------------------------------
# Golden model (scatter form, numpy) — literal transcription of
# kernelSuperposition<rad> semantics with a uniform radius.
# ---------------------------------------------------------------------------

def superpose_golden_numpy(idd, r_sigma_eff, radius, pad, rad_rows=None):
    """``rad_rows``, optional: per-source truncation radius — (S, Y) for the
    per-8-row-band semantics or (S, Y, X) for the per-32x8-tile semantics of
    the TPU op; sources with radius < 0 are dead."""
    from scipy.special import erf

    S, Y, X = idd.shape
    out = np.zeros((S, Y + 2 * pad, X + 2 * pad), np.float64)
    ks = np.arange(radius + 1)
    for s in range(S):
        for y in range(Y):
            for x in range(X):
                if rad_rows is None:
                    r_y = radius
                elif rad_rows.ndim == 2:
                    r_y = int(rad_rows[s, y])
                else:
                    r_y = int(rad_rows[s, y, x])
                if r_y < 0:
                    continue
                dose = idd[s, y, x]
                if dose <= 0.0:
                    continue
                rs = r_sigma_eff[s, y, x]
                w = 0.5 * (erf(rs * (ks + 0.5)) - erf(rs * (ks - 0.5)))
                for dy in range(-r_y, r_y + 1):
                    for dx in range(-r_y, r_y + 1):
                        out[s, pad + y + dy, pad + x + dx] += (
                            dose * w[abs(dy)] * w[abs(dx)]
                        )
    return out.astype(np.float32)
