"""K3 — spot-weight -> ray-weight Gaussian pre-convolution (per energy layer).

Reference: xConvGathResampGpu / yConvGathResampGpu / gpuConvolution2D
(gpu_convolution_2d.cu:16-71). Each output ray gathers from spot-grid columns
within CONV_SIGMA_CUTOFF*sigma + 0.5 output pixels, weighted by the exact
box-integrated Gaussian (erf difference), handling the unequal input/output
grid spacing through inOutDelta/inOutOffset and demagnifying the pixel
spacing to the entry depth via pxSpMult = 1 - entryZ/sourceDist
(kernel_wrapper.cu:849-854).

TPU-native restructure: instead of per-thread gather loops, build the dense
(out x in) erf-difference weight matrices for both axes (they are tiny:
nRays x nSpots) and apply the separable convolution as two MXU matmuls,
batched over energy layers. The cutoff becomes a mask on the weight matrix,
reproducing the reference's truncation exactly. Fully differentiable w.r.t.
spot weights and (through sigma) beam energies.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def conv_weight_matrix(
    n_in: int,
    n_out: int,
    sigma: Array,
    pixel_sp: Array,
    in_out_delta: Array,
    in_out_offset: Array,
    cutoff: float,
) -> Array:
    """Dense (n_out, n_in) weight matrix for one axis and one (or a batch of)
    layer sigma(s).

    For output index u and input index x (gpu_convolution_2d.cu:22-33):
      sigmaEff = sigma / pixel_sp
      dist = x*in_out_delta + in_out_offset - u      [output-pixel units]
      w = 0.5*(erf((dist+0.5)/(sqrt(2)*sigmaEff)) - erf((dist-0.5)/(sqrt(2)*sigmaEff)))
      included iff dist in [ceil-start, cutoff*sigmaEff + 0.5)

    ``sigma`` may have leading batch dims (layers); the result broadcasts to
    (*batch, n_out, n_in).
    """
    sigma = jnp.asarray(sigma)
    sigma_eff = sigma / pixel_sp
    r_sigma_eff = (1.0 / jnp.sqrt(2.0)) / sigma_eff

    xs = jnp.arange(n_in, dtype=jnp.float32)
    us = jnp.arange(n_out, dtype=jnp.float32)
    dist = xs[None, :] * in_out_delta + in_out_offset - us[:, None]  # (out, in)

    shape = sigma.shape + (n_out, n_in)
    dist_b = jnp.broadcast_to(dist, shape)
    rs = r_sigma_eff[..., None, None]
    w = 0.5 * (
        jax.scipy.special.erf((dist_b + 0.5) * rs)
        - jax.scipy.special.erf((dist_b - 0.5) * rs)
    )

    # Reference gather loop bounds: start at the first input index with
    # dist >= -(cutoff*sigmaEff + 0.5) (via ceil), continue while
    # dist < cutoff*sigmaEff + 0.5. Equivalent mask:
    bound = cutoff * sigma_eff[..., None, None] + 0.5
    # The ceil-derived start index means an input at exactly dist ==
    # -(bound) is included only if it lands on an integer grid point; the
    # half-open [-bound_from_ceil, bound) window below matches the loop for
    # all non-degenerate spacings.
    start_idx = jnp.ceil((us[:, None] - bound - in_out_offset) / in_out_delta)
    included = (xs[None, :] >= start_idx) & (dist_b < bound)
    return jnp.where(included, w, 0.0)


def spot_to_ray_weights(
    spot_weights: Array,       # (L, Sy, Sx)
    entry_sigmas: Array,       # (L, 2) sigma (x, y) at entry depth [mm]
    ray_dims: Tuple[int, int],
    spot_delta: Tuple[float, float],
    spot_offset: Tuple[float, float],
    ray_delta: Tuple[float, float],
    ray_offset: Tuple[float, float],
    px_sp_mult: Array,         # (2,) demagnification 1 - entryZ/sourceDist
    cutoff: float = 3.0,
) -> Array:
    """All-layer spot->ray convolution: returns (L, Ry, Rx) ray weights.

    Mirrors gpuConvolution2D (gpu_convolution_2d.cu:61-71): X pass then Y
    pass, with inOutDelta = spotDelta/rayDelta and inOutOffset =
    (spotOffset-rayOffset)/rayDelta, pixel spacing rayDelta*pxSpMult.
    """
    nrx, nry = ray_dims
    in_out_delta_x = spot_delta[0] / ray_delta[0]
    in_out_delta_y = spot_delta[1] / ray_delta[1]
    in_out_offset_x = (spot_offset[0] - ray_offset[0]) / ray_delta[0]
    in_out_offset_y = (spot_offset[1] - ray_offset[1]) / ray_delta[1]

    wx = conv_weight_matrix(
        spot_weights.shape[2], nrx, entry_sigmas[:, 0],
        ray_delta[0] * px_sp_mult[0], in_out_delta_x, in_out_offset_x, cutoff,
    )  # (L, Rx, Sx)
    wy = conv_weight_matrix(
        spot_weights.shape[1], nry, entry_sigmas[:, 1],
        ray_delta[1] * px_sp_mult[1], in_out_delta_y, in_out_offset_y, cutoff,
    )  # (L, Ry, Sy)

    # X pass: (L, Sy, Sx) x (L, Rx, Sx) -> (L, Sy, Rx); then Y pass -> (L, Ry, Rx)
    interm = jnp.einsum("lyx,lux->lyu", spot_weights, wx,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("lyu,lvy->lvu", interm, wy,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
