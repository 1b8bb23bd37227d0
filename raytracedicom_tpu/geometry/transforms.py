"""Coordinate-transform algebra for the beam's-eye-view (fan) geometry.

TPU-native equivalents of the reference's transform layer
(/root/reference/src/float3_affine_transform.cu, float3_idx_transform.cu,
float3_from_fan_transform.cu:37-42, float3_to_fan_transform.cu:26-31,
matrix_3x3.cu). Instead of C++ classes with per-point ``transformPoint``
methods, transforms are immutable pytrees (NamedTuples of arrays) and the
apply functions are pure, batched over arbitrary leading point dimensions, and
traceable under ``jax.jit``/``vmap``/``grad``.

Conventions (matching the reference):
  * points are (..., 3) arrays ordered (x, y, z);
  * the fan ("beam's-eye-view") coordinate system has z pointing *away from*
    the beam direction, so divergence scales x,y by ``1 - z/sourceDist``;
  * ``sourceDist`` is a pair (x, y) of apparent source-axis distances; an
    infinite distance gives a parallel (non-divergent) beam.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class AffineTransform(NamedTuple):
    """y = m @ p + v  (reference: Float3AffineTransform, float3_affine_transform.cu:16)."""

    m: Array  # (3, 3)
    v: Array  # (3,)

    @staticmethod
    def identity() -> "AffineTransform":
        return AffineTransform(jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))

    @staticmethod
    def from_diagonal(diag, offset) -> "AffineTransform":
        diag = jnp.asarray(diag, jnp.float32)
        return AffineTransform(jnp.diag(diag), jnp.asarray(offset, jnp.float32))


class IdxTransform(NamedTuple):
    """y = p * delta + offset  (reference: Float3IdxTransform, float3_idx_transform.cu:9)."""

    delta: Array  # (3,)
    offset: Array  # (3,)


class FanFromIdxTransform(NamedTuple):
    """fan-grid index -> image/dose-grid index.

    Composition (reference: Float3FromFanTransform::transformPoint,
    float3_from_fan_transform.cu:37-42): apply ``fan_idx_to_fan`` (diagonal),
    scale x,y by the divergence factor ``1 - z/sourceDist``, then the
    ``gantry_to_im_idx`` affine.
    """

    fan_idx_to_fan: IdxTransform
    source_dist: Array  # (2,)
    gantry_to_im_idx: AffineTransform


class FanToIdxTransform(NamedTuple):
    """image/dose-grid index -> fan-grid index (reference: Float3ToFanTransform,
    float3_to_fan_transform.cu:26-31)."""

    im_idx_to_gantry: AffineTransform
    source_dist: Array  # (2,)
    fan_to_fan_idx: IdxTransform


# ---------------------------------------------------------------------------
# Apply / algebra
# ---------------------------------------------------------------------------

def apply_affine(t: AffineTransform, p: Array) -> Array:
    p = jnp.asarray(p)
    return jnp.einsum("ij,...j->...i", t.m, p) + t.v


def apply_affine_vector(t: AffineTransform, p: Array) -> Array:
    return jnp.einsum("ij,...j->...i", t.m, jnp.asarray(p))


def invert_affine(t: AffineTransform) -> AffineTransform:
    m_inv = jnp.linalg.inv(t.m)
    return AffineTransform(m_inv, -(m_inv @ t.v))


def concat_affine(t1: AffineTransform, t2: AffineTransform) -> AffineTransform:
    """Transform equal to applying t1 then t2 (reference:
    concatFloat3AffineTransform, float3_affine_transform.cu:41-45)."""
    return AffineTransform(t2.m @ t1.m, t2.m @ t1.v + t2.v)


def apply_idx(t: IdxTransform, p: Array) -> Array:
    return jnp.asarray(p) * t.delta + t.offset


def invert_idx(t: IdxTransform) -> IdxTransform:
    return IdxTransform(1.0 / t.delta, -t.offset / t.delta)


def shift_idx_offset(t: IdxTransform, shift) -> IdxTransform:
    return IdxTransform(t.delta, t.offset + jnp.asarray(shift, t.offset.dtype))


def _divergence_scale(z: Array, source_dist: Array) -> Tuple[Array, Array]:
    # 1 - z/dist per lateral axis; infinite dist -> exactly 1 (parallel beam).
    sx = jnp.where(jnp.isinf(source_dist[0]), 1.0, 1.0 - z / source_dist[0])
    sy = jnp.where(jnp.isinf(source_dist[1]), 1.0, 1.0 - z / source_dist[1])
    return sx, sy


def apply_fan_from_idx(t: FanFromIdxTransform, fan_idx: Array) -> Array:
    interm = apply_idx(t.fan_idx_to_fan, fan_idx)
    sx, sy = _divergence_scale(interm[..., 2], t.source_dist)
    interm = jnp.stack(
        [interm[..., 0] * sx, interm[..., 1] * sy, interm[..., 2]], axis=-1
    )
    return apply_affine(t.gantry_to_im_idx, interm)


def apply_fan_to_idx(t: FanToIdxTransform, im_idx: Array) -> Array:
    interm = apply_affine(t.im_idx_to_gantry, im_idx)
    sx, sy = _divergence_scale(interm[..., 2], t.source_dist)
    interm = jnp.stack(
        [interm[..., 0] / sx, interm[..., 1] / sy, interm[..., 2]], axis=-1
    )
    return apply_idx(t.fan_to_fan_idx, interm)


def invert_fan_from_idx(t: FanFromIdxTransform) -> FanToIdxTransform:
    """reference: Float3FromFanTransform::inverse, float3_from_fan_transform.cu:18-20."""
    return FanToIdxTransform(
        invert_affine(t.gantry_to_im_idx), t.source_dist, invert_idx(t.fan_idx_to_fan)
    )


def invert_and_shift_fan_from_idx(t: FanFromIdxTransform, shift) -> FanToIdxTransform:
    """Inverse whose fan-index output is shifted by ``shift`` (padding offsets);
    reference: Float3FromFanTransform::invertAndShift, float3_from_fan_transform.cu:22-30."""
    inv = invert_idx(t.fan_idx_to_fan)
    return FanToIdxTransform(
        invert_affine(t.gantry_to_im_idx),
        t.source_dist,
        shift_idx_offset(inv, shift),
    )


def invert_fan_to_idx(t: FanToIdxTransform) -> FanFromIdxTransform:
    return FanFromIdxTransform(
        invert_idx(t.fan_to_fan_idx), t.source_dist, invert_affine(t.im_idx_to_gantry)
    )


# ---------------------------------------------------------------------------
# Host-side (numpy, float32) versions, used for static grid-geometry setup
# where results feed array *shapes* and must be concrete python numbers.
# ---------------------------------------------------------------------------

def np_affine(m, v) -> AffineTransform:
    return AffineTransform(np.asarray(m, np.float32), np.asarray(v, np.float32))


def np_idx(delta, offset) -> IdxTransform:
    return IdxTransform(np.asarray(delta, np.float32), np.asarray(offset, np.float32))


def np_apply_fan_from_idx(t: FanFromIdxTransform, fan_idx) -> np.ndarray:
    p = np.asarray(fan_idx, np.float32) * np.asarray(t.fan_idx_to_fan.delta) + np.asarray(
        t.fan_idx_to_fan.offset
    )
    sd = np.asarray(t.source_dist, np.float32)
    sx = np.float32(1.0) if np.isinf(sd[0]) else np.float32(1.0) - p[..., 2] / sd[0]
    sy = np.float32(1.0) if np.isinf(sd[1]) else np.float32(1.0) - p[..., 2] / sd[1]
    p = np.stack([p[..., 0] * sx, p[..., 1] * sy, p[..., 2]], axis=-1)
    return np.einsum("ij,...j->...i", np.asarray(t.gantry_to_im_idx.m), p) + np.asarray(
        t.gantry_to_im_idx.v
    )
