"""Beam/plan data model, BEV ray-grid geometry, and the watercube phantom.

TPU-native equivalent of the reference's BeamSettings (beam_settings.h:17-112)
plus the host-side ray-grid setup from the engine orchestrator
(kernel_wrapper.cu:644-663) and the WATER_CUBE_TEST phantom + plan synthesis
(main.cu:39-99). Geometry that determines array *shapes* is computed on the
host in float32 (matching the reference's float arithmetic) so shapes are
static under jit; everything that flows into the dose values lives in arrays.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Optional, Tuple

import numpy as np

from .geometry.transforms import (
    AffineTransform,
    FanFromIdxTransform,
    IdxTransform,
    np_affine,
    np_idx,
)


class Beam(NamedTuple):
    """One treatment field (reference: BeamSettings, beam_settings.h:17).

    spot_weights is (nLayers, nSpotsY, nSpotsX): the reference stores layers
    along the slowest dimension of its pinned 3D image (beam_settings.h:24).
    """

    spot_weights: np.ndarray        # (L, Sy, Sx) float32
    energies: np.ndarray            # (L,) MeV/u
    spot_sigmas: np.ndarray         # (L, 2) sigma (x, y) at iso in air [mm]
    ray_spacing: Tuple[float, float]        # lateral ray spacing at iso [mm]
    steps: int                              # tracer depth steps
    source_dist: Tuple[float, float]        # apparent source-axis distance [mm]
    spot_idx_to_gantry: IdxTransform        # (i,j,k) -> gantry mm; z delta/offset = step len/start
    gantry_to_im_idx: AffineTransform
    gantry_to_dose_idx: AffineTransform


@dataclasses.dataclass(frozen=True)
class RayGridGeometry:
    """Static BEV ray-grid geometry for one beam (kernel_wrapper.cu:644-663).

    The grid covers every spot plus the estimated maximum pre-convolution
    radius, contains a ray centred at gantry (0,0), and is rounded up to the
    superposition tile (32, 8).
    """

    ray_dims: Tuple[int, int]       # (nRaysX, nRaysY)
    ray_res: Tuple[float, float, float]     # spacing at iso + z step [mm]
    ray_offset: Tuple[float, float, float]  # gantry position of ray (0,0) at step 0

    def ray_idx_to_gantry(self) -> IdxTransform:
        return np_idx(self.ray_res, self.ray_offset)


def _round_to(val: int, multiple: int) -> int:
    return ((val + multiple - 1) // multiple) * multiple


def compute_ray_grid(beam: Beam, conv_sigma_cutoff: float = 3.0,
                     tile: Tuple[int, int] = (32, 8)) -> RayGridGeometry:
    f32 = np.float32
    delta = np.asarray(beam.spot_idx_to_gantry.delta, f32)
    offset = np.asarray(beam.spot_idx_to_gantry.offset, f32)
    sx, sy = f32(beam.ray_spacing[0]), f32(beam.ray_spacing[1])
    res = (sx, sy, f32(delta[2]))
    max_sig_x = f32(np.max(np.asarray(beam.spot_sigmas, f32)[:, 0]))
    max_sig_y = f32(np.max(np.asarray(beam.spot_sigmas, f32)[:, 1]))
    cut = f32(conv_sigma_cutoff)
    half = f32(0.5)
    n_sx = beam.spot_weights.shape[2]
    n_sy = beam.spot_weights.shape[1]

    l_steps = int(math.ceil((offset[0] - (cut * max_sig_x + half * res[0])) / res[0]))
    b_steps = int(math.ceil((offset[1] - (cut * max_sig_y + half * res[1])) / res[1]))
    r_steps = int(math.floor(
        ((n_sx - 1) * delta[0] + offset[0] + (cut * max_sig_x + half * res[0])) / res[0]))
    t_steps = int(math.floor(
        ((n_sy - 1) * delta[1] + offset[1] + (cut * max_sig_y + half * res[1])) / res[1]))

    ray_offset = (f32(res[0] * l_steps), f32(res[1] * b_steps), f32(offset[2]))
    dims = (
        _round_to(r_steps - l_steps + 1, tile[0]),
        _round_to(t_steps - b_steps + 1, tile[1]),
    )
    return RayGridGeometry(ray_dims=dims, ray_res=tuple(map(float, res)),
                           ray_offset=tuple(map(float, ray_offset)))


def ray_idx_to_im_idx(beam: Beam, grid: RayGridGeometry) -> FanFromIdxTransform:
    return FanFromIdxTransform(
        grid.ray_idx_to_gantry(),
        np.asarray(beam.source_dist, np.float32),
        beam.gantry_to_im_idx,
    )


# ---------------------------------------------------------------------------
# glibc rand() reproduction — the reference seeds the watercube spot weights
# with C rand() under the default seed (main.cu:79-81), which on glibc is the
# TYPE_3 additive-feedback generator. Reimplemented here so the phantom is
# bit-identical to a glibc-built reference binary.
# ---------------------------------------------------------------------------

def glibc_rand_sequence(n: int, seed: int = 1) -> np.ndarray:
    r = np.zeros(344 + n, dtype=np.uint64)
    r[0] = seed
    for i in range(1, 31):
        r[i] = (16807 * r[i - 1]) % 2147483647
    for i in range(31, 34):
        r[i] = r[i - 31]
    for i in range(34, 344 + n):
        r[i] = (r[i - 31] + r[i - 3]) & 0xFFFFFFFF
    return (r[344:] >> np.uint64(1)).astype(np.int64)


GLIBC_RAND_MAX = 2147483647


# ---------------------------------------------------------------------------
# Watercube phantom (main.cu:39-99)
# ---------------------------------------------------------------------------

WATERCUBE_DIM = (256, 256, 256)         # (Z, Y, X) voxels, 1 mm
WATERCUBE_N_LAYERS = 20
WATERCUBE_SPOTS = (33, 33)


def watercube_ct() -> Tuple[np.ndarray, AffineTransform]:
    """256^3 CT of constant HU+1000 = 1000 with imIdxToWorld offset
    (-128, -128, -106) (main.cu:40-43). Returns (volume[Z,Y,X], imIdxToWorld)."""
    vol = np.full(WATERCUBE_DIM, 1000.0, np.float32)
    im_idx_to_world = np_affine(np.eye(3, dtype=np.float32),
                                [-128.0, -128.0, -256.0 + 150.0])
    return vol, im_idx_to_world


def patient_ct(seed: int = 0) -> Tuple[np.ndarray, AffineTransform]:
    """Patient-like heterogeneous phantom at the watercube benchmark scale.

    The reference's sub-second headline claim is for patient CT (README.md:2;
    kernelSuperposition handles arbitrary heterogeneity at full speed,
    kernel_wrapper.cuh:432-489), so the TPU benchmark needs a workload where
    no depth slice has laterally-uniform sigma. 256^3, 1 mm voxels, same
    imIdxToWorld as the watercube (main.cu:40-43) so the watercube plan
    geometry applies unchanged; contents (HU+1000, Schneider-adjusted):

      * air above the body (beam entry through skin like a real field)
      * soft-tissue body ellipse with smooth +-3% lateral density texture
      * an off-axis lung volume (~0.3 g/cc) in the beam path
      * a bone shell ("rib") and a bone cylinder ("spine") partially
        covering the field

    Every BEV slice therefore mixes lung/soft/bone sigma histories, which
    forces the engine's general (per-source) superposition branch.
    Deterministic for a given ``seed``.
    """
    Z, Y, X = WATERCUBE_DIM
    rng = np.random.default_rng(seed)
    z = np.arange(Z, dtype=np.float32)[:, None, None]
    y = np.arange(Y, dtype=np.float32)[None, :, None]
    x = np.arange(X, dtype=np.float32)[None, None, :]

    # smooth lateral/axial texture: sum of random-phase cosines (band-limited)
    tex = np.zeros((Z, Y, X), np.float32)
    for _ in range(6):
        k = rng.uniform(0.02, 0.12, size=3).astype(np.float32)
        ph = rng.uniform(0, 2 * np.pi, size=3).astype(np.float32)
        tex += (np.cos(k[0] * z + ph[0]) * np.cos(k[1] * y + ph[1])
                * np.cos(k[2] * x + ph[2])).astype(np.float32)
    tex /= 6.0

    body = (((y - 128.0) / 112.0) ** 2 + ((x - 128.0) / 112.0) ** 2 <= 1.0) \
        & (z >= 40.0) & (z <= 220.0)
    lung = ((((y - 110.0) / 36.0) ** 2 + ((x - 110.0) / 36.0) ** 2) <= 1.0) \
        & (z >= 150.0) & (z <= 195.0)
    rib = (np.abs(z - 200.0) <= 4.0) & (x < 128.0) \
        & ((((y - 128.0) / 104.0) ** 2 + ((x - 128.0) / 104.0) ** 2) <= 1.0)
    spine = ((((y - 150.0) / 12.0) ** 2 + ((x - 150.0) / 12.0) ** 2) <= 1.0) \
        & (z >= 60.0) & (z <= 200.0)

    vol = np.zeros((Z, Y, X), np.float32)
    vol[body] = 1020.0
    vol[lung] = 300.0
    vol[rib] = 1700.0
    vol[spine] = 1400.0
    vol *= (1.0 + 0.03 * tex)
    im_idx_to_world = np_affine(np.eye(3, dtype=np.float32),
                                [-128.0, -128.0, -256.0 + 150.0])
    return vol, im_idx_to_world


def rotate_beam(beam: Beam, gantry_deg: float, couch_deg: float,
                im_idx_to_world: AffineTransform,
                ct_shape: Tuple[int, int, int],
                iso_world=(0.0, 0.0, 0.0),
                dose_idx_to_world: Optional[AffineTransform] = None,
                steps: Optional[int] = None) -> Beam:
    """Re-aim a beam at arbitrary gantry/couch angles (IEC 61217 model,
    dicom/rtplan.gantry_rotation). Rebuilds gantry_to_im_idx /
    gantry_to_dose_idx as world_to_im ∘ gantry_to_world and re-derives the
    fan z start so tracing starts just outside the volume along the new
    axis (the same corner projection rtplan.beam_from_ion_beam uses).
    Exercises the engine's general-rotation paths (the reference is
    rotation-agnostic through tex3D, kernel_wrapper.cu:130-187)."""
    from .dicom.rtplan import gantry_rotation

    rot = gantry_rotation(gantry_deg, couch_deg)
    iso = np.asarray(iso_world, np.float64)
    zd, yd, xd = ct_shape
    corners = np.array([[x, y, z] for x in (0, xd - 1) for y in (0, yd - 1)
                        for z in (0, zd - 1)], np.float64)
    m_i2w = np.asarray(im_idx_to_world.m, np.float64)
    v_i2w = np.asarray(im_idx_to_world.v, np.float64)
    world = corners @ m_i2w.T + v_i2w
    gz = (world - iso) @ rot[:, 2]
    step_len = abs(float(beam.spot_idx_to_gantry.delta[2]))
    start_z = float(gz.max()) + 2.0 * step_len
    if steps is None:
        span = start_z - float(gz.min()) + 2.0 * step_len
        steps = max(beam.steps, int(-(-span // step_len)))

    m_w2i = np.linalg.inv(m_i2w)
    gantry_to_im = np_affine(
        m_w2i @ rot, m_w2i @ (iso - v_i2w)
    )
    if dose_idx_to_world is None:
        gantry_to_dose = gantry_to_im
    else:
        m_d = np.linalg.inv(np.asarray(dose_idx_to_world.m, np.float64))
        v_d = np.asarray(dose_idx_to_world.v, np.float64)
        gantry_to_dose = np_affine(m_d @ rot, m_d @ (iso - v_d))

    sig = np.asarray(beam.spot_idx_to_gantry.delta, np.float64)
    sof = np.asarray(beam.spot_idx_to_gantry.offset, np.float64)
    spot_idx_to_gantry = np_idx(
        [float(sig[0]), float(sig[1]), -step_len],
        [float(sof[0]), float(sof[1]), start_z],
    )
    return beam._replace(
        steps=int(steps),
        spot_idx_to_gantry=spot_idx_to_gantry,
        gantry_to_im_idx=gantry_to_im,
        gantry_to_dose_idx=gantry_to_dose,
    )


def watercube_beam(tables, tracer_steps: int = 512,
                   weights: Optional[np.ndarray] = None) -> Beam:
    """The watercube plan: 33x33 spots x 20 layers, energies 118.12..172.51
    MeV, glibc-random weights in [90, 110), empirical sigma fit
    2.3 + 290/(peakDepth+15), fan spacing 3 mm starting at gantry z=128 with
    1 mm steps toward -z, 1 mm ray spacing, parallel beam (main.cu:52-99,192-197)."""
    n_layers = WATERCUBE_N_LAYERS
    sx, sy = WATERCUBE_SPOTS
    if weights is None:
        seq = glibc_rand_sequence(sx * sy * n_layers)
        weights = (90.0 + 10.0 * (seq / float(GLIBC_RAND_MAX))).astype(np.float32)
    weights = np.asarray(weights, np.float32).reshape(n_layers, sy, sx)

    e0, e1 = np.float32(118.12), np.float32(172.51)
    step = (e1 - e0) / np.float32(n_layers - 1)
    energies = (e0 + step * np.arange(n_layers, dtype=np.float32)).astype(np.float32)
    peaks = np.interp(energies, tables.energies, tables.peak_depths).astype(np.float32)
    sig = (2.3 + 290.0 / (peaks + 15.0)).astype(np.float32)
    spot_sigmas = np.stack([sig, sig], axis=1)

    world_to_im = np_affine(np.eye(3, dtype=np.float32), [128.0, 128.0, 106.0])
    fan_idx_to_fan = np_idx([3.0, 3.0, -1.0], [-48.0, -48.0, 128.0])
    inf = float("inf")
    return Beam(
        spot_weights=weights,
        energies=energies,
        spot_sigmas=spot_sigmas,
        ray_spacing=(1.0, 1.0),
        steps=tracer_steps,
        source_dist=(inf, inf),
        spot_idx_to_gantry=fan_idx_to_fan,
        gantry_to_im_idx=world_to_im,      # gantry == world for the watercube
        gantry_to_dose_idx=world_to_im,
    )
