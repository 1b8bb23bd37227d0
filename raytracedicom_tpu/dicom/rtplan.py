"""RT Ion Plan ingest — native replacement for the rti:: submodule.

The reference delegates plan parsing to the topasmc/dicom-interface submodule
(main.cu:16-18,102-182): it extracts per-beam gantry/couch angles, isocenter,
and the per-control-point spot sequences (energy, positions, meterset
weights, spot size) — then, notably, never wires them into the engine
(BeamSettings is hard-coded, main.cu:185-197, and multi-beam throws,
main.cu:117-120). This module completes that path: parsed plans become real
``plan.Beam`` objects with gantry-angle transforms.
"""
from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Tuple

import numpy as np

from ..geometry.transforms import AffineTransform, np_affine
from . import parser

TAG_ION_BEAM_SEQ = (0x300A, 0x03A2)
TAG_BEAM_SEQ = (0x300A, 0x00B0)
TAG_CTRL_SEQ = (0x300A, 0x03A8)
TAG_ENERGY = (0x300A, 0x0114)
TAG_GANTRY = (0x300A, 0x011E)
TAG_COUCH = (0x300A, 0x0122)
TAG_ISOCENTER = (0x300A, 0x012C)
TAG_N_SPOTS = (0x300A, 0x0392)
TAG_SPOT_POS = (0x300A, 0x0394)
TAG_SPOT_WEIGHTS = (0x300A, 0x0396)
TAG_SPOT_SIZE = (0x300A, 0x0398)
TAG_BEAM_NAME = (0x300A, 0x00C2)
TAG_VSAD = (0x300A, 0x030A)       # VirtualSourceAxisDistances (x, y) mm


@dataclasses.dataclass
class IonLayer:
    energy: float                 # MeV (nominal)
    positions: np.ndarray         # (nSpots, 2) mm in the beam frame
    weights: np.ndarray           # (nSpots,) meterset weights
    spot_size: Optional[Tuple[float, float]]  # FWHM (x, y) mm, if present


@dataclasses.dataclass
class IonBeam:
    name: str
    gantry_angle_deg: float
    couch_angle_deg: float
    isocenter: np.ndarray         # (3,) mm patient coords
    layers: List[IonLayer]
    # per-axis virtual source-axis distances (x, y) mm; None = not in plan
    # (reference: sourceDist plumbing, float3_from_fan_transform.cu:37-42)
    source_distances: Optional[Tuple[float, float]] = None


FWHM_TO_SIGMA = 1.0 / (2.0 * math.sqrt(2.0 * math.log(2.0)))


def read_ion_plan(path: str) -> List[IonBeam]:
    ds = parser.read_file(path)
    beam_seq = ds.get(TAG_ION_BEAM_SEQ) or ds.get(TAG_BEAM_SEQ)
    if not beam_seq:
        raise ValueError(f"{path} contains no IonBeamSequence")
    beams = []
    for b in beam_seq:
        ctrl = b.get(TAG_CTRL_SEQ) or []
        gantry = couch = 0.0
        iso = np.zeros(3, np.float64)
        layers: List[IonLayer] = []
        for cp in ctrl:
            if TAG_GANTRY in cp:
                gantry = float(cp.first(TAG_GANTRY))
            if TAG_COUCH in cp:
                couch = float(cp.first(TAG_COUCH))
            if TAG_ISOCENTER in cp:
                iso = np.asarray(cp.floats(TAG_ISOCENTER), np.float64)
            pos = cp.floats(TAG_SPOT_POS)
            wts = cp.floats(TAG_SPOT_WEIGHTS)
            if pos is None or wts is None:
                continue
            wts = np.asarray(wts, np.float32)
            if float(np.sum(wts)) <= 0.0:
                continue          # paired zero-weight control point
            size = cp.floats(TAG_SPOT_SIZE)
            layers.append(IonLayer(
                energy=float(cp.first(TAG_ENERGY)),
                positions=np.asarray(pos, np.float32).reshape(-1, 2),
                weights=wts,
                spot_size=None if size is None else (float(size[0]), float(size[1])),
            ))
        vsad = b.floats(TAG_VSAD)
        beams.append(IonBeam(
            name=str(b.first(TAG_BEAM_NAME, "")),
            gantry_angle_deg=gantry,
            couch_angle_deg=couch,
            isocenter=iso,
            layers=layers,
            source_distances=None if vsad is None
            else (float(vsad[0]), float(vsad[1])),
        ))
    return beams


def gantry_rotation(gantry_deg: float, couch_deg: float = 0.0) -> np.ndarray:
    """IEC 61217 beam->patient rotation: gantry rotates about the patient
    y axis, couch about the patient... (simplified fixed-patient model:
    couch about z). The beam (gantry) frame has +z pointing from isocenter
    toward the source."""
    g = math.radians(gantry_deg)
    c = math.radians(couch_deg)
    rot_g = np.array([
        [math.cos(g), 0.0, math.sin(g)],
        [0.0, 1.0, 0.0],
        [-math.sin(g), 0.0, math.cos(g)],
    ], np.float64)
    rot_c = np.array([
        [math.cos(c), -math.sin(c), 0.0],
        [math.sin(c), math.cos(c), 0.0],
        [0.0, 0.0, 1.0],
    ], np.float64)
    return rot_c @ rot_g


def beam_from_ion_beam(
    ion: IonBeam,
    im_idx_to_world: AffineTransform,
    tables,
    *,
    ray_spacing: Tuple[float, float] = (1.0, 1.0),
    steps: Optional[int] = None,
    source_dist: Optional[Tuple[float, float]] = None,
    trace_start_z: Optional[float] = None,
    step_len: float = 1.0,
    dose_idx_to_world: Optional[AffineTransform] = None,
    ct_shape: Optional[Tuple[int, int, int]] = None,
):
    """Build a plan.Beam from a parsed ion beam.

    Spots are resampled onto the regular grid spanned by the unique x/y
    positions (the reference's BeamSettings assumes a regular spot grid,
    beam_settings.h:24). Energies become layers sorted ascending.

    ``source_dist``: per-axis virtual source distances in mm. Default (None)
    uses the plan's VirtualSourceAxisDistances (0x300A,0x030A) when present —
    producing the divergent-fan geometry of the reference's sourceDist
    plumbing (float3_from_fan_transform.cu:37-42) — else a parallel beam.
    Spot positions (and the derived fan grid) are defined at the isocenter
    plane (gantry z=0), which the divergence factor ``1 - z/sourceDist``
    leaves fixed.

    When ``trace_start_z``/``steps`` are omitted they are derived from the
    CT extent (``ct_shape`` (Z, Y, X) required): tracing starts one step
    outside the volume along the beam axis and covers the full depth.
    """
    from ..plan import Beam
    from ..geometry.transforms import np_idx

    if source_dist is None:
        source_dist = ion.source_distances or (float("inf"), float("inf"))

    rot_early = gantry_rotation(ion.gantry_angle_deg, ion.couch_angle_deg)
    if trace_start_z is None or steps is None:
        if ct_shape is None:
            raise ValueError("need ct_shape to derive the trace window "
                             "(or pass trace_start_z and steps explicitly)")
        zd, yd, xd = ct_shape
        corners = np.array([[x, y, z] for x in (0, xd - 1)
                            for y in (0, yd - 1) for z in (0, zd - 1)], np.float64)
        world = corners @ np.asarray(im_idx_to_world.m, np.float64).T \
            + np.asarray(im_idx_to_world.v, np.float64)
        gz = (world - ion.isocenter) @ rot_early[:, 2]
        if trace_start_z is None:
            trace_start_z = float(gz.max()) + 2.0 * step_len
        if steps is None:
            span = trace_start_z - float(gz.min()) + 2.0 * step_len
            steps = int(-(-span // step_len))

    xs = np.unique(np.concatenate([l.positions[:, 0] for l in ion.layers]))
    ys = np.unique(np.concatenate([l.positions[:, 1] for l in ion.layers]))
    dx = float(np.min(np.diff(xs))) if len(xs) > 1 else 1.0
    dy = float(np.min(np.diff(ys))) if len(ys) > 1 else 1.0
    nx = int(round((xs[-1] - xs[0]) / dx)) + 1 if len(xs) > 1 else 1
    ny = int(round((ys[-1] - ys[0]) / dy)) + 1 if len(ys) > 1 else 1

    layers = sorted(ion.layers, key=lambda l: l.energy)
    weights = np.zeros((len(layers), ny, nx), np.float32)
    energies = np.zeros(len(layers), np.float32)
    sigmas = np.zeros((len(layers), 2), np.float32)
    for li, layer in enumerate(layers):
        energies[li] = layer.energy
        for p, w in zip(layer.positions, layer.weights):
            ix = int(round((p[0] - xs[0]) / dx))
            iy = int(round((p[1] - ys[0]) / dy))
            weights[li, iy, ix] += w
        if layer.spot_size is not None:
            sigmas[li] = (layer.spot_size[0] * FWHM_TO_SIGMA,
                          layer.spot_size[1] * FWHM_TO_SIGMA)
        else:
            peak = float(np.interp(layer.energy, tables.energies, tables.peak_depths))
            s = 2.3 + 290.0 / (peak + 15.0)     # the reference's empirical fit (main.cu:93)
            sigmas[li] = (s, s)

    rot = gantry_rotation(ion.gantry_angle_deg, ion.couch_angle_deg)
    # world -> gantry: translate isocenter to origin, rotate patient->beam
    world_to_gantry = np_affine(rot.T, -(rot.T @ ion.isocenter))
    m_w2i = np.linalg.inv(np.asarray(im_idx_to_world.m, np.float64))
    world_to_im = np_affine(m_w2i, -(m_w2i @ np.asarray(im_idx_to_world.v, np.float64)))
    # gantry -> image index = world_to_im ∘ gantry_to_world
    g2w_m = rot
    g2w_v = ion.isocenter
    gantry_to_im = np_affine(
        np.asarray(world_to_im.m) @ g2w_m,
        np.asarray(world_to_im.m) @ g2w_v + np.asarray(world_to_im.v),
    )
    if dose_idx_to_world is None:
        gantry_to_dose = gantry_to_im
    else:
        m_d = np.linalg.inv(np.asarray(dose_idx_to_world.m, np.float64))
        w2d = np_affine(m_d, -(m_d @ np.asarray(dose_idx_to_world.v, np.float64)))
        gantry_to_dose = np_affine(
            np.asarray(w2d.m) @ g2w_m,
            np.asarray(w2d.m) @ g2w_v + np.asarray(w2d.v),
        )

    spot_idx_to_gantry = np_idx(
        [dx, dy, -step_len], [float(xs[0]), float(ys[0]), trace_start_z]
    )
    return Beam(
        spot_weights=weights,
        energies=energies,
        spot_sigmas=sigmas,
        ray_spacing=ray_spacing,
        steps=steps,
        source_dist=source_dist,
        spot_idx_to_gantry=spot_idx_to_gantry,
        gantry_to_im_idx=gantry_to_im,
        gantry_to_dose_idx=gantry_to_dose,
    )
