"""CT series ingest — native replacement for the reference's ITK reader.

Reproduces itk_reader (dicom_reader.cpp:15-129): reads every CT slice in a
directory, sorts by position along the slice normal, applies the rescale
slope/intercept, adds HUOFFSET=1000 (dicom_reader.cpp:24,104), and returns
the (Z, Y, X) float32 volume plus the index->world affine built from
direction * diag(spacing) and the first-slice origin (dicom_reader.cpp:117-128).
"""
from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from ..geometry.transforms import AffineTransform, np_affine
from . import parser

HU_OFFSET = 1000.0

TAG_MODALITY = (0x0008, 0x0060)
TAG_POSITION = (0x0020, 0x0032)
TAG_ORIENTATION = (0x0020, 0x0037)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_SPACING = (0x0028, 0x0030)
TAG_BITS_ALLOC = (0x0028, 0x0100)
TAG_REPR = (0x0028, 0x0103)
TAG_INTERCEPT = (0x0028, 0x1052)
TAG_SLOPE = (0x0028, 0x1053)
TAG_PIXELS = (0x7FE0, 0x0010)


def _slice_pixels(ds: parser.Dataset) -> np.ndarray:
    rows = int(ds.first(TAG_ROWS))
    cols = int(ds.first(TAG_COLS))
    bits = int(ds.first(TAG_BITS_ALLOC, 16))
    signed = int(ds.first(TAG_REPR, 1))
    raw = ds[TAG_PIXELS]
    if isinstance(raw, list):
        raw = bytes(raw)
    if bits == 16:
        dtype = np.int16 if signed else np.uint16
    elif bits == 8:
        dtype = np.int8 if signed else np.uint8
    else:
        raise ValueError(f"unsupported BitsAllocated {bits}")
    arr = np.frombuffer(raw, dtype=dtype, count=rows * cols).reshape(rows, cols)
    slope = float(ds.first(TAG_SLOPE, 1.0))
    intercept = float(ds.first(TAG_INTERCEPT, 0.0))
    return arr.astype(np.float32) * slope + intercept


def read_ct_series(directory: str) -> Tuple[np.ndarray, AffineTransform]:
    """Returns (volume[Z, Y, X] in HU+1000, imIdxToWorld affine).

    The affine maps (x=col, y=row, z=slice) indices to patient mm, matching
    the reference's Float3AffineTransform(imDir*imSpacing, imOrigin).
    Uses the native C++ reader (native/fastdicom.cpp) when built; falls back
    to the pure-Python parser."""
    native_result = _read_ct_series_native(directory)
    if native_result is not None:
        return native_result
    return _read_ct_series_python(directory)


def _read_ct_series_python(directory: str) -> Tuple[np.ndarray, AffineTransform]:
    """Pure-Python path (no native library) — same contract as
    read_ct_series; kept callable directly so tests can compare it against
    the native reader."""
    slices: List[parser.Dataset] = []
    for path in parser.list_dicom_files(directory):
        try:
            ds = parser.read_file(path)
        except ValueError:
            continue
        if ds.first(TAG_MODALITY) == "CT" and TAG_PIXELS in ds:
            slices.append(ds)
    if not slices:
        raise FileNotFoundError(f"no CT slices found in {directory}")

    orient = np.asarray(slices[0].floats(TAG_ORIENTATION), np.float64)
    # first triplet: direction along increasing COLUMN index (the x axis);
    # second: along increasing ROW index (the y axis)
    x_dir, y_dir = orient[:3], orient[3:]
    normal = np.cross(x_dir, y_dir)
    slices.sort(key=lambda s: float(np.dot(np.asarray(s.floats(TAG_POSITION)), normal)))

    first = slices[0]
    spacing_rc = first.floats(TAG_SPACING)        # (row spacing, col spacing)
    origin = np.asarray(first.floats(TAG_POSITION), np.float64)
    if len(slices) > 1:
        p1 = np.asarray(slices[1].floats(TAG_POSITION), np.float64)
        z_spacing = float(np.dot(p1 - origin, normal))
    else:
        z_spacing = float(first.first((0x0018, 0x0050), 1.0))

    vol = np.stack([_slice_pixels(s) for s in slices], axis=0) + HU_OFFSET

    # direction matrix columns: (x, y, z) index axes in world space
    direction = np.stack([x_dir, y_dir, normal], axis=1)
    spacing = np.diag([float(spacing_rc[1]), float(spacing_rc[0]), z_spacing])
    return vol.astype(np.float32), np_affine(direction @ spacing, origin)


def _read_ct_series_native(directory: str):
    """Native C++ path: probe + decode every slice through fastdicom.
    Returns None (silent fallback) when the library is unavailable or any
    slice fails to parse natively."""
    from . import native

    if not native.available():
        return None
    entries = []
    for path in parser.list_dicom_files(directory):
        meta = native.probe(path)
        if meta is not None and meta["is_ct"]:
            entries.append((path, meta))
    if not entries:
        return None

    orient = entries[0][1]["orientation"]
    x_dir, y_dir = orient[:3], orient[3:]
    normal = np.cross(x_dir, y_dir)
    entries.sort(key=lambda e: float(np.dot(e[1]["position"], normal)))

    first = entries[0][1]
    rows, cols = first["rows"], first["cols"]
    origin = entries[0][1]["position"]
    if len(entries) > 1:
        z_spacing = float(np.dot(entries[1][1]["position"] - origin, normal))
    else:
        z_spacing = 1.0

    vol = np.empty((len(entries), rows, cols), np.float32)
    for k, (path, meta) in enumerate(entries):
        if meta["rows"] != rows or meta["cols"] != cols:
            return None
        if not native.decode_into(path, vol[k], HU_OFFSET):
            return None

    direction = np.stack([x_dir, y_dir, normal], axis=1)
    spacing = np.diag([first["pixel_spacing"][1], first["pixel_spacing"][0],
                       z_spacing])
    return vol, np_affine(direction @ spacing, origin)
