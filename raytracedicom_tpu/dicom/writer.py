"""Minimal DICOM writer (explicit VR little endian) for synthesizing test
fixtures — the native equivalent of the dicom-interface submodule's
``generate_water_cube.py`` flow documented in the reference README
(README.md:33-41): a dummy CT series plus an RT ion plan.
"""
from __future__ import annotations

import os
import struct
from typing import List, Sequence, Tuple

import numpy as np

_EXPLICIT_LE = "1.2.840.10008.1.2.1"
_CT_SOP = "1.2.840.10008.5.1.4.1.1.2"
_RTION_SOP = "1.2.840.10008.5.1.4.1.1.481.8"
_LONG_VRS = {"OB", "OW", "OF", "OL", "OD", "SQ", "UC", "UR", "UT", "UN"}


def _encode(vr: str, value) -> bytes:
    if vr in ("DS", "IS"):
        if not isinstance(value, (list, tuple, np.ndarray)):
            value = [value]
        txt = "\\".join(f"{v:g}" if vr == "DS" else str(int(v)) for v in value)
        raw = txt.encode()
    elif vr in ("UI", "CS", "LO", "SH", "PN", "DA", "TM"):
        raw = str(value).encode()
        if len(raw) % 2:
            raw += b"\x00"
        return raw
    elif vr == "US":
        if not isinstance(value, (list, tuple)):
            value = [value]
        raw = b"".join(struct.pack("<H", int(v)) for v in value)
    elif vr == "FL":
        arr = np.asarray(value, "<f4").ravel()
        raw = arr.tobytes()
    elif vr in ("OW", "OB"):
        raw = bytes(value)
    else:
        raise ValueError(f"unsupported VR {vr}")
    if len(raw) % 2:
        raw += b" " if vr in ("DS", "IS") else b"\x00"
    return raw


def _element(tag: Tuple[int, int], vr: str, value) -> bytes:
    if vr == "SQ":
        body = b""
        for item in value:           # item: bytes of an encoded dataset
            body += struct.pack("<HHI", 0xFFFE, 0xE000, len(item)) + item
        head = struct.pack("<HH", *tag) + b"SQ\x00\x00" + struct.pack("<I", len(body))
        return head + body
    raw = _encode(vr, value)
    if vr in _LONG_VRS:
        head = struct.pack("<HH", *tag) + vr.encode() + b"\x00\x00" + struct.pack("<I", len(raw))
    else:
        head = struct.pack("<HH", *tag) + vr.encode() + struct.pack("<H", len(raw))
    return head + raw


def _dataset(elements: Sequence[Tuple[Tuple[int, int], str, object]]) -> bytes:
    return b"".join(_element(t, vr, v) for t, vr, v in
                    sorted(elements, key=lambda e: e[0]))


def _file(path: str, sop_class: str, sop_instance: str, body: bytes):
    meta = _dataset([
        ((0x0002, 0x0002), "UI", sop_class),
        ((0x0002, 0x0003), "UI", sop_instance),
        ((0x0002, 0x0010), "UI", _EXPLICIT_LE),
    ])
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM")
        f.write(meta)
        f.write(body)


def write_ct_series(directory: str, volume_hu: np.ndarray,
                    origin=(-127.5, -127.5, -105.5), spacing=(1.0, 1.0, 1.0),
                    series_uid: str = "1.2.826.0.1.3680043.999.1"):
    """Write ``volume_hu`` (Z, Y, X) in plain HU (NOT +1000) as a CT series."""
    os.makedirs(directory, exist_ok=True)
    nz, ny, nx = volume_hu.shape
    for k in range(nz):
        pixels = np.asarray(volume_hu[k], np.int16)
        body = _dataset([
            ((0x0008, 0x0016), "UI", _CT_SOP),
            ((0x0008, 0x0018), "UI", f"{series_uid}.{k+1}"),
            ((0x0008, 0x0021), "DA", "20260101"),
            ((0x0008, 0x0060), "CS", "CT"),
            ((0x0020, 0x000D), "UI", series_uid + ".0"),
            ((0x0020, 0x000E), "UI", series_uid),
            ((0x0020, 0x0013), "IS", k + 1),
            ((0x0020, 0x0032), "DS", [origin[0], origin[1], origin[2] + k * spacing[2]]),
            ((0x0020, 0x0037), "DS", [1, 0, 0, 0, 1, 0]),
            ((0x0028, 0x0002), "US", 1),
            ((0x0028, 0x0010), "US", ny),
            ((0x0028, 0x0011), "US", nx),
            ((0x0028, 0x0030), "DS", [spacing[1], spacing[0]]),
            ((0x0028, 0x0100), "US", 16),
            ((0x0028, 0x0101), "US", 16),
            ((0x0028, 0x0102), "US", 15),
            ((0x0028, 0x0103), "US", 1),
            ((0x0028, 0x1052), "DS", 0.0),
            ((0x0028, 0x1053), "DS", 1.0),
            ((0x0018, 0x0050), "DS", spacing[2]),
            ((0x7FE0, 0x0010), "OW", pixels.tobytes()),
        ])
        _file(os.path.join(directory, f"ct_{k:04d}.dcm"),
              _CT_SOP, f"{series_uid}.{k+1}", body)


def write_ion_plan(path: str, layers, gantry_deg: float = 0.0,
                   couch_deg: float = 0.0, isocenter=(0.0, 0.0, 0.0),
                   beam_name: str = "G000",
                   plan_uid: str = "1.2.826.0.1.3680043.999.2",
                   source_distances=None):
    """``layers``: list of dicts {energy, positions (n,2), weights (n,),
    spot_size (fwhm_x, fwhm_y)}. ``source_distances``: optional (x, y) mm
    VirtualSourceAxisDistances (0x300A,0x030A) for divergent beams."""
    ctrl_items: List[bytes] = []
    for i, layer in enumerate(layers):
        elements = [
            ((0x300A, 0x0112), "IS", i),
            ((0x300A, 0x0114), "DS", layer["energy"]),
            ((0x300A, 0x0392), "IS", len(layer["weights"])),
            ((0x300A, 0x0394), "FL", np.asarray(layer["positions"], np.float32).ravel()),
            ((0x300A, 0x0396), "FL", np.asarray(layer["weights"], np.float32)),
        ]
        if "spot_size" in layer:
            elements.append(((0x300A, 0x0398), "FL",
                             np.asarray(layer["spot_size"], np.float32)))
        if i == 0:
            elements += [
                ((0x300A, 0x011E), "DS", gantry_deg),
                ((0x300A, 0x0122), "DS", couch_deg),
                ((0x300A, 0x012C), "DS", list(isocenter)),
            ]
        ctrl_items.append(_dataset(elements))
    beam_elements = [
        ((0x300A, 0x00C2), "LO", beam_name),
        ((0x300A, 0x00C6), "CS", "PROTON"),
    ]
    if source_distances is not None:
        beam_elements.append(((0x300A, 0x030A), "FL",
                              np.asarray(source_distances, np.float32)))
    beam_elements.append(((0x300A, 0x03A8), "SQ", ctrl_items))
    beam_item = _dataset(beam_elements)
    body = _dataset([
        ((0x0008, 0x0016), "UI", _RTION_SOP),
        ((0x0008, 0x0018), "UI", plan_uid),
        ((0x0008, 0x0060), "CS", "RTPLAN"),
        ((0x300A, 0x03A2), "SQ", [beam_item]),
    ])
    _file(path, _RTION_SOP, plan_uid, body)
