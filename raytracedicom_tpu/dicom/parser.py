"""Minimal native DICOM reader (no pydicom/GDCM in the image).

Replaces the reference's ITK/GDCM dependency (dicom_reader.cpp:15-129 reads
the CT series; the rti:: submodule reads the RTPLAN, main.cu:102-182) with a
self-contained parser for the subset of DICOM needed by the pipeline:

  * Part-10 files (128-byte preamble + 'DICM') and bare datasets;
  * implicit VR little endian (1.2.840.10008.1.2) and explicit VR little
    endian (1.2.840.10008.1.2.1) transfer syntaxes;
  * sequences with defined and undefined lengths;
  * numeric string (DS/IS), text, and binary (US/SS/FL/FD/OW/OB) values.

Compressed transfer syntaxes are rejected with a clear error.
"""
from __future__ import annotations

import os
import struct
from typing import Any, Dict, List, Optional, Tuple

# VRs whose explicit-VR encoding uses a 2-byte reserved field + 4-byte length
_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC", b"UR", b"UT", b"UN"}

_IMPLICIT = "1.2.840.10008.1.2"
_EXPLICIT_LE = "1.2.840.10008.1.2.1"

# tag -> VR for implicit-VR decoding (only the attributes the pipeline reads)
IMPLICIT_VRS = {
    (0x0008, 0x0016): "UI", (0x0008, 0x0018): "UI", (0x0008, 0x0021): "DA",
    (0x0008, 0x0060): "CS",
    (0x0020, 0x000D): "UI", (0x0020, 0x000E): "UI",
    (0x0020, 0x0013): "IS", (0x0020, 0x0032): "DS", (0x0020, 0x0037): "DS",
    (0x0028, 0x0002): "US", (0x0028, 0x0010): "US", (0x0028, 0x0011): "US",
    (0x0028, 0x0030): "DS", (0x0028, 0x0100): "US", (0x0028, 0x0101): "US",
    (0x0028, 0x0102): "US", (0x0028, 0x0103): "US",
    (0x0028, 0x1052): "DS", (0x0028, 0x1053): "DS",
    (0x0018, 0x0050): "DS",
    (0x7FE0, 0x0010): "OW",
    # RT ion plan
    (0x300A, 0x00B0): "SQ", (0x300A, 0x03A2): "SQ", (0x300A, 0x03A8): "SQ",
    (0x300A, 0x0114): "DS", (0x300A, 0x011E): "DS", (0x300A, 0x0122): "DS",
    (0x300A, 0x012C): "DS", (0x300A, 0x0392): "IS", (0x300A, 0x0394): "FL",
    (0x300A, 0x0396): "FL", (0x300A, 0x0398): "FL", (0x300A, 0x010E): "DS",
    (0x300A, 0x00C6): "CS", (0x300C, 0x0006): "IS", (0x300A, 0x00C0): "IS",
    (0x300A, 0x0110): "IS", (0x300A, 0x0112): "IS",
}

_NUMERIC_BIN = {
    "US": ("<H", 2), "SS": ("<h", 2), "UL": ("<I", 4), "SL": ("<i", 4),
    "FL": ("<f", 4), "FD": ("<d", 8),
}
_STR_VRS = {"AE", "AS", "CS", "DA", "DT", "LO", "LT", "PN", "SH", "ST",
            "TM", "UI", "UC", "UR", "UT"}


class Dataset(dict):
    """tag -> value mapping with attribute-ish helpers."""

    def value(self, tag: Tuple[int, int], default=None):
        return self.get(tag, default)

    def floats(self, tag, default=None):
        v = self.get(tag)
        if v is None:
            return default
        if isinstance(v, (int, float)):
            return [float(v)]
        if isinstance(v, list):
            return [float(x) for x in v]
        return [float(v)]

    def first(self, tag, default=None):
        v = self.get(tag)
        if v is None:
            return default
        if isinstance(v, list):
            return v[0] if v else default
        return v


def _decode_value(vr: str, raw: bytes) -> Any:
    if vr in ("DS", "IS"):
        txt = raw.decode("ascii", "replace").strip("\x00 ")
        if not txt:
            return []
        parts = [p.strip() for p in txt.split("\\") if p.strip()]
        vals = [float(p) if vr == "DS" else int(p) for p in parts]
        return vals[0] if len(vals) == 1 else vals
    if vr in _STR_VRS:
        txt = raw.decode("ascii", "replace").strip("\x00 ")
        if "\\" in txt:
            return txt.split("\\")
        return txt
    if vr in _NUMERIC_BIN:
        fmt, size = _NUMERIC_BIN[vr]
        n = len(raw) // size
        vals = [struct.unpack_from(fmt, raw, i * size)[0] for i in range(n)]
        return vals[0] if len(vals) == 1 else vals
    return raw     # OB/OW/UN: raw bytes (PixelData etc.)


class _Reader:
    def __init__(self, buf: bytes, pos: int, explicit: bool):
        self.buf = buf
        self.pos = pos
        self.explicit = explicit

    def u16(self):
        v = struct.unpack_from("<H", self.buf, self.pos)[0]
        self.pos += 2
        return v

    def u32(self):
        v = struct.unpack_from("<I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def read_element(self) -> Optional[Tuple[Tuple[int, int], Any]]:
        if self.pos + 8 > len(self.buf):
            return None
        group = self.u16()
        elem = self.u16()
        tag = (group, elem)
        if tag == (0xFFFE, 0xE00D) or tag == (0xFFFE, 0xE0DD):   # item/seq delim
            self.u32()
            return tag, None
        if tag == (0xFFFE, 0xE000):                               # item start
            length = self.u32()
            return tag, length

        if self.explicit:
            vr = self.buf[self.pos:self.pos + 2]
            self.pos += 2
            if vr in _LONG_VRS:
                self.pos += 2
                length = self.u32()
            else:
                length = self.u16()
            vr_s = vr.decode("ascii", "replace")
        else:
            length = self.u32()
            vr_s = IMPLICIT_VRS.get(tag, "UN")
            # implicit-VR sequences are recognised by undefined length or by
            # the tag dictionary
            if vr_s == "UN" and length == 0xFFFFFFFF:
                vr_s = "SQ"

        if vr_s == "SQ":
            return tag, self.read_sequence(length)
        if length == 0xFFFFFFFF:
            raise ValueError(f"undefined length on non-SQ tag {tag}")
        raw = self.buf[self.pos:self.pos + length]
        self.pos += length
        return tag, _decode_value(vr_s, raw)

    def read_sequence(self, length: int) -> List[Dataset]:
        items: List[Dataset] = []
        end = None if length == 0xFFFFFFFF else self.pos + length
        while end is None or self.pos < end:
            if self.pos + 8 > len(self.buf):
                break
            tag, val = self.read_element()
            if tag == (0xFFFE, 0xE0DD):
                break
            if tag != (0xFFFE, 0xE000):
                raise ValueError(f"expected item tag in sequence, got {tag}")
            item_len = val
            item_end = None if item_len == 0xFFFFFFFF else self.pos + item_len
            ds = Dataset()
            while item_end is None or self.pos < item_end:
                t2, v2 = self.read_element()
                if t2 == (0xFFFE, 0xE00D):
                    break
                ds[t2] = v2
            items.append(ds)
        return items

    def read_dataset(self, stop_at_group: Optional[int] = None) -> Dataset:
        ds = Dataset()
        while self.pos + 8 <= len(self.buf):
            save = self.pos
            group = struct.unpack_from("<H", self.buf, self.pos)[0]
            if stop_at_group is not None and group > stop_at_group:
                self.pos = save
                break
            tag, val = self.read_element()
            ds[tag] = val
        return ds


def read_file(path: str) -> Dataset:
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    if len(buf) > 132 and buf[128:132] == b"DICM":
        pos = 132
        # file meta group (0002) is always explicit VR LE
        meta_reader = _Reader(buf, pos, explicit=True)
        meta = meta_reader.read_dataset(stop_at_group=0x0002)
        ts = meta.get((0x0002, 0x0010), _EXPLICIT_LE)
        if isinstance(ts, list):
            ts = ts[0]
        pos = meta_reader.pos
    else:
        ts = _IMPLICIT
        meta = Dataset()
    if ts == _IMPLICIT:
        explicit = False
    elif ts == _EXPLICIT_LE:
        explicit = True
    else:
        raise ValueError(f"unsupported transfer syntax {ts!r} in {path} "
                         "(compressed DICOM is not supported)")
    ds = _Reader(buf, pos, explicit).read_dataset()
    ds.update({k: v for k, v in meta.items()})
    return ds


def list_dicom_files(directory: str) -> List[str]:
    out = []
    for name in sorted(os.listdir(directory)):
        p = os.path.join(directory, name)
        if not os.path.isfile(p):
            continue
        try:
            with open(p, "rb") as f:
                head = f.read(132)
            if head[128:132] == b"DICM" or len(head) >= 8:
                out.append(p)
        except OSError:
            continue
    return out
