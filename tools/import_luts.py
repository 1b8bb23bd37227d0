#!/usr/bin/env python
"""Convert a RayTraceDicom-format LUT text directory into the repo's
consolidated binary archive data/physics_tables.npz."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from raytracedicom_tpu.physics.tables import DEFAULT_NPZ, save_npz  # noqa: E402

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--lut_dir", default=None)
    p.add_argument("--out", default=DEFAULT_NPZ)
    a = p.parse_args()
    save_npz(a.out, a.lut_dir)
    print("wrote", a.out)
