#!/usr/bin/env python
"""Synthesize the watercube DICOM fixtures — native equivalent of the
dicom-interface submodule's generate_water_cube.py (reference README.md:33-41):
a dummy CT series (water cube) plus an RT ion plan with one G000 field."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--dim", type=int, default=64, help="cube voxels per side")
    ap.add_argument("--spacing", type=float, default=2.0, help="voxel mm")
    ap.add_argument("--layers", type=int, default=5)
    ap.add_argument("--spots", type=int, default=9, help="spots per side")
    args = ap.parse_args()

    from raytracedicom_tpu.dicom import write_ct_series, write_ion_plan
    from raytracedicom_tpu.physics.tables import load_physics_tables

    n = args.dim
    half = n * args.spacing / 2.0
    vol_hu = np.zeros((n, n, n), np.float32)          # water = 0 HU
    ct_dir = os.path.join(args.out_dir, "ct")
    write_ct_series(ct_dir, vol_hu,
                    origin=(-half + args.spacing / 2.0,) * 3,
                    spacing=(args.spacing,) * 3)

    tables = load_physics_tables(water_cube=True)
    e0, e1 = 118.12, 172.51
    energies = np.linspace(e0, e1, args.layers)
    coords = (np.arange(args.spots) - (args.spots - 1) / 2.0) * 6.0
    positions = np.array([[x, y] for y in coords for x in coords], np.float32)
    rng = np.random.RandomState(1)
    layers = []
    for e in energies:
        peak = float(np.interp(e, tables.energies, tables.peak_depths))
        sig = 2.3 + 290.0 / (peak + 15.0)
        fwhm = sig * 2.3548200450309493
        layers.append(dict(
            energy=float(e), positions=positions,
            weights=rng.uniform(90, 110, len(positions)).astype(np.float32),
            spot_size=(fwhm, fwhm),
        ))
    plan_path = os.path.join(args.out_dir, "rtplan.dcm")
    write_ion_plan(plan_path, layers, gantry_deg=0.0, beam_name="G000")
    print(f"Wrote {ct_dir} ({n}^3 CT) and {plan_path} "
          f"({args.layers} layers x {len(positions)} spots)")


if __name__ == "__main__":
    main()
