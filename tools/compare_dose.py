#!/usr/bin/env python
"""Compare two dose grids (e.g. ours vs a reference CUDA run's dose.dat):
allclose statistics plus the clinical gamma-index pass rate.

Usage: compare_dose.py A.dat B.dat --shape 256 256 256 [--dta 3 --dd 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def gamma_pass_rate(ref, test, spacing_mm=1.0, dd_percent=3.0, dta_mm=3.0,
                    cutoff_frac=0.1):
    """Global-normalization gamma analysis (Low et al. 1998), brute force
    over a (2r+1)^3 search window. Evaluated at voxels with ref dose above
    ``cutoff_frac`` of the max."""
    ref = np.asarray(ref, np.float64)
    test = np.asarray(test, np.float64)
    dmax = ref.max()
    dd = dd_percent / 100.0 * dmax
    r = int(np.ceil(dta_mm / spacing_mm))
    eval_mask = ref > cutoff_frac * dmax
    best = np.full(ref.shape, np.inf)
    for dz in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                dist2 = (dz * dz + dy * dy + dx * dx) * spacing_mm ** 2
                if dist2 > dta_mm ** 2 + 1e-9:
                    continue
                shifted = np.roll(test, (dz, dy, dx), axis=(0, 1, 2))
                g2 = (shifted - ref) ** 2 / dd ** 2 + dist2 / dta_mm ** 2
                np.minimum(best, g2, out=best)
    gamma = np.sqrt(best[eval_mask])
    return float((gamma <= 1.0).mean()), gamma


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref")
    ap.add_argument("test")
    ap.add_argument("--shape", type=int, nargs=3, required=True)
    ap.add_argument("--spacing", type=float, default=1.0)
    ap.add_argument("--dd", type=float, default=3.0, help="dose diff %%")
    ap.add_argument("--dta", type=float, default=3.0, help="distance-to-agreement mm")
    args = ap.parse_args()

    shape = tuple(args.shape)
    a = np.fromfile(args.ref, "<f4").reshape(shape)
    b = np.fromfile(args.test, "<f4").reshape(shape)
    scale = a.max()
    diff = np.abs(a - b)
    print(f"max |diff|: {diff.max():.4g} ({100 * diff.max() / scale:.3f}% of max)")
    print(f"mean |diff| over nonzero: {diff[a > 0].mean():.4g}")
    rate, gamma = gamma_pass_rate(a, b, args.spacing, args.dd, args.dta)
    print(f"gamma {args.dd:g}%/{args.dta:g}mm pass rate: {100 * rate:.2f}% "
          f"(median gamma {np.median(gamma):.3f})")


if __name__ == "__main__":
    main()
