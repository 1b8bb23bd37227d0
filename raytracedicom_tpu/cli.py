"""Command-line driver — the reference's main.cu + config.cpp equivalent.

Flags mirror the reference CLI (config.cpp:9-64): --ct_dir, --rtplan,
--beams, --output_directory, --config_file; --gpu_id is accepted for parity
(the reference parses and ignores it too, SURVEY.md §2.4). Without --ct_dir
the watercube phantom + plan is used (the WATER_CUBE_TEST compile-time
branch, main.cu:39-99). Output is output_directory/dose.dat, raw float32,
plus the printed max (main.cu:211-216).

Improvements over the reference driver: the parsed RT plan actually drives
the engine (the reference hard-codes BeamSettings, main.cu:185-197), and
multiple --beams fields are summed instead of throwing (main.cu:117-120).
"""
from __future__ import annotations

import argparse
import configparser
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracedicom_tpu",
        description="TPU-native proton pencil-beam dose engine",
        allow_abbrev=False,
    )
    p.add_argument("--gpu_id", type=int, default=0,
                   help="accepted for reference-CLI parity; device selection "
                        "is controlled by JAX")
    p.add_argument("--ct_dir", type=str, default=None,
                   help="directory with the DICOM CT series (default: watercube)")
    p.add_argument("--rtplan", type=str, default=None,
                   help="RT ion plan DICOM file")
    p.add_argument("--beams", type=str, nargs="*", default=None,
                   help="beam names to compute (default: all in the plan)")
    p.add_argument("--output_directory", type=str, required=False, default=".",
                   help="where dose.dat is written")
    p.add_argument("--config_file", type=str, default=None,
                   help="ini file with key=value defaults for these flags")
    p.add_argument("--nuclear", choices=["soukup", "fluka", "gauss_fit"],
                   default=None, help="nuclear-halo correction mode")
    p.add_argument("--dose_to_physical", action="store_true",
                   help="report dose to medium instead of dose to water")
    p.add_argument("--no_nozzle", action="store_true",
                   help="disable the nozzle air-scatter model")
    p.add_argument("--steps", type=int, default=512, help="tracer depth steps")
    p.add_argument("--verbose", action="store_true",
                   help="print per-beam/per-layer diagnostics (the reference's "
                        "FINE_GRAINED stdout echo)")
    return p


def parse_args(argv=None):
    parser = build_parser()
    # Strict parsing: unknown/misspelled flags are an error, matching the
    # reference's CLI11 behavior (config.cpp:29-45). A silently dropped
    # --nuclaer=fluka would run the wrong physics.
    args = parser.parse_args(argv)
    if args.config_file:
        cp = configparser.ConfigParser()
        with open(args.config_file) as f:
            content = f.read()
        if not content.lstrip().startswith("["):
            content = "[DEFAULT]\n" + content
        cp.read_string(content)
        defaults = dict(cp["DEFAULT"])
        for key, val in defaults.items():
            if getattr(args, key, None) in (None, parser.get_default(key)):
                setattr(args, key, val)
    return args


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax.numpy as jnp

    from .config import EngineConfig
    from .engine import DoseEngine
    from .physics.tables import load_physics_tables
    from . import plan as planmod

    cfg = EngineConfig(
        dose_to_water=not args.dose_to_physical,
        nozzle=not args.no_nozzle,
        nuclear=args.nuclear,
    )
    water_cube = args.ct_dir is None
    tables = load_physics_tables(water_cube=water_cube, nuclear=args.nuclear)

    if water_cube:
        print("Using the watercube phantom (no --ct_dir given); note the "
              "water-adjusted radiation length table is in effect.")
        ct, _ = planmod.watercube_ct()
        beams = [planmod.watercube_beam(tables, tracer_steps=args.steps)]
    else:
        from .dicom import beam_from_ion_beam, read_ct_series, read_ion_plan
        ct, im_idx_to_world = read_ct_series(args.ct_dir)
        if args.rtplan is None:
            print("error: --rtplan is required with --ct_dir", file=sys.stderr)
            return 2
        ion_beams = read_ion_plan(args.rtplan)
        if args.beams:
            ion_beams = [b for b in ion_beams if b.name in set(args.beams)]
            if not ion_beams:
                print(f"error: no beams named {args.beams} in plan", file=sys.stderr)
                return 2
        beams = [
            beam_from_ion_beam(b, im_idx_to_world, tables, ct_shape=ct.shape)
            for b in ion_beams
        ]
        print(f"Computing {len(beams)} beam(s): "
              f"{[b.name or f'beam{i}' for i, b in enumerate(ion_beams)]}")

    eng = DoseEngine(tables, cfg)
    if args.verbose:
        for bi, b in enumerate(beams):
            print(f"--- beam {bi} ---")
            eng.describe_beam(b, ct.shape, stream=sys.stdout)
    t0 = time.time()
    dose = eng.compute_dose(jnp.asarray(ct), beams)
    dose_np = np.asarray(dose)
    print(f"Dose computed in {time.time() - t0:.2f} s "
          f"({ct.shape} grid, {len(beams)} beam(s))")

    os.makedirs(args.output_directory, exist_ok=True)
    out_path = os.path.join(args.output_directory, "dose.dat")
    dose_np.astype("<f4").tofile(out_path)
    print(f"Wrote {out_path}")
    print(f"Max dose: {dose_np.max()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
