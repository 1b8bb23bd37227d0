"""Native DICOM reader/writer round-trips + plan->engine integration."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.dicom import (
    beam_from_ion_beam, read_ct_series, read_ion_plan,
    write_ct_series, write_ion_plan,
)


def test_ct_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    vol_hu = rng.randint(-1000, 2000, size=(5, 16, 12)).astype(np.float32)
    d = str(tmp_path / "ct")
    write_ct_series(d, vol_hu, origin=(-5.5, -7.5, -2.0), spacing=(1.0, 1.5, 2.0))
    vol, affine = read_ct_series(d)
    np.testing.assert_allclose(vol, vol_hu + 1000.0)
    # index->world: voxel (x, y, z) -> origin + (x*sx, y*sy, z*sz)
    np.testing.assert_allclose(np.asarray(affine.v), [-5.5, -7.5, -2.0])
    np.testing.assert_allclose(np.asarray(affine.m),
                               np.diag([1.0, 1.5, 2.0]), atol=1e-6)


def test_ion_plan_roundtrip(tmp_path):
    positions = np.array([[-6, -6], [0, -6], [6, -6], [-6, 0], [0, 0],
                          [6, 0], [-6, 6], [0, 6], [6, 6]], np.float32)
    layers = [
        dict(energy=118.12, positions=positions,
             weights=np.full(9, 100.0, np.float32), spot_size=(8.0, 8.0)),
        dict(energy=130.0, positions=positions,
             weights=np.linspace(90, 110, 9).astype(np.float32),
             spot_size=(7.0, 7.0)),
    ]
    p = str(tmp_path / "rtplan.dcm")
    write_ion_plan(p, layers, gantry_deg=90.0, isocenter=(1.0, 2.0, 3.0),
                   beam_name="G090")
    beams = read_ion_plan(p)
    assert len(beams) == 1
    b = beams[0]
    assert b.name == "G090"
    assert b.gantry_angle_deg == 90.0
    np.testing.assert_allclose(b.isocenter, [1.0, 2.0, 3.0])
    assert len(b.layers) == 2
    np.testing.assert_allclose(b.layers[0].positions, positions)
    np.testing.assert_allclose(b.layers[1].weights,
                               np.linspace(90, 110, 9), rtol=1e-6)
    assert b.layers[0].spot_size == (8.0, 8.0)


def test_plan_to_engine_dose(tmp_path):
    """Full DICOM flow: synthesize CT + plan, read back, compute dose."""
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import DoseEngine
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    vol_hu = np.zeros((72, 72, 72), np.float32)   # water: HU=0 -> HU+1000=1000
    ctdir = str(tmp_path / "ct")
    write_ct_series(ctdir, vol_hu, origin=(-71.0, -71.0, -71.0),
                    spacing=(2.0, 2.0, 2.0))

    positions = np.array([[x, y] for y in (-6, 0, 6) for x in (-6, 0, 6)],
                         np.float32)
    layers = [dict(energy=118.12, positions=positions,
                   weights=np.full(9, 100.0, np.float32),
                   spot_size=(10.0, 10.0))]
    planp = str(tmp_path / "plan.dcm")
    write_ion_plan(planp, layers, gantry_deg=0.0, isocenter=(0.0, 0.0, 0.0))

    ct, affine = read_ct_series(ctdir)
    ion = read_ion_plan(planp)[0]
    beam = beam_from_ion_beam(ion, affine, tables, ray_spacing=(2.0, 2.0),
                              steps=96, trace_start_z=80.0, step_len=2.0)
    eng = DoseEngine(tables, EngineConfig())
    dose = np.asarray(eng.compute_dose(jnp.asarray(ct), [beam]))
    assert np.all(np.isfinite(dose))
    assert dose.max() > 0
    # Bragg peak depth sanity: beam along -z from the +z face (world z=+71)
    axis = dose[:, 36, 36]
    peak_world_z = int(np.argmax(axis)) * 2.0 - 71.0
    peak_depth = 71.0 - peak_world_z
    expected = float(np.interp(118.12, tables.energies, tables.peak_depths))
    assert abs(peak_depth - expected) < 12.0


def test_cli_end_to_end(tmp_path):
    """README flow: synthesize DICOM fixtures, run the CLI, check dose.dat."""
    import subprocess, sys, os
    from raytracedicom_tpu import cli

    fix = str(tmp_path / "fix")
    out = str(tmp_path / "out")
    # small fixture: 40^3 CT at 3 mm, 2 layers, 5x5 spots
    from raytracedicom_tpu.dicom import write_ct_series, write_ion_plan
    vol_hu = np.zeros((40, 40, 40), np.float32)
    write_ct_series(os.path.join(fix, "ct"), vol_hu,
                    origin=(-58.5, -58.5, -58.5), spacing=(3.0, 3.0, 3.0))
    coords = (np.arange(5) - 2.0) * 8.0
    positions = np.array([[x, y] for y in coords for x in coords], np.float32)
    layers = [dict(energy=e, positions=positions,
                   weights=np.full(25, 100.0, np.float32),
                   spot_size=(12.0, 12.0)) for e in (118.12, 125.0)]
    write_ion_plan(os.path.join(fix, "rtplan.dcm"), layers, beam_name="G000")

    rc = cli.main([
        "--ct_dir", os.path.join(fix, "ct"),
        "--rtplan", os.path.join(fix, "rtplan.dcm"),
        "--beams", "G000",
        "--output_directory", out,
    ])
    assert rc == 0
    dose = np.fromfile(os.path.join(out, "dose.dat"), "<f4").reshape(40, 40, 40)
    assert np.isfinite(dose).all() and dose.max() > 0


def test_cli_watercube_config_file(tmp_path):
    """--config_file ini parsing (config.cpp:48-51 equivalent)."""
    from raytracedicom_tpu.cli import parse_args
    ini = tmp_path / "cfg.ini"
    ini.write_text("output_directory=/tmp/somewhere\nsteps=64\n")
    args = parse_args(["--config_file", str(ini)])
    assert args.output_directory == "/tmp/somewhere"
    assert int(args.steps) == 64
    # explicit flags beat the config file
    args = parse_args(["--config_file", str(ini), "--output_directory", "/x"])
    assert args.output_directory == "/x"


def test_cli_rejects_unknown_flags():
    """Misspelled flags must error out like the reference's CLI11
    (config.cpp:29-45) — a silently dropped --nuclaer=fluka would run the
    wrong physics."""
    import pytest
    from raytracedicom_tpu.cli import parse_args
    for bad in (["--nuclaer", "fluka"], ["--dose-to-physical"],
                ["--output_dir", "/x"]):
        with pytest.raises(SystemExit) as ei:
            parse_args(bad)
        assert ei.value.code != 0


def test_native_reader_matches_python(tmp_path):
    """The C++ fastdicom path must produce the identical volume + affine as
    the pure-Python parser (skipped when the toolchain is unavailable)."""
    import os
    from raytracedicom_tpu.dicom import ct as ctmod
    from raytracedicom_tpu.dicom import native

    if not native.available():
        pytest.skip("native fastdicom library not built")

    rng = np.random.RandomState(7)
    vol_hu = rng.randint(-1000, 2500, size=(7, 24, 20)).astype(np.float32)
    d = str(tmp_path / "ct")
    write_ct_series(d, vol_hu, origin=(-11.5, -17.0, -6.0), spacing=(1.0, 1.5, 2.0))

    vol_n, aff_n = ctmod._read_ct_series_native(d)
    vol_p, aff_p = ctmod._read_ct_series_python(d)

    # native vs pure-Python: identical volume and affine
    np.testing.assert_array_equal(vol_n, vol_p)
    np.testing.assert_allclose(np.asarray(aff_n.m), np.asarray(aff_p.m),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(aff_n.v), np.asarray(aff_p.v),
                               atol=1e-9)
    # and both against the synthetic truth
    np.testing.assert_allclose(vol_n, vol_hu + 1000.0)
    np.testing.assert_allclose(np.asarray(aff_n.m), np.diag([1.0, 1.5, 2.0]),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(aff_n.v), [-11.5, -17.0, -6.0])


def test_divergent_sad_plan_roundtrip_and_dose(tmp_path):
    """A plan with finite VirtualSourceAxisDistances (0x300A,0x030A) must
    round-trip through the writer/parser and drive the divergent-fan path
    end to end (reference: sourceDist plumbing,
    float3_from_fan_transform.cu:37-42). The divergent dose field must be
    laterally wider at depth than the parallel-beam dose of the same plan."""
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import DoseEngine
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    vol_hu = np.zeros((72, 72, 72), np.float32)
    ctdir = str(tmp_path / "ct")
    write_ct_series(ctdir, vol_hu, origin=(-71.0, -71.0, -71.0),
                    spacing=(2.0, 2.0, 2.0))

    positions = np.array([[x, y] for y in (-8, 0, 8) for x in (-8, 0, 8)],
                         np.float32)
    layers = [dict(energy=118.12, positions=positions,
                   weights=np.full(9, 100.0, np.float32),
                   spot_size=(10.0, 10.0))]
    planp = str(tmp_path / "plan.dcm")
    write_ion_plan(planp, layers, gantry_deg=0.0, isocenter=(0.0, 0.0, 0.0),
                   source_distances=(900.0, 1700.0))

    ion = read_ion_plan(planp)[0]
    assert ion.source_distances == (900.0, 1700.0)

    ct, affine = read_ct_series(ctdir)
    kwargs = dict(ray_spacing=(2.0, 2.0), steps=96, trace_start_z=80.0,
                  step_len=2.0)
    beam_div = beam_from_ion_beam(ion, affine, tables, **kwargs)
    assert beam_div.source_dist == (900.0, 1700.0)
    # explicit override still wins
    beam_par = beam_from_ion_beam(
        ion, affine, tables, source_dist=(float("inf"), float("inf")),
        **kwargs)
    assert np.isinf(beam_par.source_dist).all()

    eng = DoseEngine(tables, EngineConfig())
    dose_div = np.asarray(eng.compute_dose(jnp.asarray(ct), [beam_div]))
    dose_par = np.asarray(eng.compute_dose(jnp.asarray(ct), [beam_par]))
    assert np.isfinite(dose_div).all() and dose_div.max() > 0

    # lateral second moment at the Bragg-peak slice: the fan diverges below
    # the isocenter plane (z=0 is world z=0, mid-volume), so the divergent
    # footprint is wider at depth
    k = int(np.argmax(dose_div[:, 36, 36]))
    ys = np.arange(72) - 36.0

    def lateral_var(d):
        sl = d[k]
        w = sl.sum()
        return float((sl.sum(1) * ys ** 2).sum() / w)

    assert lateral_var(dose_div) > 1.02 * lateral_var(dose_par), (
        lateral_var(dose_div), lateral_var(dose_par))
