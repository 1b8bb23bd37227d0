import numpy as np

from raytracedicom_tpu.physics.tables import load_physics_tables, resolve_lut_dir


def test_load_base_tables():
    t = load_physics_tables()
    assert t.cidd.shape == (147, 1024)
    assert t.energies.shape == (147,)
    assert np.all(np.diff(t.energies) > 0)
    assert np.all(np.diff(t.peak_depths) > 0)
    assert t.density.shape[0] == 3072
    assert t.sp.shape[0] == 3072
    assert t.rrl.shape[0] == 3072
    # cumulative IDD must be nondecreasing along depth samples
    assert np.all(np.diff(t.cidd, axis=1) >= -1e-4)


def test_water_and_nuclear_variants():
    base = load_physics_tables()
    water = load_physics_tables(water_cube=True)
    assert not np.allclose(base.rrl, water.rrl)
    for mode in ("soukup", "fluka", "gauss_fit"):
        t = load_physics_tables(nuclear=mode)
        assert t.nuclear is not None
        assert t.nuclear.weight.shape == t.cidd.shape
        # halo fraction stays well below 1 (slightly negative fit values occur)
        assert t.nuclear.weight.min() > -0.05
        assert t.nuclear.weight.max() < 0.5
        assert np.all(t.nuclear.sq_sigma > 0)


def test_npz_matches_text():
    txt = load_physics_tables(resolve_lut_dir())
    npz = load_physics_tables()
    np.testing.assert_array_equal(txt.cidd, npz.cidd)
    np.testing.assert_array_equal(txt.density, npz.density)
    assert txt.sp_scale == npz.sp_scale
