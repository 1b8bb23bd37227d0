import numpy as np

from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu import plan


def test_glibc_rand_known_values():
    # First outputs of glibc rand() with default seed 1 (well-known sequence).
    seq = plan.glibc_rand_sequence(5)
    assert list(seq) == [1804289383, 846930886, 1681692777, 1714636915, 1957747793]


def test_watercube_geometry_matches_reference_dims():
    tables = load_physics_tables(water_cube=True)
    beam = plan.watercube_beam(tables)
    grid = plan.compute_ray_grid(beam)
    # 33x33 spots at 3 mm + 3*sigma margin, 1 mm rays, tile-rounded
    assert grid.ray_dims == (128, 128)
    assert grid.ray_res == (1.0, 1.0, -1.0)
    assert grid.ray_offset[2] == 128.0
    # grid must be symmetric around gantry origin and cover all spots
    assert grid.ray_offset[0] <= -48.0
    assert grid.ray_offset[0] + (grid.ray_dims[0] - 1) * grid.ray_res[0] >= 48.0


def test_watercube_beam_properties():
    tables = load_physics_tables(water_cube=True)
    beam = plan.watercube_beam(tables)
    assert beam.spot_weights.shape == (20, 33, 33)
    assert beam.spot_weights.min() >= 90.0
    assert beam.spot_weights.max() < 110.0
    assert beam.energies[0] == np.float32(118.12)
    assert abs(beam.energies[-1] - 172.51) < 1e-4
    # empirical sigma fit decreases with energy (deeper peak -> smaller sigma)
    assert np.all(np.diff(beam.spot_sigmas[:, 0]) < 0)
