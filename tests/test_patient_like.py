"""BASELINE config 3: patient-like heterogeneous CT with the H&N stopping
power LUT and Schneider-2000 density conversion (the non-watercube table set,
energy_reader.cpp:68-76 — radiation_length.txt instead of the water-adjusted
variant)."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import DoseEngine
from raytracedicom_tpu.physics.tables import load_physics_tables
from tests.test_engine import _mini_beam


@pytest.fixture(scope="module")
def patient_tables():
    return load_physics_tables(water_cube=False)


def test_hn_tables_differ_from_watercube(patient_tables):
    wc = load_physics_tables(water_cube=True)
    assert not np.allclose(patient_tables.rrl, wc.rrl)
    np.testing.assert_allclose(patient_tables.cidd, wc.cidd)


def test_heterogeneous_ct_dose(patient_tables):
    """Water slab with a lung-like low-density insert and a bone-like slab:
    the Bragg peak must shift deeper behind lung (less WEPL) and shallower
    behind bone (more WEPL)."""
    tables = patient_tables
    beam = _mini_beam(tables)
    base = np.full((72, 72, 72), 1000.0, np.float32)

    ct_lung = base.copy()
    ct_lung[52:62, 30:43, 30:43] = 300.0      # HU+1000=300 ~ lung density
    ct_bone = base.copy()
    ct_bone[52:62, 30:43, 30:43] = 2000.0     # HU+1000=2000 ~ bone

    eng = DoseEngine(tables, EngineConfig())
    d_w = np.asarray(eng.compute_dose(jnp.asarray(base), [beam]))
    d_l = np.asarray(eng.compute_dose(jnp.asarray(ct_lung), [beam]))
    d_b = np.asarray(eng.compute_dose(jnp.asarray(ct_bone), [beam]))

    for d in (d_w, d_l, d_b):
        assert np.isfinite(d).all() and d.max() > 0

    # central-axis peaks; beam enters at high k moving toward low k
    k_w = int(np.argmax(d_w[:, 36, 36]))
    k_l = int(np.argmax(d_l[:, 36, 36]))
    k_b = int(np.argmax(d_b[:, 36, 36]))
    assert k_l < k_w, (k_l, k_w)    # lung: less stopping -> deeper (lower k)
    assert k_b > k_w, (k_b, k_w)    # bone: more stopping -> shallower
