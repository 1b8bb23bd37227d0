"""Spot-weight optimization loop (BASELINE config 5) + checkpoint/resume."""
import numpy as np
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import DoseEngine
from raytracedicom_tpu.optimize import optimize_spot_weights
from raytracedicom_tpu.physics.tables import load_physics_tables
from tests.test_engine import _mini_beam


@pytest.fixture(scope="module")
def env():
    tables = load_physics_tables(water_cube=True)
    beam = _mini_beam(tables)
    ct = np.full((72, 72, 72), 1000.0, np.float32)
    eng = DoseEngine(tables, EngineConfig(ray_weight_cutoff=0.0))
    target = np.asarray(eng.compute_dose(jnp.asarray(ct), [beam]))
    beam_start = beam._replace(spot_weights=beam.spot_weights * 1.4)
    return eng, ct, beam_start, target


def test_optimization_reduces_loss(env):
    eng, ct, beam, target = env
    res = optimize_spot_weights(eng, ct, [beam], target, steps=6, lr=0.3)
    assert len(res.losses) == 6
    assert res.losses[-1] < 0.5 * res.losses[0], res.losses
    # weights move toward the nominal (1/1.4 of start)
    assert res.weights[0].mean() < beam.spot_weights.mean()
    assert (res.weights[0] >= 0).all()


@pytest.mark.slow
def test_checkpoint_resume(env, tmp_path):
    eng, ct, beam, target = env
    ck = str(tmp_path / "ckpt")
    r1 = optimize_spot_weights(eng, ct, [beam], target, steps=4, lr=0.3,
                               checkpoint_dir=ck, checkpoint_every=2)
    # resume to 6 total steps: restores from step 4 and runs 2 more
    r2 = optimize_spot_weights(eng, ct, [beam], target, steps=6, lr=0.3,
                               checkpoint_dir=ck, checkpoint_every=2)
    assert len(r2.losses) == 6
    np.testing.assert_allclose(r2.losses[:4], r1.losses, rtol=1e-6)
    assert r2.losses[-1] <= r1.losses[-1]
