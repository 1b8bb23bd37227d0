"""Mesh-sharded engine tests on the 8-virtual-device CPU backend.

Validates (a) sharded dose == single-device dose (GSPMD partitioning is
numerics-preserving up to reduction order), (b) mesh-size-1 degeneracy,
(c) the batched spot-weight optimization step runs and reduces the loss
(SURVEY.md §4: multi-host testing via virtual CPU devices)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine
from raytracedicom_tpu.parallel import (
    batch_sharding, make_mesh, make_sharded_dose_fn, make_train_step,
)
from raytracedicom_tpu.physics.tables import load_physics_tables
from tests.test_engine import _mini_beam


@pytest.fixture(scope="module")
def setup():
    tables = load_physics_tables(water_cube=True)
    beam = _mini_beam(tables)
    ct = jnp.full((72, 72, 72), 1000.0, jnp.float32)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct.shape)
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    return ct, inputs, eng.table_arrays, static, cfg


@pytest.mark.parametrize("mesh_shape", [(1, 1), (2, 4), (8, 1), (1, 8)])
def test_sharded_dose_matches_single_device(setup, mesh_shape):
    ct, inputs, tabs, static, cfg = setup
    n = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:n], n_field=mesh_shape[0])

    dose0 = jnp.zeros(static.dose_shape, jnp.float32)
    ref = np.asarray(jax.jit(
        lambda *a: __import__("raytracedicom_tpu.engine", fromlist=["x"])
        .compute_beam_dose(*a, static, cfg)
    )(ct, dose0, inputs, tabs))

    fn = make_sharded_dose_fn(static, cfg, mesh)
    out = np.asarray(fn(ct, dose0, inputs, tabs))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6 * ref.max())


@pytest.mark.slow
def test_train_step_reduces_loss(setup):
    ct, inputs, tabs, static, cfg = setup
    if len(jax.devices()) < 4:
        pytest.skip("needs virtual devices")
    mesh = make_mesh(jax.devices()[:4], n_field=2)
    step, loss_and_grad = make_train_step(static, cfg, mesh)

    # target: the dose of the nominal weights; start from perturbed weights
    fn = make_sharded_dose_fn(static, cfg, mesh)
    dose0 = jnp.zeros(static.dose_shape, jnp.float32)
    target = fn(ct, dose0, inputs, tabs)

    w0 = inputs.spot_weights * 1.3
    weights_b = jnp.broadcast_to(w0[None], (4,) + w0.shape)
    weights_b = jax.device_put(weights_b, batch_sharding(mesh, weights_b.ndim))

    # calibrate lr from the first gradient so the step size is a small
    # fraction of the weight scale (dose/weight units are ~1e-8, so any
    # fixed lr would be either invisible or explosive)
    loss0, g0 = loss_and_grad(weights_b, ct, inputs.energies,
                              inputs.spot_sigmas, target, tabs)
    gmax = float(jnp.max(jnp.abs(g0)))
    assert gmax > 0, "zero gradient through the dose engine"
    lr = 0.05 * float(jnp.mean(w0)) / gmax

    losses = [float(loss0)]
    for _ in range(3):
        weights_b, loss = step(ct, weights_b, inputs.energies,
                               inputs.spot_sigmas, target, tabs, lr)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # weights should move toward the nominal (smaller) values
    assert float(jnp.mean(weights_b)) < float(jnp.mean(w0))


def _collective_shapes(hlo_text, opname):
    """All result-shape element counts of ``opname`` ops in an HLO dump."""
    import re
    out = []
    for m in re.finditer(r"= ([^=]*?) %?" + opname + r"\(", hlo_text):
        for dims in re.findall(r"\w+\[([0-9,]*)\]", m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            out.append(n)
    return out


def test_ray_sharding_hlo_has_no_slab_allgather(setup):
    """The compiled ray-sharded program must not all-gather (S, Ry, Rx)
    BEV slabs: the superposition/transfer boundary goes through the
    shard_map overlap-add, whose only communication is the dose-bbox psum
    (VERDICT r1: pure GSPMD replicated the Pallas superposition behind 170
    full-slab all-gathers)."""
    ct, inputs, tabs, static, cfg = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], n_field=1)
    fn = make_sharded_dose_fn(static, cfg, mesh)
    dose0 = jnp.zeros(static.dose_shape, jnp.float32)
    txt = fn.lower(ct, dose0, inputs, tabs).compile().as_text()

    nrx, nry = static.grid.ray_dims
    slab_elems = static.z_window * nry * nrx
    ag = _collective_shapes(txt, "all-gather")
    big = [n for n in ag if n >= slab_elems]
    assert not big, (
        f"{len(big)} all-gathers of >= slab size ({slab_elems} elems): {big}")
    # the overlap-add combine must exist: one all-reduce covering the bbox
    ar = _collective_shapes(txt, "all-reduce")
    (x0, y0, z0), (x1, y1, z1) = static.bbox_min, static.bbox_max
    bbox_elems = (z1 - z0 + 1) * (y1 - y0 + 1) * (x1 - x0 + 1)
    assert any(n >= bbox_elems for n in ar), (ar, bbox_elems)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8)])
def test_sharded_dose_matches_single_device_heterogeneous(setup, mesh_shape):
    """Sharded == unsharded on a heterogeneous CT: the general (per-source)
    superposition branch runs under shard_map with per-band radii sliced
    from the GLOBAL band table — a wrong slice offset or a per-shard radius
    recomputation would break this exactly here."""
    _, inputs, tabs, static, cfg = setup
    n = mesh_shape[0] * mesh_shape[1]
    if len(jax.devices()) < n:
        pytest.skip("needs 8 virtual devices")
    ct = np.full((72, 72, 72), 1000.0, np.float32)
    ct[40:60, 20:40, 20:40] = 300.0      # lung insert in the beam path
    ct[30:40, 36:50, 30:44] = 1800.0     # bone slab
    ct = jnp.asarray(ct)
    mesh = make_mesh(jax.devices()[:n], n_field=mesh_shape[0])

    dose0 = jnp.zeros(static.dose_shape, jnp.float32)
    ref = np.asarray(jax.jit(
        lambda *a: __import__("raytracedicom_tpu.engine", fromlist=["x"])
        .compute_beam_dose(*a, static, cfg)
    )(ct, dose0, inputs, tabs))

    fn = make_sharded_dose_fn(static, cfg, mesh)
    out = np.asarray(fn(ct, dose0, inputs, tabs))
    assert ref.max() > 0
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6 * ref.max())
