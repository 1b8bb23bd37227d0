"""Multi-process (N>=2 "hosts") execution of the sharded train step.

The reference is single-process single-GPU (--gpu_id parsed at
/root/reference/src/config.cpp:13-16 and never consumed); BASELINE.md's
north star requires rays/s scaling evidence at N>=2 hosts. These tests
execute the jax.distributed DCN bring-up + cross-process (field, ray)
mesh for real: two local OS processes, 4 virtual CPU devices each, Gloo
collectives, one watercube-shaped train step — and require the
cross-process loss to equal the single-process 8-device loss.
"""
import numpy as np
import pytest

import jax

from raytracedicom_tpu.parallel import make_mesh, multihost
from raytracedicom_tpu.parallel.demo_workload import run_train_step_loss


def test_initialize_noop_without_env_or_args(monkeypatch):
    for k in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(k, raising=False)
    assert multihost.initialize() is False


def test_initialize_reraises_with_explicit_args(monkeypatch):
    def boom(**kw):
        raise RuntimeError("bring-up failed")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    # explicit args: a failure must surface, not masquerade as fallback
    with pytest.raises(RuntimeError, match="bring-up failed"):
        multihost.initialize(coordinator_address="127.0.0.1:1",
                             num_processes=2, process_id=0)
    # env-triggered path stays tolerant (already-initialized etc.)
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:1")
    assert multihost.initialize() is False


@pytest.mark.slow
def test_two_process_loss_matches_single_process():
    """2 processes x 4 devices == 1 process x 8 devices, same mesh, same
    program, same loss."""
    single = run_train_step_loss(make_mesh(jax.devices()[:8], n_field=2))

    r = multihost.run_dryrun(n_processes=2, devices_per_process=4, n_field=2)
    assert r["n_devices"] == 8
    assert len(r["per_process"]) == 2
    for pid, res in r["per_process"].items():
        assert res["initialized"], res
        assert res["mesh"] == {"field": 2, "ray": 4}, res
    assert np.isfinite(r["loss"])
    # same partitioning on both sides; only the transport differs
    np.testing.assert_allclose(r["loss"], single, rtol=2e-5)
