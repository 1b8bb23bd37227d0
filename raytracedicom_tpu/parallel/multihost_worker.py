"""Multi-host dry-run worker: one OS process = one "host" of the pod.

Launched by ``multihost.run_dryrun`` (or by hand) as

    python -m raytracedicom_tpu.parallel.multihost_worker \
        --coordinator 127.0.0.1:PORT --num-processes N --process-id I

Each worker brings up ``jax.distributed`` via ``multihost.initialize``
(explicit args — a failure raises, it cannot silently fall back to
single-process), builds the global (field, ray) mesh spanning every
process's devices, and runs one step of the shared watercube-shaped
sharded training workload (``demo_workload.run_train_step_loss``). Global
arrays are assembled with ``jax.make_array_from_callback`` so each process
materializes only its addressable shards — exactly the multi-host pattern
a real pod uses. The result is printed as one machine-readable line.

The reference has no multi-process analogue (single GPU, SURVEY.md §2.4);
this path serves BASELINE.md's "rays/s scaling at N>=2 hosts" north star.
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", required=True)
    p.add_argument("--num-processes", type=int, required=True)
    p.add_argument("--process-id", type=int, required=True)
    p.add_argument("--n-field", type=int, default=2)
    args = p.parse_args(argv)

    import jax
    if os.environ.get("RAYTRACEDICOM_FORCE_CPU") == "1":
        # The image's sitecustomize pre-imports jax on the TPU tunnel; the
        # env var is read too late, but no backend is initialized yet so
        # config.update still switches the platform (same as tests/conftest).
        jax.config.update("jax_platforms", "cpu")

    from raytracedicom_tpu.parallel import multihost
    from raytracedicom_tpu.parallel.demo_workload import run_train_step_loss

    ok = multihost.initialize(coordinator_address=args.coordinator,
                              num_processes=args.num_processes,
                              process_id=args.process_id)
    assert ok, "initialize() must return True with explicit args"
    assert jax.process_count() == args.num_processes, (
        jax.process_count(), args.num_processes)

    mesh = multihost.global_mesh(n_field=args.n_field)

    def put(host_array, sharding):
        return jax.make_array_from_callback(
            host_array.shape, sharding, lambda idx: host_array[idx])

    loss = run_train_step_loss(mesh, put=put)
    result = {
        "process_id": args.process_id,
        "initialized": True,
        "loss": loss,
        "n_devices": jax.device_count(),
        "n_local_devices": jax.local_device_count(),
        "mesh": dict(zip(mesh.axis_names, mesh.devices.shape)),
    }
    print(multihost.RESULT_MARKER + json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
