"""Multi-host initialization + cross-host mesh construction.

The reference is single-process single-GPU (SURVEY.md §2.4); the TPU build
scales over pod slices: `jax.distributed.initialize` brings up the DCN
control plane, after which `jax.devices()` spans every host and the standard
(field, ray) mesh from sharding.make_mesh rides ICI within a slice. All
collectives (halo permutes for the superposition apron, dose psum, gradient
all-reduce) are inserted by GSPMD from the sharding annotations — nothing
here issues communication by hand.

On a real pod each host runs the same program:

    from raytracedicom_tpu.parallel import multihost
    multihost.initialize()                    # reads TPU env / explicit args
    mesh = multihost.global_mesh(n_field=...) # all hosts' devices

Single-process runs (tests, one chip) skip initialization and fall back to
the local devices, so the same code works everywhere.
"""
from __future__ import annotations

from typing import Optional

import jax

from .sharding import make_mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Bring up jax.distributed when running multi-process.

    Returns False (no-op) only when the environment provides no
    coordination info AND no explicit arguments are given — the intended
    single-process fallback. When the caller passes explicit arguments, a
    failed bring-up RE-RAISES: a broken distributed init must not
    masquerade as intentional single-process mode.
    """
    import os

    explicit = any(a is not None for a in
                   (coordinator_address, num_processes, process_id))
    have_env = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
    ))
    if not explicit and not have_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        if explicit:
            raise
        # env-triggered path: tolerate already-initialized / partial envs
        return False


def global_mesh(n_field: Optional[int] = None):
    """(field, ray) mesh over every device in the (possibly multi-host)
    runtime. Call after initialize() on pods."""
    return make_mesh(jax.devices(), n_field=n_field)


RESULT_MARKER = "MULTIHOST_RESULT "


def run_dryrun(n_processes: int = 2, devices_per_process: int = 4,
               n_field: int = 2, timeout: float = 1200.0) -> dict:
    """Execute the watercube-shaped sharded train step across N real OS
    processes joined by ``jax.distributed`` (DCN control plane) + Gloo CPU
    collectives — the local stand-in for an N-host TPU pod.

    Spawns ``n_processes`` workers (each with ``devices_per_process``
    virtual CPU devices), a coordinator on 127.0.0.1, and waits for every
    worker to report its loss. Raises on any worker failure, missing
    result, or cross-process loss disagreement. Returns
    ``{"loss": float, "n_processes": int, "n_devices": int,
    "per_process": {pid: result_dict}}``.
    """
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={devices_per_process}")
    env["XLA_FLAGS"] = " ".join(flags)
    env["RAYTRACEDICOM_FORCE_CPU"] = "1"

    pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = []
    for pid in range(n_processes):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "raytracedicom_tpu.parallel.multihost_worker",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(n_processes),
             "--process-id", str(pid),
             "--n-field", str(n_field)],
            env=env, cwd=pkg_root, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    per_process = {}
    logs = {}
    try:
        for pid, p in enumerate(procs):
            out, _ = p.communicate(timeout=timeout)
            logs[pid] = out
            if p.returncode != 0:
                raise RuntimeError(
                    f"multihost worker {pid} exited {p.returncode}:\n{out}")
            for line in out.splitlines():
                if line.startswith(RESULT_MARKER):
                    per_process[pid] = json.loads(line[len(RESULT_MARKER):])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()

    for pid in range(n_processes):
        if pid not in per_process:
            raise RuntimeError(
                f"multihost worker {pid} produced no result:\n{logs.get(pid)}")
        r = per_process[pid]
        if not r.get("initialized"):
            raise RuntimeError(f"worker {pid} did not initialize: {r}")
        expect_dev = n_processes * devices_per_process
        if r["n_devices"] != expect_dev or r["n_local_devices"] != devices_per_process:
            raise RuntimeError(f"worker {pid} saw wrong device counts: {r}")

    losses = [per_process[pid]["loss"] for pid in range(n_processes)]
    if max(losses) - min(losses) > 1e-12 * max(1.0, abs(losses[0])):
        raise RuntimeError(f"cross-process losses disagree: {losses}")
    return {"loss": losses[0], "n_processes": n_processes,
            "n_devices": n_processes * devices_per_process,
            "per_process": per_process}
