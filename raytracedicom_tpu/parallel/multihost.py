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
    """Bring up jax.distributed when running multi-process; no-op (returns
    False) when the environment provides no coordination info and no
    explicit arguments are given."""
    import os

    have_env = any(k in os.environ for k in (
        "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
    ))
    if coordinator_address is None and not have_env:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        return False


def global_mesh(n_field: Optional[int] = None):
    """(field, ray) mesh over every device in the (possibly multi-host)
    runtime. Call after initialize() on pods."""
    return make_mesh(jax.devices(), n_field=n_field)
