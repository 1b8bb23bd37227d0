"""Watercube-shaped sharding workload shared by the driver dry runs.

Used by ``__graft_entry__.dryrun_multichip`` (single-process, N virtual
devices) and the multi-host dry run (N processes x M devices each,
``multihost.run_dryrun``) so both execute the *same* program and their
losses are directly comparable. 128^3 CT (2 mm voxels, 256 mm cube), 256
tracer steps, 4 energy layers 118..172 MeV, 15x15 spots at 6 mm -> a
(64, 64)-ray BEV grid so an 8-way mesh gives ray shards of 16 rows (whole
8-row truncation bands).

The reference has no analogue: it is single-process single-GPU
(/root/reference/src/config.cpp:13-16 parses --gpu_id and never uses it).
"""
from __future__ import annotations

import numpy as np


def watercube_scale_setup(steps: int = 256, dim: int = 128):
    """Build (ct, inputs, table_arrays, static, cfg) for the dry-run beam."""
    import jax.numpy as jnp
    from ..config import EngineConfig
    from ..engine import BeamInputs, DoseEngine
    from ..geometry.transforms import np_affine, np_idx
    from ..physics.tables import load_physics_tables
    from ..plan import Beam

    tables = load_physics_tables(water_cube=True)
    n_layers, n_spots = 4, 15
    energies = np.linspace(118.12, 172.51, n_layers).astype(np.float32)
    peaks = np.interp(energies, tables.energies, tables.peak_depths).astype(np.float32)
    sig = (2.3 + 290.0 / (peaks + 15.0)).astype(np.float32)
    world_to_im = np_affine(np.eye(3, dtype=np.float32) * 0.5,
                            [dim / 2.0] * 3)
    inf = float("inf")
    half_extent = 3.0 * (n_spots - 1)
    beam = Beam(
        spot_weights=np.full((n_layers, n_spots, n_spots), 100.0, np.float32),
        energies=energies,
        spot_sigmas=np.stack([sig, sig], 1),
        ray_spacing=(2.0, 2.0),
        steps=steps,
        source_dist=(inf, inf),
        spot_idx_to_gantry=np_idx([6.0, 6.0, -2.0],
                                  [-half_extent, -half_extent, dim + 8.0]),
        gantry_to_im_idx=world_to_im,
        gantry_to_dose_idx=world_to_im,
    )
    ct = jnp.full((dim, dim, dim), 1000.0, jnp.float32)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct.shape)
    assert static.grid.ray_dims == (64, 64), static.grid.ray_dims
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    return ct, inputs, eng.table_arrays, static, cfg


def run_train_step_loss(mesh, put=None) -> float:
    """Run ONE sharded train step of the dry-run workload on ``mesh``.

    ``put(host_array, sharding)`` places a host array onto the mesh;
    defaults to ``jax.device_put`` (single-process). The multi-host worker
    passes a ``jax.make_array_from_callback`` wrapper so every process
    contributes only its addressable shards. The target dose is the
    nominal-weight dose (computed locally on one device — deterministic,
    so identical on every process) and the candidate weights are 0.8x
    nominal, making the normalized MSE loss O(1) and mesh-independent.

    Returns the scalar loss; callers compare it across mesh/process
    configurations (single-process 8-device vs 2-process 4+4) to validate
    that GSPMD partitioning over DCN reproduces the ICI-only result.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..engine import compute_beam_dose
    from .sharding import FIELD_AXIS, batch_sharding, make_train_step

    if put is None:
        put = jax.device_put
    ct, inputs, tabs, static, cfg = watercube_scale_setup()

    import jax.numpy as jnp
    dose0 = jnp.zeros(static.dose_shape, jnp.float32)
    target = jax.jit(
        lambda ct, d, i, t: compute_beam_dose(ct, d, i, t, static, cfg)
    )(ct, dose0, inputs, tabs)

    step, _ = make_train_step(static, cfg, mesh)
    rep = NamedSharding(mesh, P())
    n_field = dict(zip(mesh.axis_names, mesh.devices.shape))[FIELD_AXIS]
    w = np.asarray(inputs.spot_weights)
    wb = np.ascontiguousarray(
        np.broadcast_to(0.8 * w[None], (n_field,) + w.shape))
    wb_g = put(wb, batch_sharding(mesh, wb.ndim))
    ct_g = put(np.asarray(ct), rep)
    en_g = put(np.asarray(inputs.energies), rep)
    sg_g = put(np.asarray(inputs.spot_sigmas), rep)
    tg_g = put(np.asarray(target), rep)
    tabs_g = jax.tree.map(lambda a: put(np.asarray(a), rep), tabs)

    new_w, loss = step(ct_g, wb_g, en_g, sg_g, tg_g, tabs_g, 1e-4)
    jax.block_until_ready((new_w, loss))
    return float(loss)
