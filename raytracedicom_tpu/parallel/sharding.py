"""Device-mesh sharding for the dose engine.

The reference is strictly single-GPU (SURVEY.md §2.4: ``--gpu_id`` is parsed
at config.cpp:13-16 and never consumed). The TPU build scales along the
analogue axes identified there:

  * ``field`` (data parallel) — independent beams / plan candidates /
    optimization batch members. No communication until the loss reduction
    (a ``psum`` XLA inserts automatically under jit).
  * ``ray`` (spatial / "tensor" parallel) — the BEV ray grid's Y axis.
    Trace (K1) and IDD/sigma fill (K2) are embarrassingly parallel per ray
    (GSPMD annotations, zero communication). The superposition (K5) and
    transfer (K6) go through an explicit shard_map overlap-add
    (engine.superpose_primary / the transfer tail): each shard superposes
    its own rows into a locally padded slab — a source ray only reaches
    ±pad rows, so the global padded slab is exactly the overlap-add of the
    shard slabs — and the transfer resamples each local slab into the dose
    bbox, combined with ONE psum per beam. Measured alternative (pure GSPMD
    annotations): the partitioner cannot see into pallas_call, so it
    replicated K5 behind 170 full-slab all-gathers; tests/test_sharding.py
    asserts the compiled HLO stays slab-all-gather-free.

Everything else follows the scaling-book recipe: annotate shardings on
inputs and load-bearing intermediates and let the SPMD partitioner insert
psum/all-gather as implied.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..engine import BeamInputs, BeamStatic, TableArrays, compute_beam_dose

FIELD_AXIS = "field"
RAY_AXIS = "ray"

# Cap on the default ray-axis extent. Ray sharding splits the BEV grid's Y
# axis (typically ~128-160 rows for the watercube field) and every shard pays
# a fixed ±pad-row halo (pad = maxSuperpR = 32) at the superposition
# boundary. At 8 shards each owns ~16-20 rows against a 64-row halo window —
# already communication-dominated — so the default never shards rays more
# than 8 ways and gives all remaining devices to the halo-free field axis.
# Callers with bigger ray grids can pass n_field explicitly.
MAX_RAY_SHARDS = 8


def make_mesh(devices: Optional[Sequence] = None,
              n_field: Optional[int] = None) -> Mesh:
    """2D (field, ray) mesh over the given devices.

    ``n_field`` picks the data-parallel extent; the remainder shards rays.
    Default = the largest divisor of the device count that keeps the ray
    axis within MAX_RAY_SHARDS (fields never communicate; ray sharding pays
    halo traffic).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_field is None:
        n_field = n
        while n % n_field or n // n_field > MAX_RAY_SHARDS:
            n_field -= 1
    if n % n_field:
        raise ValueError(f"n_field={n_field} must divide device count {n}")
    arr = np.asarray(devices).reshape(n_field, n // n_field)
    return Mesh(arr, (FIELD_AXIS, RAY_AXIS))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (S, Ry, Rx) BEV slabs: rays partitioned along Y."""
    return NamedSharding(mesh, P(None, RAY_AXIS, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, rank: int) -> NamedSharding:
    """Leading-axis (batch-of-fields) sharding for a rank-``rank`` array."""
    return NamedSharding(mesh, P(FIELD_AXIS, *([None] * (rank - 1))))


def make_sharded_dose_fn(static: BeamStatic, cfg: EngineConfig, mesh: Mesh):
    """jit-compiled single-beam dose with ray-axis sharding annotations."""
    rs = ray_sharding(mesh)

    @jax.jit
    def dose_fn(ct, dose0, inputs: BeamInputs, tabs: TableArrays):
        return compute_beam_dose(ct, dose0, inputs, tabs, static, cfg,
                                 ray_sharding=rs)

    return dose_fn


def make_train_step(static: BeamStatic, cfg: EngineConfig, mesh: Mesh):
    """Batched spot-weight optimization step (BASELINE.json config 5).

    Each batch member is a candidate plan (one beam's spot-weight map);
    members are sharded over the ``field`` axis, rays within each member
    over the ``ray`` axis. Loss = mean squared error of the dose grid
    against a target dose, normalized by the target's mean square so its
    scale is O(1) regardless of the dose units; gradients flow through the
    full engine (trace → fill → superposition → transfer). The cross-field
    mean and the weight update's implied all-reduce ride ICI, overlapped
    with the backward pass by XLA's async collectives.

    Returns ``(step, loss_and_grad)`` where
    ``step(ct, weights_b, energies, spot_sigmas, target, tabs, lr)
    -> (new_weights_b, loss)``.
    """
    rs = ray_sharding(mesh)
    dose_shape = static.dose_shape

    def per_field_loss(ct, weights, energies, spot_sigmas, target, tabs):
        inputs = BeamInputs(spot_weights=weights, energies=energies,
                            spot_sigmas=spot_sigmas)
        dose0 = jnp.zeros(dose_shape, ct.dtype)
        dose = compute_beam_dose(ct, dose0, inputs, tabs, static, cfg,
                                 ray_sharding=rs)
        norm = jnp.mean(target ** 2) + jnp.asarray(1e-30, ct.dtype)
        return jnp.mean((dose - target) ** 2) / norm

    def batch_loss(weights_b, ct, energies, spot_sigmas, target, tabs):
        losses = jax.vmap(
            lambda w: per_field_loss(ct, w, energies, spot_sigmas, target, tabs)
        )(weights_b)
        return jnp.mean(losses)

    @jax.jit
    def loss_and_grad(weights_b, ct, energies, spot_sigmas, target, tabs):
        weights_b = jax.lax.with_sharding_constraint(
            weights_b, batch_sharding(mesh, weights_b.ndim))
        return jax.value_and_grad(batch_loss)(
            weights_b, ct, energies, spot_sigmas, target, tabs)

    @jax.jit
    def step(ct, weights_b, energies, spot_sigmas, target, tabs, lr):
        weights_b = jax.lax.with_sharding_constraint(
            weights_b, batch_sharding(mesh, weights_b.ndim))
        loss, grads = jax.value_and_grad(batch_loss)(
            weights_b, ct, energies, spot_sigmas, target, tabs)
        new_w = jnp.maximum(weights_b - lr * grads, 0.0)   # weights stay >= 0
        return new_w, loss

    return step, loss_and_grad
