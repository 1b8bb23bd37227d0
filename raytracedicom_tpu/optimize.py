"""Gradient-based spot-weight optimization loop (BASELINE.json config 5:
adaptive replanning, backward through the full dose engine) with
checkpoint/resume.

The reference has no optimizer and no checkpointing (SURVEY.md §5); this is
the adaptive-proton-therapy workflow its paper motivates: given a target
dose distribution, optimize the spot-weight maps of one or more fields by
gradient descent through the differentiable engine. State is checkpointed
with orbax so a preempted optimization resumes exactly.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import EngineConfig
from .engine import BeamInputs, DoseEngine, compute_beam_dose


@dataclasses.dataclass
class OptimizeResult:
    weights: List[np.ndarray]
    losses: List[float]
    step: int


def _loss_fn(eng: DoseEngine, statics, cfg: EngineConfig, dose_shape):
    def loss(weight_list, inputs_list, ct, target):
        dose = jnp.zeros(dose_shape, ct.dtype)
        for w, inp, static in zip(weight_list, inputs_list, statics):
            dose = compute_beam_dose(ct, dose, inp._replace(spot_weights=w),
                                     eng.table_arrays, static, cfg)
        norm = jnp.mean(target ** 2) + jnp.asarray(1e-30, ct.dtype)
        return jnp.mean((dose - target) ** 2) / norm

    return loss


def optimize_spot_weights(
    eng: DoseEngine,
    ct,
    beams: Sequence,
    target,
    *,
    steps: int = 50,
    lr: float = 0.1,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 10,
    callback: Optional[Callable[[int, float], None]] = None,
) -> OptimizeResult:
    """Minimize the normalized MSE between the multi-field dose and
    ``target`` over all beams' spot weights (projected to >= 0).

    ``lr`` is in units of the initial-weight scale: the actual step is
    ``lr * mean(|w0|) / max(|grad0|)``, so it is dimensionless and stable
    across dose normalizations. With ``checkpoint_dir``, state is saved
    every ``checkpoint_every`` steps and restored on restart.
    """
    ct = jnp.asarray(ct)
    cfg = eng.cfg
    dose_shape = tuple(ct.shape)
    statics = [eng.beam_static(b, dose_shape) for b in beams]
    inputs_list = [
        BeamInputs(
            spot_weights=jnp.asarray(b.spot_weights),
            energies=jnp.asarray(b.energies),
            spot_sigmas=jnp.asarray(b.spot_sigmas),
        )
        for b in beams
    ]
    weights = [i.spot_weights for i in inputs_list]
    target = jnp.asarray(target)

    loss = _loss_fn(eng, statics, cfg, dose_shape)
    value_and_grad = jax.jit(jax.value_and_grad(loss))

    start_step = 0
    losses: List[float] = []
    alpha = None
    ckptr = None
    if checkpoint_dir is not None:
        import orbax.checkpoint as ocp

        checkpoint_dir = os.path.abspath(checkpoint_dir)
        ckptr = ocp.StandardCheckpointer()
        latest = _latest_checkpoint(checkpoint_dir)
        if latest is not None:
            state = ckptr.restore(latest)
            weights = [jnp.asarray(w) for w in state["weights"]]
            start_step = int(state["step"])
            losses = [float(x) for x in state["losses"]]
            alpha = float(state["alpha"])

    if alpha is None:
        # calibrate the step size from the initial gradient (persisted in
        # checkpoints: recalibrating near the optimum would overshoot)
        _, g0 = value_and_grad(weights, inputs_list, ct, target)
        gmax = max(float(jnp.max(jnp.abs(g))) for g in g0)
        wmean = float(np.mean([float(jnp.mean(jnp.abs(w))) for w in weights]))
        alpha = lr * wmean / max(gmax, 1e-30)

    for step in range(start_step, steps):
        val, grads = value_and_grad(weights, inputs_list, ct, target)
        weights = [jnp.maximum(w - alpha * g, 0.0) for w, g in zip(weights, grads)]
        losses.append(float(val))
        if callback is not None:
            callback(step, float(val))
        if ckptr is not None and (step + 1) % checkpoint_every == 0:
            path = os.path.join(checkpoint_dir, f"step_{step + 1:06d}")
            ckptr.save(path, {
                "weights": [np.asarray(w) for w in weights],
                "step": np.asarray(step + 1),
                "losses": np.asarray(losses, np.float64),
                "alpha": np.asarray(alpha, np.float64),
            }, force=True)
    if ckptr is not None:
        ckptr.wait_until_finished()

    return OptimizeResult(
        weights=[np.asarray(w) for w in weights],
        losses=losses,
        step=steps,
    )


def _latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None
