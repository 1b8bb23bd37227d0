"""Engine configuration.

The reference splits configuration between compile-time CMake options
(CMakeLists.txt:36-79: WATER_CUBE_TEST, DOSE_TO_WATER, NOZZLE, NUCLEAR_CORR,
the four cutoffs) and runtime CLI11 flags (config.cpp:9-64). Since JAX
specializes at trace time, both tiers collapse into one frozen dataclass that
is passed as a static argument to the jitted engine.
"""
from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    dose_to_water: bool = True          # DOSE_TO_WATER (on by default, CMakeLists.txt:40-43)
    nozzle: bool = True                 # NOZZLE air-scatter model (CMakeLists.txt:48-51)
    nuclear: Optional[str] = None       # None | 'soukup' | 'fluka' | 'gauss_fit'
    bp_depth_cutoff: float = 1.05       # BP_DEPTH_CUTOFF (CMakeLists.txt:72)
    conv_sigma_cutoff: float = 3.0      # CONV_SIGMA_CUTOFF (pre-convolution)
    ks_sigma_cutoff: float = 3.0        # KS_SIGMA_CUTOFF (kernel superposition)
    ray_weight_cutoff: float = 1.0      # RAY_WEIGHT_CUTOFF (dead-ray threshold)
    max_superp_radius: int = 32         # maxSuperpR (kernel_wrapper.cuh:26)
    superp_tile = (32, 8)               # BEV grid rounding (kernel_wrapper.cuh:27-28)
    compute_dtype: str = "float32"

    # TPU-side knobs (no reference equivalent)
    superp_chunk_z: int = 8             # z-slices per superposition weight chunk
    # jax.checkpoint each energy layer: off by default — the per-layer
    # adjoints are cheap enough that storing residuals beats recomputing the
    # forward (measured r3: watercube grad 312 -> 244 ms, hetero 508 -> 435)
    remat_layers: bool = False
    # jax.checkpoint only the K2 fill: recomputes the fill forward in the
    # backward pass instead of materializing its (S,Y,X) intermediates.
    # Measured r3 on v5e: a net LOSS (watercube grad 251 -> 297 ms — the
    # recompute costs more than the residual traffic); kept as a tunable
    # for memory-constrained geometries
    remat_fill: bool = False
    # Spot-weight-only optimization: freeze the sigma adjoint chain
    # (stop_gradient on r_sigma_eff). r_sigma_eff is mathematically
    # independent of the spot weights, so d-dose/d-weights is UNCHANGED;
    # only set when energies/sigmas/CT are not being differentiated (their
    # gradients silently lose the through-sigma term otherwise). Cuts the
    # dominant backward path (PERF.md backward attribution).
    freeze_sigma_grad: bool = False

    @property
    def nuclear_enabled(self) -> bool:
        return self.nuclear is not None


# Nuclear-mode physics constants (fillIddAndSigma, kernel_wrapper.cu:228-245):
# (eRefSq [MeV^2], sigmaDelta [mm]) per mode; plain mode uses Highland 14.1 MeV.
SCATTER_CONSTANTS = {
    None: (14.1 ** 2, 0.21),
    "soukup": (13.8 ** 2, 0.0),
    "fluka": (14.7 ** 2, 0.08),
    "gauss_fit": (13.0 ** 2, 0.06),
}
