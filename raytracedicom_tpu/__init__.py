"""raytracedicom_tpu: TPU-native differentiable proton pencil-beam dose engine.

A from-scratch JAX/Pallas reimplementation of the capability surface of
RayTraceDicom (sub-second GPU pencil-beam dose calculation for adaptive
proton therapy), redesigned for XLA/TPU: fully parallel ray tracing and
IDD/sigma physics (masked cumulative sums instead of sequential per-ray
marches), dense erf-difference spot convolution on the MXU, static-shape
kernel superposition, end-to-end autodiff, and multi-device sharding.
"""

__version__ = "0.1.0"
