"""pdm_tpu — TPU-native physics-of-diffusion-models framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``antoniibelyshev/physics-of-diffusion-models``: DDPM training/sampling
generic over noise schedules written in log-temperature space, Monte-Carlo
estimators of free energy / entropy / heat capacity and of the Fisher-Rao
metric over noise levels, schedules derived from those statistics, and
FID-based evaluation — all designed TPU-first (MXU-shaped fused kernels,
lax.scan samplers, pjit/shard_map data+model parallelism over a device
mesh).
"""

__version__ = "0.1.0"
