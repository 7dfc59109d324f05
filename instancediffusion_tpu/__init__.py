"""InstanceDiffusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of frank-xwang/InstanceDiffusion (CVPR 2024).

Instance-level controlled text-to-image generation on Stable Diffusion 1.5:
per-instance (phrase, location) conditioning where a location is a point, a
scribble (20 points), a bounding box, or an instance mask — fused into the
denoising UNet via UniFusion grounding tokens + gated self-attention, with
ScaleU decoder rescaling and the Multi-Instance Sampler.

Design stance (not a port of the PyTorch reference):
  * functional core — all networks are pure functions over parameter pytrees
  * samplers are `lax.scan` loops compiled under one `jit`
  * conditioning preprocessing happens on-device inside the jitted graph
  * hot attention ops run as Pallas TPU kernels
  * parallelism via `jax.sharding.Mesh` + NamedSharding (data-parallel
    training, batch-sharded eval sampling), not NCCL-style process groups
"""

__version__ = "0.1.0"
