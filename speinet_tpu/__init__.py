"""SPEINet-TPU: a TPU-native (JAX/XLA/Pallas) video-deblurring framework.

A from-scratch rebuild of the capabilities of the SPEINet reference
(yangt1013/SPEINet, "Video Deblurring by Sharpness Prior Detection and Edge
Information", arXiv 2501.12246), designed TPU-first:

- models: flax.linen modules (hourglass CNN encoder/decoder, cross-frame
  Swin fusion, patch-correlation search & transfer, RL edge branch)
- ops: pure-jnp numeric primitives + Pallas kernels for the hot loops
- data: host-side sliding-window video pipeline with device prefetch
- detector: sharpness-prior frame classifier (6 focus measures + logistic
  regression / decision tree) running batched on device
- training: L1+HEM loss (fully on-device), optax Adam + step decay, orbax
  checkpoints, DP sharding over a jax.sharding.Mesh
- parallel: mesh construction, sharding rules, spatial tiling (the TPU
  equivalent of the reference's 4-quadrant forward_chop)
"""

__version__ = "0.1.0"
