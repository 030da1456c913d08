"""pggan_tpu — a TPU-native progressive-growing GAN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
PGGAN reference (yukyeongleee/pggan): equalized-learning-rate convolutions,
PixelNorm, minibatch-stddev, progressive growth with toRGB/fromRGB alpha
fade-in, BCE+R1 and WGAN-GP(+drift) losses, progressive schedule with
checkpoint/resume, and data-parallel training over a `jax.sharding.Mesh`.

Design notes (vs. the reference):
  * Networks are pure functions of a parameter pytree; progressive growth is
    pytree surgery between scales plus one freshly jitted train step per
    scale — never dynamic module mutation inside a compiled graph
    (reference: `pggan/model.py:163-166` mutates `nn.ModuleList` mid-run).
  * Gradient penalties (R1, WGAN-GP) are `jax.grad`-of-`jax.grad` inside a
    single fused step; no conv2d_gradfix analog is needed.
  * Layout is NHWC end-to-end (TPU-friendly), not the reference's NCHW.
"""

__version__ = "0.1.0"

from pggan_tpu.config import Config  # noqa: F401
from pggan_tpu.registry import create_model, register_model, MODEL_REGISTRY  # noqa: F401
