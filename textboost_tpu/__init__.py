"""TextBoost-TPU: a TPU-native (JAX/XLA/Pallas/pjit) one-shot text-to-image
personalization framework.

Re-implements the capabilities of the TextBoost reference (arXiv 2409.08248):
CLIP-text-encoder-only fine-tuning (LoRA + learnable placeholder tokens)
against a frozen Stable Diffusion VAE + UNet denoising loss, with paired
image/caption augmentation tokens and a knowledge-preservation loss.

Everything is built TPU-first:
  * models: Flax (linen) CLIP text encoder / UNet2DCondition / AutoencoderKL
  * compute: bf16 matmuls on the MXU, Pallas flash-attention for the UNet
  * parallelism: GSPMD via jax.sharding.Mesh + NamedSharding (dp x tp)
  * train loop: a single jitted, donated train step
"""

__version__ = "0.1.0"

from . import ops, samplers  # noqa: F401
