"""worddiffusion_tpu — a TPU-native handwritten-word diffusion framework.

A from-scratch JAX / Flax / Pallas rebuild of the capabilities of the
reference WordDiffusion stack (latent DDPM generating 64x256 handwritten
word images conditioned on character sequences, writer IDs and PHOS/PHOC
descriptors), designed TPU-first:

- models run in NHWC bfloat16 on the MXU, fp32 GroupNorm/softmax,
- sampling/training loops are jit-compiled ``lax.scan`` programs,
- scaling is a ``jax.sharding.Mesh`` with data/model axes (GSPMD
  collectives over ICI), not host-side replication,
- hot ops (cross-attention, GroupNorm+SiLU) have Pallas TPU kernels with
  XLA fallbacks.

Layering (bottom-up): data -> diffusion -> models -> ops -> parallel ->
train/generate/eval -> cli.
"""

__version__ = "0.1.0"
