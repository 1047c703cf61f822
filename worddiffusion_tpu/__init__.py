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

import os as _os

if _os.environ.get("WD_PLATFORM"):
    # Deployment images may force-select an accelerator backend at
    # interpreter start (e.g. a sitecustomize that registers a tunneled
    # TPU plugin and overrides ``jax_platforms`` via jax.config, which
    # wins over the JAX_PLATFORMS env var). WD_PLATFORM=cpu pins the
    # platform at the config layer — the only override that sticks —
    # for host-only runs of the CLIs (data prep, eval, CI smoke runs).
    # Must run before any backend initialisation, hence package import.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["WD_PLATFORM"])
    if _os.environ.get("WD_CPU_DEVICES"):
        # virtual host mesh for sharding dryruns without real chips
        _jax.config.update(
            "jax_num_cpu_devices", int(_os.environ["WD_CPU_DEVICES"])
        )
