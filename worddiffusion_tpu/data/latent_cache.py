"""VAE latent cache builder.

In-repo replacement for the reference's precomputed latent pickles
(``imageWordLineVae3.pkl``, ``trainModifyCondition.py:303-325``): run
the frozen VAE encoder over the dataset once on device, store
``image_name -> latent`` as a compressed npz, then train with the
``vaeFromDict`` fast path (no per-step VAE encode).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import AutoencoderKL, encode_to_latent
from .dataset import LatentLookup, WordImageDataset
from .loader import batches


def build_latent_cache(
    dataset: WordImageDataset,
    vae: AutoencoderKL,
    vae_params,
    batch_size: int = 64,
    rng: Optional[jax.Array] = None,
    sample_posterior: bool = True,
    out_path: Optional[str] = None,
) -> LatentLookup:
    rng = jax.random.PRNGKey(0) if rng is None else rng

    @jax.jit
    def encode(imgs, step_rng):
        return encode_to_latent(
            vae, vae_params, imgs, step_rng, sample=sample_posterior
        )

    names: list[str] = []
    lats: list[np.ndarray] = []
    for i, batch in enumerate(
        batches(dataset, batch_size, shuffle=False, drop_remainder=False)
    ):
        z = encode(jnp.asarray(batch["image"]), jax.random.fold_in(rng, i))
        lats.append(np.asarray(z))
        names.extend(batch["image_name"])
    all_lat = np.concatenate(lats) if lats else np.zeros((0, 8, 32, 4), np.float32)
    # drop_remainder=False pads the tail by wrapping; dedupe by name
    seen: dict[str, np.ndarray] = {}
    for n, l in zip(names, all_lat):
        if n not in seen:
            seen[n] = l
    if out_path:
        np.savez_compressed(out_path, **seen)
    return LatentLookup(seen)
