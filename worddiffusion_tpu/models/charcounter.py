"""Word-length (character-counter) classifier.

Rebuild of ``ResPhoSCNetZSL/modules/charactercountermodels.py:17-72`` /
``main_charactercounter.py``: the PHOSCnet conv trunk + temporal
pyramid pooling + a softmax head over word lengths 1..17 (one-hot
targets, CE loss ``main_charactercounter.py:120``). Used by the
GZSL length-estimation evaluation (``engine.py:362-438``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .phoscnet import _VGGTrunk, temporal_pyramid_pool

Dtype = Any


class CharacterCounterNet(nn.Module):
    outputs: int = 17
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, 50, 250, 3] -> [B, outputs] class probabilities."""
        x = x.astype(jnp.dtype(self.dtype))
        feats = temporal_pyramid_pool(_VGGTrunk(dtype=self.dtype, name="trunk")(x))
        logits = nn.Dense(self.outputs, dtype=self.dtype,
                          param_dtype=jnp.float32, name="head")(feats)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def length_onehot(words, outputs: int = 17) -> jnp.ndarray:
    """word -> one-hot of (len-1), lengths clamped to [1, outputs]
    (``modules/datasets.py:121-156``)."""
    import numpy as np

    idx = np.asarray([min(max(len(w), 1), outputs) - 1 for w in words])
    return jnp.asarray(jax.nn.one_hot(idx, outputs))


def counter_loss(probs: jax.Array, onehot: jax.Array) -> jax.Array:
    """CE over the softmax output (the reference applies CE on
    softmaxed probabilities, ``main_charactercounter.py:120``)."""
    return jnp.mean(-jnp.sum(onehot * jnp.log(probs + 1e-9), axis=-1))
