"""PHOSC zero-shot word recognizer (the evaluation head).

Rebuild of ``ResPhoSCNetZSL/modules/models.py:15-85``: 13-conv VGG-ish
trunk (two 2x2 maxpools), temporal pyramid pooling over levels [1,2,5]
(``modules/pyramidpooling.py:74-113``), and two 4096-4096 MLP heads —
phos (165, ReLU) and phoc (604, Sigmoid). Input 50x250 RGB word crops
in NHWC. Residual variants (``residualmodels.py``) are provided via
``trunk='resnet18'``.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def temporal_pyramid_pool(x: jax.Array, levels=(1, 2, 5)) -> jax.Array:
    """NHWC -> [B, C * sum(levels)] max-pooled horizontal stripes.

    Mirrors the reference semantics: for each level, width is
    ceil-padded so ``level`` equal stripes cover it, each stripe is
    max-pooled over (full height x stripe width).
    """
    b, h, w, c = x.shape
    out = []
    # -inf init/pad: required for JAX to specialise to the
    # differentiable reduce_window_max
    neg = -jnp.inf
    for level in levels:
        kernel_w = math.ceil(w / level)
        pad_total = kernel_w * level - w
        pad1 = pad_total // 2
        pad2 = pad_total - pad1
        xp = jnp.pad(
            x, ((0, 0), (0, 0), (pad1, pad2), (0, 0)),
            constant_values=neg,
        )
        pooled = jax.lax.reduce_window(
            xp, neg, jax.lax.max,
            window_dimensions=(1, h, kernel_w, 1),
            window_strides=(1, h, kernel_w, 1),
            padding="VALID",
        )  # [B, 1, level, C]
        # a window that is entirely padding -> torch's 0-pad semantics
        # (trunk activations are post-ReLU, so partially-padded windows
        # already agree)
        pooled = jnp.where(jnp.isneginf(pooled), 0.0, pooled)
        out.append(pooled.reshape(b, level * c))
    return jnp.concatenate(out, axis=1)


def spatial_pyramid_pool(x: jax.Array, levels=(1, 2, 4)) -> jax.Array:
    """NHWC -> [B, C * sum(level^2)] max-pooled level x level grids
    (``modules/pyramidpooling.py:34-72``)."""
    b, h, w, c = x.shape
    out = []
    neg = -jnp.inf
    for level in levels:
        kh = math.ceil(h / level)
        kw = math.ceil(w / level)
        ph = kh * level - h
        pw = kw * level - w
        xp = jnp.pad(
            x,
            ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0)),
            constant_values=neg,
        )
        pooled = jax.lax.reduce_window(
            xp, neg, jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, kh, kw, 1),
            padding="VALID",
        )
        pooled = jnp.where(jnp.isneginf(pooled), 0.0, pooled)
        out.append(pooled.reshape(b, level * level * c))
    return jnp.concatenate(out, axis=1)


class FixedPatchPrompter(nn.Module):
    """Additive learned visual prompt patch over the whole input
    (``modules/modelPaper.py:142-166``): a trainable [1, H, W, 3]
    tensor added to every image before the frozen recognizer."""

    height: int = 50
    width: int = 250

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        patch = self.param(
            "patch", nn.initializers.normal(1.0), (1, self.height, self.width, 3)
        )
        return x + patch


class _VGGTrunk(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        plan = [
            (64, False), (64, True),
            (128, False), (128, True),
            (256, False), (256, False), (256, False),
            (256, False), (256, False), (256, False),
            (512, False), (512, False), (512, False),
        ]
        for i, (feats, pool_after) in enumerate(plan):
            x = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.relu(x)
            if pool_after:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class _ResNet18Trunk(nn.Module):
    """Residual trunk option (``residualmodels.py:266-330`` family)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def block(h, feats, stride, name):
            res = h
            h = nn.Conv(feats, (3, 3), strides=(stride, stride),
                        padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=name + "_c1")(h)
            h = nn.GroupNorm(num_groups=min(32, feats), dtype=jnp.float32,
                             param_dtype=jnp.float32, name=name + "_n1")(
                h.astype(jnp.float32)).astype(self.dtype)
            h = nn.relu(h)
            h = nn.Conv(feats, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=name + "_c2")(h)
            h = nn.GroupNorm(num_groups=min(32, feats), dtype=jnp.float32,
                             param_dtype=jnp.float32, name=name + "_n2")(
                h.astype(jnp.float32)).astype(self.dtype)
            if res.shape != h.shape:
                res = nn.Conv(feats, (1, 1), strides=(stride, stride),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name=name + "_sc")(res)
            return nn.relu(h + res)

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem")(x)
        x = nn.relu(x)
        for stage, (feats, stride) in enumerate(
            [(64, 1), (128, 2), (256, 1), (512, 1)]
        ):
            x = block(x, feats, stride, f"s{stage}b0")
            x = block(x, feats, 1, f"s{stage}b1")
        return x


class _TorchResNetTrunk(nn.Module):
    """torchvision resnet18/34 layout with the reference's paper
    modifications (``residualmodels.py:352-467`` ResNet18Pretrain):
    7x7 stem with padding (0,0) and an ADDED bias, 3x3 maxpool with
    padding (0,0), biased BasicBlock convs. BatchNorm handling:

    - ``norm='group'``: GroupNorm stand-in for training from scratch
      (no running stats under SPMD);
    - ``norm='none'``: no norm — used with torchvision-format
      checkpoints whose eval-mode BN ``convert_torchvision_resnet``
      folds into the conv weights (pretrained-trunk interop without
      torchvision in the image).

    ``blocks=(2,2,2,2)`` is resnet18; ``(3,4,6,3)`` is ResNet34
    (``residualmodels.py:152-264``)."""

    blocks: tuple = (2, 2, 2, 2)
    norm: str = "group"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def gn(h, feats, name):
            if self.norm != "group":
                return h
            return nn.GroupNorm(num_groups=min(32, feats), dtype=jnp.float32,
                                param_dtype=jnp.float32, name=name)(
                h.astype(jnp.float32)).astype(self.dtype)

        if x.shape[-1] == 1:  # grayscale -> 3ch (reference expand)
            x = jnp.broadcast_to(x, x.shape[:-1] + (3,))
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        h = nn.relu(gn(h, 64, "bn1"))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

        for stage, n in enumerate(self.blocks):
            feats = 64 * (2 ** stage)
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                res = h
                name = f"l{stage}b{b}"
                h = nn.Conv(feats, (3, 3), strides=(stride, stride),
                            padding=((1, 1), (1, 1)), dtype=self.dtype,
                            param_dtype=jnp.float32, name=name + "_c1")(h)
                h = nn.relu(gn(h, feats, name + "_n1"))
                h = nn.Conv(feats, (3, 3), padding=((1, 1), (1, 1)),
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=name + "_c2")(h)
                h = gn(h, feats, name + "_n2")
                if res.shape[-1] != feats or stride != 1:
                    res = nn.Conv(feats, (1, 1), strides=(stride, stride),
                                  dtype=self.dtype, param_dtype=jnp.float32,
                                  name=name + "_ds")(res)
                    res = gn(res, feats, name + "_dsn")
                h = nn.relu(h + res)
        return h


TRUNKS = {
    "vgg": lambda dtype, norm: _VGGTrunk(dtype=dtype, name="trunk"),
    "resnet18": lambda dtype, norm: _ResNet18Trunk(dtype=dtype, name="trunk"),
    "resnet18_pretrain": lambda dtype, norm: _TorchResNetTrunk(
        blocks=(2, 2, 2, 2), norm=norm, dtype=dtype, name="trunk"),
    # the reference's ResNet18PretrainAttention (residualmodels.py:556-600)
    # is architecturally identical to the plain pretrain variant — kept as
    # an alias for config parity
    "resnet18_attention": lambda dtype, norm: _TorchResNetTrunk(
        blocks=(2, 2, 2, 2), norm=norm, dtype=dtype, name="trunk"),
    "resnet34": lambda dtype, norm: _TorchResNetTrunk(
        blocks=(3, 4, 6, 3), norm=norm, dtype=dtype, name="trunk"),
}


class PHOSCNet(nn.Module):
    phos_size: int = 165
    phoc_size: int = 604
    hidden: int = 4096
    levels: tuple = (1, 2, 5)
    trunk: str = "vgg"          # see TRUNKS
    # baseline PHOSCnet heads have two 4096 hidden layers
    # (modules/models.py:15-85); the residual variants one
    # (residualmodels.py:434-452)
    head_layers: int = 2
    trunk_norm: str = "group"   # 'group' | 'none' (folded-BN checkpoints)
    dropout: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True,
        return_features: bool = False,
    ) -> dict:
        """``return_features=True`` adds the pooled trunk features
        (pre-head TPP vector) under ``'features'`` — the documented FID
        featurizer protocol (``eval/features.py``)."""
        x = x.astype(jnp.dtype(self.dtype))
        trunk = TRUNKS[self.trunk](jnp.dtype(self.dtype), self.trunk_norm)
        feats = temporal_pyramid_pool(trunk(x), self.levels)

        def head(name, out_dim, final_act):
            h = feats
            for i in range(self.head_layers):
                h = nn.Dense(self.hidden, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"{name}_fc{i}")(h)
                h = nn.relu(h)
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(out_dim, dtype=self.dtype, param_dtype=jnp.float32,
                         name=f"{name}_out")(h)
            return final_act(h.astype(jnp.float32))

        out = {
            "phos": head("phos", self.phos_size, nn.relu),
            "phoc": head("phoc", self.phoc_size, nn.sigmoid),
        }
        if return_features:
            out["features"] = feats.astype(jnp.float32)
        return out


def resnet18_pretrain_phoscnet(**kw) -> PHOSCNet:
    """The paper's reported recognizer (``residualmodels.py:352-467``):
    torchvision-resnet18 trunk + TPP[1,2,5] + one-hidden-layer heads,
    phos 180 / phoc 646."""
    base = dict(phos_size=180, phoc_size=646, trunk="resnet18_pretrain",
                head_layers=1)
    base.update(kw)
    return PHOSCNet(**base)


def convert_torchvision_resnet(sd, blocks=(2, 2, 2, 2)) -> dict:
    """torchvision resnet18/34 state dict -> `_TorchResNetTrunk` params
    with eval-mode BatchNorm folded into the convs (use
    ``trunk_norm='none'``). Accepts both bare ('conv1.weight') and
    reference-wrapped ('resnet18.0.weight') key styles are NOT needed —
    the reference keeps torchvision naming until the final Sequential
    wrap (``residualmodels.py:430``)."""
    import numpy as np

    def arr(k):
        return np.asarray(sd[k], np.float32)

    def fold(conv_prefix, bn_prefix, eps=1e-5):
        w = arr(conv_prefix + ".weight")  # OIHW
        b = (arr(conv_prefix + ".bias") if conv_prefix + ".bias" in sd
             else np.zeros(w.shape[0], np.float32))
        g, beta = arr(bn_prefix + ".weight"), arr(bn_prefix + ".bias")
        mean, var = arr(bn_prefix + ".running_mean"), arr(bn_prefix + ".running_var")
        s = g / np.sqrt(var + eps)
        return {
            "kernel": (w * s[:, None, None, None]).transpose(2, 3, 1, 0),
            "bias": (b - mean) * s + beta,
        }

    out = {"conv1": fold("conv1", "bn1")}
    for stage, n in enumerate(blocks):
        for b in range(n):
            t = f"layer{stage + 1}.{b}"
            name = f"l{stage}b{b}"
            out[name + "_c1"] = fold(t + ".conv1", t + ".bn1")
            out[name + "_c2"] = fold(t + ".conv2", t + ".bn2")
            if t + ".downsample.0.weight" in sd:
                out[name + "_ds"] = fold(t + ".downsample.0", t + ".downsample.1")
    return out


def phosc_loss(
    pred: dict, target_phos: jax.Array, target_phoc: jax.Array,
    phos_w: float = 4.5, phoc_w: float = 1.0,
) -> jax.Array:
    """4.5 * MSE(phos) + CE(phoc) (``modules/loss.py:7-19``).

    The reference feeds the *sigmoid outputs* into
    ``F.cross_entropy`` with a float multi-hot target — i.e.
    ``-sum(target * log_softmax(pred))`` averaged over the batch.
    Reproduced exactly (it is what the published recognizers were
    trained with).
    """
    phos_loss = phos_w * jnp.mean(jnp.square(pred["phos"] - target_phos))
    logp = jax.nn.log_softmax(pred["phoc"], axis=-1)
    phoc_loss = phoc_w * jnp.mean(-jnp.sum(target_phoc * logp, axis=-1))
    return phos_loss + phoc_loss
