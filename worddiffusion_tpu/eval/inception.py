"""InceptionV3 feature extractor (Flax) + torch-checkpoint converter.

Classic FID uses the pool3 (2048-d) features of an ImageNet InceptionV3.
Those weights cannot be fetched in this environment (zero egress), so
this module ships the NETWORK and the CONVERTER: point
``--inception_weights`` at a torchvision-layout ``inception_v3`` state
dict (``.pt``/``.pth``, e.g. torchvision's ``inception_v3_google``) and
``cli.evaluate`` computes standard FID. Architecture follows
torchvision ``models/inception.py`` (BasicConv2d = conv + BN(eps=1e-3)
+ relu; Mixed_5b..7c), NHWC with BatchNorm folded into the convs at
conversion — parity vs a torch mirror is test-proven
(``tests/test_inception.py``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class _BasicConv(nn.Module):
    """Folded conv+BN+relu: the converter bakes BN(eps=1e-3) into the
    kernel/bias, so the Flax module is a biased conv + relu."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    padding: Any = "VALID"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv",
        )(x)
        return nn.relu(x)


def _avgpool3(x):
    # torch avg_pool2d(3, stride=1, padding=1, count_include_pad=True):
    # flax divides by the full window size, matching.
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


class _InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = _BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = _BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = _BasicConv(64, (5, 5), padding=((2, 2), (2, 2)), dtype=d,
                        name="branch5x5_2")(b5)
        b3 = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(b3)
        b3 = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_3")(b3)
        bp = _BasicConv(self.pool_features, (1, 1), dtype=d,
                        name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class _InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _BasicConv(384, (3, 3), strides=(2, 2), dtype=d, name="branch3x3")(x)
        bd = _BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(96, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(bd)
        bd = _BasicConv(96, (3, 3), strides=(2, 2), dtype=d,
                        name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class _InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.c7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = _BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = _BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=p71, dtype=d, name="branch7x7_3")(b7)
        bd = _BasicConv(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = _BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_2")(bd)
        bd = _BasicConv(c7, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_3")(bd)
        bd = _BasicConv(c7, (7, 1), padding=p71, dtype=d, name="branch7x7dbl_4")(bd)
        bd = _BasicConv(192, (1, 7), padding=p17, dtype=d, name="branch7x7dbl_5")(bd)
        bp = _BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class _InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = _BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = _BasicConv(320, (3, 3), strides=(2, 2), dtype=d, name="branch3x3_2")(b3)
        b7 = _BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = _BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=d,
                        name="branch7x7x3_2")(b7)
        b7 = _BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=d,
                        name="branch7x7x3_3")(b7)
        b7 = _BasicConv(192, (3, 3), strides=(2, 2), dtype=d,
                        name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class _InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = _BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = _BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3_2a")(b3),
            _BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = _BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = _BasicConv(384, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                        name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            _BasicConv(384, (1, 3), padding=p13, dtype=d, name="branch3x3dbl_3a")(bd),
            _BasicConv(384, (3, 1), padding=p31, dtype=d, name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _BasicConv(192, (1, 1), dtype=d, name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """x [B, H, W, 3] in [-1, 1] -> pool3 features [B, 2048].

    Input is bilinear-resized to 299x299 like the standard FID protocol
    (torch-fidelity / pytorch-fid resize before the network).
    """

    dtype: Dtype = jnp.float32
    resize: bool = True

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        if self.resize and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), "bilinear"
            )
        x = x.astype(jnp.dtype(d))
        x = _BasicConv(32, (3, 3), strides=(2, 2), dtype=d, name="Conv2d_1a_3x3")(x)
        x = _BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = _BasicConv(64, (3, 3), padding=((1, 1), (1, 1)), dtype=d,
                       name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = _BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = _InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = _InceptionB(dtype=d, name="Mixed_6a")(x)
        x = _InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = _InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = _InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = _InceptionD(dtype=d, name="Mixed_7a")(x)
        x = _InceptionE(dtype=d, name="Mixed_7b")(x)
        x = _InceptionE(dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # global avg pool


def _fold_bn(w, gamma, beta, mean, var, eps=1e-3):
    """conv weight OIHW + BN -> (HWIO kernel, bias)."""
    scale = gamma / np.sqrt(var + eps)
    k = np.transpose(w, (2, 3, 1, 0)) * scale[None, None, None, :]
    b = beta - mean * scale
    return k.astype(np.float32), b.astype(np.float32)


def convert_torch_inception(sd: dict) -> dict:
    """torchvision ``inception_v3`` state dict (numpy values, keys like
    ``Mixed_5b.branch1x1.conv.weight`` / ``...bn.{weight,bias,
    running_mean,running_var}``) -> Flax params for
    :class:`InceptionV3Features`, BN folded (eps=1e-3,
    torchvision BasicConv2d). fc / AuxLogits entries are ignored."""
    params: dict = {}

    def put(path: str, kernel, bias):
        node = params
        for part in path.split("."):
            node = node.setdefault(part, {})
        node["conv"] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}

    prefixes = sorted({
        k[: -len(".conv.weight")]
        for k in sd if k.endswith(".conv.weight") and not k.startswith("AuxLogits")
    })
    for p in prefixes:
        k, b = _fold_bn(
            np.asarray(sd[f"{p}.conv.weight"]),
            np.asarray(sd[f"{p}.bn.weight"]),
            np.asarray(sd[f"{p}.bn.bias"]),
            np.asarray(sd[f"{p}.bn.running_mean"]),
            np.asarray(sd[f"{p}.bn.running_var"]),
        )
        put(p, k, b)
    return {"params": params}


def load_inception_featurizer(weights_path: str, batch_jit: bool = True):
    """-> jitted apply_fn(images [B,H,W,3] in [-1,1]) -> [B, 2048].
    ``weights_path``: torch ``.pt``/``.pth`` state dict or ``.npz``."""
    if weights_path.endswith(".npz"):
        with np.load(weights_path) as z:
            sd = {k: z[k] for k in z.files}
    else:
        import torch

        obj = torch.load(weights_path, map_location="cpu", weights_only=True)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        sd = {k: v.numpy() for k, v in obj.items()}
    params = convert_torch_inception(sd)
    net = InceptionV3Features()
    fn = lambda im: net.apply(params, im)
    return jax.jit(fn) if batch_jit else fn
