"""Checkpoint-interop parity: reference torch UNet vs converted Flax.

Instantiates the ACTUAL reference module from /root/reference (read-only
import with an omegaconf stub), converts its state dict, and checks the
Flax forward matches the torch forward numerically. Skipped when the
reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference tree not mounted"
)


def _load_reference_model(variant="phosc", **kw):
    if "omegaconf" not in sys.modules:
        sys.modules["omegaconf"] = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        sys.modules["omegaconf.listconfig"] = lc
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import torch  # noqa

    from unetPhosc import UNetModelPhosc

    args = types.SimpleNamespace(device="cpu", interpolation=False, phosc=0, phos=0)
    defaults = dict(
        image_size=(8, 32), in_channels=4, model_channels=32, out_channels=4,
        num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1, 1),
        num_heads=4, context_dim=32, vocab_size=54, num_classes=8,
        args=args, max_seq_len=10,
    )
    defaults.update(kw)
    return UNetModelPhosc(**defaults)


def _our_cfg(**kw):
    from worddiffusion_tpu.configs.config import UNetConfig

    base = dict(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        channel_mult=(1, 1), attention_resolutions=(1,), num_heads=4,
        context_dim=32, vocab_size=54, num_writers=8, max_seq_len=10,
        attn1_cross=False, dtype="float32",
    )
    base.update(kw)
    return UNetConfig(**base)


def test_converted_forward_matches_reference():
    import torch

    import jax.numpy as jnp

    from worddiffusion_tpu.models.convert import convert_reference_unet
    from worddiffusion_tpu.models.unet import UNet

    torch.manual_seed(0)
    ref = _load_reference_model()
    ref.eval()

    x = torch.randn(2, 4, 8, 32)
    t = torch.tensor([5, 100])
    ctx = torch.randint(0, 53, (2, 10))
    y = torch.tensor([0, 3])
    with torch.no_grad():
        ref_out = ref(x, None, timesteps=t, context=ctx, y=y).numpy()

    cfg = _our_cfg()
    params = convert_reference_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg
    )
    model = UNet(cfg)
    ours = model.apply(
        params,
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),  # NCHW -> NHWC
        jnp.asarray(t.numpy()),
        jnp.asarray(ctx.numpy()),
        jnp.asarray(y.numpy()),
    )
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    diff = np.abs(ours - ref_out).max()
    assert diff < 2e-4, f"max abs diff {diff}"


def test_converted_tree_structure_matches_init():
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.models.convert import convert_reference_unet
    from worddiffusion_tpu.models.unet import UNet

    ref = _load_reference_model()
    cfg = _our_cfg()
    params = convert_reference_unet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg
    )
    model = UNet(cfg)
    rng = jax.random.PRNGKey(0)
    expected = model.init(
        rng,
        jnp.zeros((1, 8, 32, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 10), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    exp_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(expected)[0]
    }
    got_flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(leaf).shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert exp_flat == got_flat, set(exp_flat) ^ set(got_flat)
