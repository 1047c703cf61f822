"""Reverse checkpoint interop: Flax -> reference torch state dict.

Round-trip torch -> flax -> torch must be BITWISE equal for every
parameter the importer keeps (the transforms are pure transposes), and
the exported dict (template-merged) must load into the actual reference
module with ``strict=True`` and produce the identical forward.
(VERDICT r2 next #10.)
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REFERENCE), reason="reference tree not mounted"
    ),
]


def test_roundtrip_bitwise_and_reference_load():
    import torch

    from test_convert_research import _load_research_model, _our_cfg

    from worddiffusion_tpu.models.convert import (
        convert_reference_unet,
        export_reference_unet,
    )

    torch.manual_seed(3)
    ref = _load_research_model(model_channels=32, context_dim=32, num_heads=4)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    cfg = _our_cfg(model_channels=32, context_dim=32, num_heads=4)

    params = convert_reference_unet(sd, cfg)
    exported = export_reference_unet(params, cfg, template=sd)

    # bitwise round-trip on every key the importer keeps
    kept = set(exported) - {
        k for k in sd
        if ".to_kv." in k or ".attnc." in k or ".norm1." in k
        or k.startswith("auxhead")
    }
    mismatched = [
        k for k in kept
        if not np.array_equal(np.asarray(sd[k]), np.asarray(exported[k]))
    ]
    assert not mismatched, f"non-bitwise round trip: {mismatched[:5]}"

    # the exported dict loads into the ACTUAL reference module strictly
    # and computes the identical forward
    ref2 = _load_research_model(model_channels=32, context_dim=32, num_heads=4)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in exported.items()},
        strict=True,
    )
    x = torch.randn(2, 4, 8, 32)
    t = torch.tensor([5, 100])
    ctx = torch.randint(0, 53, (2, 10))
    y = torch.tensor([0, 3])
    with torch.no_grad():
        a = ref(x, None, timesteps=t, context=ctx, y=y)
        b = ref2(x, None, timesteps=t, context=ctx, y=y)
    assert torch.equal(a, b)


def test_export_wordstylist_variant_keys():
    """The attn1_cross=False (UNetModelPhosc layout) export emits norm1
    and round-trips bitwise too."""
    import jax

    from worddiffusion_tpu.models.convert import (
        convert_reference_unet,
        export_reference_unet,
    )
    from worddiffusion_tpu.models.unet import UNet
    from test_convert_research import _our_cfg

    cfg = _our_cfg(model_channels=32, context_dim=32, num_heads=4,
                   attn1_cross=False)
    model = UNet(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((2, 8, 32, 4), np.float32), np.zeros((2,), np.int32),
        np.zeros((2, 10), np.int32), np.zeros((2,), np.int32),
    )
    sd = export_reference_unet(params, cfg)
    assert any(".norm1." in k for k in sd)
    back = convert_reference_unet(sd, cfg)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        assert np.array_equal(np.asarray(leaf), np.asarray(flat_b[path])), path
