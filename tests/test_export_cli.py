"""cli/export_torch: trained orbax checkpoint -> reference-format
torch state dict, end to end through the CLI (exporter math itself is
round-trip-proven in test_convert_export)."""

import dataclasses

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # two orbax round-trips + CLI invocations


@pytest.fixture()
def tiny_preset(monkeypatch):
    """Register a tiny 'tiny' preset so the CLI drives flagship code
    paths at unit-test size."""
    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.configs.config import UNetConfig

    def tiny():
        exp = presets.get("iam")
        return dataclasses.replace(
            exp,
            unet=UNetConfig(
                in_channels=4, model_channels=32, out_channels=4,
                num_res_blocks=1, channel_mult=(1, 1),
                attention_resolutions=(1,), num_heads=4, context_dim=32,
                vocab_size=54, num_writers=8, max_seq_len=10,
                attn1_cross=True, dtype="float32",
            ),
            data=dataclasses.replace(exp.data, max_chars=10),
        )

    monkeypatch.setitem(presets.PRESETS, "tiny", tiny)
    return tiny()


def _save_tiny_ckpt(exp, ckpt_dir):
    import jax

    from worddiffusion_tpu.models.unet import UNet
    from worddiffusion_tpu.train.checkpoint import CheckpointManager
    from worddiffusion_tpu.train.state import TrainState, make_optimizer

    model = UNet(exp.unet)
    params = model.init(
        jax.random.PRNGKey(7),
        np.zeros((2, 8, 32, 4), np.float32), np.zeros((2,), np.int32),
        np.zeros((2, exp.data.max_chars), np.int32), np.zeros((2,), np.int32),
    )
    state = TrainState.create(params, make_optimizer(1e-4))
    # make EMA distinguishable from raw params
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda a: a + 1.0, state.params)
    )
    mgr = CheckpointManager(str(ckpt_dir))
    mgr.save(0, state)
    mgr.close()
    return params


def test_export_torch_cli_roundtrip(tmp_path, tiny_preset):
    import torch

    from worddiffusion_tpu.cli.export_torch import main
    from worddiffusion_tpu.models.convert import convert_reference_unet

    params = _save_tiny_ckpt(tiny_preset, tmp_path / "ckpt")
    out = tmp_path / "export.pt"
    main(["--preset", "tiny", "--ckpt_dir", str(tmp_path / "ckpt"),
          "--out", str(out), "--use_ema", "0"])

    sd = torch.load(out, map_location="cpu", weights_only=True)
    assert all(isinstance(v, torch.Tensor) for v in sd.values())
    # reference layout markers
    assert "time_embed.0.weight" in sd
    assert any(k.startswith("input_blocks.") for k in sd)
    # torch -> flax round trip reproduces the saved params exactly
    back = convert_reference_unet(
        {k: v.numpy() for k, v in sd.items()}, tiny_preset.unet
    )
    import jax

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    for path, leaf in flat_a:
        assert np.array_equal(np.asarray(leaf), np.asarray(flat_b[path])), path


def test_export_torch_cli_ema_selects_ema(tmp_path, tiny_preset):
    import torch

    from worddiffusion_tpu.cli.export_torch import main

    _save_tiny_ckpt(tiny_preset, tmp_path / "ckpt")
    raw, ema = tmp_path / "raw.pt", tmp_path / "ema.pt"
    main(["--preset", "tiny", "--ckpt_dir", str(tmp_path / "ckpt"),
          "--out", str(raw), "--use_ema", "0"])
    main(["--preset", "tiny", "--ckpt_dir", str(tmp_path / "ckpt"),
          "--out", str(ema), "--use_ema", "1"])
    a = torch.load(raw, weights_only=True)["time_embed.0.weight"]
    b = torch.load(ema, weights_only=True)["time_embed.0.weight"]
    assert torch.allclose(b, a + 1.0)
