"""Reference (PyTorch) UNet checkpoint -> Flax params converter.

Loads the published ``ckpt_*.pt`` / ``ema_*.pt`` state dicts of the
reference ``UNetModel`` / ``UNetModelPhosc`` (layer inventory at
``unet.py:1096-1478`` / ``unetPhosc.py:751-1159``) into this package's
``UNet``. Enumerates blocks in the reference's construction order
(conv_in; per level: num_res_blocks x [ResBlock(+SpatialTransformer)],
Downsample between levels; middle Res/ST/Res; reversed output levels
with Upsample), so any (channel_mult, num_res_blocks,
attention_resolutions) combination converts.

Weight-layout transforms: conv OIHW->HWIO, linear [out,in]->[in,out],
GroupNorm/LayerNorm weight->scale. The reference's dead parameters
(``to_kv``, ``attnc``, and ``norm1`` in the research variant whose
forward never uses it, ``unet.py:337-341``) are dropped.

Numerical parity is proven by ``tests/test_convert.py``, which runs the
actual reference torch module against the converted Flax model.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from ..configs.config import UNetConfig


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _conv(sd, prefix):
    return {
        "Conv_0": {
            "kernel": _t(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[prefix + ".bias"]),
        }
    }


def _dense(sd, prefix, bias=True):
    out = {"Dense_0": {"kernel": _t(sd[prefix + ".weight"]).T}}
    if bias:
        out["Dense_0"]["bias"] = _t(sd[prefix + ".bias"])
    return out


def _gn(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]), "bias": _t(sd[prefix + ".bias"])}


def _resblock(sd, prefix):
    out = {
        "in_norm": _gn(sd, prefix + ".in_layers.0"),
        "in_conv": _conv(sd, prefix + ".in_layers.2"),
        "emb_proj": _dense(sd, prefix + ".emb_layers.1"),
        "out_norm": _gn(sd, prefix + ".out_layers.0"),
        "out_conv": _conv(sd, prefix + ".out_layers.3"),
    }
    if prefix + ".skip_connection.weight" in sd:
        out["skip"] = _conv(sd, prefix + ".skip_connection")
    return out


def _attn(sd, prefix):
    return {
        "to_q": _dense(sd, prefix + ".to_q", bias=False),
        "to_k": _dense(sd, prefix + ".to_k", bias=False),
        "to_v": _dense(sd, prefix + ".to_v", bias=False),
        "to_out": _dense(sd, prefix + ".to_out.0"),
    }


def _spatial_transformer(sd, prefix, cfg: UNetConfig, depth: int):
    out = {
        "norm": _gn(sd, prefix + ".norm"),
        "proj_in": _conv(sd, prefix + ".proj_in"),
        "proj_out": _conv(sd, prefix + ".proj_out"),
    }
    for d in range(depth):
        tb = f"{prefix}.transformer_blocks.{d}"
        block = {
            "attn1": _attn(sd, tb + ".attn1"),
            "attn2": _attn(sd, tb + ".attn2"),
            "norm2": _ln(sd, tb + ".norm2"),
            "norm3": _ln(sd, tb + ".norm3"),
            "ff": {
                # Dense is a wrapper module: path is <name>/Dense_0/...
                "GEGLU_0": {"Dense_0": _dense(sd, tb + ".ff.net.0.proj")},
                "Dense_0": _dense(sd, tb + ".ff.net.2"),
            },
        }
        if not cfg.attn1_cross:
            # wordstylist variant actually uses norm1 for self-attn
            block["norm1"] = _ln(sd, tb + ".norm1")
        out[f"block_{d}"] = block
    return out


def convert_reference_unet(
    sd: Mapping[str, "np.ndarray"], cfg: UNetConfig
) -> dict:
    """torch state dict (tensors or ndarrays) -> {'params': ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: dict = {}

    p["time_mlp_1"] = _dense(sd, "time_embed.0")
    p["time_mlp_2"] = _dense(sd, "time_embed.2")
    if "label_emb.weight" in sd:
        p["label_emb"] = {"embedding": _t(sd["label_emb.weight"])}
    p["word_emb"] = {
        "embedding": {"embedding": _t(sd["word_emb.embedding.weight"])},
        "attention": {
            "linear_query": _dense(sd, "word_emb.attention.linear_query"),
            "linear_key": _dense(sd, "word_emb.attention.linear_key"),
            "linear_value": _dense(sd, "word_emb.attention.linear_value"),
        },
    }
    if "wrd_proj.weight" in sd and cfg.style_vec_dim:
        p["style_proj"] = {"wrd_proj": _dense(sd, "wrd_proj")}

    depth = cfg.transformer_depth
    p["conv_in"] = _conv(sd, "input_blocks.0.0")

    idx = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for i in range(cfg.num_res_blocks):
            p[f"in_{level}_{i}_res"] = _resblock(sd, f"input_blocks.{idx}.0")
            if ds in cfg.attention_resolutions:
                p[f"in_{level}_{i}_attn"] = _spatial_transformer(
                    sd, f"input_blocks.{idx}.1", cfg, depth
                )
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            # Down/Upsample contain an auto-named Conv2D wrapper
            p[f"down_{level}"] = {"Conv2D_0": _conv(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    if "middle_block.0.in_layers.0.weight" in sd:
        p["mid_res1"] = _resblock(sd, "middle_block.0")
        p["mid_attn"] = _spatial_transformer(sd, "middle_block.1", cfg, depth)
        p["mid_res2"] = _resblock(sd, "middle_block.2")
    else:
        # --attentionMaps checkpoints store the same three modules as
        # middle_block1 = [[ResBlock, ST], [ResBlock]]
        # (``unet.py:1336-1366``)
        p["mid_res1"] = _resblock(sd, "middle_block1.0.0")
        p["mid_attn"] = _spatial_transformer(sd, "middle_block1.0.1", cfg, depth)
        p["mid_res2"] = _resblock(sd, "middle_block1.1.0")

    idx = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            p[f"out_{level}_{i}_res"] = _resblock(sd, f"output_blocks.{idx}.0")
            layer = 1
            if ds in cfg.attention_resolutions:
                p[f"out_{level}_{i}_attn"] = _spatial_transformer(
                    sd, f"output_blocks.{idx}.{layer}", cfg, depth
                )
                layer += 1
            if level and i == cfg.num_res_blocks:
                p[f"up_{level}"] = {
                    "Conv2D_0": _conv(sd, f"output_blocks.{idx}.{layer}.conv")
                }
                ds //= 2
            idx += 1

    p["out_norm"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")

    if cfg.ocr_head and "auxhead.temporal_i.0.weight" in sd:
        p["aux_head"] = _ctc_head(sd, "auxhead", cfg)
    return {"params": p}


def _fold_bn_conv(sd, conv_prefix: str, bn_prefix: str, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm2d into the preceding conv.

    y = ((conv(x) - mean) / sqrt(var+eps)) * gamma + beta is affine per
    channel, so it folds exactly into the conv kernel/bias. The converted
    CTC head therefore runs with ``ocr_norm='none'`` and matches the
    reference ``CTCtopC`` eval forward (``unet.py:1054-1092``)."""
    w = _t(sd[conv_prefix + ".weight"])  # OIHW
    b = _t(sd[conv_prefix + ".bias"])
    gamma = _t(sd[bn_prefix + ".weight"])
    beta = _t(sd[bn_prefix + ".bias"])
    mean = _t(sd[bn_prefix + ".running_mean"])
    var = _t(sd[bn_prefix + ".running_var"])
    s = gamma / np.sqrt(var + eps)
    w = w * s[:, None, None, None]
    b = (b - mean) * s + beta
    return {"Conv_0": {"kernel": w.transpose(2, 3, 1, 0), "bias": b}}


def _ctc_head(sd, prefix: str, cfg: UNetConfig) -> dict:
    if cfg.ocr_norm != "none":
        raise ValueError(
            "converted reference CTC heads fold BatchNorm into the convs; "
            "build the UNet with ocr_norm='none'"
        )
    out = {
        "temporal_i": _fold_bn_conv(sd, f"{prefix}.temporal_i.0",
                                    f"{prefix}.temporal_i.1"),
        "temporal_o": _conv(sd, f"{prefix}.temporal_o"),
        "lin1": _dense(sd, f"{prefix}.lin1"),
        "lin2": _dense(sd, f"{prefix}.lin2"),
    }
    for i in range(cfg.ocr_layers):
        out[f"temporal_m{i}"] = _fold_bn_conv(
            sd, f"{prefix}.temporal_m.{i}.0", f"{prefix}.temporal_m.{i}.1"
        )
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Read a reference .pt checkpoint into numpy (cpu torch)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items()}


# ---------------------------------------------------------------------------
# Reverse export: Flax params -> reference-format torch state dict, so
# models trained here can be evaluated by any reference-side tooling.
# The weight transforms are pure transposes, so torch -> flax -> torch
# round-trips BITWISE for every parameter the forward converter keeps
# (tests/test_convert_export.py). What cannot round-trip: the
# reference's dead parameters (to_kv/attnc/norm1 of the research
# variant — pass the original sd as ``template`` to carry them
# through), and the CTC aux head (BatchNorm folded at import, lossy).


def _inv_conv(node, prefix, out):
    out[prefix + ".weight"] = np.ascontiguousarray(
        _t(node["Conv_0"]["kernel"]).transpose(3, 2, 0, 1)
    )
    out[prefix + ".bias"] = _t(node["Conv_0"]["bias"])


def _inv_dense(node, prefix, out, bias=True):
    out[prefix + ".weight"] = np.ascontiguousarray(_t(node["Dense_0"]["kernel"]).T)
    if bias:
        out[prefix + ".bias"] = _t(node["Dense_0"]["bias"])


def _inv_norm(node, prefix, out):
    out[prefix + ".weight"] = _t(node["scale"])
    out[prefix + ".bias"] = _t(node["bias"])


def _inv_resblock(node, prefix, out):
    _inv_norm(node["in_norm"], prefix + ".in_layers.0", out)
    _inv_conv(node["in_conv"], prefix + ".in_layers.2", out)
    _inv_dense(node["emb_proj"], prefix + ".emb_layers.1", out)
    _inv_norm(node["out_norm"], prefix + ".out_layers.0", out)
    _inv_conv(node["out_conv"], prefix + ".out_layers.3", out)
    if "skip" in node:
        _inv_conv(node["skip"], prefix + ".skip_connection", out)


def _inv_attn(node, prefix, out):
    _inv_dense(node["to_q"], prefix + ".to_q", out, bias=False)
    _inv_dense(node["to_k"], prefix + ".to_k", out, bias=False)
    _inv_dense(node["to_v"], prefix + ".to_v", out, bias=False)
    _inv_dense(node["to_out"], prefix + ".to_out.0", out)


def _inv_spatial_transformer(node, prefix, cfg: UNetConfig, depth: int, out):
    _inv_norm(node["norm"], prefix + ".norm", out)
    _inv_conv(node["proj_in"], prefix + ".proj_in", out)
    _inv_conv(node["proj_out"], prefix + ".proj_out", out)
    for d in range(depth):
        tb = f"{prefix}.transformer_blocks.{d}"
        block = node[f"block_{d}"]
        _inv_attn(block["attn1"], tb + ".attn1", out)
        _inv_attn(block["attn2"], tb + ".attn2", out)
        _inv_norm(block["norm2"], tb + ".norm2", out)
        _inv_norm(block["norm3"], tb + ".norm3", out)
        # GEGLU wraps its Dense: path ff/GEGLU_0/Dense_0/Dense_0
        _inv_dense(block["ff"]["GEGLU_0"]["Dense_0"], tb + ".ff.net.0.proj", out)
        _inv_dense(block["ff"]["Dense_0"], tb + ".ff.net.2", out)
        if not cfg.attn1_cross:
            _inv_norm(block["norm1"], tb + ".norm1", out)


def export_reference_unet(
    params: Mapping, cfg: UNetConfig, template: Mapping | None = None,
    middle_block1: bool = False,
) -> dict:
    """Flax ``{'params': ...}`` -> reference torch state dict (numpy
    values; wrap with ``torch.from_numpy`` to ``torch.save``).

    ``template``: an original reference state dict whose entries fill
    every key this exporter does not produce (dead params, buffers), so
    ``load_state_dict(strict=True)`` succeeds on the reference module.
    ``middle_block1``: emit the --attentionMaps key layout
    (``unet.py:1336-1366``). The CTC aux head is NOT exported (its
    BatchNorm was folded at import; retrain or keep the template's)."""
    p = params["params"] if "params" in params else params
    out: dict = {}

    _inv_dense(p["time_mlp_1"], "time_embed.0", out)
    _inv_dense(p["time_mlp_2"], "time_embed.2", out)
    if "label_emb" in p:
        out["label_emb.weight"] = _t(p["label_emb"]["embedding"])
    out["word_emb.embedding.weight"] = _t(p["word_emb"]["embedding"]["embedding"])
    for lin in ("linear_query", "linear_key", "linear_value"):
        _inv_dense(p["word_emb"]["attention"][lin],
                   f"word_emb.attention.{lin}", out)
    if "style_proj" in p:
        _inv_dense(p["style_proj"]["wrd_proj"], "wrd_proj", out)

    depth = cfg.transformer_depth
    _inv_conv(p["conv_in"], "input_blocks.0.0", out)

    idx = 1
    ds = 1
    for level in range(len(cfg.channel_mult)):
        for i in range(cfg.num_res_blocks):
            _inv_resblock(p[f"in_{level}_{i}_res"], f"input_blocks.{idx}.0", out)
            if ds in cfg.attention_resolutions:
                _inv_spatial_transformer(
                    p[f"in_{level}_{i}_attn"], f"input_blocks.{idx}.1",
                    cfg, depth, out,
                )
            idx += 1
        if level != len(cfg.channel_mult) - 1:
            _inv_conv(p[f"down_{level}"]["Conv2D_0"],
                      f"input_blocks.{idx}.0.op", out)
            idx += 1
            ds *= 2

    if middle_block1:
        _inv_resblock(p["mid_res1"], "middle_block1.0.0", out)
        _inv_spatial_transformer(p["mid_attn"], "middle_block1.0.1", cfg, depth, out)
        _inv_resblock(p["mid_res2"], "middle_block1.1.0", out)
    else:
        _inv_resblock(p["mid_res1"], "middle_block.0", out)
        _inv_spatial_transformer(p["mid_attn"], "middle_block.1", cfg, depth, out)
        _inv_resblock(p["mid_res2"], "middle_block.2", out)

    idx = 0
    for level in reversed(range(len(cfg.channel_mult))):
        for i in range(cfg.num_res_blocks + 1):
            _inv_resblock(p[f"out_{level}_{i}_res"], f"output_blocks.{idx}.0", out)
            layer = 1
            if ds in cfg.attention_resolutions:
                _inv_spatial_transformer(
                    p[f"out_{level}_{i}_attn"], f"output_blocks.{idx}.{layer}",
                    cfg, depth, out,
                )
                layer += 1
            if level and i == cfg.num_res_blocks:
                _inv_conv(p[f"up_{level}"]["Conv2D_0"],
                          f"output_blocks.{idx}.{layer}.conv", out)
                ds //= 2
            idx += 1

    _inv_norm(p["out_norm"], "out.0", out)
    _inv_conv(p["out_conv"], "out.2", out)

    if template is not None:
        merged = {k: np.asarray(v) for k, v in template.items()}
        merged.update(out)
        return merged
    return out
