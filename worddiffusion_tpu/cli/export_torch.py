"""Export a trained Flax checkpoint to a reference-format PyTorch
state dict, so rebuilt models can be evaluated / sampled by any
reference-side tooling (the inverse of ``cli/sample --torch_ckpt``;
exporter parity is round-trip-proven in ``tests/test_convert_export``).

    python -m worddiffusion_tpu.cli.export_torch \
        --preset iam --ckpt_dir runs/demo/ckpt --out ema_export.pt

The output loads into the reference ``unet.py:1096`` ``UNetModel`` (or
``unetPhosc.py:751`` with ``--preset iam_phosc``) via
``model.load_state_dict(torch.load(path))``; pass ``--template`` (an
original reference ckpt) when the reference module expects keys this
exporter does not produce (dead params / CTC-head buffers) and you
need ``strict=True``.
"""

from __future__ import annotations

import argparse
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="flax -> reference torch export")
    p.add_argument("--preset", default="iam")
    p.add_argument("--ckpt_dir", required=True, help="orbax ckpt dir from training")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--use_ema", type=int, default=1,
                   help="export the EMA weights (the reference samples from ema_*)")
    p.add_argument("--template", default="",
                   help="reference torch ckpt whose extra keys (dead "
                        "params, buffers) fill the export for strict loads")
    p.add_argument("--middle_block1", type=int, default=0,
                   help="emit the --attentionMaps middle_block1 key "
                        "layout (reference unet.py:1336-1366)")
    return p


def main(argv=None) -> None:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    args = build_parser().parse_args(argv)

    import torch

    from ..configs import presets
    from ..models.convert import export_reference_unet, load_torch_checkpoint
    from .sample import load_state

    exp = presets.get(args.preset)
    state = load_state(exp, args.ckpt_dir)
    params = state.ema_params if args.use_ema else state.params

    template = load_torch_checkpoint(args.template) if args.template else None
    sd = export_reference_unet(
        params, exp.unet, template=template,
        middle_block1=bool(args.middle_block1),
    )
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, args.out)
    logging.info(
        "wrote %s: %d tensors (%s weights, step %d)",
        args.out, len(sd), "EMA" if args.use_ema else "raw", int(state.step),
    )


if __name__ == "__main__":
    main()
