"""CLI surface tests: parsers and flag -> config mapping."""

import importlib

import pytest


@pytest.mark.parametrize("mod", [
    "worddiffusion_tpu.cli.train",
    "worddiffusion_tpu.cli.sample",
    "worddiffusion_tpu.cli.regenerate",
    "worddiffusion_tpu.cli.train_phosc",
    "worddiffusion_tpu.cli.train_ocr",
    "worddiffusion_tpu.cli.train_charcounter",
    "worddiffusion_tpu.cli.build_latent_cache",
    "worddiffusion_tpu.cli.evaluate",
])
def test_cli_modules_import(mod):
    importlib.import_module(mod)


def test_train_flag_mapping():
    from worddiffusion_tpu.cli.train import build_parser, experiment_from_args

    args = build_parser().parse_args([
        "--preset", "iam", "--epochs", "7", "--batch_size", "32",
        "--lr", "2e-4", "--save_path", "/tmp/x", "--ocrTraining", "1",
        "--latent", "0", "--stopFlagFile", "/tmp/flag.txt",
        "--mesh_data", "4", "--mesh_model", "2", "--img_size", "64,256",
    ])
    exp = experiment_from_args(args)
    assert exp.train.epochs == 7
    assert exp.data.batch_size == 32
    assert exp.train.lr == 2e-4
    assert exp.unet.ocr_head is True
    assert exp.train.ctc_weight > 0
    assert exp.data.latent is False
    assert exp.unet.in_channels == 3      # pixel mode
    assert exp.train.stop_flag_file == "/tmp/flag.txt"
    assert exp.mesh.data == 4 and exp.mesh.model == 2


def test_train_phosc_preset_switch():
    from worddiffusion_tpu.cli.train import build_parser, experiment_from_args

    args = build_parser().parse_args(["--preset", "iam", "--phosc", "1"])
    exp = experiment_from_args(args)
    assert exp.unet.use_phosc is True
    assert exp.unet.attn1_cross is False  # UNetModelPhosc layout


def test_regenerate_parser_defaults():
    from worddiffusion_tpu.cli.regenerate import build_parser

    args = build_parser().parse_args(
        ["--ckpt_dir", "/tmp/c", "--gt_file", "/tmp/g"]
    )
    assert args.batch_size == 256          # reference regen batch
    assert args.fullSampling == 0          # skip-step by default
    assert args.ddim == 0                  # DDPM schedules by default
    assert args.keep_rejected == 0
    assert args.vae_ckpt == ""


def test_train_ckpt_cadence_and_vae_ckpt_flags():
    from worddiffusion_tpu.cli.train import build_parser, experiment_from_args

    args = build_parser().parse_args(
        ["--synthetic", "1", "--ckpt_every_epochs", "50"]
    )
    exp = experiment_from_args(args)
    assert exp.train.ckpt_every_epochs == 50
    # default preserves the reference's every-5-epochs cadence
    exp0 = experiment_from_args(build_parser().parse_args(["--synthetic", "1"]))
    assert exp0.train.ckpt_every_epochs == 5


def test_sample_parser_requires_some_ckpt():
    from worddiffusion_tpu.cli.sample import build_parser

    args = build_parser().parse_args(["--words", "a,b"])
    assert args.ckpt_dir == "" and args.torch_ckpt == ""
