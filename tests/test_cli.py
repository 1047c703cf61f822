"""CLI surface tests: parsers and flag -> config mapping."""

import importlib
import os

import pytest


@pytest.mark.parametrize("mod", [
    "worddiffusion_tpu.cli.train",
    "worddiffusion_tpu.cli.sample",
    "worddiffusion_tpu.cli.regenerate",
    "worddiffusion_tpu.cli.train_phosc",
    "worddiffusion_tpu.cli.train_style",
    "worddiffusion_tpu.cli.train_ocr",
    "worddiffusion_tpu.cli.train_charcounter",
    "worddiffusion_tpu.cli.build_latent_cache",
    "worddiffusion_tpu.cli.evaluate",
    "worddiffusion_tpu.cli.export_torch",
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


def test_writer_registry_resolution_pins_training_order(tmp_path):
    """Inference conditioning ids come from writers_dict_train.json even
    when the regen gt enumerates writers in a different order (VERDICT
    round-2 missing #1; reference full_sampling.py:155-162)."""
    import json

    from worddiffusion_tpu.cli.sample import resolve_writer_registry
    from worddiffusion_tpu.data.gt import Sample, WriterRegistry

    save = tmp_path / "run"
    ckpt = save / "ckpt"
    ckpt.mkdir(parents=True)
    # training saw writers in order w3, w1, w2
    (save / "writers_dict_train.json").write_text(
        json.dumps({"w3": 0, "w1": 1, "w2": 2})
    )
    # the regen gt enumerates them in a DIFFERENT order: w2 first
    samples = [
        Sample("a.png", "w2", "the"),
        Sample("b.png", "w1", "of"),
        Sample("c.png", "w3", "and"),
    ]
    gt_registry = WriterRegistry()
    for s in samples:
        gt_registry.add(s.writer)
    assert gt_registry["w2"] == 0  # first-seen order differs from training

    reg = resolve_writer_registry("", str(ckpt), samples, gt_registry)
    assert reg["w2"] == 2 and reg["w1"] == 1 and reg["w3"] == 0  # training ids


def test_writer_registry_refuses_unknown_writers(tmp_path):
    import json

    import pytest

    from worddiffusion_tpu.cli.sample import resolve_writer_registry
    from worddiffusion_tpu.data.gt import Sample, WriterRegistry

    d = tmp_path / "writers_dict_train.json"
    d.write_text(json.dumps({"w1": 0}))
    samples = [Sample("a.png", "w9", "the")]
    with pytest.raises(SystemExit, match="not in the training writers dict"):
        resolve_writer_registry(str(d), "", samples, WriterRegistry())


def test_writer_registry_falls_back_without_dict(tmp_path, caplog):
    from worddiffusion_tpu.cli.sample import resolve_writer_registry
    from worddiffusion_tpu.data.gt import Sample, WriterRegistry

    samples = [Sample("a.png", "w1", "the")]
    gt_registry = WriterRegistry()
    gt_registry.add("w1")
    import logging

    with caplog.at_level(logging.WARNING):
        reg = resolve_writer_registry("", str(tmp_path / "none"), samples, gt_registry)
    assert reg is gt_registry
    assert any("writers_dict" in r.message for r in caplog.records)


def test_train_phosc_test_mode_requires_trained_weights(tmp_path):
    """--mode test must refuse to report random-weight accuracy
    (ADVICE r2 medium)."""
    import pytest

    from worddiffusion_tpu.cli.train_phosc import main

    with pytest.raises(SystemExit, match="best_params.pkl not found"):
        main([
            "--mode", "test", "--synthetic", "1", "--n_synth", "16",
            "--save_dir", str(tmp_path / "empty"),
        ])


def test_word_list_unique_past_one_cycle():
    """word_list(n) never repeats (duplicates would leak 'unseen' words
    across the zero-shot cut; ADVICE r2)."""
    from worddiffusion_tpu.data.synthetic import word_list

    for n in (500, 1000):
        words = word_list(n)
        assert len(words) == n
        assert len(set(words)) == n


def test_train_style_parser_and_corpus():
    from worddiffusion_tpu.cli.train_style import _corpus, _retrieval_accuracy, build_parser

    args = build_parser().parse_args([
        "--synthetic", "1", "--writers", "3", "--samples_per_writer", "4",
        "--img_size", "32,96",
    ])
    by_writer = _corpus(args)
    assert len(by_writer) == 3
    assert all(len(v) == 4 for v in by_writer.values())
    assert all(c.shape == (32, 96, 3) for v in by_writer.values() for c in v)
    # perfectly separable embeddings -> retrieval 1.0
    import numpy as np

    vecs = {w: np.eye(3)[i][None].repeat(4, 0) + 0.01 * np.random.default_rng(i).normal(size=(4, 3))
            for i, w in enumerate("abc")}
    assert _retrieval_accuracy(vecs) == 1.0


def test_writer_style_deterministic_and_distinct():
    from worddiffusion_tpu.data.synthetic import render_word, writer_style

    s1, s1b, s2 = writer_style("w1"), writer_style("w1"), writer_style("w2")
    assert s1 == s1b
    assert s1 != s2
    # same writer, different images: consistent slant (style pinned)
    import numpy as np

    a = render_word("hand", 32, 96, seed=1, style=s1)
    b = render_word("hand", 32, 96, seed=1, style=s2)
    assert a.shape == (32, 96, 3)
    assert not np.array_equal(a, b)  # different writers render differently


def test_regen_ocr_alphabet_follows_preset():
    """The regen OCR alphabet follows the preset's tokenizer alphabet
    (regenerateFromTrainNor.py:1064-1066 equivalent; CVL gets the
    extended digit/punct gate the reference lacks,
    regenerateFromtrainWord22CVL.py:106)."""
    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.data.alphabets import OCR_CVL, OCR_ENG, OCR_NOR

    # the selection expression used by cli.regenerate
    for name, expect in [
        ("norwegian", OCR_NOR), ("iam", OCR_ENG), ("gw", OCR_ENG),
        ("cvl", OCR_CVL),
    ]:
        exp = presets.get(name)
        alphabet = {"nor": OCR_NOR, "cvl": OCR_CVL}.get(
            exp.data.alphabet, OCR_ENG
        )
        assert alphabet == expect
    assert all(c in OCR_NOR for c in "æøå")
    assert all(c in OCR_CVL for c in "0123456789!?&'")


def test_cvl_word_list_tokenizes_and_decodes():
    """Every synthetic CVL word encodes under the cvl tokenizer AND
    round-trips through the extended OCR gate's host decode (blank '_'
    is not a CVL symbol, so blank-strip cannot corrupt words)."""
    import numpy as np

    from worddiffusion_tpu.data.alphabets import OCR_CVL, OCR_CVL_BLANK
    from worddiffusion_tpu.data.synthetic import word_list
    from worddiffusion_tpu.data.tokenizer import Tokenizer
    from worddiffusion_tpu.ops.ctc import collapse_and_decode

    tok = Tokenizer.from_name("cvl", 42)
    assert OCR_CVL[OCR_CVL_BLANK] == "_"
    for w in word_list(60, "cvl"):
        ids = tok.encode(w)
        assert tok.decode(ids) == w, w
        # perfect-frame OCR ids (blank between repeated chars) decode back
        frames = []
        prev = None
        for c in w:
            i = OCR_CVL.index(c)
            if i == prev:
                frames.append(OCR_CVL_BLANK)
            frames.append(i)
            prev = i
        assert collapse_and_decode(np.array([frames]), OCR_CVL) == [w], w


def test_nor_word_list_tokenizes():
    """Every synthetic Norwegian word encodes under the nor alphabet."""
    from worddiffusion_tpu.data.synthetic import word_list
    from worddiffusion_tpu.data.tokenizer import Tokenizer

    tok = Tokenizer.from_name("nor", 25)
    for w in word_list(60, "nor"):
        ids = tok.encode(w)
        assert tok.decode(ids) == w, w


def test_phosc_eval_batches_keep_partial_remainder():
    """Eval call sites pass drop_remainder=False so corpora smaller than
    the batch size still evaluate (the default synthetic valid split is
    40 images at batch 64 — dropping the partial batch evaluated on
    ZERO samples)."""
    from worddiffusion_tpu.cli.train_phosc import _image_batches, _load_split

    tr = _load_split("", "", 1, "eng", n_synth=80)
    small = tr[:10]
    assert list(_image_batches(small, "", 64)) == []  # train semantics
    batches = list(_image_batches(small, "", 64, drop_remainder=False))
    assert len(batches) == 1 and batches[0][0].shape[0] == 10
    # and a corpus that splits unevenly yields the tail too
    batches = list(_image_batches(tr[:10], "", 4, drop_remainder=False))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]


def test_phosc_resize_shared_path():
    """phosc_resize is the ONE resize used by both the FID featurizer
    and the evaluate-CLI ZSL path; 50x250 inputs pass through
    untouched, anything else lands at 50x250 still in [-1,1]."""
    import numpy as np

    from worddiffusion_tpu.eval.fid import phosc_resize

    already = np.zeros((2, 50, 250, 3), np.float32)
    out = phosc_resize(already)
    assert out.shape == (2, 50, 250, 3) and (out == already).all()
    img = np.random.default_rng(0).uniform(-1, 1, (2, 64, 256, 3)).astype(np.float32)
    out = phosc_resize(img)
    assert out.shape == (2, 50, 250, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_sample_words_mode_maps_dense_to_raw_writer_names(tmp_path):
    """--writer takes the dense embedding index, but the style dict is
    keyed by RAW training writer ids: the words path must invert the
    training writers_dict (cli/sample.py words branch)."""
    import json

    from worddiffusion_tpu.cli.sample import load_writers_dict

    d = tmp_path / "writers_dict_train.json"
    d.write_text(json.dumps({"000": 0, "writer-7": 1, "151": 2}))
    registry = load_writers_dict(str(d), "")
    raw_by_dense = {v: k for k, v in registry.mapping.items()}
    assert raw_by_dense == {0: "000", 1: "writer-7", 2: "151"}
    # fallback when no dict exists (parent is checked too, so isolate)
    empty = tmp_path / "isolated" / "ckpt"
    empty.mkdir(parents=True)
    assert load_writers_dict("", str(empty)) is None


def test_evaluate_cli_fails_loudly_on_missing_weights(tmp_path):
    """--phosc_params / --inception_weights pointing at nothing must
    exit, not silently skip the metric."""
    import numpy as np
    import pytest
    from PIL import Image

    from worddiffusion_tpu.cli.evaluate import main

    for sub in ("real", "fake"):
        (tmp_path / sub).mkdir()
        for i in range(2):
            arr = np.full((64, 256, 3), 255, np.uint8)
            Image.fromarray(arr).save(tmp_path / sub / f"{i}_0_word.png")
    with pytest.raises(SystemExit, match="not found"):
        main(["--real_dir", str(tmp_path / "real"),
              "--fake_dir", str(tmp_path / "fake"),
              "--phosc_params", str(tmp_path / "nope.pkl"),
              "--out", str(tmp_path / "o.json")])
    with pytest.raises(SystemExit, match="not found"):
        main(["--real_dir", str(tmp_path / "real"),
              "--fake_dir", str(tmp_path / "fake"),
              "--inception_weights", str(tmp_path / "nope.pkl"),
              "--out", str(tmp_path / "o.json")])


def test_phosc_batches_augment_and_writer_styles():
    """--renders_per_word scales training density without moving the
    seen/unseen word cut; --augment / --writer_styles change pixels but
    never targets, and eval renders stay un-augmented."""
    import numpy as np

    from worddiffusion_tpu.cli.train_phosc import _image_batches, _load_split

    tr8 = _load_split("", "", 1, "eng", n_synth=80, renders_per_word=8)
    tr24 = _load_split("", "", 1, "eng", n_synth=80, renders_per_word=24)
    va = _load_split("", "", 1, "eng", n_synth=80, split="valid")
    assert {s.word for s in tr8} == {s.word for s in tr24}  # same cut
    assert len(tr24) == 3 * len(tr8)
    assert not ({s.word for s in tr24} & {s.word for s in va})

    rng = np.random.default_rng(0)
    (plain, w1), = list(_image_batches(tr8[:4], "", 4))
    (styled, w2), = list(_image_batches(tr8[:4], "", 4, writer_styles=True))
    assert plain.shape == styled.shape == (4, 50, 250, 3)
    assert w1 == w2 and plain.dtype == np.uint8
    assert (plain != styled).any()  # writer styles move pixels

    # augment_pct=100 re-rolls pixels every epoch; eval (no rng) does not
    (aug1, _), = list(_image_batches(tr8[:4], "", 4, rng, augment_pct=100))
    (aug2, _), = list(_image_batches(tr8[:4], "", 4, rng, augment_pct=100))
    assert (aug1 != aug2).any()
    (ev1, _), = list(_image_batches(tr8[:4], "", 4))
    (ev2, _), = list(_image_batches(tr8[:4], "", 4))
    assert (ev1 == ev2).all()


@pytest.mark.slow
def test_train_sample_charimages_cli_roundtrip(tmp_path, monkeypatch):
    """cli.train --charImages -> cli.sample --charImages round trip
    through real argv on a tiny model: the glyph-conv params restore and
    the sampler conditions on rendered glyph crops
    (trainModifyCondition.py:406-446 at train time; the reference has NO
    sampling path for this mode — sampling.py only covers the published
    variants)."""
    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.configs.config import (
        DataConfig, DiffusionConfig, Experiment, UNetConfig,
    )

    tiny = Experiment(
        name="iam_base",
        unet=UNetConfig(
            model_channels=16, context_dim=16, num_heads=2, vocab_size=54,
            num_writers=8, max_seq_len=10, in_channels=3, out_channels=3,
            dtype="float32", char_image_size=(8, 8),
        ),
        data=DataConfig(max_chars=10, img_height=16, img_width=32, latent=False),
        diffusion=DiffusionConfig(num_steps=8),
    )
    monkeypatch.setattr(presets, "get", lambda name: tiny)
    from worddiffusion_tpu.cli import sample as sample_cli
    from worddiffusion_tpu.cli import train as train_cli

    run = tmp_path / "run"
    train_cli.main([
        "--preset", "iam_base", "--synthetic", "1", "--vocab_size", "3",
        "--samples_per_word", "4", "--charImages", "1", "--latent", "0",
        "--epochs", "1", "--batch_size", "4", "--img_size", "16,32",
        "--mesh_data", "1", "--save_path", str(run),
    ])
    out = tmp_path / "out"
    sample_cli.main([
        "--preset", "iam_base", "--ckpt_dir", str(run / "ckpt"),
        "--charImages", "1", "--words", "the,of", "--n", "1",
        "--writer", "1", "--save_path", str(out),
    ])
    pngs = sorted(os.listdir(out))
    assert len(pngs) == 2 and pngs[0].endswith("the.png")


def test_sample_interpolation_flags():
    """--writer2/--mix_rate expose the sampler's writer-embedding
    interpolation (reference --interpolation + mix_rate,
    sampling.py:122-124, unet.py:1559-1570)."""
    from worddiffusion_tpu.cli.sample import build_parser

    args = build_parser().parse_args(
        ["--ckpt_dir", "x", "--writer", "1", "--writer2", "3",
         "--mix_rate", "0.25"]
    )
    assert args.writer2 == 3 and args.mix_rate == 0.25
    # defaults: interpolation off; mix negative = per-sample uniform
    # draws, the reference gt-file distribution (full_sampling.py:150)
    defaults = build_parser().parse_args(["--ckpt_dir", "x"])
    assert defaults.writer2 == -1 and defaults.mix_rate < 0


def test_sample_img_conditioned_flags():
    """--imgConditioned needs --cond_image; the flags parse
    (reference-latent conditioning, trainModifyCondition.py:733)."""
    from worddiffusion_tpu.cli.sample import build_parser, main

    args = build_parser().parse_args(
        ["--ckpt_dir", "x", "--imgConditioned", "1", "--cond_image", "a.png"]
    )
    assert args.imgConditioned == 1 and args.cond_image == "a.png"
    with pytest.raises(SystemExit, match="needs --cond_image"):
        main(["--ckpt_dir", "x", "--imgConditioned", "1"])


@pytest.mark.slow
def test_train_phosc_calib_record_tracks_checkpoint(tmp_path):
    """The calib_words.json on disk always describes the best_params.pkl
    on disk: a full-vocab retrain that stops BEFORE its first checkpoint
    write must leave a previous run's holdout record (and checkpoint)
    intact; once the retrain writes a checkpoint, the stale record goes
    (advisor round-4: deleting it up front orphaned the old checkpoint's
    holdout on a crashed retrain)."""
    import json

    from worddiffusion_tpu.cli.train_phosc import main as phosc_main

    save = tmp_path / "phosc"
    save.mkdir()
    (save / "calib_words.json").write_text(json.dumps(["oldword"]))
    (save / "best_params.pkl").write_bytes(b"old-ckpt-stand-in")
    flag = tmp_path / "stop.txt"
    flag.write_text("0")  # raised: stop before any epoch trains
    phosc_main([
        "--mode", "train", "--synthetic", "1", "--n_synth", "16",
        "--renders_per_word", "2", "--epochs", "1", "--batch_size", "8",
        "--save_dir", str(save), "--flagFile", str(flag),
    ])
    # no checkpoint written -> the old (ckpt, calib) pair is untouched
    assert json.loads((save / "calib_words.json").read_text()) == ["oldword"]
    assert (save / "best_params.pkl").read_bytes() == b"old-ckpt-stand-in"
    phosc_main([
        "--mode", "train", "--synthetic", "1", "--n_synth", "16",
        "--renders_per_word", "2", "--epochs", "1", "--batch_size", "8",
        "--save_dir", str(save),
    ])
    # full-vocab checkpoint written -> stale holdout record removed
    assert not (save / "calib_words.json").exists()
    assert (save / "best_params.pkl").stat().st_size > 100


@pytest.mark.slow
def test_train_phosc_len_counter_cycle(tmp_path):
    """Full reference test-mode protocol with length estimation
    (gzslAccuracyTestAni lenEstimation path, engine.py:273-461):
    train_phosc 1 epoch -> train_charcounter 1 epoch -> --mode test
    --len_counter reports length_accuracy alongside ZSL/GZSL."""
    from worddiffusion_tpu.cli import train_charcounter
    from worddiffusion_tpu.cli.train_phosc import main as phosc_main

    save = tmp_path / "phosc"
    phosc_main([
        "--mode", "train", "--synthetic", "1", "--n_synth", "16",
        "--renders_per_word", "2", "--epochs", "1", "--batch_size", "8",
        "--save_dir", str(save), "--calib_words_fraction", "0.2",
    ])
    # margin-calibration holdout recorded; test mode below must pick it
    # up as the genuine pseudo-unseen split
    assert (save / "calib_words.json").exists()
    counter_dir = tmp_path / "counter"
    train_charcounter.main([
        "--synthetic", "1", "--samples_per_word", "2", "--epochs", "1",
        "--batch_size", "8", "--save_dir", str(counter_dir),
    ])
    phosc_main([
        "--mode", "test", "--synthetic", "1", "--n_synth", "16",
        "--renders_per_word", "2", "--batch_size", "8",
        "--save_dir", str(save),
        "--len_counter", str(counter_dir / "params.pkl"),
    ])
    results = (save / "testresults.txt").read_text()
    for key in ("zsl=", "gzsl_harmonic=", "gzsl_valmargin_gamma=",
                "gzsl_valmargin_harmonic=", "length_accuracy=",
                "length_fuzzy_accuracy="):
        assert key in results, results
