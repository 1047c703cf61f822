import numpy as np

from worddiffusion_tpu.configs.config import DataConfig, VAEConfig
from worddiffusion_tpu.data import augment
from worddiffusion_tpu.data.dataset import LatentLookup, WordImageDataset
from worddiffusion_tpu.data.gt import WriterRegistry
from worddiffusion_tpu.data.loader import batches, epoch_batches, host_shard, prefetch
from worddiffusion_tpu.data.synthetic import render_word, synthetic_corpus
from worddiffusion_tpu.data.tokenizer import Tokenizer
from worddiffusion_tpu.utils.images import (
    center_on_canvas,
    crop_whitespace,
    regen_filename,
    resize_and_pad,
    save_image_grid,
)


def make_dataset(**kw):
    samples = synthetic_corpus()
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    tok = Tokenizer.from_name("eng_main", 42)
    cfg = DataConfig()
    return WordImageDataset(samples, reg, tok, cfg, **kw), samples


def test_render_word_shape_and_ink():
    img = render_word("handwriting")
    assert img.shape == (64, 256, 3)
    assert img.dtype == np.uint8
    assert (img < 100).sum() > 50  # has ink
    # deterministic per (word, seed)
    assert np.array_equal(img, render_word("handwriting"))


def test_render_word_extended_alphabet_glyphs_differ():
    """å/ø/æ must render as DISTINCT glyphs. PIL's embedded default
    font draws every non-ASCII char as the same tofu box, which would
    silently turn the Norwegian chain into tofu recognition — rendered
    single-glyph images of different special chars must not be
    identical (same seed, no jitter isolates the glyph itself)."""
    glyphs = [render_word(c, jitter=False, seed=0) for c in "æøå"]
    for i in range(len(glyphs)):
        for j in range(i + 1, len(glyphs)):
            assert not np.array_equal(glyphs[i], glyphs[j]), (i, j)
    # and each actually has ink
    for g in glyphs:
        assert (g < 100).sum() > 20


def test_char_glyphs_assembly():
    """Compile-free fast-tier coverage of the charImages conditioning
    input (``trainModifyCondition.py:406-446``): the glyph stack the
    UNet's glyph conv consumes, without building a model. The compiled
    siblings (test_char_images_sampling, test_char_image_conditioning)
    are slow-tier."""
    from worddiffusion_tpu.data.dataset import char_glyphs

    g = char_glyphs("the", 10, (8, 8))
    assert g.shape == (10, 8, 8, 1) and g.dtype == np.float32
    assert g.min() >= -1.0 and g.max() <= 1.0
    # unused slots stay white (+1)
    assert np.all(g[3:] == 1.0)
    # each used slot has ink, and distinct chars give distinct glyphs
    for i in range(3):
        assert (g[i] < 0).sum() > 0, i
    assert not np.array_equal(g[0], g[1])
    # same char -> identical glyph (deterministic render, shared cache)
    g2 = char_glyphs("tt", 10, (8, 8))
    assert np.array_equal(g2[0], g2[1]) and np.array_equal(g2[0], g[0])
    # words longer than max_chars truncate instead of erroring
    g3 = char_glyphs("abcdefgh", 4, (8, 8))
    assert g3.shape[0] == 4 and (g3[3] < 0).sum() > 0
    # the dataset emits exactly this assembly
    ds, samples = make_dataset(char_images=True)
    rec = ds[0]
    want = char_glyphs(samples[0].word, ds.cfg.max_chars, ds.char_image_size)
    assert np.array_equal(rec["char_images"], want)


def test_dataset_record():
    ds, _ = make_dataset(use_phosc=True)
    rec = ds[0]
    assert rec["image"].shape == (64, 256, 3)
    assert rec["image"].min() >= -1.0 and rec["image"].max() <= 1.0
    assert rec["context"].shape == (42,)
    assert rec["phosc"].shape == (769,)
    assert isinstance(rec["word"], str)


def test_dataset_writer_styled_renders():
    """writer_styled=True gives the synthetic fallback a writer-
    CONSISTENT style: the same (word, seed) renders differently for
    different writers, and identically to a direct styled render —
    without the flag there is no writer signal for --wrdChrWrStyl /
    style-encoder training to learn."""
    from worddiffusion_tpu.data.gt import Sample
    from worddiffusion_tpu.data.synthetic import stable_seed, writer_style

    samples = [Sample(image="same.png", writer="3", word="hand"),
               Sample(image="same.png", writer="7", word="hand")]
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    tok = Tokenizer.from_name("eng_main", 42)
    plain = WordImageDataset(samples, reg, tok, DataConfig())
    styled = WordImageDataset(samples, reg, tok, DataConfig(), writer_styled=True)
    # same image name + seed: identical without styles...
    assert np.array_equal(plain[0]["image"], plain[1]["image"])
    # ...distinct per writer with styles, and exactly the styled render
    assert not np.array_equal(styled[0]["image"], styled[1]["image"])
    direct = render_word("hand", 64, 256, seed=stable_seed("same.png"),
                         style=writer_style("3"))
    assert np.allclose(styled[0]["image"], direct.astype(np.float32) / 127.5 - 1.0)


def test_batches_and_prefetch():
    ds, _ = make_dataset()
    got = list(epoch_batches(ds, 8, epoch=0))
    assert all(b["image"].shape == (8, 64, 256, 3) for b in got)
    assert len(got) == len(ds) // 8
    # different epochs shuffle differently
    a = list(epoch_batches(ds, 8, epoch=0))[0]["image_name"]
    b = list(epoch_batches(ds, 8, epoch=1))[0]["image_name"]
    assert a != b


def test_prefetch_propagates_errors():
    def boom():
        yield {"x": np.zeros(1)}
        raise ValueError("boom")

    it = prefetch(boom())
    next(it)
    import pytest

    with pytest.raises(ValueError):
        list(it)


def test_host_shard_partitions():
    items = list(range(10))
    parts = [host_shard(items, h, 4) for h in range(4)]
    flat = sorted(x for p in parts for x in p)
    assert flat == items


def test_latent_cache_roundtrip(tmp_path):
    import jax

    from worddiffusion_tpu.data.latent_cache import build_latent_cache
    from worddiffusion_tpu.models.vae import AutoencoderKL

    ds, samples = make_dataset()
    ds.samples = ds.samples[:6]
    cfg = VAEConfig(base_channels=16, channel_mult=(1, 1, 2, 2),
                    num_res_blocks=1, dtype="float32")
    vae = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    params = vae.init(rng, np.zeros((1, 64, 256, 3), np.float32), rng)
    path = str(tmp_path / "latents.npz")
    cache = build_latent_cache(ds, vae, params, batch_size=4, out_path=path)
    assert len(cache) == 6
    loaded = LatentLookup.load(path)
    assert loaded[samples[0].image].shape == (8, 32, 4)

    # dataset consults the cache: record has latent, no image
    ds2, _ = make_dataset(latent_cache=loaded)
    ds2.samples = ds2.samples[:6]
    rec = ds2[0]
    assert "latent" in rec and "image" not in rec


def test_augment_ops_preserve_shape():
    rng = np.random.default_rng(0)
    img = render_word("test")
    for name in augment.DEFAULT_OPS:
        out = augment.random_augment(img, rng, ops=(name,))
        assert out.shape == img.shape, name
        assert out.dtype == np.uint8, name
    lined = augment.vertical_line_eraser(img, rng)
    assert (lined == 255).sum() >= (img == 255).sum()


def test_image_utils(tmp_path):
    img = render_word("pad", width=100)
    out = resize_and_pad(img[:, :80], 64, 256)
    assert out.shape == (64, 256, 3)
    cropped = crop_whitespace(render_word("x", jitter=False))
    assert cropped.shape[0] <= 64 and cropped.shape[1] <= 256
    cent = center_on_canvas(np.ones((2, 32, 100, 3), np.float32), 64, 256)
    assert cent.shape == (2, 64, 256, 3)
    assert regen_filename("a01-000.png", 7, "the") == "a01-000_7_the.png"
    save_image_grid(np.random.rand(4, 64, 256, 3).astype(np.float32),
                    str(tmp_path / "grid.png"))
    assert (tmp_path / "grid.png").exists()
