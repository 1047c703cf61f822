import os

import jax
import numpy as np

from worddiffusion_tpu.configs.config import (
    DataConfig,
    DiffusionConfig,
    Experiment,
    UNetConfig,
)
from worddiffusion_tpu.data.gt import Sample
from worddiffusion_tpu.diffusion.sampler import regen_call_mask
from worddiffusion_tpu.generate.regenerate import Regenerator, scan_existing
from worddiffusion_tpu.generate.sample import WordSampler


def pixel_exp(steps=12):
    return Experiment(
        name="pix",
        unet=UNetConfig(
            model_channels=16, context_dim=16, num_heads=2, vocab_size=54,
            num_writers=8, max_seq_len=10, in_channels=3, out_channels=3,
            dtype="float32",
        ),
        data=DataConfig(max_chars=10, img_height=16, img_width=32, latent=False),
        diffusion=DiffusionConfig(num_steps=steps),
    )


def make_sampler(exp, **kw):
    from worddiffusion_tpu.models.unet import UNet

    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        np.zeros((1, 16, 32, 3), np.float32),
        np.zeros((1,), np.int32),
        np.zeros((1, 10), np.int32),
        np.zeros((1,), np.int32),
    )
    return WordSampler(exp, params, **kw)


def corpus():
    return [Sample(f"img-{i:03d}.png", str(i % 3), w)
            for i, w in enumerate(["the", "of", "and", "hand"] * 2)]


def test_regen_no_filter_writes_all(tmp_path):
    exp = pixel_exp()
    regen = Regenerator(make_sampler(exp), out_dir=str(tmp_path / "out"))
    stats = regen.run(corpus(), batch_size=4, rng=jax.random.PRNGKey(0))
    assert stats.generated == 8
    assert stats.accepted == 8
    files = os.listdir(tmp_path / "out")
    assert "img-000_0_the.png" in files
    assert len(files) == 8


def test_regen_resumable(tmp_path):
    exp = pixel_exp()
    out = str(tmp_path / "out")
    regen = Regenerator(make_sampler(exp), out_dir=out)
    regen.run(corpus()[:4], batch_size=4)
    stats = regen.run(corpus(), batch_size=4)
    assert stats.skipped_existing == 4
    assert stats.generated == 4


def test_regen_resumes_across_prior_dump_dirs(tmp_path):
    """Dump-folder history (regenerateFromtrain2.py:676-704): crops
    found in *previous* dump folders are skipped even when the current
    out_dir is fresh. Compile-free: resumption decides before sampling,
    so a batch_size covering only the remainder never calls the model."""
    from worddiffusion_tpu.utils.images import regen_filename

    samples = corpus()
    prior1 = tmp_path / "old_run_a"
    prior2 = tmp_path / "old_run_b"
    for d, sl in ((prior1, samples[:2]), (prior2, samples[2:4])):
        d.mkdir()
        for s in sl:
            (d / regen_filename(s.image, s.writer, s.word)).write_bytes(b"png")

    exp = pixel_exp()

    class FakeSampler:  # duck-typed, no UNet compile (fast tier)
        def __init__(self):
            self.exp = exp

        def sample_async(self, words, wids, rng, phosc=None):
            return np.full((len(words), 16, 32, 3), 200, np.uint8)

    regen = Regenerator(
        FakeSampler(), out_dir=str(tmp_path / "fresh"),
        prior_dirs=[str(prior1), str(tmp_path / "old_run_*b")],  # path + glob
    )
    stats = regen.run(samples, batch_size=4)
    assert stats.skipped_existing == 4
    assert stats.generated == 4
    assert len(os.listdir(tmp_path / "fresh")) == 4


def test_regen_skip_schedule_and_deterministic(tmp_path):
    exp = pixel_exp(steps=20)
    mask = regen_call_mask(20, epoch=0)
    sampler = make_sampler(exp, call_mask=mask, stochastic=False)
    regen = Regenerator(sampler, out_dir=str(tmp_path / "out"))
    stats = regen.run(corpus()[:4], batch_size=4)
    assert stats.accepted == 4
    # deterministic: same rng -> identical pixels
    imgs1 = sampler.sample(["the"], [0], jax.random.PRNGKey(5))
    imgs2 = sampler.sample(["the"], [0], jax.random.PRNGKey(5))
    assert np.array_equal(imgs1, imgs2)


def test_regen_filter_accept_reject_fake_sampler(tmp_path):
    """Compile-free accept/reject coverage (fast tier): a duck-typed
    sampler returns fixed uint8 images with no UNet compile, and a host
    OCR stub that always spells 'the' accepts exactly the 'the' samples;
    everything else lands in rejected/ (regenerateFromtrain2.py:929-967).
    The full compiled-path siblings (test_regen_ocr_filter_rejects,
    test_regen_fused_ocr_accepts_matching_word) run in the slow tier."""
    import jax.numpy as jnp

    from worddiffusion_tpu.data.alphabets import OCR_ENG

    exp = pixel_exp()

    class FakeSampler:
        def __init__(self):
            self.exp = exp

        def sample_async(self, words, wids, rng, phosc=None):
            b = len(words)
            return np.full((b, 16, 32, 3), 200, np.uint8)

    t_id, h_id, e_id = (OCR_ENG.index(c) for c in "the")

    def spell_the(imgs):
        logits = jnp.full((imgs.shape[0], 4, len(OCR_ENG)), -10.0, jnp.float32)
        for frame, cid in enumerate([t_id, h_id, e_id]):
            logits = logits.at[:, frame, cid].set(10.0)
        return logits.at[:, 3, OCR_ENG.index("_")].set(10.0)  # trailing CTC blank

    regen = Regenerator(
        FakeSampler(), ocr_apply=spell_the, out_dir=str(tmp_path / "out"),
        keep_rejected=True,
    )
    stats = regen.run(corpus(), batch_size=4)
    # corpus() is ["the","of","and","hand"] * 2 -> exactly the two 'the'
    assert stats.generated == 8 and stats.accepted == 2
    accepted = [f for f in os.listdir(tmp_path / "out") if f.endswith(".png")]
    assert sorted(accepted) == ["img-000_0_the.png", "img-004_1_the.png"]
    assert len(os.listdir(tmp_path / "out" / "rejected")) == 6


def test_regen_ocr_filter_rejects(tmp_path):
    # an OCR stub that always reads "wrong" -> nothing accepted
    exp = pixel_exp()

    def bad_ocr(imgs):
        b = imgs.shape[0]
        logits = np.full((b, 4, 55), -10.0, np.float32)
        # frames spell 'zzz' (not any target word)
        import jax.numpy as jnp

        z = 54 - 1
        out = jnp.asarray(logits).at[:, :, z].set(10.0)
        return out

    regen = Regenerator(
        make_sampler(exp), ocr_apply=bad_ocr, out_dir=str(tmp_path / "out"),
        keep_rejected=True,
    )
    stats = regen.run(corpus()[:4], batch_size=4)
    assert stats.generated == 4 and stats.accepted == 0
    assert len(os.listdir(tmp_path / "out" / "rejected")) == 4


def test_regen_fused_ocr_accepts_matching_word(tmp_path):
    """With a WordSampler, the OCR forward+argmax fuse into the device
    program (sample_async returns (uint8 images, frame ids)); a stub
    that spells 'the' accepts exactly the 'the' samples."""
    import jax.numpy as jnp

    from worddiffusion_tpu.data.alphabets import OCR_ENG

    exp = pixel_exp()

    t_id, h_id, e_id = (OCR_ENG.index(c) for c in "the")

    def spell_the(imgs):
        b, tframes = imgs.shape[0], 4
        logits = jnp.full((b, tframes, len(OCR_ENG)), -10.0, jnp.float32)
        for frame, cid in enumerate([t_id, h_id, e_id]):
            logits = logits.at[:, frame, cid].set(10.0)
        logits = logits.at[:, 3, 0].set(10.0)  # trailing blank
        return logits

    # fusion is opt-in at sampler CONSTRUCTION; the Regenerator never
    # mutates a sampler it didn't build
    sampler = make_sampler(exp, ocr_apply=spell_the)
    regen = Regenerator(sampler, ocr_apply=spell_the, out_dir=str(tmp_path / "out"))
    assert sampler.ocr_apply is spell_the
    stats = regen.run(corpus(), batch_size=4)
    n_the = sum(1 for s in corpus() if s.word == "the")
    assert stats.generated == 8
    assert stats.accepted == n_the
    files = os.listdir(tmp_path / "out")
    assert len(files) == n_the and all("_the.png" in f for f in files)


def test_regen_stop_flag(tmp_path):
    flag = tmp_path / "flagGen.txt"
    flag.write_text("0")
    exp = pixel_exp()
    regen = Regenerator(
        make_sampler(exp), out_dir=str(tmp_path / "out"), stop_flag=str(flag)
    )
    regen.stop.poll_interval_s = 0.0
    stats = regen.run(corpus(), batch_size=4)
    assert stats.generated == 0


def test_scan_existing_empty(tmp_path):
    assert scan_existing(str(tmp_path / "nope")) == set()


def test_regen_small_tail_pads_to_full_batch(tmp_path):
    """A tail smaller than half the batch must still pad to batch_size
    (one compiled program), and only the real samples are written."""
    exp = pixel_exp()
    sampler = make_sampler(exp)
    regen = Regenerator(sampler, out_dir=str(tmp_path / "out"))
    stats = regen.run(corpus()[:3], batch_size=8)  # 3 << 8/2
    assert stats.generated == 3 and stats.accepted == 3
    assert len(os.listdir(tmp_path / "out")) == 3
    # exactly one program compiled (tail padded to the static shape)
    assert len(sampler._compiled) == 1


def test_regen_double_buffer_drains_last_batch(tmp_path):
    """The double-buffered loop processes every batch including the
    final pending one, in dispatch order."""
    exp = pixel_exp()
    sampler = make_sampler(exp)
    order = []
    orig = Regenerator._process

    def spy(self, images, chunk, stats):
        order.append([name for _, name in chunk])
        return orig(self, images, chunk, stats)

    regen = Regenerator(sampler, out_dir=str(tmp_path / "out"))
    regen._process = spy.__get__(regen)
    stats = regen.run(corpus(), batch_size=3)  # 8 samples -> 3 batches
    assert stats.generated == 8 and stats.accepted == 8
    assert len(order) == 3
    assert sum(len(o) for o in order) == 8
    assert len(os.listdir(tmp_path / "out")) == 8


def test_sharded_sampling_over_mesh(tmp_path):
    from worddiffusion_tpu.configs.config import MeshConfig
    from worddiffusion_tpu.parallel.mesh import make_mesh

    exp = pixel_exp(steps=8)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    sampler = make_sampler(exp, mesh=mesh)
    imgs = sampler.sample(["the"] * 16, list(range(16)), jax.random.PRNGKey(0))
    assert imgs.shape == (16, 16, 32, 3)
    assert np.all(np.isfinite(imgs.astype(np.float32)))
    # sharded regen end-to-end
    regen = Regenerator(sampler, out_dir=str(tmp_path / "out"))
    stats = regen.run(corpus(), batch_size=8)
    assert stats.accepted == 8


def test_style_interpolation_sampling():
    exp = pixel_exp(steps=6)
    sampler = make_sampler(exp)
    # zero-init out conv -> all outputs equal at init; perturb
    import jax as _jax

    sampler.params = _jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else (p * 3.0 if p.ndim == 2 else p),
        sampler.params,
    )
    rng = jax.random.PRNGKey(0)
    a = sampler.sample(["the"], [0], rng)
    b = sampler.sample(["the"], [0], rng, writer_ids2=[3], mix_rate=1.0)
    c = sampler.sample(["the"], [3], rng)
    # mix_rate 1.0 == pure writer 3 (exact); writer-vs-writer pixel
    # differences are sub-quantisation for an untrained net, so the
    # a-vs-b contrast is asserted at model level in test_unet_extras
    assert np.array_equal(b, c)
    assert a.shape == b.shape


def test_latent_mode_sampler_with_vae(tmp_path):
    """WordSampler latent mode: sample -> VAE decode -> uint8 on device
    (only 1 byte/px crosses the device->host link)."""
    from worddiffusion_tpu.configs.config import (
        DataConfig, DiffusionConfig, Experiment, UNetConfig, VAEConfig,
    )
    from worddiffusion_tpu.models.vae import AutoencoderKL
    from worddiffusion_tpu.models.unet import UNet

    exp = Experiment(
        unet=UNetConfig(model_channels=16, context_dim=16, num_heads=2,
                        vocab_size=54, num_writers=4, max_seq_len=10,
                        dtype="float32"),
        vae=VAEConfig(base_channels=16, channel_mult=(1, 1, 2, 2),
                      num_res_blocks=1, dtype="float32"),
        data=DataConfig(max_chars=10, latent=True),
        diffusion=DiffusionConfig(num_steps=8),
    )
    rng = jax.random.PRNGKey(0)
    model = UNet(exp.unet)
    params = model.init(rng, np.zeros((1, 8, 32, 4), np.float32),
                        np.zeros((1,), np.int32), np.zeros((1, 10), np.int32),
                        np.zeros((1,), np.int32))
    vae = AutoencoderKL(exp.vae)
    vae_params = vae.init(rng, np.zeros((1, 64, 256, 3), np.float32), rng)
    sampler = WordSampler(exp, params, vae, vae_params, ddim_steps=4)
    imgs = sampler.sample(["text", "prop"], [0, 1], rng)
    assert imgs.shape == (2, 64, 256, 3)
    assert imgs.dtype == np.uint8


def test_style_vec_sampling():
    """WordSampler feeds per-sample style vectors through to the model
    (--wrdChrWrStyl inference: without this a style-trained model is
    unsampleable; reference loads the style dict at inference,
    unet.py:1159-1161)."""
    import dataclasses

    from worddiffusion_tpu.models.unet import UNet

    exp = pixel_exp()
    exp = dataclasses.replace(
        exp, unet=dataclasses.replace(
            exp.unet, style_vec_dim=8, style_replace_context=True
        )
    )
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        rng,
        np.zeros((1, 16, 32, 3), np.float32),
        np.zeros((1,), np.int32),
        np.zeros((1, 10), np.int32),
        np.zeros((1,), np.int32),
        style_vec=np.zeros((1, 8), np.float32),
    )
    # zero-init out conv makes a fresh model insensitive to ALL
    # conditioning; perturb convs so sensitivity is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    sampler = WordSampler(exp, params)
    sv = np.arange(16, dtype=np.float32).reshape(2, 8)
    imgs = sampler.sample(["the", "of"], [0, 1], rng, style_vec=sv)
    assert imgs.shape == (2, 16, 32, 3) and imgs.dtype == np.uint8
    # the style token IS the context in replace mode: different vectors
    # must change the output
    imgs2 = sampler.sample(["the", "of"], [0, 1], rng, style_vec=sv + 100.0)
    assert not np.array_equal(imgs, imgs2)


def test_char_images_sampling():
    """WordSampler feeds per-character glyph crops through to the model
    (--charImages inference: without this a glyph-trained model is
    unsampleable; the training-side crops come from the same builder,
    trainModifyCondition.py:406-446)."""
    import dataclasses

    from worddiffusion_tpu.data.dataset import char_glyphs
    from worddiffusion_tpu.models.unet import UNet

    exp = pixel_exp()
    exp = dataclasses.replace(
        exp, unet=dataclasses.replace(
            exp.unet, use_char_images=True, char_image_size=(8, 8)
        )
    )
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    glyphs = np.stack([
        char_glyphs(w, exp.data.max_chars, (8, 8)) for w in ["the", "of"]
    ])
    params = model.init(
        rng,
        np.zeros((1, 16, 32, 3), np.float32),
        np.zeros((1,), np.int32),
        np.zeros((1, 10), np.int32),
        np.zeros((1,), np.int32),
        char_images=glyphs[:1],
    )
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    sampler = WordSampler(exp, params)
    imgs = sampler.sample(["the", "of"], [0, 1], rng, char_images=glyphs)
    assert imgs.shape == (2, 16, 32, 3) and imgs.dtype == np.uint8
    # different glyph content must change the output (glyph tokens are
    # concatenated onto the context)
    glyphs2 = np.stack([
        char_glyphs(w, exp.data.max_chars, (8, 8)) for w in ["xyz", "qv"]
    ])
    imgs2 = sampler.sample(["the", "of"], [0, 1], rng, char_images=glyphs2)
    assert not np.array_equal(imgs, imgs2)
    # preview builds its own glyphs for charImages models
    prev = sampler.sample_preview(rng, n=2)
    assert prev.shape[0] == 2


def test_cond_latents_sampling():
    """WordSampler feeds reference latents through to the model
    (--imgConditioned inference: channel concat at conv_in, the
    trainer's original_images=latents, trainModifyCondition.py:733)."""
    import dataclasses

    from worddiffusion_tpu.models.unet import UNet

    exp = pixel_exp()
    exp = dataclasses.replace(
        exp, unet=dataclasses.replace(exp.unet, img_conditioned=True)
    )
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)
    cl = np.zeros((1, 16, 32, 3), np.float32)
    params = model.init(
        rng,
        np.zeros((1, 16, 32, 3), np.float32),
        np.zeros((1,), np.int32),
        np.zeros((1, 10), np.int32),
        np.zeros((1,), np.int32),
        cond_latents=cl,
    )
    # zero-init out convs make a fresh model insensitive to ALL
    # conditioning; perturb convs so sensitivity is observable
    params = jax.tree_util.tree_map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    sampler = WordSampler(exp, params)
    cond = np.random.default_rng(0).normal(size=(2, 16, 32, 3)).astype(np.float32)
    imgs = sampler.sample(["the", "of"], [0, 1], rng, cond_latents=cond)
    assert imgs.shape == (2, 16, 32, 3) and imgs.dtype == np.uint8
    # conv_in consumes the reference latent directly (no zero-init gate):
    # different references must change the output
    imgs2 = sampler.sample(["the", "of"], [0, 1], rng, cond_latents=cond + 1.0)
    assert not np.array_equal(imgs, imgs2)
    # preview supplies a neutral reference for imgConditioned models
    prev = sampler.sample_preview(rng, n=2)
    assert prev.shape[0] == 2
