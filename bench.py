"""Headline benchmark.

North star (BASELINE.json): full IAM test-set regeneration at >= 50
sampled 64x256 word images/sec/chip. The headline number is the FULL
regeneration pipeline exactly as the reference runs it
(``regenerateFromtrain2.py``): 600-step DDPM with the skip-step call
schedule (~121 denoiser calls, deterministic update) on the flagship
320-ch UNet, **plus** VAE decode (``:624-636``), the CTC OCR filter
forward + greedy decode (``:291-315,896-967``), and host PNG writes —
depth-2 pipelined over 10 batches so host work overlaps device
compute (steady state, like ``generate/regenerate.Regenerator``),
batch 128, one real chip.

The metric string also carries component numbers measured in the same
run: the SAME pipeline program's device-only ceiling (the honest upper
bound — round-4 decomposition, BENCHMARKS.md), the latent sampler
alone (the round-1 headline), the full 1000-call DDPM mode (judged
against the CORRECTED 19.4 imgs/s HBM ceiling — 5.42 GB/call with the
fused FFN kernel's hand-counted traffic, docs/roofline_cost_analysis
.json "corrected"; the round-5 decomposition shows the call is ~72%
MXU time, so the achievable floor is ~7.4 ms/call ≈ 17 imgs/s), and
the flagship train-step throughput (the reference's main entry point).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def _log(msg: str) -> None:
    """Stage progress on stderr (stdout stays the one JSON line)."""
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _best_of(run, rng_fold, x, reps=3):
    import jax

    jax.block_until_ready(run(rng_fold(0), x))  # compile
    best = float("inf")
    for i in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(run(rng_fold(i), x))
        best = min(best, time.perf_counter() - t0)
    return best


def _fast_init(init_fn, *args):
    """Random params without per-initializer XLA programs (shared impl:
    ``worddiffusion_tpu.utils.fastinit``)."""
    from worddiffusion_tpu.utils.fastinit import fast_init

    return fast_init(init_fn, *args)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from worddiffusion_tpu.configs import presets
    from worddiffusion_tpu.data.alphabets import OCR_ENG
    from worddiffusion_tpu.diffusion.sampler import (
        ddpm_sample, latent_to_image, regen_call_mask,
    )
    from worddiffusion_tpu.diffusion.schedule import NoiseSchedule
    from worddiffusion_tpu.models.ocr import CTCRecognizer
    from worddiffusion_tpu.models.unet import UNet
    from worddiffusion_tpu.models.vae import (
        AutoencoderKL, decode_from_latent,
    )
    from worddiffusion_tpu.ops.ctc import collapse_and_decode
    from worddiffusion_tpu.utils.images import save_single_images

    BATCH = 128
    exp = presets.get("iam")
    model = UNet(exp.unet)
    rng = jax.random.PRNGKey(0)

    x = jax.random.normal(rng, (BATCH, 8, 32, 4), jnp.float32)
    ctx = jax.random.randint(rng, (BATCH, exp.data.max_chars), 0, 53)
    wid = jnp.ones((BATCH,), jnp.int32)
    params = _fast_init(
        model.init, rng, x[:1], jnp.zeros((1,), jnp.int32), ctx[:1], wid[:1]
    )

    vae = AutoencoderKL(exp.vae)
    vae_params = _fast_init(
        vae.init, rng, jnp.zeros((1, 64, 256, 3), jnp.float32), jax.random.PRNGKey(0)
    )
    ocr = CTCRecognizer(num_classes=len(OCR_ENG))
    ocr_vars = _fast_init(ocr.init, rng, jnp.zeros((1, 64, 256, 1), jnp.float32))

    fold = lambda i: jax.random.fold_in(rng, i)
    s600 = NoiseSchedule.linear(600)
    mask = regen_call_mask(600, epoch=0)

    # params enter every jitted program as ARGUMENTS, not closed-over
    # constants — the axon tunnel rejects programs with embedded
    # multi-hundred-MB constant blobs (HTTP 413)

    # 1) latent sampler alone (round-1 headline, kept for comparison)
    @jax.jit
    def sampler_run_p(p, r, xi):
        return ddpm_sample(
            s600, lambda xx, tt: model.apply(p, xx, tt, ctx, wid),
            r, xi, stochastic=False, call_mask=mask,
        )

    _log("models initialised; compiling skip-step sampler")
    sampler_run = lambda r, xi: sampler_run_p(params, r, xi)
    dt_sampler = _best_of(sampler_run, fold, x)
    _log(f"sampler-alone done ({BATCH / dt_sampler:.1f} imgs/s); compiling full pipeline")
    sampler_ips = BATCH / dt_sampler / jax.device_count()

    # 2) FULL pipeline: sampler -> VAE decode -> OCR logits on device;
    #    greedy CTC decode + exact-match filter + PNG writes on host,
    #    double-buffered exactly like generate/regenerate.Regenerator
    @jax.jit
    def pipeline_run_p(p, vp, ov, r, xi):
        lat = ddpm_sample(
            s600, lambda xx, tt: model.apply(p, xx, tt, ctx, wid),
            r, xi, stochastic=False, call_mask=mask,
        )
        img = latent_to_image(
            lat, lambda z: decode_from_latent(vae, vp, z * 0.18215)
        )
        logits = ocr.apply(ov, img[..., :1] * 2.0 - 1.0)
        ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        img_u8 = (img * 255.0).astype(jnp.uint8)
        return img_u8, ids

    pipeline_run = lambda r, xi: pipeline_run_p(params, vae_params, ocr_vars, r, xi)

    words = ["benchword"] * BATCH
    out_dir = tempfile.mkdtemp(prefix="bench_regen_")

    def host_process(imgs_u8, ids, tag):
        decoded = collapse_and_decode(np.asarray(ids), OCR_ENG)
        keep = [i for i, d in enumerate(decoded) if d == words[i]] or list(range(BATCH))
        save_single_images(
            np.asarray(imgs_u8)[keep], [f"{tag}_{i}.png" for i in keep], out_dir
        )

    # warmup/compile
    jax.block_until_ready(pipeline_run(fold(100), x)[0])
    _log("pipeline compiled; timing device ceiling")

    # device-only ceiling of the SAME program (dispatch all, sync one
    # element of the last output): the honest upper bound the pipelined
    # number is judged against — the sampler-alone leg above excludes
    # the VAE-decode+OCR device work the pipeline must do
    N = 10
    t0 = time.perf_counter()
    outs = [pipeline_run(fold(400 + i), x) for i in range(N)]
    np.asarray(outs[-1][0][0, 0, 0])
    ceil_ips = BATCH / ((time.perf_counter() - t0) / N) / jax.device_count()
    del outs
    _log(f"device ceiling {ceil_ips:.1f} imgs/s; timing pipelined")

    # steady-state pipelined throughput, depth-2 queue exactly like
    # generate/regenerate.Regenerator
    from collections import deque

    pending = deque()
    t0 = time.perf_counter()
    for i in range(N):
        pending.append(pipeline_run(fold(200 + i), x))  # async dispatch
        if len(pending) > 2:
            host_process(*pending.popleft(), tag=f"b{i}")
    while pending:
        host_process(*pending.popleft(), tag=f"t{len(pending)}")
    dt_pipe = (time.perf_counter() - t0) / N
    pipe_ips = BATCH / dt_pipe / jax.device_count()
    for f in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, f))
    os.rmdir(out_dir)

    # 3) full 1000-step DDPM (every step a model call)
    s1000 = NoiseSchedule.linear(1000)

    @jax.jit
    def full_run_p(p, r, xi):
        return ddpm_sample(
            s1000, lambda xx, tt: model.apply(p, xx, tt, ctx, wid), r, xi
        )

    _log(f"pipeline done ({BATCH / dt_pipe:.1f} imgs/s); compiling full-1000 DDPM")
    full_run = lambda r, xi: full_run_p(params, r, xi)
    dt_full = _best_of(full_run, fold, x, reps=2)
    full_ips = BATCH / dt_full / jax.device_count()

    # 4) training throughput (the reference's main entry point,
    #    trainModifyCondition.py:624-824): flagship jitted train step at
    #    B=128, pipelined (dispatch all, sync the last step's loss)
    _log(f"full-1000 done ({full_ips:.1f} imgs/s); compiling train step")
    from worddiffusion_tpu.train.state import TrainState, make_optimizer
    from worddiffusion_tpu.train.step import make_train_step

    tx = make_optimizer(exp.train.lr)
    t_state = TrainState.create(params, tx)
    # production training config: Trainer resolves the fused FF kernel
    # OFF for fwd+bwd programs (BENCHMARKS.md round-3/4); the param
    # tree is identical so the sampler params drop in
    import dataclasses as _dc

    t_model = UNet(_dc.replace(exp.unet, use_pallas_ffn=False))
    t_step = jax.jit(make_train_step(t_model, s600, exp, tx))
    t_batch = {
        "latent": x,
        "context": ctx,
        "writer": jnp.asarray(np.ones((BATCH,), np.int32)),
    }
    t_state, m = t_step(t_state, t_batch, fold(1000))  # compile
    jax.block_until_ready(m["loss"])
    T = 10
    t0 = time.perf_counter()
    for i in range(T):
        t_state, m = t_step(t_state, t_batch, fold(1001 + i))
    float(m["loss"])  # sync
    dt_train = (time.perf_counter() - t0) / T
    train_ips = BATCH / dt_train / jax.device_count()

    # MFU / bound-% against the committed cost dump
    # (docs/roofline_cost_analysis.json, scripts/roofline_dump.py):
    # full-DDPM vs the CORRECTED ceiling (XLA-visible bytes + the fused
    # FFN kernel's hand-counted traffic), train step vs its binding
    # resource
    roofline_note = ""
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "docs", "roofline_cost_analysis.json")) as f:
            cost = json.load(f)
        corr = cost["corrected"]
        full_bound_ms = corr["memory_bound_time_per_call_ms"] * 999
        full_pct = full_bound_ms / (dt_full * 1e3) * 100.0
        ts = cost["train_step"]
        t_bound_ms = max(ts["mxu_bound_ms"], ts["hbm_bound_ms"])
        t_pct = t_bound_ms / (dt_train * 1e3) * 100.0
        t_mfu = ts["flops"] / dt_train / (ts["mxu_peak_assumed_tflops"] * 1e12) * 100.0
        roofline_note = (
            f"; full-DDPM at {full_pct:.0f}% of the corrected "
            f"{corr['full_ddpm_roofline_imgs_per_s']:.1f} imgs/s HBM "
            f"ceiling; train step {t_pct:.0f}% of its "
            f"{ts['binding_resource']} bound ({t_mfu:.0f}% MFU)"
        )
    except (OSError, KeyError, json.JSONDecodeError) as e:
        roofline_note = f"; roofline dump unavailable ({e})"

    # 5) END-TO-END Trainer throughput (round-5 verdict item 2): the
    #    production Trainer.run over a latent-cache dataset — host batch
    #    assembly, prefetch, metrics, checkpoints and all — measured as
    #    steady-state epoch wall (epoch 0 carries the compile). Target:
    #    <= 1.2x the jitted-step row above.
    _log(f"train step done ({dt_train * 1e3:.1f} ms); timing Trainer end-to-end")
    import numpy as _np

    from worddiffusion_tpu.configs.config import DataConfig
    from worddiffusion_tpu.data.dataset import LatentLookup, WordImageDataset
    from worddiffusion_tpu.data.gt import WriterRegistry
    from worddiffusion_tpu.data.synthetic import synthetic_corpus
    from worddiffusion_tpu.data.tokenizer import Tokenizer
    from worddiffusion_tpu.train.loop import Trainer

    n_samp = BATCH * 20  # 20 steps/epoch
    samples = synthetic_corpus(words=None, samples_per_word=n_samp // 10)[:n_samp]
    reg = WriterRegistry()
    for s in samples:
        reg.add(s.writer)
    tok = Tokenizer.from_name("eng_main", exp.data.max_chars)
    lat_rng = _np.random.default_rng(0)
    cache = LatentLookup({
        s.image: lat_rng.normal(size=(8, 32, 4)).astype(_np.float32)
        for s in samples
    })
    tdir = tempfile.mkdtemp(prefix="bench_trainer_")
    t_exp = exp.replace(
        data=DataConfig(max_chars=exp.data.max_chars, batch_size=BATCH),
        train=_dc.replace(exp.train, save_path=tdir, epochs=3,
                          ckpt_every_epochs=1000, log_every=10**9),
    )
    ds = WordImageDataset(samples, reg, tok, t_exp.data, latent_cache=cache)
    trainer = Trainer(t_exp, ds)
    trainer.run(epochs=3)
    steady = trainer.epoch_seconds[1:]
    e2e_ms = sum(s for s, _ in steady) / max(sum(n for _, n in steady), 1) * 1e3
    e2e_ips = BATCH / (e2e_ms / 1e3) / jax.device_count()
    import shutil

    shutil.rmtree(tdir, ignore_errors=True)

    baseline = 50.0
    print(
        json.dumps(
            {
                "metric": (
                    "IAM regen imgs/sec/chip, FULL reference pipeline "
                    "(skip-step 600-step DDPM + VAE decode + OCR filter "
                    "+ PNG writes, depth-2 pipelined over 10 batches; "
                    f"same program device-only ceiling: {ceil_ips:.1f}; "
                    f"latent sampler alone: {sampler_ips:.1f}; full "
                    f"1000-call DDPM: {full_ips:.1f} imgs/s/chip; train "
                    f"step B={BATCH}: {train_ips:.0f} imgs/s/chip at "
                    f"{dt_train * 1e3:.1f} ms/step; Trainer end-to-end: "
                    f"{e2e_ips:.0f} imgs/s/chip at {e2e_ms:.1f} ms/step "
                    f"= {e2e_ms / (dt_train * 1e3):.2f}x the jitted step"
                    f"{roofline_note})"
                ),
                "value": round(pipe_ips, 1),
                "unit": "imgs/sec/chip",
                "vs_baseline": round(pipe_ips / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
