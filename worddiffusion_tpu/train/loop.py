"""The training driver: epochs, checkpoints, previews, stop-flag.

Orchestrates the pure jitted step (``train/step.py``) around host-side
concerns, mirroring the reference trainer behaviours (SURVEY.md §3.1):
stop-flag polling, every-N-epoch checkpointing (default 5,
``trainModifyCondition.py:813-824``), fixed-word preview sampling with
the EMA weights (``train.py:298-313``), and warm-start from the latest
checkpoint (``--loadPrev``).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Callable, Optional

import jax
import numpy as np

from ..configs.config import Experiment
from ..data.dataset import WordImageDataset
from ..data.loader import epoch_batches
from ..diffusion.schedule import NoiseSchedule
from ..models.unet import UNet
from ..parallel.mesh import make_mesh, replicated, shard_batch
from ..utils.stop_flag import StopFlag
from .checkpoint import CheckpointManager
from .state import TrainState, make_optimizer
from .step import jit_train_step, make_train_step

log = logging.getLogger("worddiffusion")

PREVIEW_WORDS = ["text", "getting", "prop"]  # reference train.py:307


class Trainer:
    def __init__(
        self,
        exp: Experiment,
        dataset: WordImageDataset,
        encode_fn: Optional[Callable] = None,
        preview_fn: Optional[Callable] = None,
        mesh=None,
        model=None,
    ):
        """``encode_fn(batch, rng) -> latent [B,8,32,4]`` maps image
        batches into the diffusion space (VAE encode); identity-like
        passthrough is used when batches already carry latents.
        ``preview_fn(state, epoch)`` renders the fixed probe words."""
        self.exp = exp
        self.dataset = dataset
        self.encode_fn = encode_fn
        self.preview_fn = preview_fn
        self.mesh = mesh or make_mesh(exp.mesh)
        self.schedule = NoiseSchedule.linear(
            exp.diffusion.num_steps, exp.diffusion.beta_start, exp.diffusion.beta_end
        )
        if model is not None:
            self.model = model
        else:
            unet_cfg = exp.unet
            if unet_cfg.use_pallas_ffn is None:
                # auto resolves OFF for training: the fused FF kernel
                # wins ~3% on sampling but every measured backward —
                # XLA-recompute (+19%) and the round-4 fused Pallas
                # backward (+36%) — costs more than the forward win on
                # fwd+bwd programs (BENCHMARKS.md round-3/round-4
                # tables; XLA's saved-residual backward is already at
                # the op's compute bound). Explicit True overrides.
                unet_cfg = dataclasses.replace(unet_cfg, use_pallas_ffn=False)
            if unet_cfg.fast_softmax is None:
                # auto resolves OFF for training: bf16 softmax
                # intermediates perturb gradients (~0.5% per attention);
                # inference keeps the quality gates, training keeps the
                # reference numerics. Explicit True overrides.
                unet_cfg = dataclasses.replace(unet_cfg, fast_softmax=False)
            self.model = UNet(unet_cfg)
        self.tx = make_optimizer(exp.train.lr, exp.train.weight_decay)
        self.ckpt = CheckpointManager(f"{exp.train.save_path}/ckpt")
        self.stop = StopFlag(exp.train.stop_flag_file)
        from ..utils.metrics import MetricsLogger, StepTimer

        self.metrics = MetricsLogger(f"{exp.train.save_path}/metrics.jsonl")
        self.timer = StepTimer()
        # (wall seconds, steps) per completed epoch of the last run() —
        # the end-to-end training rate incl. host batch assembly
        # (bench.py's Trainer-throughput row reads epoch 1+: epoch 0
        # carries the compile)
        self.epoch_seconds: list[tuple[float, int]] = []

    def init_state(self, sample_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.exp.train.seed)
        b = sample_batch
        latent = b.get("latent")
        if latent is None and self.encode_fn is None:
            latent = b.get("image")  # pixel-mode training
        if latent is None:
            latent = np.zeros(
                (2, self.exp.data.img_height // 8, self.exp.data.img_width // 8, 4),
                np.float32,
            )
        extra = {}
        if "style_vec" in b:
            extra["style_vec"] = jax.numpy.asarray(b["style_vec"][:2])
        if "char_images" in b:
            extra["char_images"] = jax.numpy.asarray(b["char_images"][:2])
        if self.exp.unet.img_conditioned:
            extra["cond_latents"] = jax.numpy.asarray(
                np.asarray(b.get("cond_latents", latent))[:2]
            )
        # one jitted program for the whole init: eager Module.init
        # dispatches one tiny compiled program per parameter (~hundreds),
        # which costs minutes of compile round-trips on a remote-compile
        # backend (axon); under jit it is a single compile
        init_fn = jax.jit(
            lambda r, lat, t, ctx, wid, **kw: self.model.init(
                r, lat, t, ctx, wid, **kw
            )
        )
        params = init_fn(
            rng,
            jax.numpy.asarray(latent[:2]),
            jax.numpy.zeros((2,), jax.numpy.int32),
            jax.numpy.asarray(b["context"][:2]),
            jax.numpy.asarray(b["writer"][:2]),
            phosc_ids=(
                jax.numpy.asarray(b["phosc"][:2]) if "phosc" in b else None
            ),
            **extra,
        )
        state = TrainState.create(params, self.tx)
        return jax.device_put(
            state,
            jax.tree_util.tree_map(lambda _: replicated(self.mesh), state),
        )

    def _device_batch(self, batch: dict, rng=None) -> dict:
        keep = {}
        if "latent" in batch:
            keep["latent"] = batch["latent"]
        elif self.encode_fn is not None:
            if rng is None:
                raise ValueError("encode_fn path needs the per-step rng")
            keep["latent"] = np.asarray(self.encode_fn(batch["image"], rng))
        else:
            keep["latent"] = batch["image"]
        for k in ("context", "writer", "phosc", "ocr_ids", "ocr_len",
                  "style_vec", "char_images", "cond_latents"):
            if k in batch:
                keep[k] = batch[k]
        if self.exp.unet.img_conditioned and "cond_latents" not in keep:
            keep["cond_latents"] = keep["latent"]
        return shard_batch(keep, self.mesh)

    def run(
        self,
        epochs: Optional[int] = None,
        resume: bool = False,
        max_steps: Optional[int] = None,
    ) -> TrainState:
        """Train to ``epochs`` TOTAL epochs (not "epochs from here").

        **RNG & resume contract** (step-deterministic, pinned by
        ``tests/test_train_loop.py::test_resume_is_bit_deterministic``):
        every stochastic input to the jitted step is a pure function of
        ``(seed, step)`` or ``(seed, epoch)`` —

        - per-step RNG: ``fold_in(PRNGKey(seed+1), state.step)`` inside
          the step (timesteps/noise/CFG-drop) and for ``encode_fn``;
        - batch order for epoch ``e``: the
          ``np.random.default_rng((seed, e))`` permutation of the
          dataset (``data/loader.epoch_batches``);
        - EMA warmup counter: ``state.step`` itself.

        Checkpoints persist {params, ema, opt_state, step}; on
        ``resume=True`` the loop derives ``(start_epoch, batch offset)``
        from the restored step and replays the epoch's permutation up to
        the offset, so resuming after ANY interruption — epoch-aligned,
        stop-flag, or ``max_steps`` kill — continues bit-identically to
        an uninterrupted ``run(epochs)`` with the same dataset,
        batch_size and seed. (The reference has no such contract: its
        ``--loadPrev`` warm-start rejoins a freshly shuffled loader,
        ``trainModifyCondition.py:1101-1104``.) One documented
        exception: host-side pixel augmentation (``augment_fn``) draws
        from a dataset-level stream that is not keyed by step, so
        augmented-pixel training is statistically but not bitwise
        resumable; latent-cache training (the production fast path) is
        exact.

        ``max_steps``: checkpoint and stop once ``state.step`` reaches
        it (a deterministic mid-epoch kill, unlike the wall-clock
        stop-flag poll).
        """
        tcfg = self.exp.train
        epochs = epochs if epochs is not None else tcfg.epochs
        # per-host slice of the global batch (multi-host SPMD: each
        # process loads 1/n of the batch; shard_batch assembles the
        # global array). Single-process: local == global.
        from ..parallel.distributed import local_batch_slice

        local_bs = local_batch_slice(self.exp.data.batch_size)
        first = next(
            epoch_batches(self.dataset, local_bs, epoch=0, seed=tcfg.seed)
        )
        state = self.init_state(first)
        start_epoch, skip_batches = 0, 0
        if resume and self.ckpt.latest_step() is not None:
            state = self.ckpt.restore(state)
            steps_per_epoch = max(len(self.dataset) // local_bs, 1)
            start_epoch = int(state.step) // steps_per_epoch
            skip_batches = int(state.step) - start_epoch * steps_per_epoch
            log.info(
                "resumed from step %s (epoch %d, %d batches into it)",
                int(state.step), start_epoch, skip_batches,
            )

        step_fn = jit_train_step(
            make_train_step(self.model, self.schedule, self.exp, self.tx),
            self.mesh,
            state,
        )
        rng = jax.random.PRNGKey(tcfg.seed + 1)
        history = []
        stopped = False
        # host-side mirror of state.step: reading int(state.step) in the
        # hot loop blocks on the in-flight step and serialises host
        # batch assembly with device compute (the round-4 ~95 ms/step vs
        # 36 ms device-only gap, BENCHMARKS.md). The mirror advances in
        # lockstep (the jitted step is step += 1 unconditionally), so
        # RNG fold-in and the resume contract are unchanged; the only
        # remaining per-step sync is the metrics read every log_every
        # steps, which bounds the dispatch queue without draining it.
        step_no = int(state.step)
        self.epoch_seconds = []
        # Tunnel/host discipline (each device->host sync costs a full
        # RTT — ~26 ms through the axon tunnel): device staging runs on
        # the prefetch worker thread when batches need no per-step rng
        # (latent-cache and pixel modes — the VAE-encode path still
        # stages on the main thread because its rng folds on step_no);
        # losses are reduced ON DEVICE and synced once per epoch; the
        # periodic metrics log ships ONE stacked array, not one sync per
        # metric.
        stage_in_worker = self.encode_fn is None
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            losses = []
            for bi, batch in enumerate(epoch_batches(
                self.dataset, local_bs, epoch=epoch, seed=tcfg.seed,
                map_fn=self._device_batch if stage_in_worker else None,
            )):
                if epoch == start_epoch and bi < skip_batches:
                    continue  # replay the interrupted epoch's permutation
                if self.stop.should_stop():
                    log.info("stop flag raised; finishing at epoch %d", epoch)
                    stopped = True
                    break
                if max_steps is not None and step_no >= max_steps:
                    log.info("max_steps %d reached; checkpoint and stop", max_steps)
                    stopped = True
                    break
                db = batch if stage_in_worker else self._device_batch(
                    batch, jax.random.fold_in(rng, step_no)
                )
                state, metrics = step_fn(state, db, rng)
                losses.append(metrics["loss"])
                self.timer.tick()
                step_no += 1
                if step_no % max(tcfg.log_every, 1) == 0:
                    keys = sorted(metrics)
                    vals = np.asarray(jax.numpy.stack(
                        [metrics[k] for k in keys]
                    ))  # one transfer for all metrics
                    self.metrics.log(
                        step_no,
                        **{k: float(v) for k, v in zip(keys, vals)},
                        step_time=self.timer.step_time_ema or 0.0,
                    )
            if losses:
                # reduce on device, sync ONCE (one tunnel RTT per epoch,
                # not one per step); the sync drains the dispatch queue,
                # so the epoch wall below is honest end-to-end time
                mean_loss = float(np.asarray(
                    jax.numpy.mean(jax.numpy.stack(losses))
                ))
                history.append(mean_loss)
                self.epoch_seconds.append((time.time() - t0, len(losses)))
                log.info(
                    "epoch %d: loss %.4f (%d steps, %.1fs)",
                    epoch, mean_loss, len(losses), time.time() - t0,
                )
            if stopped or (epoch + 1) % tcfg.ckpt_every_epochs == 0 or epoch == epochs - 1:
                self.ckpt.save(step_no, state,
                               {"loss": history[-1] if history else 0.0})
            if self.preview_fn is not None and (epoch + 1) % tcfg.ckpt_every_epochs == 0:
                imgs = self.preview_fn(state, epoch)
                if imgs is not None:  # mirror preview grid (wandb/JSONL)
                    self.metrics.log_images(step_no, "preview", imgs)
            if stopped:
                break
        return state
