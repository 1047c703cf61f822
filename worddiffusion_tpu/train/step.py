"""The jitted training step.

One compiled program per step (reference hot path, SURVEY.md §3.1):
q_sample -> UNet -> MSE(eps) [+ CTC aux] -> AdamW -> EMA. The batch is
sharded over the mesh 'data' axis; params are replicated (or
tensor-sharded over 'model'); GSPMD inserts the gradient all-reduce
over ICI. RNG is folded from (seed, step) so every step is reproducible
and identical across hosts.

Batch dict layout (produced by ``data.loader``):
  ``latent``  [B, 8, 32, 4] float32 — VAE-encoded, already * 0.18215
  ``context`` [B, L] int32 char ids
  ``writer``  [B] int32 dense writer index
  ``phosc``   [B, P] int32 (phosc presets only)
  ``ocr_ids`` [B, L] int32 CTC targets   (ctc_weight > 0 only)
  ``ocr_len`` [B] int32 target lengths
  ``style_vec``    [B, D] float32 writer-style vectors (style_vec_dim>0)
  ``char_images``  [B, L, gh, gw, 1] glyph crops (use_char_images)
  ``cond_latents`` [B, 8, 32, 4] reference latents (img_conditioned;
                   defaults to the clean ``latent``)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from ..configs.config import Experiment
from ..diffusion.forward import q_sample, sample_timesteps
from ..diffusion.schedule import NoiseSchedule
from ..models.unet import UNet
from ..parallel.mesh import batch_sharding, param_sharding, replicated
from .state import TrainState, ema_update


def _check_conditioning_keys(exp: Experiment, batch) -> None:
    """Fail LOUDLY (at trace time) when the model config demands a
    conditioning input the data pipeline does not produce — the
    reference silently trains without the style token when
    ``--wrdChrWrStyl 1`` lacks data (``unet.py:1628``); we refuse."""
    required = []
    if exp.unet.style_vec_dim:
        required.append("style_vec")
    if exp.unet.use_char_images:
        required.append("char_images")
    if exp.unet.img_conditioned and "latent" not in batch:
        required.append("cond_latents")
    missing = [k for k in required if batch.get(k) is None]
    if missing:
        raise ValueError(
            f"UNet config requires conditioning batch keys {missing} but the "
            "batch only has "
            f"{sorted(k for k, v in batch.items() if v is not None)}; enable "
            "the matching WordImageDataset option (style_lookup / "
            "char_images / cond_latents)"
        )


def make_loss_fn(model: UNet, schedule: NoiseSchedule, exp: Experiment):
    tcfg = exp.train

    def loss_fn(params, batch, rng):
        _check_conditioning_keys(exp, batch)
        b = batch["latent"].shape[0]
        t_rng, n_rng, d_rng = jax.random.split(rng, 3)
        t = sample_timesteps(schedule, t_rng, b)
        noise = jax.random.normal(n_rng, batch["latent"].shape, jnp.float32)
        x_t = q_sample(schedule, batch["latent"], t, noise)

        # per-batch writer-conditioning drop (reference train.py:284-285)
        if tcfg.cfg_drop_prob > 0:
            keep = (
                jax.random.uniform(d_rng, ()) >= tcfg.cfg_drop_prob
            ).astype(jnp.float32)
            writer_mask = jnp.full((b,), 1.0) * keep
        else:
            writer_mask = None

        cond_latents = None
        if exp.unet.img_conditioned:
            # reference passes the clean latents of the same batch as
            # the conditioning reference (``trainModifyCondition.py:733``)
            cond_latents = batch.get("cond_latents", batch["latent"])

        out = model.apply(
            params,
            x_t,
            t,
            batch["context"],
            batch["writer"],
            phosc_ids=batch.get("phosc"),
            style_vec=batch.get("style_vec"),
            char_images=batch.get("char_images"),
            cond_latents=cond_latents,
            writer_mask=writer_mask,
            deterministic=True,
        )
        if exp.unet.ocr_head:
            eps, ocr_logits = out
        else:
            eps, ocr_logits = out, None

        mse = jnp.mean(jnp.square(eps - noise))
        metrics = {"mse": mse}
        loss = mse

        if tcfg.ctc_weight > 0 and ocr_logits is not None:
            # [T, B, K] -> optax wants [B, T, K]
            logits = ocr_logits.transpose(1, 0, 2)
            logit_pad = jnp.zeros(logits.shape[:2], jnp.float32)
            labels = batch["ocr_ids"]
            pad = (
                jnp.arange(labels.shape[1])[None, :] >= batch["ocr_len"][:, None]
            ).astype(jnp.float32)
            ctc = jnp.mean(
                optax.ctc_loss(logits, logit_pad, labels, pad, blank_id=0)
            )
            loss = loss + tcfg.ctc_weight * ctc
            metrics["ctc"] = ctc

        metrics["loss"] = loss
        return loss, metrics

    return loss_fn


def make_train_step(model: UNet, schedule: NoiseSchedule, exp: Experiment, tx):
    loss_fn = make_loss_fn(model, schedule, exp)
    tcfg = exp.train

    def train_step(state: TrainState, batch, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(
            state.ema_params, params, state.step, tcfg.ema_beta,
            tcfg.ema_warmup_steps,
        )
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            ema_params=ema,
        )
        return new_state, metrics

    return train_step


def jit_train_step(train_step, mesh, state: TrainState):
    """jit with explicit shardings: state replicated/TP, batch on 'data'."""
    state_sh = jax.tree_util.tree_map(lambda _: replicated(mesh), state)
    state_sh = state_sh.replace(
        params=param_sharding(state.params, mesh),
        ema_params=param_sharding(state.ema_params, mesh),
    )
    bsh = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(state_sh, bsh, replicated(mesh)),
        out_shardings=(state_sh, replicated(mesh)),
        donate_argnums=(0,),
    )
