"""Word sampling entry (the ``sampling.py`` / ``full_sampling.py``
capability): generate word images for (word, writer) pairs.

One jit-compiled program per (batch-shape, schedule): encode words ->
scan sampler -> VAE decode, all on device; only uint8 images cross back
to host.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import Experiment
from ..data.tokenizer import PAD_TOKEN, Tokenizer
from ..diffusion.sampler import ddpm_sample, latent_to_image, pixel_to_uint8
from ..diffusion.schedule import NoiseSchedule
from ..models.unet import UNet
from ..models.vae import AutoencoderKL, decode_from_latent


class WordSampler:
    def __init__(
        self,
        exp: Experiment,
        params,
        vae: Optional[AutoencoderKL] = None,
        vae_params=None,
        call_mask: Optional[np.ndarray] = None,
        stochastic: bool = True,
        cfg_scale: float = 0.0,
        ddim_steps: int = 0,
        ddim_eta: float = 0.0,
        mesh=None,
        ocr_apply=None,
        model=None,
    ):
        """``mesh``: a jax Mesh to shard sampling over its 'data' axis
        (BASELINE config #3: full-set regeneration sharded over a
        v5e-8 slice). Batches must divide the data-axis size.

        ``ocr_apply`` (images [B,H,W,1] in [-1,1] -> CTC logits): when
        given, the OCR forward + per-frame argmax are FUSED into the
        sampling program, so only uint8 images + int frame-ids cross
        the (slow) device->host link — the reference round-trips fp32
        images through host memory instead
        (``regenerateFromtrain2.py:880-896``).

        ``model``: alternative denoiser module with the UNet call
        signature (e.g. ``HiGanDenoiserAdapter`` for ``--hiGanArch``
        checkpoints, ``trainModifyConditionHiGan.py:383-389``);
        defaults to the preset's UNet."""
        self.exp = exp
        self.mesh = mesh
        self.ocr_apply = ocr_apply
        self.model = model if model is not None else UNet(exp.unet)
        self.params = params
        self.vae = vae
        self.vae_params = vae_params
        self.tokenizer = Tokenizer.from_name(exp.data.alphabet, exp.data.max_chars)
        self.schedule = NoiseSchedule.linear(
            exp.diffusion.num_steps, exp.diffusion.beta_start, exp.diffusion.beta_end
        )
        self.call_mask = call_mask
        self.stochastic = stochastic
        self.cfg_scale = cfg_scale
        self.ddim_steps = ddim_steps
        self.ddim_eta = ddim_eta
        self._compiled = {}

    def _run_fn(self, batch: int, latent_shape: tuple):
        key = (batch, latent_shape)
        if key not in self._compiled:

            def run(params, rng, ctx, wid, phosc, wid2=None, mix=None,
                    style=None, chimg=None, condlat=None):
                x = jax.random.normal(
                    jax.random.fold_in(rng, 0), (batch,) + latent_shape, jnp.float32
                )

                def eps_fn(xx, tt):
                    return self.model.apply(
                        params, xx, tt, ctx, wid, phosc_ids=phosc,
                        writer_id2=wid2, mix_rate=mix, style_vec=style,
                        char_images=chimg, cond_latents=condlat,
                    )

                uncond_fn = None
                if self.cfg_scale > 0:

                    def uncond_fn(xx, tt):
                        pad_ctx = jnp.full_like(ctx, PAD_TOKEN)
                        return self.model.apply(
                            params, xx, tt, pad_ctx, wid,
                            phosc_ids=phosc,
                            writer_mask=jnp.zeros((batch,), jnp.float32),
                        )

                if self.ddim_steps:
                    from ..diffusion.sampler import ddim_sample

                    lat = ddim_sample(
                        self.schedule, eps_fn, jax.random.fold_in(rng, 1), x,
                        num_steps=self.ddim_steps,
                        eta=self.ddim_eta,
                        cfg_scale=self.cfg_scale,
                        uncond_eps_fn=uncond_fn,
                    )
                else:
                    lat = ddpm_sample(
                        self.schedule, eps_fn, jax.random.fold_in(rng, 1), x,
                        stochastic=self.stochastic,
                        call_mask=self.call_mask,
                        cfg_scale=self.cfg_scale,
                        uncond_eps_fn=uncond_fn,
                    )
                if self.vae is not None:
                    img = latent_to_image(
                        lat,
                        lambda z: decode_from_latent(
                            self.vae, self.vae_params, z * 0.18215
                        ),
                    )
                    img = (img * 255.0).astype(jnp.uint8)
                else:
                    img = pixel_to_uint8(lat)
                if self.ocr_apply is not None:
                    gray = img[..., :1].astype(jnp.float32) / 127.5 - 1.0
                    ids = jnp.argmax(self.ocr_apply(gray), axis=-1).astype(jnp.int32)
                    return img, ids
                return img

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self.mesh, P())
                data = NamedSharding(self.mesh, P("data"))
                self._compiled[key] = jax.jit(
                    run,
                    in_shardings=(None, rep, data, data, None, None, None,
                                  None, None, None),
                    out_shardings=data,
                )
            else:
                self._compiled[key] = jax.jit(run)
        return self._compiled[key]

    def sample_async(
        self,
        words: Sequence[str],
        writer_ids: Sequence[int],
        rng: jax.Array,
        phosc: Optional[np.ndarray] = None,
        writer_ids2: Optional[Sequence[int]] = None,
        mix_rate: Optional[float] = None,
        style_vec: Optional[np.ndarray] = None,
        char_images: Optional[np.ndarray] = None,
        cond_latents: Optional[np.ndarray] = None,
    ) -> jax.Array:
        """Dispatch sampling and return the on-device result WITHOUT
        blocking (JAX async dispatch). The caller overlaps host work
        (OCR post-processing, PNG writes) with device compute and syncs
        with ``np.asarray`` when needed — used by the Regenerator's
        double buffering. ``style_vec`` [B, D]: per-sample writer-style
        vectors for ``--wrdChrWrStyl`` models (``unet.py:1159-1161``).
        ``char_images`` [B, max_chars, gh, gw, 1]: per-character glyph
        crops for ``--charImages`` models
        (``trainModifyCondition.py:406-446``). ``cond_latents``
        [B, h, w, c]: reference latents (SD-scaled, i.e.
        ``encode_to_latent`` output) for ``--imgConditioned`` models
        (the trainer's ``original_images=latents``,
        ``trainModifyCondition.py:733``)."""
        ctx = jnp.asarray(self.tokenizer.encode_batch(list(words)))
        wid = jnp.asarray(np.asarray(writer_ids, np.int32))
        if self.exp.data.latent:
            latent_shape = (
                self.exp.data.img_height // 8, self.exp.data.img_width // 8, 4
            )
        else:
            latent_shape = (self.exp.data.img_height, self.exp.data.img_width, 3)
        run = self._run_fn(len(words), latent_shape)
        ph = jnp.asarray(phosc) if phosc is not None else None
        wid2 = (
            jnp.asarray(np.asarray(writer_ids2, np.int32))
            if writer_ids2 is not None else None
        )
        # scalar or per-sample [B] (the reference draws a fresh
        # random.uniform(0,1) per item in gt-file sampling,
        # full_sampling.py:150)
        mix = (
            jnp.asarray(
                np.broadcast_to(np.asarray(mix_rate, np.float32), (len(words),))
            )
            if mix_rate is not None else None
        )
        sv = (
            jnp.asarray(np.asarray(style_vec, np.float32))
            if style_vec is not None else None
        )
        ci = (
            jnp.asarray(np.asarray(char_images, np.float32))
            if char_images is not None else None
        )
        cl = (
            jnp.asarray(np.asarray(cond_latents, np.float32))
            if cond_latents is not None else None
        )
        return run(self.params, rng, ctx, wid, ph, wid2, mix, sv, ci, cl)

    def sample(
        self,
        words: Sequence[str],
        writer_ids: Sequence[int],
        rng: jax.Array,
        phosc: Optional[np.ndarray] = None,
        writer_ids2: Optional[Sequence[int]] = None,
        mix_rate: Optional[float] = None,
        style_vec: Optional[np.ndarray] = None,
        char_images: Optional[np.ndarray] = None,
        cond_latents: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """-> uint8 images [B, H, W, 3] synced to host (+ OCR frame-id
        array when ``ocr_apply`` is fused in). ``writer_ids2`` +
        ``mix_rate`` interpolate between two writer styles (reference
        ``--interpolation``)."""
        out = self.sample_async(
            words, writer_ids, rng, phosc, writer_ids2, mix_rate, style_vec,
            char_images, cond_latents,
        )
        if isinstance(out, tuple):
            return tuple(np.asarray(o) for o in out)
        return np.asarray(out)

    def sample_preview(self, rng: jax.Array, words=None, n: int = 3) -> np.ndarray:
        """Fixed-probe-word preview; writer id forced to ones like the
        reference epoch preview (``trainModifyCondition.py:574``)."""
        words = words or ["text", "getting", "prop"][:n]
        wid = np.ones((len(words),), np.int32)
        phosc = None
        if self.exp.unet.use_phosc:
            from ..data.phosc import phosc_vector

            phosc = np.stack([
                phosc_vector(w, self.exp.data.phos_version, as_int=True) for w in words
            ]).astype(np.int32)
        chimg = None
        if self.exp.unet.use_char_images:
            from ..data.dataset import char_glyphs

            chimg = np.stack([
                char_glyphs(w, self.exp.data.max_chars,
                            self.exp.unet.char_image_size)
                for w in words
            ])
        cl = None
        if self.exp.unet.img_conditioned:
            # neutral (zero) reference latent: conv_in was built for the
            # concatenated width, so SOME conditioning tensor must exist
            if self.exp.data.latent:
                shape = (self.exp.data.img_height // 8,
                         self.exp.data.img_width // 8, 4)
            else:
                shape = (self.exp.data.img_height, self.exp.data.img_width, 3)
            cl = np.zeros((len(words),) + shape, np.float32)
        return self.sample(words, wid, rng, phosc, char_images=chimg,
                           cond_latents=cl)
