"""Numerical parity of the Flax AutoencoderKL against a real torch forward.

The reference freezes diffusers' pretrained AutoencoderKL as its latent
codec (``trainModifyCondition.py:1130-1139``; decode ``train.py:239-247``).
diffusers itself is not installed here, so this file hand-writes a minimal
torch mirror of the SD VAE forward (same module graph, same diffusers
state-dict naming), random-initialises it, converts the state dict with
``convert_diffusers_vae``, and asserts encode (mean AND logvar) and decode
match the torch outputs — the test ``test_vae.py`` could not provide
(it only checked shapes on a synthetic dict).

The torch mirror follows diffusers' `AutoencoderKL` exactly:
  * ResnetBlock2D: GN(eps 1e-6) -> SiLU -> 3x3 conv, twice; 1x1 shortcut
    on channel change.
  * Downsample2D(padding=0): asymmetric (0,1,0,1) pad then stride-2 conv.
  * Upsample2D: nearest 2x then 3x3 conv.
  * Mid block: resnet, single-head attention (group_norm + q/k/v/out
    linears, scale c**-0.5), resnet.
  * quant_conv / post_quant_conv 1x1; DiagonalGaussian splits moments on
    the channel axis and clamps logvar to [-30, 20].
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


def _gn(c):
    return nn.GroupNorm(32 if c % 32 == 0 else c, c, eps=1e-6)


class _Resnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = _gn(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = _gn(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x):
        h = self.conv1(nn.functional.silu(self.norm1(x)))
        h = self.conv2(nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _Attn(nn.Module):
    """diffusers Attention with one head over spatial tokens."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = _gn(c)
        self.to_q = nn.Linear(c, c)
        self.to_k = nn.Linear(c, c)
        self.to_v = nn.Linear(c, c)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        x = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(x), self.to_k(x), self.to_v(x)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](attn @ v)
        return res + out.transpose(1, 2).reshape(b, c, h, w)


class _Mid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.resnets = nn.ModuleList([_Resnet(c, c), _Resnet(c, c)])
        self.attentions = nn.ModuleList([_Attn(c)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _Down(nn.Module):
    def __init__(self, cin, cout, n_res, has_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if j == 0 else cout, cout) for j in range(n_res)]
        )
        if has_down:
            ds = nn.Module()
            ds.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([ds])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = nn.functional.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _Up(nn.Module):
    def __init__(self, cin, cout, n_res, has_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_Resnet(cin if j == 0 else cout, cout) for j in range(n_res + 1)]
        )
        if has_up:
            us = nn.Module()
            us.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([us])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = nn.functional.interpolate(x, scale_factor=2, mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class TorchSDVAE(nn.Module):
    """Minimal diffusers-naming AutoencoderKL (encode/decode only)."""

    def __init__(self, base=32, mult=(1, 2, 4, 4), n_res=2, latent=4, cin=3):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(cin, base, 3, padding=1)
        blocks = []
        ch = base
        for i, m in enumerate(mult):
            out = base * m
            blocks.append(_Down(ch, out, n_res, i != len(mult) - 1))
            ch = out
        enc.down_blocks = nn.ModuleList(blocks)
        enc.mid_block = _Mid(ch)
        enc.conv_norm_out = _gn(ch)
        enc.conv_out = nn.Conv2d(ch, 2 * latent, 3, padding=1)
        self.encoder = enc

        dec = nn.Module()
        dec.conv_in = nn.Conv2d(latent, ch, 3, padding=1)
        dec.mid_block = _Mid(ch)
        ups = []
        for i, m in reversed(list(enumerate(mult))):
            out = base * m
            ups.append(_Up(ch, out, n_res, i != 0))
            ch = out
        dec.up_blocks = nn.ModuleList(ups)
        dec.conv_norm_out = _gn(ch)
        dec.conv_out = nn.Conv2d(ch, cin, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        h = self.encoder.conv_in(x)
        for b in self.encoder.down_blocks:
            h = b(h)
        h = self.encoder.mid_block(h)
        h = nn.functional.silu(self.encoder.conv_norm_out(h))
        moments = self.quant_conv(self.encoder.conv_out(h))
        mean, logvar = torch.chunk(moments, 2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block(h)
        for b in self.decoder.up_blocks:
            h = b(h)
        h = nn.functional.silu(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)


def _nchw(a):
    return np.transpose(np.asarray(a), (0, 3, 1, 2))


def _build(base, mult, n_res, seed):
    import jax.numpy as jnp  # noqa: F401

    from worddiffusion_tpu.configs.config import VAEConfig
    from worddiffusion_tpu.models.vae import AutoencoderKL, convert_diffusers_vae

    torch.manual_seed(seed)
    ref = TorchSDVAE(base=base, mult=mult, n_res=n_res)
    # break the default-init symmetry: zero-mean inits leave GroupNorm
    # scale=1/bias=0 untouched, so also perturb those
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith(".weight") and p.ndim == 1:  # GN scales
                p.add_(0.2 * torch.randn_like(p))
            elif name.endswith(".bias"):
                p.add_(0.1 * torch.randn_like(p))
    ref.eval()
    cfg = VAEConfig(base_channels=base, channel_mult=mult,
                    num_res_blocks=n_res, dtype="float32")
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_diffusers_vae(sd, cfg)
    return ref, AutoencoderKL(cfg), params


@pytest.mark.parametrize(
    "base,mult,n_res",
    [(32, (1, 2, 4, 4), 2),   # full SD structure, narrow channels
     (16, (1, 2), 1)],        # different depth to catch index bugs
)
def test_vae_encode_decode_parity(base, mult, n_res):
    import jax.numpy as jnp

    from worddiffusion_tpu.models.vae import AutoencoderKL

    ref, ours, params = _build(base, mult, n_res, seed=0)
    f = 2 ** (len(mult) - 1)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 4 * f, 8 * f)).astype(np.float32)

    with torch.no_grad():
        ref_mean, ref_logvar = ref.encode_moments(torch.from_numpy(x))
        z = ref_mean  # deterministic: compare the mode path
        ref_img = ref.decode(z).numpy()

    mean, logvar = ours.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.encode,
    )
    d_mean = np.abs(_nchw(mean) - ref_mean.numpy()).max()
    d_logvar = np.abs(_nchw(logvar) - ref_logvar.numpy()).max()
    assert d_mean < 1e-4, f"encode mean max diff {d_mean}"
    assert d_logvar < 1e-4, f"encode logvar max diff {d_logvar}"

    img = ours.apply(
        params, jnp.asarray(ref_mean.numpy().transpose(0, 2, 3, 1)),
        method=AutoencoderKL.decode,
    )
    d_img = np.abs(_nchw(img) - ref_img).max()
    assert d_img < 1e-4, f"decode max diff {d_img}"


def test_vae_roundtrip_latent_scaling_parity():
    """encode*0.18215 then decode(/0.18215) — the exact reference call
    pattern (``trainModifyCondition.py:703-706``, ``train.py:239-247``)."""
    import jax
    import jax.numpy as jnp

    from worddiffusion_tpu.models.vae import decode_from_latent, encode_to_latent

    ref, ours, params = _build(16, (1, 2), 1, seed=1)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 16, 32)).astype(np.float32)

    lat = encode_to_latent(ours, params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                           jax.random.PRNGKey(0), sample=False)
    with torch.no_grad():
        ref_mean, _ = ref.encode_moments(torch.from_numpy(x))
        ref_lat = (ref_mean * 0.18215).numpy()
        ref_img = ref.decode(torch.from_numpy(ref_lat) / 0.18215).numpy()
    assert np.abs(_nchw(lat) - ref_lat).max() < 1e-4

    img = decode_from_latent(ours, params, jnp.asarray(lat))
    assert np.abs(_nchw(img) - ref_img).max() < 1e-4
