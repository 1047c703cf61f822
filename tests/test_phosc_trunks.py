"""Pretrained-trunk recognizer variants (``residualmodels.py:352-600``).

Parity: a hand-written torch mirror of the torchvision resnet18 trunk
(with the reference's paper mods: stem padding 0, maxpool padding 0) is
random-initialised, its state dict is converted with BN folding, and the
Flax trunk output must match. Plus forward smoke for the registered
variants with the paper head shapes (phos 180 / phoc 646).
"""

import numpy as np
import pytest

from worddiffusion_tpu.models.phoscnet import (
    PHOSCNet,
    TRUNKS,
    convert_torchvision_resnet,
    resnet18_pretrain_phoscnet,
)

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402


class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=True)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=True)
        self.bn2 = nn.BatchNorm2d(cout)
        if cin != cout or stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )
        else:
            self.downsample = None

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + res)


class TorchRefTrunk(nn.Module):
    """torchvision-resnet layout + the reference's padding mods."""

    def __init__(self, blocks=(2, 2, 2, 2)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=0, bias=True)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=0)
        cin = 64
        for stage, n in enumerate(blocks):
            feats = 64 * (2 ** stage)
            layers = []
            for b in range(n):
                stride = 2 if (stage > 0 and b == 0) else 1
                layers.append(_BasicBlock(cin, feats, stride))
                cin = feats
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))
        self.blocks = blocks

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(len(self.blocks)):
            h = getattr(self, f"layer{i + 1}")(h)
        return h


@pytest.mark.parametrize("blocks,name", [((2, 2, 2, 2), "resnet18_pretrain"),
                                         ((3, 4, 6, 3), "resnet34")])
def test_torch_resnet_trunk_parity(blocks, name):
    import jax.numpy as jnp

    torch.manual_seed(0)
    ref = TorchRefTrunk(blocks)
    with torch.no_grad():  # perturb BN stats so folding is exercised
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.add_(0.2 * torch.randn_like(m.running_mean))
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    ref.eval()
    x = torch.randn(2, 3, 50, 250)
    with torch.no_grad():
        ref_out = ref(x).numpy()

    params = convert_torchvision_resnet(
        {k: v.numpy() for k, v in ref.state_dict().items()}, blocks
    )
    trunk = TRUNKS[name](jnp.float32, "none")
    out = trunk.apply({"params": params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    assert out.shape == ref_out.shape
    diff = np.abs(out - ref_out).max()
    assert diff < 2e-3, f"trunk max abs diff {diff}"


def test_pretrain_phoscnet_forward_and_heads():
    import jax

    model = resnet18_pretrain_phoscnet(dtype="float32")
    x = np.random.default_rng(0).standard_normal((2, 50, 250, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["phos"].shape == (2, 180)
    assert out["phoc"].shape == (2, 646)
    assert np.all(np.asarray(out["phos"]) >= 0)          # ReLU head
    assert np.all((np.asarray(out["phoc"]) >= 0)
                  & (np.asarray(out["phoc"]) <= 1))      # sigmoid head
    # one hidden layer per head (paper variant)
    assert "phos_fc0" in params["params"] and "phos_fc1" not in params["params"]


def test_attention_alias_is_pretrain_shape():
    import jax

    m = PHOSCNet(trunk="resnet18_attention", phos_size=180, phoc_size=646,
                 head_layers=1, dtype="float32")
    x = np.zeros((1, 50, 250, 3), np.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out["phos"].shape == (1, 180)
