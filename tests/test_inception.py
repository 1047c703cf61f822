"""InceptionV3 featurizer parity (``eval/inception.py``).

A hand-written torch mirror of torchvision ``inception_v3`` (BasicConv2d
= conv(bias=False) + BatchNorm(eps=1e-3) + relu, Mixed_5b..7c, identical
state-dict key layout) is random-initialised with perturbed BN running
stats; the converter folds the BN and the Flax forward must match the
torch eval-mode forward. Proves the "ready Inception path" for classic
FID: drop real torchvision weights on disk and ``cli.evaluate
--inception_weights`` computes standard FID (VERDICT r2 next #4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.slow


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([b1, b5, bd, bp], 1)


class InceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F

        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class InceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b7, bd, bp], 1)


class InceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        import torch.nn.functional as F

        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class InceptionE(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        import torch.nn.functional as F

        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
        return torch.cat([self.branch1x1(x), b3, bd, bp], 1)


class TorchInceptionFeatures(nn.Module):
    """torchvision inception_v3 trunk with identical state-dict keys."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionA(192, 32)
        self.Mixed_5c = InceptionA(256, 64)
        self.Mixed_5d = InceptionA(288, 64)
        self.Mixed_6a = InceptionB(288)
        self.Mixed_6b = InceptionC(768, 128)
        self.Mixed_6c = InceptionC(768, 160)
        self.Mixed_6d = InceptionC(768, 160)
        self.Mixed_6e = InceptionC(768, 192)
        self.Mixed_7a = InceptionD(768)
        self.Mixed_7b = InceptionE(1280)
        self.Mixed_7c = InceptionE(2048)

    def forward(self, x):
        import torch.nn.functional as F

        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for blk in [self.Mixed_5b, self.Mixed_5c, self.Mixed_5d, self.Mixed_6a,
                    self.Mixed_6b, self.Mixed_6c, self.Mixed_6d, self.Mixed_6e,
                    self.Mixed_7a, self.Mixed_7b, self.Mixed_7c]:
            x = blk(x)
        return x.mean(dim=(2, 3))


def test_inception_feature_parity():
    from worddiffusion_tpu.eval.inception import (
        InceptionV3Features,
        convert_torch_inception,
    )

    torch.manual_seed(0)
    ref = TorchInceptionFeatures().eval()
    with torch.no_grad():  # non-trivial BN stats so folding is exercised
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.add_(0.2 * torch.randn_like(m.running_mean))
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)

    x = torch.rand(2, 3, 128, 128) * 2 - 1  # 128px keeps the test fast
    with torch.no_grad():
        ref_out = ref(x).numpy()

    params = convert_torch_inception(
        {k: v.numpy() for k, v in ref.state_dict().items()}
    )
    net = InceptionV3Features(resize=False)
    ours = np.asarray(net.apply(
        params, np.transpose(x.numpy(), (0, 2, 3, 1))
    ))
    assert ours.shape == (2, 2048)
    diff = np.abs(ours - ref_out).max()
    assert diff < 2e-3, f"max abs diff {diff}"


def test_classic_fid_activation_cli_end_to_end(tmp_path):
    """The single classic-FID activation step (BASELINE.md / README):
    drop an inception_v3 state dict on disk and run

        cli.evaluate --real_dir A --fake_dir B --inception_weights W

    Drills the FULL CLI path the parity tests don't: torch ``.pt``
    state-dict load -> BN-folding conversion -> jitted featurizer ->
    FID over two real image directories (the quality gate implied at
    ``regenerateFromtrain2.py:964-967``)."""
    import json

    from PIL import Image

    from worddiffusion_tpu.cli.evaluate import main as eval_main
    from worddiffusion_tpu.data.synthetic import render_word

    torch.manual_seed(2)
    wpath = tmp_path / "inception_v3.pt"
    torch.save(TorchInceptionFeatures().state_dict(), wpath)

    real, fake = tmp_path / "real", tmp_path / "fake"
    real.mkdir(), fake.mkdir()
    for i, w in enumerate(["deed", "flag", "moon", "park", "quiz", "vast"]):
        Image.fromarray(render_word(w, 64, 256, seed=i)).save(
            real / f"img{i}_00_{w}.png")
        Image.fromarray(render_word(w, 64, 256, seed=100 + i)).save(
            fake / f"img{i}_00_{w}.png")

    out = tmp_path / "res.json"
    eval_main(["--real_dir", str(real), "--fake_dir", str(fake),
               "--inception_weights", str(wpath), "--batch_size", "3",
               "--out", str(out)])
    res = json.loads(out.read_text())
    assert np.isfinite(res["fid_inception"]) and res["fid_inception"] > 0

    # identical sets -> FID ~ 0 through the same CLI path
    out2 = tmp_path / "res2.json"
    eval_main(["--real_dir", str(real), "--fake_dir", str(real),
               "--inception_weights", str(wpath), "--batch_size", "3",
               "--out", str(out2)])
    same = json.loads(out2.read_text())["fid_inception"]
    assert abs(same) < 1e-3, same


def test_inception_npz_weights_roundtrip(tmp_path):
    """load_inception_featurizer accepts an .npz state dict and resizes
    arbitrary input to 299."""
    from worddiffusion_tpu.eval.inception import load_inception_featurizer

    torch.manual_seed(1)
    ref = TorchInceptionFeatures()
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    path = tmp_path / "inception.npz"
    np.savez(path, **sd)
    fn = load_inception_featurizer(str(path), batch_jit=False)
    out = fn(np.zeros((1, 64, 256, 3), np.float32))
    assert out.shape == (1, 2048)
