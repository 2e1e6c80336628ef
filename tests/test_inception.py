"""InceptionV3 FID extractor: parity against an independently-written torch
mirror with torchvision's exact module/state_dict layout (random weights —
no checkpoints exist in this image; loading real torchvision / pytorch-fid
weights exercises the identical key namespace)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax

from emcid_tpu.models.inception import (
    InceptionV3Features,
    fid_features,
    inception_from_torch,
)


# --- torch mirror (torchvision naming; FID patches per pytorch-fid) --------

class BasicConv2dT(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x, fid):
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=not fid)


class InceptionAT(tnn.Module):
    def __init__(self, cin, pool_features, fid=True):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2dT(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2dT(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2dT(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2dT(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2dT(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2dT(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2dT(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x, self.fid)),
        ], 1)


class InceptionBT(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2dT(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2dT(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2dT(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2dT(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class InceptionCT(tnn.Module):
    def __init__(self, cin, c7, fid=True):
        super().__init__()
        self.fid = fid
        self.branch1x1 = BasicConv2dT(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2dT(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2dT(c7, c7, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7_3 = BasicConv2dT(c7, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2dT(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2dT(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2dT(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2dT(c7, c7, kernel_size=(7, 1),
                                           padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2dT(c7, 192, kernel_size=(1, 7),
                                           padding=(0, 3))
        self.branch_pool = BasicConv2dT(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        for m in (self.branch7x7dbl_2, self.branch7x7dbl_3,
                  self.branch7x7dbl_4, self.branch7x7dbl_5):
            bd = m(bd)
        return torch.cat([
            self.branch1x1(x), b7, bd, self.branch_pool(_avg(x, self.fid)),
        ], 1)


class InceptionDT(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2dT(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2dT(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2dT(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2dT(192, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2dT(192, 192, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2dT(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b7 = self.branch7x7x3_1(x)
        for m in (self.branch7x7x3_2, self.branch7x7x3_3, self.branch7x7x3_4):
            b7 = m(b7)
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)), b7,
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class InceptionET(tnn.Module):
    def __init__(self, cin, pool_mode="avg", fid=True):
        super().__init__()
        self.pool_mode, self.fid = pool_mode, fid
        self.branch1x1 = BasicConv2dT(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2dT(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2dT(384, 384, kernel_size=(1, 3),
                                         padding=(0, 1))
        self.branch3x3_2b = BasicConv2dT(384, 384, kernel_size=(3, 1),
                                         padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2dT(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2dT(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2dT(384, 384, kernel_size=(1, 3),
                                            padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2dT(384, 384, kernel_size=(3, 1),
                                            padding=(1, 0))
        self.branch_pool = BasicConv2dT(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg(x, self.fid)
        return torch.cat([
            self.branch1x1(x), b3, bd, self.branch_pool(bp),
        ], 1)


class InceptionV3T(tnn.Module):
    def __init__(self, fid=True):
        super().__init__()
        self.fid = fid
        self.Conv2d_1a_3x3 = BasicConv2dT(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2dT(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2dT(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2dT(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2dT(80, 192, kernel_size=3)
        self.Mixed_5b = InceptionAT(192, 32, fid)
        self.Mixed_5c = InceptionAT(256, 64, fid)
        self.Mixed_5d = InceptionAT(288, 64, fid)
        self.Mixed_6a = InceptionBT(288)
        self.Mixed_6b = InceptionCT(768, 128, fid)
        self.Mixed_6c = InceptionCT(768, 160, fid)
        self.Mixed_6d = InceptionCT(768, 160, fid)
        self.Mixed_6e = InceptionCT(768, 192, fid)
        self.Mixed_7a = InceptionDT(768)
        self.Mixed_7b = InceptionET(1280, "avg", fid)
        self.Mixed_7c = InceptionET(2048, "max" if fid else "avg", fid)

    def forward(self, x):  # x in [0,1], NCHW
        x = F.interpolate(x, size=(299, 299), mode="bilinear",
                          align_corners=False)
        x = 2 * x - 1
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = InceptionV3T(fid=True).eval()
    # randomize BN running stats so the test exercises them
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.3, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    return net


@pytest.mark.slow
def test_inception_parity_and_converter(torch_net):
    params = inception_from_torch(
        {k: v.numpy() for k, v in torch_net.state_dict().items()})
    model = InceptionV3Features(fid=True)

    rng = np.random.RandomState(0)
    x = rng.rand(2, 299, 299, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply({"params": params}, x))
    assert out.shape == (2, 2048)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_inception_resize_path(torch_net):
    params = inception_from_torch(
        {k: v.numpy() for k, v in torch_net.state_dict().items()})
    model = InceptionV3Features(fid=True)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out = np.asarray(model.apply({"params": params}, x))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_fid_features_batching(torch_net):
    params = inception_from_torch(
        {k: v.numpy() for k, v in torch_net.state_dict().items()})
    model = InceptionV3Features(fid=True)
    rng = np.random.RandomState(2)
    imgs = (rng.rand(5, 32, 32, 3) * 255).astype(np.uint8)
    feats = fid_features(model, params, imgs, batch_size=2)
    assert feats.shape == (5, 2048)
    # padding must not leak into kept rows
    feats1 = fid_features(model, params, imgs, batch_size=5)
    np.testing.assert_allclose(feats, feats1, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_fid_end_to_end(tmp_path, torch_net):
    """fid_between_folders with the native extractor: FID(A, A) == 0 and
    FID(A, B) > 0."""
    from PIL import Image

    from emcid_tpu.evals.scorers import fid_between_folders

    params = inception_from_torch(
        {k: v.numpy() for k, v in torch_net.state_dict().items()})
    model = InceptionV3Features(fid=True)
    extractor = lambda imgs: fid_features(model, params, imgs, batch_size=4)

    rng = np.random.RandomState(3)
    for name, offset in (("a", 0), ("b", 120)):
        d = tmp_path / name
        d.mkdir()
        for i in range(6):
            arr = ((rng.rand(32, 32, 3) * 120) + offset).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    fab = fid_between_folders(tmp_path / "a", tmp_path / "b", extractor)
    # cached second call
    faa = fid_between_folders(tmp_path / "a", tmp_path / "a", extractor)
    assert faa == pytest.approx(0.0, abs=1e-4)
    assert fab > faa
