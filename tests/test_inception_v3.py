"""Native flax FID-InceptionV3 vs an independently-constructed torch model.

Same pattern as tests/test_i3d.py: the pretrained NVIDIA export
(metrics/frechet_inception_distance.py reference :25) is unavailable offline,
so the ARCHITECTURE + state_dict CONVERTER are validated against a torch
InceptionV3 built here from the published topology (torchvision layout with
the pytorch-fid TF-style branch pools), random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from long_video_gan_tpu.metrics.inception_v3 import (  # noqa: E402
    InceptionV3, inception_variables_from_state_dict)


class TBasicConv2d(torch.nn.Module):
    def __init__(self, in_ch, out_ch, **kw):
        super().__init__()
        self.conv = torch.nn.Conv2d(in_ch, out_ch, bias=False, **kw)
        self.bn = torch.nn.BatchNorm2d(out_ch, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def t_avg_pool_tf(x):
    return F.avg_pool2d(x, kernel_size=3, stride=1, padding=1,
                        count_include_pad=False)


class TInceptionA(torch.nn.Module):
    def __init__(self, in_ch, pool_features):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv2d(in_ch, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv2d(in_ch, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(t_avg_pool_tf(x))], 1)


class TInceptionB(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3 = TBasicConv2d(in_ch, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class TInceptionC(torch.nn.Module):
    def __init__(self, in_ch, c7):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv2d(in_ch, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(t_avg_pool_tf(x))], 1)


class TInceptionD(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch3x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv2d(in_ch, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            F.max_pool2d(x, kernel_size=3, stride=2)], 1)


class TInceptionE(torch.nn.Module):
    def __init__(self, in_ch):
        super().__init__()
        self.branch1x1 = TBasicConv2d(in_ch, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv2d(in_ch, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv2d(in_ch, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasicConv2d(in_ch, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(t_avg_pool_tf(x))], 1)


class TInceptionV3(torch.nn.Module):
    def __init__(self, num_classes=1008):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32)
        self.Mixed_5c = TInceptionA(256, 64)
        self.Mixed_5d = TInceptionA(288, 64)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128)
        self.Mixed_6c = TInceptionC(768, 160)
        self.Mixed_6d = TInceptionC(768, 160)
        self.Mixed_6e = TInceptionC(768, 192)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280)
        self.Mixed_7c = TInceptionE(2048)
        self.fc = torch.nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


def test_inception_converted_features_match(rng):
    torch.manual_seed(0)
    m = TInceptionV3().eval()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.8, 1.2)

    img = rng.standard_normal((2, 3, 299, 299)).astype(np.float32) * 0.5
    with torch.no_grad():
        want_feats, want_logits = m(torch.from_numpy(img))

    variables = inception_variables_from_state_dict(m.state_dict())
    got_feats, got_logits = InceptionV3().apply(variables, jnp.asarray(img))

    assert got_feats.shape == tuple(want_feats.shape) == (2, 2048)
    assert got_logits.shape == tuple(want_logits.shape) == (2, 1008)
    np.testing.assert_allclose(np.asarray(got_feats), want_feats.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_inception_detector_roundtrip(tmp_path, rng, monkeypatch):
    """Traced-module file -> converter -> on-device detector, incl. the
    is50k no_output_bias option (reference inception_score.py:26)."""
    from long_video_gan_tpu.metrics import detectors
    from long_video_gan_tpu.metrics.inception_v3 import InceptionDetector

    torch.manual_seed(1)
    m = TInceptionV3().eval()
    example = torch.zeros(1, 3, 299, 299)
    path = str(tmp_path / "inception.pt")
    with torch.no_grad():
        torch.jit.trace(m, example).save(path)

    det = InceptionDetector.from_torchscript(path)
    imgs = (rng.random((2, 3, 64, 64)) * 255).astype(np.uint8)
    feats = det(imgs, return_features=True)
    assert feats.shape == (2, 2048) and np.isfinite(feats).all()
    probs = det(imgs, return_probs=True, no_output_bias=True)
    assert probs.shape == (2, 1008)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)

    # Registry resolution by basename.
    detectors.get_detector.cache_clear()
    got = detectors.get_detector(path)
    assert isinstance(got, InceptionDetector)
    detectors.get_detector.cache_clear()
