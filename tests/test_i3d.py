"""Native flax I3D vs an independently-constructed torch I3D.

The real pretrained torchscript (Dropbox, metrics/frechet_video_distance.py
reference :29) is unavailable offline, so equivalence of the ARCHITECTURE and
the state_dict CONVERTER is validated against a torch InceptionI3d built here
from the published layout (piergiaj/pytorch-i3d module names; the layout the
torchscript detector exports): random weights, scripted to disk, converted,
compared on random video. When the real file is present the same converter
path runs FVD on-device (metrics/detectors.py get_detector('i3d')).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from long_video_gan_tpu.metrics.i3d import (  # noqa: E402
    _INCEPTION_BLOCKS, InceptionI3d, i3d_variables_from_state_dict)


# --------------------------------------------------------------------------
# Torch-side reference (standard published I3D layout, TF-SAME padding).


class TUnit3D(torch.nn.Module):
    def __init__(self, in_ch, out_ch, kernel=(1, 1, 1), stride=(1, 1, 1),
                 use_bn=True, activation=True, use_bias=False):
        super().__init__()
        self.kernel = kernel
        self.stride = stride
        self.conv3d = torch.nn.Conv3d(in_ch, out_ch, kernel, stride=stride,
                                      bias=use_bias)
        self.bn = torch.nn.BatchNorm3d(out_ch, eps=1e-3) if use_bn else None
        self.activation = activation

    def _same_pad(self, x):
        pads = []
        for d in (4, 3, 2):  # W, H, T (F.pad wants last-dim-first)
            size = x.shape[d]
            k = self.kernel[d - 2]
            s = self.stride[d - 2]
            total = max((-(-size // s) - 1) * s + k - size, 0)
            pads += [total // 2, total - total // 2]
        return F.pad(x, pads)

    def forward(self, x):
        x = self.conv3d(self._same_pad(x))
        if self.bn is not None:
            x = self.bn(x)
        return F.relu(x) if self.activation else x


def t_max_pool_same(x, kernel, stride):
    pads = []
    for d in (4, 3, 2):
        size = x.shape[d]
        k = kernel[d - 2]
        s = stride[d - 2]
        total = max((-(-size // s) - 1) * s + k - size, 0)
        pads += [total // 2, total - total // 2]
    return F.max_pool3d(F.pad(x, pads, value=0.0), kernel, stride)


class TInception(torch.nn.Module):
    def __init__(self, in_ch, c):
        super().__init__()
        self.b0 = TUnit3D(in_ch, c[0])
        self.b1a = TUnit3D(in_ch, c[1])
        self.b1b = TUnit3D(c[1], c[2], kernel=(3, 3, 3))
        self.b2a = TUnit3D(in_ch, c[3])
        self.b2b = TUnit3D(c[3], c[4], kernel=(3, 3, 3))
        self.b3b = TUnit3D(in_ch, c[5])

    def forward(self, x):
        return torch.cat([
            self.b0(x), self.b1b(self.b1a(x)), self.b2b(self.b2a(x)),
            self.b3b(t_max_pool_same(x, (3, 3, 3), (1, 1, 1)))], dim=1)


class TI3D(torch.nn.Module):
    def __init__(self, num_classes=400):
        super().__init__()
        self.Conv3d_1a_7x7 = TUnit3D(3, 64, kernel=(7, 7, 7), stride=(2, 2, 2))
        self.Conv3d_2b_1x1 = TUnit3D(64, 64)
        self.Conv3d_2c_3x3 = TUnit3D(64, 192, kernel=(3, 3, 3))
        chans = {"Mixed_3b": 192, "Mixed_3c": 256, "Mixed_4b": 480,
                 "Mixed_4c": 512, "Mixed_4d": 512, "Mixed_4e": 512,
                 "Mixed_4f": 528, "Mixed_5b": 832, "Mixed_5c": 832}
        for name, in_ch in chans.items():
            setattr(self, name, TInception(in_ch, _INCEPTION_BLOCKS[name]))
        self.logits = TUnit3D(1024, num_classes, use_bn=False, activation=False,
                              use_bias=True)

    def forward(self, x):
        x = self.Conv3d_1a_7x7(x)
        x = t_max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Conv3d_2b_1x1(x)
        x = self.Conv3d_2c_3x3(x)
        x = t_max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = self.Mixed_3b(x)
        x = self.Mixed_3c(x)
        x = t_max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = getattr(self, name)(x)
        x = t_max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        pooled = F.avg_pool3d(x, (min(2, x.shape[2]), min(7, x.shape[3]),
                                  min(7, x.shape[4])), stride=1)
        features = pooled.mean(dim=(2, 3, 4))
        logits = self.logits(pooled.mean(dim=(3, 4), keepdim=True)).mean(dim=(2, 3, 4))
        return features, logits


@pytest.fixture(scope="module")
def torch_i3d():
    torch.manual_seed(0)
    m = TI3D().eval()
    # Randomize BN stats so conversion of running_mean/var is actually tested.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm3d):
                mod.running_mean.normal_(0, 0.02)
                mod.running_var.uniform_(0.8, 1.2)
    return m


def test_i3d_converted_features_match(torch_i3d, rng):
    video = rng.standard_normal((2, 3, 16, 112, 112)).astype(np.float32) * 0.5

    with torch.no_grad():
        want_feats, want_logits = torch_i3d(torch.from_numpy(video))

    variables = i3d_variables_from_state_dict(torch_i3d.state_dict())
    got_feats, got_logits = InceptionI3d().apply(variables, jnp.asarray(video))

    assert got_feats.shape == tuple(want_feats.shape) == (2, 1024)
    assert got_logits.shape == tuple(want_logits.shape) == (2, 400)
    np.testing.assert_allclose(np.asarray(got_feats), want_feats.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_i3d_detector_roundtrip_via_torchscript(tmp_path, torch_i3d, rng):
    """Scripted-module file -> converter -> on-device detector contract."""
    from long_video_gan_tpu.metrics.i3d import I3DDetector

    path = str(tmp_path / "i3d.pt")
    example = torch.zeros(1, 3, 16, 64, 64)
    with torch.no_grad():
        torch.jit.trace(torch_i3d, example).save(path)

    det = I3DDetector.from_torchscript(path)
    video_u8 = (rng.random((1, 3, 16, 64, 64)) * 255).astype(np.uint8)
    feats = det(video_u8, rescale=True, resize=True, return_features=True)
    # FVD feature contract: 400-d time-averaged pre-softmax logits (the
    # stylegan-v torchscript's return_features=True output), not the 1024-d
    # pre-logits pool.
    assert feats.shape == (1, 400)
    assert np.isfinite(feats).all()

    # Cross-check against the torch module run with the same pre-processing.
    x = torch.from_numpy(video_u8.astype(np.float32)) / 127.5 - 1.0
    frames = x.permute(0, 2, 1, 3, 4).reshape(-1, 3, 64, 64)
    frames = F.interpolate(frames, size=(224, 224), mode="bilinear",
                           align_corners=False)
    x = frames.reshape(1, 16, 3, 224, 224).permute(0, 2, 1, 3, 4)
    with torch.no_grad():
        _, want = torch_i3d(x)
    np.testing.assert_allclose(feats, want.numpy(), rtol=5e-3, atol=5e-3)


def test_get_detector_resolves_i3d_natively(tmp_path, torch_i3d, rng, monkeypatch):
    """metrics.detectors.get_detector('i3d') must pick the native on-device
    I3D when $LVG_DETECTOR_DIR/i3d.pt exists (FVD path, reference
    metric_utils.py:55-78)."""
    from long_video_gan_tpu.metrics import detectors
    from long_video_gan_tpu.metrics.i3d import I3DDetector

    example = torch.zeros(1, 3, 16, 64, 64)
    with torch.no_grad():
        torch.jit.trace(torch_i3d, example).save(str(tmp_path / "i3d.pt"))
    monkeypatch.setenv(detectors.DETECTOR_DIR_ENV, str(tmp_path))
    detectors.get_detector.cache_clear()
    det = detectors.get_detector("i3d")
    assert isinstance(det, I3DDetector)
    feats = det((rng.random((1, 3, 16, 64, 64)) * 255).astype(np.uint8))
    assert feats.shape == (1, 400) and np.isfinite(feats).all()
    detectors.get_detector.cache_clear()
