"""Native flax C3D vs an independently-constructed torch C3D (video-IS
detector; pretrained tgan2 export unavailable offline — see tests/test_i3d.py
for the validation pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from long_video_gan_tpu.metrics.c3d import (  # noqa: E402
    C3D, c3d_variables_from_state_dict)


class TC3D(torch.nn.Module):
    def __init__(self, num_classes=101):
        super().__init__()
        chans = [(3, 64), (64, 128), (128, 256), (256, 256),
                 (256, 512), (512, 512), (512, 512), (512, 512)]
        names = ["conv1a", "conv2a", "conv3a", "conv3b",
                 "conv4a", "conv4b", "conv5a", "conv5b"]
        for name, (ci, co) in zip(names, chans):
            setattr(self, name, torch.nn.Conv3d(ci, co, 3, padding=1))
        self.fc6 = torch.nn.Linear(8192, 4096)
        self.fc7 = torch.nn.Linear(4096, 4096)
        self.fc8 = torch.nn.Linear(4096, num_classes)

    def forward(self, x):
        relu = torch.nn.functional.relu
        mp = torch.nn.functional.max_pool3d
        x = mp(relu(self.conv1a(x)), (1, 2, 2), (1, 2, 2))
        x = mp(relu(self.conv2a(x)), (2, 2, 2), (2, 2, 2))
        x = relu(self.conv3b(relu(self.conv3a(x))))
        x = mp(x, (2, 2, 2), (2, 2, 2))
        x = relu(self.conv4b(relu(self.conv4a(x))))
        x = mp(x, (2, 2, 2), (2, 2, 2))
        x = relu(self.conv5b(relu(self.conv5a(x))))
        x = mp(x, (2, 2, 2), (2, 2, 2), padding=(0, 1, 1))
        x = x.reshape(x.shape[0], -1)
        x = relu(self.fc6(x))
        feats = relu(self.fc7(x))
        return feats, self.fc8(feats)


def test_c3d_converted_outputs_match(rng):
    torch.manual_seed(0)
    m = TC3D().eval()
    video = rng.standard_normal((2, 3, 16, 112, 112)).astype(np.float32) * 20

    with torch.no_grad():
        want_feats, want_logits = m(torch.from_numpy(video))

    variables = c3d_variables_from_state_dict(m.state_dict())
    got_feats, got_logits = C3D().apply(variables, jnp.asarray(video))

    assert got_feats.shape == tuple(want_feats.shape) == (2, 4096)
    assert got_logits.shape == tuple(want_logits.shape) == (2, 101)
    np.testing.assert_allclose(np.asarray(got_feats), want_feats.numpy(),
                               rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(got_logits), want_logits.numpy(),
                               rtol=2e-3, atol=2e-2)


def test_c3d_detector_roundtrip(tmp_path, rng):
    from long_video_gan_tpu.metrics.c3d import C3DDetector

    torch.manual_seed(1)
    m = TC3D().eval()
    path = str(tmp_path / "c3d.pt")
    with torch.no_grad():
        torch.jit.trace(m, torch.zeros(1, 3, 16, 112, 112)).save(path)

    det = C3DDetector.from_torchscript(path)
    probs = det((rng.random((2, 3, 16, 64, 64)) * 255).astype(np.uint8))
    assert probs.shape == (2, 101)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-4)
