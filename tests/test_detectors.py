"""Detector spec resolution (metrics/detectors.py): exact-name dispatch.

The reference resolves detectors by URL (metric_utils.py:55-78); here specs
resolve to local files. Dispatch must be exact — a user file whose name merely
*contains* a family substring must never be converted with that family's
weight mapper (ADVICE r2: "c3d_from_i3d_rig.pt" previously converted as I3D).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from long_video_gan_tpu.metrics import detectors
from long_video_gan_tpu.metrics.detectors import (
    StubDetector, TorchscriptDetector, get_detector)


class _TinyNet(torch.nn.Module):
    """A torchscript-able module that is NOT any known detector topology."""

    def __init__(self):
        super().__init__()
        self.fc = torch.nn.Linear(4, 3)

    def forward(self, x):
        return self.fc(x.float().flatten(2).mean(dim=2))


@pytest.fixture()
def tiny_ts(tmp_path):
    def save(name: str) -> str:
        path = str(tmp_path / name)
        with torch.no_grad():
            torch.jit.script(_TinyNet()).save(path)
        return path

    return save


@pytest.fixture(autouse=True)
def clear_cache():
    get_detector.cache_clear()
    yield
    get_detector.cache_clear()


def test_stub_spec():
    det = get_detector("stub:16")
    assert isinstance(det, StubDetector)
    feats = det(np.zeros((2, 3, 4, 8, 8), np.uint8))
    assert feats.shape == (2, 16)


def test_misleading_substring_name_is_not_converted(tiny_ts, capsys):
    """'c3d_from_i3d_rig.pt' contains both 'i3d' and 'c3d' — it must load as a
    black-box torchscript module, with no native weight conversion attempt."""
    path = tiny_ts("c3d_from_i3d_rig.pt")
    det = get_detector(path)
    assert isinstance(det, TorchscriptDetector)
    out = capsys.readouterr().out
    assert "unrecognized file name" in out
    assert "conversion" not in out  # no converter even tried


def test_explicit_family_prefix_forces_conversion_attempt(tiny_ts, capsys):
    """'i3d:<path>' asserts the architecture; on a non-I3D file the converter
    fails loudly and the resolver falls back to black-box torchscript with the
    reference I3D forward kwargs, logging the strategy."""
    path = tiny_ts("whatever.pt")
    det = get_detector(f"i3d:{path}")
    assert isinstance(det, TorchscriptDetector)
    assert det.forward_kwargs == dict(rescale=True, resize=True,
                                      return_features=True)
    assert "native conversion failed" in capsys.readouterr().out


def test_exact_published_basename_routes_to_family(tiny_ts, capsys):
    """The reference's published file name 'i3d_torchscript.pt' routes to the
    I3D converter (here failing over to torchscript since the net is fake)."""
    path = tiny_ts("i3d_torchscript.pt")
    det = get_detector(path)
    assert isinstance(det, TorchscriptDetector)
    assert "i3d native conversion failed" in capsys.readouterr().out


def test_bare_family_name_requires_detector_dir(tmp_path, monkeypatch):
    monkeypatch.setenv(detectors.DETECTOR_DIR_ENV, str(tmp_path))
    with pytest.raises(FileNotFoundError, match="c3d"):
        get_detector("c3d")


def test_missing_path_raises():
    with pytest.raises(FileNotFoundError):
        get_detector("/nonexistent/detector.pt")
