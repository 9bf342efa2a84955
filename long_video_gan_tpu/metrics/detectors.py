"""Feature detectors for quality metrics.

The reference downloads pretrained detector networks at metric time
(metrics/metric_utils.py:55-78):
  * FVD:  I3D Kinetics-400 torchscript
    (https://www.dropbox.com/s/ge9e5ujwgetktms/i3d_torchscript.pt)
  * FID/KID/IS: InceptionV3 pickle
    (https://api.ngc.nvidia.com/v2/models/nvidia/research/stylegan3/versions/1/files/metrics/inception-2015-12-05.pkl)
  * video IS: C3D UCF-101 torchscript
    (https://www.dropbox.com/s/jxpu7avzdc9n97q/c3d_ucf.pt)

This environment has no network access, so detectors load from local files
(`detector_path`): torchscript modules execute on host CPU via torch.jit (the
reference also treats them as black boxes), and `stub:<dim>` provides a
deterministic random-projection detector for tests and plumbing validation.
The detector interface is: uint8 numpy batch -> float feature matrix
([N, C, T, H, W] for video detectors, [N, C, H, W] for image detectors).
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import numpy as np

DETECTOR_URLS = {
    "i3d": "https://www.dropbox.com/s/ge9e5ujwgetktms/i3d_torchscript.pt?dl=1",
    "inception": "https://api.ngc.nvidia.com/v2/models/nvidia/research/stylegan3/"
                 "versions/1/files/metrics/inception-2015-12-05.pkl",
    "c3d": "https://www.dropbox.com/s/jxpu7avzdc9n97q/c3d_ucf.pt?dl=1",
}

# Default search location: $LVG_DETECTOR_DIR/<name>.pt
DETECTOR_DIR_ENV = "LVG_DETECTOR_DIR"


class StubDetector:
    """Deterministic random-projection detector for tests: average-pools the
    input and projects to `dim` features (plus softmax for IS-style metrics)."""

    def __init__(self, dim: int = 64, seed: int = 0):
        self.dim = dim
        self.seed = seed
        self._proj: dict[int, np.ndarray] = {}

    def __call__(self, batch: np.ndarray, return_probs: bool = False, **_) -> np.ndarray:
        batch = np.asarray(batch, dtype=np.float32) / 255.0
        flat = batch.reshape(batch.shape[0], batch.shape[1], -1)
        # Fixed-size signature: channel means + a few moments, projected.
        sig = np.concatenate([
            flat.mean(axis=2), flat.std(axis=2),
            np.abs(flat).mean(axis=2), (flat ** 2).mean(axis=2),
        ], axis=1)
        key = sig.shape[1]
        if key not in self._proj:
            rng = np.random.default_rng(self.seed + key)
            self._proj[key] = rng.standard_normal((key, self.dim)).astype(np.float32)
        feats = sig @ self._proj[key]
        if return_probs:
            e = np.exp(feats - feats.max(axis=1, keepdims=True))
            return e / e.sum(axis=1, keepdims=True)
        return feats


class TorchscriptDetector:
    """Black-box torchscript detector executed on host CPU (same contract as
    the reference's jit-loaded detectors, metrics/metric_utils.py:310-315)."""

    def __init__(self, path: str, forward_kwargs: dict | None = None):
        import torch

        self.module = torch.jit.load(path, map_location="cpu").eval()
        self.forward_kwargs = forward_kwargs or {}

    def __call__(self, batch: np.ndarray, **kwargs) -> np.ndarray:
        import torch

        kw = dict(self.forward_kwargs)
        kw.update(kwargs)
        kw.pop("return_probs", None)
        with torch.no_grad():
            out = self.module(torch.from_numpy(np.ascontiguousarray(batch)), **kw)
        return out.numpy()


@functools.lru_cache(maxsize=8)
def get_detector(spec: str) -> Callable:
    """Resolve a detector spec:
    * "stub:<dim>"           -> StubDetector (tests)
    * a filesystem path      -> torchscript module
    * a known name (i3d/c3d/inception) -> $LVG_DETECTOR_DIR/<name>.pt
    """
    if spec.startswith("stub:"):
        return StubDetector(dim=int(spec.split(":", 1)[1]))
    if spec.startswith("i3d:") or spec == "i3d" or "i3d" in os.path.basename(spec):
        # Prefer the native on-device I3D (metrics/i3d.py): convert the
        # torchscript weights once, then extract features on TPU.
        path = spec.split(":", 1)[1] if spec.startswith("i3d:") else (
            spec if os.path.isfile(spec)
            else os.path.join(os.environ.get(DETECTOR_DIR_ENV, ""), "i3d.pt"))
        if os.path.isfile(path):
            try:
                from .i3d import I3DDetector

                return I3DDetector.from_torchscript(path)
            except Exception as e:  # unexpected export layout: black-box fallback
                print(f"i3d native conversion failed ({e}); torchscript fallback")
                return TorchscriptDetector(
                    path, dict(rescale=True, resize=True, return_features=True))
    if spec.startswith("inception:") or spec == "inception" \
            or "inception" in os.path.basename(spec):
        path = spec.split(":", 1)[1] if spec.startswith("inception:") else (
            spec if os.path.isfile(spec)
            else os.path.join(os.environ.get(DETECTOR_DIR_ENV, ""), "inception.pkl"))
        if os.path.isfile(path):
            try:
                from .inception_v3 import InceptionDetector

                return InceptionDetector.from_torchscript(path)
            except Exception as e:  # unexpected export layout: black-box fallback
                print(f"inception native conversion failed ({e}); torchscript fallback")
                return TorchscriptDetector(path, dict(return_features=True))
    if spec.startswith("c3d:") or spec == "c3d" or "c3d" in os.path.basename(spec):
        path = spec.split(":", 1)[1] if spec.startswith("c3d:") else (
            spec if os.path.isfile(spec)
            else os.path.join(os.environ.get(DETECTOR_DIR_ENV, ""), "c3d.pt"))
        if os.path.isfile(path):
            try:
                from .c3d import C3DDetector

                return C3DDetector.from_torchscript(path)
            except Exception as e:  # unexpected export layout: black-box fallback
                print(f"c3d native conversion failed ({e}); torchscript fallback")
                return TorchscriptDetector(path)
    if os.path.isfile(spec):
        return TorchscriptDetector(spec)
    base = os.environ.get(DETECTOR_DIR_ENV, "")
    candidate = os.path.join(base, f"{spec}.pt")
    if base and os.path.isfile(candidate):
        kwargs = {}
        if spec == "i3d":
            kwargs = dict(rescale=True, resize=True, return_features=True)
        return TorchscriptDetector(candidate, kwargs)
    raise FileNotFoundError(
        f"detector {spec!r} not found; download it from {DETECTOR_URLS.get(spec, '<url>')} "
        f"and set ${DETECTOR_DIR_ENV} or pass an explicit path")
