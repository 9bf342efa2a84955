"""C3D (UCF-101) — native JAX/flax implementation for the video Inception
Score detector, plus a torchscript state_dict converter.

The reference's isv2048_ucf metric uses a torchscript C3D finetuned on
UCF-101 (metrics/video_inception_score.py:26-31 — the tgan2 chainer
checkpoint's "perfectly reproduced" torchscript export). The architecture is
the canonical C3D (Tran et al., "Learning Spatiotemporal Features with 3D
Convolutional Networks"): 8 conv3d(k3, pad 1)+ReLU layers with max-pools, 3
fully-connected layers, 101-way softmax. The detector contract returns class
PROBABILITIES (the IS split-KL consumes them, video_inception_score.py:57-61).

Input protocol: [N, 3, 16, H, W] uint8; frames are bilinearly resized to
128x171 and center-cropped to 112x112 with BGR mean subtraction — the
standard C3D preprocessing the tgan2 pipeline applies.

The pretrained file is absent offline; architecture + converter equivalence
is validated against an independently-built torch C3D in
tests/test_c3d.py. Exports with unfamiliar key names convert by
registration-order + shape; anything unrecognizable falls back to the
black-box torchscript path in metrics/detectors.py.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Canonical layer plan: (name, out_channels) for convs, pools between.
_CONVS = [("conv1a", 64), ("conv2a", 128), ("conv3a", 256), ("conv3b", 256),
          ("conv4a", 512), ("conv4b", 512), ("conv5a", 512), ("conv5b", 512)]
# BGR channel means of the original C3D (sports-1m) preprocessing.
_MEAN = np.asarray([90.25, 97.66, 101.41], np.float32)


class C3D(nn.Module):
    """UCF-101 C3D. Input [N, 3, 16, 112, 112] (mean-subtracted, NCTHW);
    returns (fc7 features [N, 4096], logits [N, num_classes])."""

    num_classes: int = 101

    def _conv(self, name: str, out_ch: int, x: jax.Array) -> jax.Array:
        w = self.param(f"{name}_w", nn.initializers.normal(0.02),
                       (out_ch, x.shape[1], 3, 3, 3))
        b = self.param(f"{name}_b", nn.initializers.zeros, (out_ch,))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NCTHW", "OITHW", "NCTHW"))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)), dimension_numbers=dn)
        return jax.nn.relu(y + b.reshape(1, -1, 1, 1, 1).astype(y.dtype))

    def _fc(self, name: str, out_f: int, x: jax.Array, act: bool = True) -> jax.Array:
        w = self.param(f"{name}_w", nn.initializers.normal(0.02),
                       (out_f, x.shape[1]))
        b = self.param(f"{name}_b", nn.initializers.zeros, (out_f,))
        y = x @ w.T.astype(x.dtype) + b
        return jax.nn.relu(y) if act else y

    @nn.compact
    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        def pool(x, t):
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, t, 2, 2), (1, 1, t, 2, 2),
                [(0, 0), (0, 0), (0, 0), (0, 0), (0, 0)])

        x = self._conv("conv1a", 64, x)
        x = pool(x, 1)
        x = self._conv("conv2a", 128, x)
        x = pool(x, 2)
        x = self._conv("conv3a", 256, x)
        x = self._conv("conv3b", 256, x)
        x = pool(x, 2)
        x = self._conv("conv4a", 512, x)
        x = self._conv("conv4b", 512, x)
        x = pool(x, 2)
        x = self._conv("conv5a", 512, x)
        x = self._conv("conv5b", 512, x)
        # Final pool pads H/W by 1 on BOTH sides (torch MaxPool3d padding
        # (0,1,1); floor mode drops the trailing window): 7x7 -> 4x4.
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2, 2), (1, 1, 2, 2, 2),
            [(0, 0), (0, 0), (0, 0), (1, 0), (1, 0)])
        x = x.reshape(x.shape[0], -1)                    # [N, 8192]
        x = self._fc("fc6", 4096, x)
        feats = self._fc("fc7", 4096, x)
        logits = self._fc("fc8", self.num_classes, feats, act=False)
        return feats, logits


def c3d_variables_from_state_dict(state_dict: dict[str, Any]) -> dict:
    """Map a canonical C3D state_dict onto the flax tree. Accepts
    '<layer>.weight/.bias' (tgan2/torch naming, any uniform prefix) or falls
    back to registration-order + shape matching."""
    items = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in state_dict.items()}
    wanted = [n for n, _ in _CONVS] + ["fc6", "fc7", "fc8"]
    params: dict[str, Any] = {}

    by_layer: dict[str, dict[str, np.ndarray]] = {}
    for k, v in items.items():
        parts = k.split(".")
        if len(parts) >= 2 and parts[-1] in ("weight", "bias"):
            by_layer.setdefault(parts[-2], {})[parts[-1]] = v
    if all(n in by_layer for n in wanted):
        for n in wanted:
            params[f"{n}_w"] = by_layer[n]["weight"]
            params[f"{n}_b"] = by_layer[n]["bias"]
        return {"params": params}

    # Order+shape fallback.
    expected = jax.eval_shape(
        lambda: C3D().init(jax.random.key(0),
                           jnp.zeros((1, 3, 16, 112, 112), jnp.float32)))
    tensors = [v for v in items.values() if v.ndim > 0]
    idx = 0
    for n in wanted:
        for leaf in (f"{n}_w", f"{n}_b"):
            want = tuple(expected["params"][leaf].shape)
            while idx < len(tensors) and tensors[idx].shape != want:
                idx += 1
            if idx >= len(tensors):
                raise ValueError(f"order-based C3D conversion failed at {leaf}")
            params[leaf] = tensors[idx]
            idx += 1
    return {"params": params}


@functools.lru_cache(maxsize=1)
def _jitted_c3d():
    model = C3D()

    @jax.jit
    def run(variables, video):
        x = video.astype(jnp.float32)                     # [N, 3, T, H, W]
        n, c, t, h, w = x.shape
        x = jax.image.resize(x, (n, c, t, 128, 171), method="bilinear")
        y0, x0 = (128 - 112) // 2, (171 - 112) // 2
        x = x[:, :, :, y0:y0 + 112, x0:x0 + 112]
        x = x[:, ::-1] - _MEAN[::-1].reshape(1, 3, 1, 1, 1)   # RGB -> BGR, mean-sub
        _, logits = model.apply(variables, x)
        return jax.nn.softmax(logits, axis=-1)

    return run


class C3DDetector:
    """Detector-contract wrapper: uint8 video [N, 3, 16, H, W] -> [N, 101]
    class probabilities, computed on-device (isv2048_ucf protocol)."""

    def __init__(self, variables):
        self.variables = variables

    @classmethod
    def from_torchscript(cls, path: str) -> "C3DDetector":
        import torch

        module = torch.jit.load(path, map_location="cpu")
        return cls(c3d_variables_from_state_dict(module.state_dict()))

    def __call__(self, batch: np.ndarray, **_) -> np.ndarray:
        run = _jitted_c3d()
        return np.asarray(run(self.variables, jnp.asarray(batch)))
