"""InceptionV3 (FID feature extractor) — native JAX/flax implementation plus a
weight converter from a torchscript/state_dict export.

The reference computes FID/KID/IS with NVIDIA's pickled TorchScript port of
TF-slim InceptionV3 (metrics/frechet_inception_distance.py:25,
metric_utils.py:55-78). This module implements the same published topology
(the torchvision / pytorch-fid "FID Inception" layout: BasicConv2d =
Conv(no bias) + BN(eps 1e-3) + ReLU, Mixed_5b..Mixed_7c, 2048-d pooled
features), with the TF-style branch average pools (count_include_pad=False —
the detail pytorch-fid patches into torchvision to match the TF graph).

`inception_variables_from_state_dict` maps torchvision-style keys
(Mixed_5b.branch1x1.conv.weight, ...) onto the flax tree. Validated against an
independently-built torch InceptionV3 in tests/test_inception_v3.py (random
weights; the pretrained file is absent in this zero-egress environment).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: tuple[int, int] = (1, 1)
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[1]
        w = self.param("conv_w", nn.initializers.normal(0.05),
                       (self.out_channels, in_ch) + tuple(self.kernel))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                            ("NCHW", "OIHW", "NCHW"))
        ph, pw = self.padding
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.stride,
            padding=((ph, ph), (pw, pw)), dimension_numbers=dn)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        shift = self.param("bn_shift", nn.initializers.zeros, (self.out_channels,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_channels,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_channels,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + 1e-3) * scale
        y = y * inv.reshape(1, -1, 1, 1).astype(y.dtype) + (
            (shift - mean * inv).reshape(1, -1, 1, 1).astype(y.dtype))
        return jax.nn.relu(y)


def _max_pool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 1, k, k), (1, 1, s, s), "VALID")


def _avg_pool_tf(x, k=3):
    """3x3 stride-1 average pool, pad 1, count_include_pad=False (TF style)."""
    ones = jnp.ones((1, 1) + x.shape[2:], x.dtype)
    sums = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, k, k),
                                 (1, 1, 1, 1), [(0, 0), (0, 0), (1, 1), (1, 1)])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 1, k, k),
                                   (1, 1, 1, 1), [(0, 0), (0, 0), (1, 1), (1, 1)])
    return sums / counts


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, name="branch1x1")(x)
        b5 = BasicConv2d(48, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, name="branch_pool")(_avg_pool_tf(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool(x)], axis=1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, name="branch1x1")(x)
        b7 = BasicConv2d(c7, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_tf(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool(x)], axis=1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, name="branch1x1")(x)
        b3 = BasicConv2d(384, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)], axis=1)
        bd = BasicConv2d(448, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)], axis=1)
        bp = BasicConv2d(192, name="branch_pool")(_avg_pool_tf(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=1)


class InceptionV3(nn.Module):
    """FID InceptionV3. Input [N, 3, H, W] in [-1, 1] (callers resize to
    299x299); returns (features [N, 2048], logits [N, num_classes])."""

    num_classes: int = 1008   # TF-slim export width (torchvision uses 1000)

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), stride=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        features = jnp.mean(x, axis=(2, 3))                      # [N, 2048]
        wfc = self.param("fc_w", nn.initializers.normal(0.01),
                         (self.num_classes, 2048))
        bfc = self.param("fc_b", nn.initializers.zeros, (self.num_classes,))
        logits = features @ wfc.T.astype(features.dtype) + bfc
        return features, logits


# ---------------------------------------------------------------------------
# Weight conversion (torchvision-style names).

_CONV_KEYS = {
    "conv.weight": "conv_w",
    "bn.weight": "bn_scale",
    "bn.bias": "bn_shift",
    "bn.running_mean": "bn_mean",
    "bn.running_var": "bn_var",
}


def inception_variables_from_state_dict(state_dict: dict[str, Any],
                                        num_classes: int = 1008) -> dict:
    items = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in state_dict.items()}
    params: dict[str, Any] = {}
    for k, v in items.items():
        if "num_batches_tracked" in k or "AuxLogits" in k:
            continue
        if k in ("fc.weight", "fc.bias"):
            params["fc_w" if k.endswith("weight") else "fc_b"] = v
            continue
        parts = k.split(".")
        tail = ".".join(parts[-2:])
        if tail not in _CONV_KEYS:
            raise ValueError(f"unrecognized InceptionV3 key {k!r}")
        node = params
        for s in parts[:-2]:
            node = node.setdefault(s, {})
        node[_CONV_KEYS[tail]] = v
    return {"params": params}


import functools  # noqa: E402


@functools.lru_cache(maxsize=4)
def _jitted_inception(return_probs: bool, no_output_bias: bool):
    model = InceptionV3()

    @jax.jit
    def run(variables, images):
        x = images.astype(jnp.float32)
        n, c, h, w = x.shape
        if (h, w) != (299, 299):
            x = jax.image.resize(x, (n, c, 299, 299), method="bilinear")
        x = x / 127.5 - 1.0
        feats, logits = model.apply(variables, x)
        if no_output_bias:
            # logits = feats @ fc_w.T + fc_b; drop the bias term exactly
            # (reference is50k detector_kwargs, inception_score.py:26).
            logits = logits - variables["params"]["fc_b"]
        return feats, jax.nn.softmax(logits, axis=-1)

    return run


class InceptionDetector:
    """Detector-contract wrapper: uint8 images [N, C, H, W] -> 2048-d features
    (or class probabilities with return_probs=True), computed on-device.
    Mirrors the reference detector call surface (frechet_inception_distance.py
    detector_kwargs=dict(return_features=True), inception_score.py
    dict(no_output_bias=True))."""

    def __init__(self, variables):
        self.variables = variables

    @classmethod
    def from_torchscript(cls, path: str) -> "InceptionDetector":
        import pickle

        import torch

        if path.endswith(".pkl"):
            with open(path, "rb") as fp:
                module = pickle.load(fp)
        else:
            module = torch.jit.load(path, map_location="cpu")
        return cls(inception_variables_from_state_dict(module.state_dict()))

    def __call__(self, batch: np.ndarray, return_features: bool = True,
                 return_probs: bool = False, no_output_bias: bool = False,
                 **_) -> np.ndarray:
        run = _jitted_inception(bool(return_probs), bool(no_output_bias))
        feats, probs = run(self.variables, jnp.asarray(batch))
        return np.asarray(probs if return_probs else feats)
