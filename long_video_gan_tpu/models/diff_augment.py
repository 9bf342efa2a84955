"""DiffAugment (color / translation / cutout) adapted to video.

Functional JAX port of the reference's MIT-Han-lab adaptation
(model/diff_augment.py:20-102): one transform per *clip*, consistent across
frames — color ops fold time into pixels, geometric ops fold time into
channels. All ops are differentiable w.r.t. x; randomness comes from an
explicit key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def diff_augment(key: jax.Array, x: jax.Array, policy: str = "color,translation,cutout") -> jax.Array:
    """x: [N, C, T, H, W] video batch in [-1, 1]."""
    if not policy:
        return x
    n, c, t, h, w = x.shape
    for p in policy.split(","):
        if p == "color":
            x = x.reshape(n, c, t * h, w)
        else:
            x = x.reshape(n, c * t, h, w)
        for fn in AUGMENT_FNS[p]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
        x = x.reshape(n, c, t, h, w)
    return x


def rand_brightness(key, x, scale=1.0):
    shift = (jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5) * scale
    return x + shift


def rand_saturation(key, x, scale=1.0):
    mean = jnp.mean(x, axis=1, keepdims=True)
    factor = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2 * scale
    return (x - mean) * factor + mean


def rand_contrast(key, x, scale=1.0):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    factor = (jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5) * scale
    return (x - mean) * factor + mean


def rand_translation(key, x, ratio=0.25):
    """Integer translate per sample with zero padding (reference :63-77)."""
    n, c, h, w = x.shape
    shift = round(max(h, w) * ratio)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (n,), -shift, shift + 1)
    ty = jax.random.randint(ky, (n,), -shift, shift + 1)
    x_pad = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)])

    def translate_one(img, dx, dy):
        ix = jnp.clip(jnp.arange(h) + dx + 1, 0, h + 1)
        iy = jnp.clip(jnp.arange(w) + dy + 1, 0, w + 1)
        return img[:, ix][:, :, iy]

    return jax.vmap(translate_one)(x_pad, tx, ty)


def rand_cutout(key, x, ratio=0.5):
    """Zero a random rectangle per sample (reference :80-95). The torch clamp
    semantics reduce to a contiguous clipped interval, expressed here in
    closed form."""
    n, c, h, w = x.shape
    cut_h, cut_w = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    off_x = jax.random.randint(kx, (n, 1, 1), 0, h + (1 - cut_h % 2))
    off_y = jax.random.randint(ky, (n, 1, 1), 0, w + (1 - cut_w % 2))
    gx = jnp.arange(h)[None, :, None]
    gy = jnp.arange(w)[None, None, :]
    lo_x, hi_x = off_x - cut_h // 2, off_x - cut_h // 2 + cut_h - 1
    lo_y, hi_y = off_y - cut_w // 2, off_y - cut_w // 2 + cut_w - 1
    in_x = (gx >= jnp.maximum(lo_x, 0)) & (gx <= jnp.minimum(hi_x, h - 1))
    in_y = (gy >= jnp.maximum(lo_y, 0)) & (gy <= jnp.minimum(hi_y, w - 1))
    mask = 1.0 - (in_x & in_y).astype(x.dtype)
    return x * mask[:, None]


AUGMENT_FNS = {
    "color": [rand_brightness, rand_saturation, rand_contrast],
    "translation": [rand_translation],
    "cutout": [rand_cutout],
}
