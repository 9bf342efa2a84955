"""Shared training machinery: optimizers, gradient hygiene, EMA, temporal augs."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def make_adam(lrate: float, beta2: float, warmup_steps: int = 0):
    """Adam(beta1=0, beta2) with hyperparam-injected learning rate so the
    per-step warmup (video_gan_lres.py:90-96) sets lr without advancing
    optimizer counts out of sync with the training step.

    b1/b2/eps stay static and the injected learning rate is normalized to a
    strong-typed f32 scalar at init: otherwise the first optimizer update
    flips it from weak- to strong-typed, silently retracing (and on CPU
    recompiling for minutes) every jitted train step on its second call.
    """
    import jax.numpy as jnp

    opt = optax.inject_hyperparams(optax.adam, static_args=("b1", "b2", "eps"))(
        learning_rate=lrate, b1=0.0, b2=beta2)
    orig_init = opt.init

    def init(params):
        state = orig_init(params)
        state.hyperparams["learning_rate"] = jnp.asarray(lrate, jnp.float32)
        return state

    return optax.GradientTransformation(init, opt.update)


def warmup_lrate(base: float, step, warmup_steps: int):
    """lr * min((step+1)/(warmup+1), 1) — reference update_lrates."""
    return base * jnp.minimum((step + 1.0) / (warmup_steps + 1.0), 1.0)


def scrub_grads(grads, gain=None):
    """Mirror utils.sync_grads post-processing (utils.py:116-124): optional
    gain, then nan->0 / +-inf->+-1e5. The cross-device mean the reference gets
    from a sharded all_reduce is implicit here: grads of a mean loss over the
    pjit-sharded batch are already globally averaged."""
    def fix(g):
        g = g if gain is None else g * gain
        return jnp.nan_to_num(g, nan=0.0, posinf=1e5, neginf=-1e5)
    return jax.tree.map(fix, grads)


def apply_updates(params, grads, opt, opt_state, lrate):
    """One optimizer step with an injected learning rate."""
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lrate, jnp.float32)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def ema_beta_schedule(step, ema_beta: float, warmup_steps: int):
    """Warmup-ramped EMA decay (video_gan_lres.py:208-214):
    beta_t = min(ema_beta ** ((warmup+1)/(step+1)), ema_beta)."""
    exponent = (warmup_steps + 1.0) / (step + 1.0)
    return jnp.minimum(ema_beta ** exponent, ema_beta)


def lerp_trees(target, source, weight):
    """target + (source - target) * weight, leafwise (EMA update over params
    AND buffers, mirroring misc.params_and_buffers lerp)."""
    return jax.tree.map(lambda t, s: t + (s.astype(t.dtype) - t) * weight, target, source)


# ---------------------------------------------------------------------------
# Temporal augmentations used by the lres trainer.


def random_temporal_crop(key: jax.Array, video: jax.Array, seq_length: int) -> jax.Array:
    """Per-sample random crop of `seq_length` frames from a longer video
    (G_random_temp_translate, video_gan_lres.py:106-116)."""
    n, c, t, h, w = video.shape
    assert t >= seq_length
    t0 = jax.random.randint(key, (n,), 0, t - seq_length + 1) if t > seq_length else jnp.zeros((n,), jnp.int32)

    def crop_one(v, start):
        return jax.lax.dynamic_slice_in_dim(v, start, seq_length, axis=1)

    return jax.vmap(crop_one)(video, t0)


def temporal_scale_augment(key: jax.Array, video: jax.Array, max_log2_scale: float) -> jax.Array:
    """Per-sample random temporal rescale (video_gan_lres.py:242-263):
    bilinear time-resample by 2**U(-s, s), zero-pad if shorter, random-crop
    back to the original length.

    The reference uses dynamically-shaped F.interpolate + pad + crop; here the
    same map is expressed at fixed shape: output frame j reads interpolated
    input position (j + crop - pad + 0.5)/sf - 0.5, masked to the valid
    resampled range [0, floor(T*sf)) and edge-clamped inside it (matching
    align_corners=False semantics of torch interpolate).
    """
    n, c, t, h, w = video.shape
    k_sf, k_pad, k_crop = jax.random.split(key, 3)
    sf = jnp.exp2(jax.random.uniform(k_sf, (n,), minval=-max_log2_scale, maxval=max_log2_scale))
    t_resampled = jnp.floor(t * sf).astype(jnp.int32)          # per-sample virtual length

    # p0 in [0, max(0, t - t')], i0 in [0, max(t, t') - t] (post-pad length is
    # max(t', t) because padding only happens when t' < t).
    u_pad = jax.random.uniform(k_pad, (n,))
    u_crop = jax.random.uniform(k_crop, (n,))
    pad_span = jnp.maximum(0, t - t_resampled)
    p0 = jnp.floor(u_pad * (pad_span + 1)).astype(jnp.int32)
    crop_span = jnp.maximum(t_resampled, t) - t
    i0 = jnp.floor(u_crop * (crop_span + 1)).astype(jnp.int32)

    j = jnp.arange(t)                                          # output frame index
    # Index into the virtual resampled signal, then into the source video.
    k_res = j[None, :] + i0[:, None] - p0[:, None]             # [n, t]
    valid = (k_res >= 0) & (k_res < t_resampled[:, None])
    src = (k_res.astype(jnp.float32) + 0.5) / sf[:, None] - 0.5
    src = jnp.clip(src, 0.0, t - 1.0)                          # edge clamp like torch
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (src - lo)[:, None, :, None, None].astype(video.dtype)   # [n, 1, t, 1, 1]

    def gather_frames(v, idx):
        return jnp.take(v, idx, axis=1)                        # [c, t, h, w]

    v_lo = jax.vmap(gather_frames)(video, lo)
    v_hi = jax.vmap(gather_frames)(video, hi)
    out = v_lo * (1 - frac) + v_hi * frac
    return out * valid[:, None, :, None, None].astype(video.dtype)
