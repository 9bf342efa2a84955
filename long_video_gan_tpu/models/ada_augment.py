"""ADA augmentation pipeline (StyleGAN2-ADA) generalized to video.

Functional JAX port of the reference's AugmentPipe (model/ada_augment.py:116-463):
one transform per clip — time folds into channels for geometric ops and into
pixels for color ops, so every frame of a clip receives the identical
augmentation. All stages are differentiable; the overall probability `p` is a
traced scalar (it lives in the train state and is adapted by the ADA
controller), while the per-stage enable multipliers are static config.

TPU-native deviation (documented): the reference computes the reflect-pad
margin for the geometric warp *dynamically* from the transformed image corners
(ada_augment.py:277-285), which is data-dependent shape logic that cannot live
inside a compiled XLA program. We reflect-pad by a static margin
(`margin_frac` of the image size, clamped to size-1 — the reference's own
clamp bound). At the default margin_frac=1.0 the static margin equals that
clamp, so results are *always* identical to the reference (extra reflect
padding never changes sampled values). Lower margin_frac shrinks the padded
buffer; draws whose needed margin exceeds it read zeros slightly earlier than
the reference would.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from ..ops.filters import setup_filter, wavelet_lowpass
from ..ops.grid_sample import grid_sample
from ..ops.upfirdn2d import downsample2d, upsample2d

# ---------------------------------------------------------------------------
# Batched homogeneous transform helpers (reference: ada_augment.py:42-106).


def _mat3(rows, batch_shape):
    """Build [*, 3, 3] from a 3x3 nested list of scalars / arrays."""
    elems = []
    for row in rows:
        for v in row:
            v = jnp.asarray(v, jnp.float32)
            elems.append(jnp.broadcast_to(v, batch_shape))
    return jnp.stack(elems, axis=-1).reshape(*batch_shape, 3, 3)


def translate2d(tx, ty, batch_shape=()):
    return _mat3([[1, 0, tx], [0, 1, ty], [0, 0, 1]], batch_shape)


def scale2d(sx, sy, batch_shape=()):
    return _mat3([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], batch_shape)


def rotate2d(theta, batch_shape=()):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return _mat3([[c, -s, 0], [s, c, 0], [0, 0, 1]], batch_shape)


def translate2d_inv(tx, ty, batch_shape=()):
    return translate2d(-tx, -ty, batch_shape)


def scale2d_inv(sx, sy, batch_shape=()):
    return scale2d(1 / sx, 1 / sy, batch_shape)


def rotate2d_inv(theta, batch_shape=()):
    return rotate2d(-theta, batch_shape)


def _mat4(rows, batch_shape):
    elems = []
    for row in rows:
        for v in row:
            v = jnp.asarray(v, jnp.float32)
            elems.append(jnp.broadcast_to(v, batch_shape))
    return jnp.stack(elems, axis=-1).reshape(*batch_shape, 4, 4)


def translate3d(tx, ty, tz, batch_shape=()):
    return _mat4([[1, 0, 0, tx], [0, 1, 0, ty], [0, 0, 1, tz], [0, 0, 0, 1]], batch_shape)


def scale3d(sx, sy, sz, batch_shape=()):
    return _mat4([[sx, 0, 0, 0], [0, sy, 0, 0], [0, 0, sz, 0], [0, 0, 0, 1]], batch_shape)


def rotate3d(v, theta, batch_shape=()):
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    return _mat4([
        [vx * vx * cc + c, vx * vy * cc - vz * s, vx * vz * cc + vy * s, 0],
        [vy * vx * cc + vz * s, vy * vy * cc + c, vy * vz * cc - vx * s, 0],
        [vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + c, 0],
        [0, 0, 0, 1],
    ], batch_shape)


def _erfinv(x):
    return jax.scipy.special.erfinv(x)


# ---------------------------------------------------------------------------


def _freq_filter_bank() -> np.ndarray:
    """4-band sym2 filter bank (reference: ada_augment.py:169-178)."""
    hz_lo = np.asarray(wavelet_lowpass("sym2"))
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    bank = np.eye(4, 1)
    for i in range(1, bank.shape[0]):
        bank = np.dstack([bank, np.zeros_like(bank)]).reshape(bank.shape[0], -1)[:, :-1]
        bank = scipy.signal.convolve(bank, [hz_lo2])
        bank[i, (bank.shape[1] - hz_hi2.size) // 2: (bank.shape[1] + hz_hi2.size) // 2] += hz_hi2
    return np.asarray(bank, dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    """Static augmentation config; call with (key, videos, p)."""

    # Pixel blitting.
    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    # General geometric.
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    # Color.
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    # Image-space filtering.
    imgfilter: float = 0.0
    imgfilter_bands: tuple = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    # Image-space corruptions.
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # TPU-specific: static reflect-pad margin for the geometric warp, as a
    # fraction of the image size. 1.0 equals the reference's own clamp bound
    # (size-1), making results exactly equal to the dynamic-margin reference
    # in all cases; lower values trade rare far-out-of-frame reflections for
    # a smaller padded buffer.
    margin_frac: float = 1.0

    @property
    def has_geometric(self) -> bool:
        return any(v > 0 for v in (self.xflip, self.rotate90, self.xint, self.scale,
                                   self.rotate, self.aniso, self.xfrac))

    @property
    def has_color(self) -> bool:
        return any(v > 0 for v in (self.brightness, self.contrast, self.lumaflip,
                                   self.hue, self.saturation))

    def __call__(self, key: jax.Array, videos: jax.Array, p,
                 debug_percentile: Optional[float] = None) -> jax.Array:
        assert videos.ndim == 5
        n, c, t, height, width = videos.shape
        p = jnp.asarray(p, jnp.float32)
        dp = None if debug_percentile is None else jnp.float32(debug_percentile)

        def rand(sub, shape=()):
            return jax.random.uniform(sub, (n,) + shape)

        def nrand(sub, shape=()):
            return jax.random.normal(sub, (n,) + shape)

        keys = iter(jax.random.split(key, 40))

        # ---------------- pixel blits + geometric transform matrix ----------
        g_inv = jnp.tile(jnp.eye(3, dtype=jnp.float32), (n, 1, 1))
        geom_active = False

        if self.xflip > 0:
            i = jnp.floor(rand(next(keys)) * 2)
            i = jnp.where(rand(next(keys)) < self.xflip * p, i, 0.0)
            if dp is not None:
                i = jnp.full_like(i, jnp.floor(dp * 2))
            g_inv = g_inv @ scale2d_inv(1 - 2 * i, jnp.ones(n), (n,))
            geom_active = True

        if self.rotate90 > 0:
            i = jnp.floor(rand(next(keys)) * 4)
            i = jnp.where(rand(next(keys)) < self.rotate90 * p, i, 0.0)
            if dp is not None:
                i = jnp.full_like(i, jnp.floor(dp * 4))
            g_inv = g_inv @ rotate2d_inv(-np.pi / 2 * i, (n,))
            geom_active = True

        if self.xint > 0:
            tvec = (rand(next(keys), (2,)) * 2 - 1) * self.xint_max
            tvec = jnp.where(rand(next(keys), (1,)) < self.xint * p, tvec, 0.0)
            if dp is not None:
                tvec = jnp.full_like(tvec, (dp * 2 - 1) * self.xint_max)
            g_inv = g_inv @ translate2d_inv(jnp.round(tvec[:, 0] * width),
                                            jnp.round(tvec[:, 1] * height), (n,))
            geom_active = True

        if self.scale > 0:
            s = jnp.exp2(nrand(next(keys)) * self.scale_std)
            s = jnp.where(rand(next(keys)) < self.scale * p, s, 1.0)
            if dp is not None:
                s = jnp.full_like(s, jnp.exp2(_erfinv(dp * 2 - 1) * self.scale_std))
            g_inv = g_inv @ scale2d_inv(s, s, (n,))
            geom_active = True

        p_rot = 1 - jnp.sqrt(jnp.clip(1 - self.rotate * p, 0, 1))
        if self.rotate > 0:
            theta = (rand(next(keys)) * 2 - 1) * np.pi * self.rotate_max
            theta = jnp.where(rand(next(keys)) < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * self.rotate_max)
            g_inv = g_inv @ rotate2d_inv(-theta, (n,))
            geom_active = True

        if self.aniso > 0:
            s = jnp.exp2(nrand(next(keys)) * self.aniso_std)
            s = jnp.where(rand(next(keys)) < self.aniso * p, s, 1.0)
            if dp is not None:
                s = jnp.full_like(s, jnp.exp2(_erfinv(dp * 2 - 1) * self.aniso_std))
            g_inv = g_inv @ scale2d_inv(s, 1 / s, (n,))
            geom_active = True

        if self.rotate > 0:
            theta = (rand(next(keys)) * 2 - 1) * np.pi * self.rotate_max
            theta = jnp.where(rand(next(keys)) < p_rot, theta, 0.0)
            if dp is not None:
                theta = jnp.zeros_like(theta)
            g_inv = g_inv @ rotate2d_inv(-theta, (n,))

        if self.xfrac > 0:
            tvec = nrand(next(keys), (2,)) * self.xfrac_std
            tvec = jnp.where(rand(next(keys), (1,)) < self.xfrac * p, tvec, 0.0)
            if dp is not None:
                tvec = jnp.full_like(tvec, _erfinv(dp * 2 - 1) * self.xfrac_std)
            g_inv = g_inv @ translate2d_inv(tvec[:, 0] * width, tvec[:, 1] * height, (n,))
            geom_active = True

        # ---------------- execute geometric transform -----------------------
        if geom_active:
            hz_geom = setup_filter(wavelet_lowpass("sym6"))
            hz_pad = hz_geom.shape[0] // 4
            x = videos.reshape(n, c * t, height, width)

            # Static reflect margin (see module docstring).
            mx = int(min(np.ceil(self.margin_frac * width), width - 1))
            my = int(min(np.ceil(self.margin_frac * height), height - 1))
            mx = max(mx, hz_pad * 2)
            my = max(my, hz_pad * 2)
            x = jnp.pad(x, [(0, 0), (0, 0), (my, my), (mx, mx)], mode="reflect")
            # Symmetric margins => no origin shift (translate2d((mx-mx)/2, ...)).

            x = upsample2d(x, hz_geom, up=2)
            g_inv = scale2d(2, 2, (n,)) @ g_inv @ scale2d_inv(2, 2, (n,))
            g_inv = translate2d(-0.5, -0.5, (n,)) @ g_inv @ translate2d_inv(-0.5, -0.5, (n,))

            out_h = (height + hz_pad * 2) * 2
            out_w = (width + hz_pad * 2) * 2
            g_inv = (scale2d(2 / x.shape[3], 2 / x.shape[2], (n,)) @ g_inv
                     @ scale2d_inv(2 / out_w, 2 / out_h, (n,)))

            # affine_grid(align_corners=False) over the output raster.
            xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (2.0 / out_w) - 1.0
            ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (2.0 / out_h) - 1.0
            gx, gy = jnp.meshgrid(xs, ys)
            base = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)        # [H, W, 3]
            grid = jnp.einsum("nij,hwj->nhwi", g_inv[:, :2, :], base)      # [N, H, W, 2]
            x = grid_sample(x, grid)

            x = downsample2d(x, hz_geom, down=2, padding=-hz_pad * 2, flip_filter=True)
            videos = x.reshape(n, c, t, height, width)

        # ---------------- color transform -----------------------------------
        if self.has_color:
            cmat = jnp.tile(jnp.eye(4, dtype=jnp.float32), (n, 1, 1))
            v_luma = jnp.asarray(np.asarray([1, 1, 1, 0]) / np.sqrt(3), jnp.float32)

            if self.brightness > 0:
                b = nrand(next(keys)) * self.brightness_std
                b = jnp.where(rand(next(keys)) < self.brightness * p, b, 0.0)
                if dp is not None:
                    b = jnp.full_like(b, _erfinv(dp * 2 - 1) * self.brightness_std)
                cmat = translate3d(b, b, b, (n,)) @ cmat

            if self.contrast > 0:
                cf = jnp.exp2(nrand(next(keys)) * self.contrast_std)
                cf = jnp.where(rand(next(keys)) < self.contrast * p, cf, 1.0)
                if dp is not None:
                    cf = jnp.full_like(cf, jnp.exp2(_erfinv(dp * 2 - 1) * self.contrast_std))
                cmat = scale3d(cf, cf, cf, (n,)) @ cmat

            outer = jnp.outer(v_luma, v_luma)
            if self.lumaflip > 0:
                i = jnp.floor(rand(next(keys)) * 2)
                i = jnp.where(rand(next(keys)) < self.lumaflip * p, i, 0.0)
                if dp is not None:
                    i = jnp.full_like(i, jnp.floor(dp * 2))
                eye4 = jnp.eye(4, dtype=jnp.float32)
                cmat = (eye4 - 2 * outer * i[:, None, None]) @ cmat   # Householder

            if self.hue > 0 and c > 1:
                theta = (rand(next(keys)) * 2 - 1) * np.pi * self.hue_max
                theta = jnp.where(rand(next(keys)) < self.hue * p, theta, 0.0)
                if dp is not None:
                    theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * self.hue_max)
                cmat = rotate3d(v_luma, theta, (n,)) @ cmat

            if self.saturation > 0 and c > 1:
                s = jnp.exp2(nrand(next(keys)) * self.saturation_std)
                s = jnp.where(rand(next(keys)) < self.saturation * p, s, 1.0)
                if dp is not None:
                    s = jnp.full_like(s, jnp.exp2(_erfinv(dp * 2 - 1) * self.saturation_std))
                eye4 = jnp.eye(4, dtype=jnp.float32)
                cmat = (outer + (eye4 - outer) * s[:, None, None]) @ cmat

            flat = videos.reshape(n, c, t * height * width)
            if c == 3:
                flat = cmat[:, :3, :3] @ flat + cmat[:, :3, 3:]
            elif c == 1:
                cm = jnp.mean(cmat[:, :3, :], axis=1, keepdims=True)
                flat = flat * jnp.sum(cm[:, :, :3], axis=2, keepdims=True) + cm[:, :, 3:]
            else:
                raise ValueError("videos must be RGB (3) or L (1) channels")
            videos = flat.reshape(n, c, t, height, width)

        # ---------------- image-space filtering ------------------------------
        if self.imgfilter > 0:
            bank = _freq_filter_bank()
            num_bands = bank.shape[0]
            assert len(self.imgfilter_bands) == num_bands
            expected_power = np.array([10, 1, 1, 1]) / 13

            g = jnp.ones((n, num_bands), jnp.float32)
            for i, band_strength in enumerate(self.imgfilter_bands):
                t_i = jnp.exp2(nrand(next(keys)) * self.imgfilter_std)
                t_i = jnp.where(rand(next(keys)) < self.imgfilter * p * band_strength, t_i, 1.0)
                if dp is not None:
                    t_i = (jnp.full_like(t_i, jnp.exp2(_erfinv(dp * 2 - 1) * self.imgfilter_std))
                           if band_strength > 0 else jnp.ones_like(t_i))
                tvec = jnp.ones((n, num_bands), jnp.float32).at[:, i].set(t_i)
                tvec = tvec / jnp.sqrt(jnp.sum(expected_power * jnp.square(tvec),
                                               axis=-1, keepdims=True))
                g = g * tvec

            hz_prime = g @ jnp.asarray(bank)                       # [N, taps]
            taps = bank.shape[1]
            pad = taps // 2
            # Per-clip separable filter, applied identically to every channel
            # and frame. (The reference's video adaptation of this stage
            # mismatches groups vs channels for T>1, ada_augment.py:402-406;
            # we apply the per-batch filter correctly across c*t channels.)
            x = videos.reshape(n, c * t, height, width)
            x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode="reflect")
            fx = hz_prime[:, None, None, :]                        # [N,1,1,taps]
            # vmap the depthwise 1-D convs over the batch (per-sample filter).
            def _conv1d_pair(img, f1d):
                dn = jax.lax.conv_dimension_numbers(
                    img[None].shape, (1, 1, 1, taps), ("NCHW", "OIHW", "NCHW"))
                k = jnp.tile(f1d.reshape(1, 1, 1, taps), (img.shape[0], 1, 1, 1))
                y = jax.lax.conv_general_dilated(
                    img[None], k, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn,
                    feature_group_count=img.shape[0])[0]
                k2 = jnp.tile(f1d.reshape(1, 1, taps, 1), (img.shape[0], 1, 1, 1))
                y = jax.lax.conv_general_dilated(
                    y[None], k2, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn,
                    feature_group_count=img.shape[0])[0]
                return y

            x = jax.vmap(_conv1d_pair)(x, hz_prime)
            videos = x.reshape(n, c, t, height, width)

        # ---------------- corruptions ----------------------------------------
        x = videos.reshape(n, c * t, height, width)

        if self.noise > 0:
            sigma = jnp.abs(nrand(next(keys))) * self.noise_std
            sigma = jnp.where(rand(next(keys)) < self.noise * p, sigma, 0.0)
            if dp is not None:
                sigma = jnp.full_like(sigma, _erfinv(dp) * self.noise_std)
            x = x + jax.random.normal(next(keys), x.shape) * sigma[:, None, None, None]

        if self.cutout > 0:
            size = jnp.full((n, 2), self.cutout_size, jnp.float32)
            size = jnp.where(rand(next(keys), (1,)) < self.cutout * p, size, 0.0)
            center = rand(next(keys), (2,))
            if dp is not None:
                size = jnp.full_like(size, self.cutout_size)
                center = jnp.full_like(center, dp)
            coord_x = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width
            coord_y = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height
            mask_x = jnp.abs(coord_x[None, None, :] - center[:, 0, None, None]) >= size[:, 0, None, None] / 2
            mask_y = jnp.abs(coord_y[None, :, None] - center[:, 1, None, None]) >= size[:, 1, None, None] / 2
            mask = jnp.logical_or(mask_x, mask_y).astype(x.dtype)
            x = x * mask[:, None]

        return x.reshape(n, c, t, height, width)

    def random_temporal_filter(self, key: jax.Array, video: jax.Array, p,
                               min_ksize: int = 2, max_ksize: int = 16,
                               max_std: float = 1.0) -> jax.Array:
        """Random per-clip temporal FIR jitter (reference: ada_augment.py:441-463;
        unused by the release configs but part of the pipeline surface)."""
        assert video.ndim == 5 and min_ksize >= 2 and max_ksize >= min_ksize
        n = video.shape[0]
        k1, k2, k3, k4 = jax.random.split(key, 4)
        ksize = jax.random.randint(k1, (n, 1, 1, 1, 1), 2, max_ksize + 1)
        index = jnp.arange(max_ksize).reshape(1, 1, -1, 1, 1)
        kmask = ((index >= (max_ksize - ksize) // 2) & (index < (max_ksize + ksize) // 2)).astype(jnp.float32)
        std = jax.random.uniform(k2, (n, 1, 1, 1, 1)) * max_std
        weight = jax.random.normal(k3, (n, 1, max_ksize, 1, 1)) * std * kmask
        weight = (1.0 / ksize) * kmask + weight - jnp.mean(weight, axis=2, keepdims=True)

        pad_lo, pad_hi = max_ksize // 2, (max_ksize - 1) // 2
        v = jnp.pad(video, [(0, 0), (0, 0), (pad_lo, pad_hi), (0, 0), (0, 0)], mode="reflect")
        # Per-sample temporal conv: treat channels as batch, samples as groups.
        v = v.transpose(1, 0, 2, 3, 4)                            # [c, n, T, h, w]
        dn = jax.lax.conv_dimension_numbers(v.shape, weight.shape, ("NCDHW", "OIDHW", "NCDHW"))
        out = jax.lax.conv_general_dilated(v, weight, (1, 1, 1), ((0, 0),) * 3,
                                           dimension_numbers=dn, feature_group_count=n)
        out = out.transpose(1, 0, 2, 3, 4)
        pmask = jnp.asarray(p) < jax.random.uniform(k4, (n, 1, 1, 1, 1))
        return jnp.where(pmask, out, video)
