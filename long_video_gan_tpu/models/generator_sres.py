"""Stage-2 super-resolution video generator (36x64 -> 144x256).

TPU-native reimplementation of the reference's sres generator
(model/generator_sres.py): a StyleGAN3 ("SG3") alias-free per-frame synthesis
network conditioned on a +/-temporal_context window of low-res frames, with a
per-layer Kaiser-resampled conditioning pyramid. Frames fold into the batch
axis ((n t) c h w), so every conv is a large MXU-friendly batch.

Execution-model differences from the reference (semantics preserved):
  * modulated_conv2d runs as activation-side modulation + one dense conv +
    einsum demodulation epilogue — mathematically identical to the reference's
    per-sample grouped-conv weight modulation (generator_sres.py:27-67), but
    keeps a single large conv on the MXU instead of batch-many groups;
  * filtered_lrelu is the composed XLA op from ops/ (no CUDA sign tensor);
  * the mapping network runs once per video and broadcasts per frame (the
    reference maps the identical z repeated T times, generator_sres.py:575);
  * fp16 layers map to bfloat16.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filtered_lrelu import auto_impl_policy, filtered_lrelu
from ..ops.filters import design_lowpass_filter, kaiser_resample_filter
from ..ops.upfirdn2d import downsample2d, upsample2d
from ..utils.misc import assert_shape
from .common import FullyConnectedLayer


# ---------------------------------------------------------------------------


def modulated_conv2d(
    x: jax.Array,               # [N, Ci, H, W]
    w: jax.Array,               # [Co, Ci, kh, kw]
    s: jax.Array,               # [N, Ci] per-sample styles
    demodulate: bool = True,
    padding: int = 0,
    input_gain: Optional[jax.Array] = None,
) -> jax.Array:
    """StyleGAN3 modulated conv2d (semantics: generator_sres.py:27-67).

    conv(x, w * s) == conv(x * s, w) for per-input-channel styles, so the
    modulation moves to the activations and the conv stays dense.
    """
    batch = x.shape[0]
    out_channels, in_channels, kh, kw = w.shape
    assert_shape(x, (batch, in_channels, None, None))
    assert_shape(s, (batch, in_channels))

    w = w.astype(jnp.float32)
    s = s.astype(jnp.float32)
    if demodulate:
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(1, 2, 3), keepdims=True))
        s = s * jax.lax.rsqrt(jnp.mean(jnp.square(s)))

    if demodulate:
        dcoefs = jax.lax.rsqrt(
            jnp.einsum("oikl,ni->no", jnp.square(w), jnp.square(s)) + 1e-8
        )                                                      # [N, Co]

    gain = s
    if input_gain is not None:
        gain = gain * jnp.broadcast_to(input_gain.astype(jnp.float32), (batch, in_channels))

    x = x * gain[:, :, None, None].astype(x.dtype)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)), dimension_numbers=dn,
    )
    if demodulate:
        y = y * dcoefs[:, :, None, None].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------


class MappingNetwork(nn.Module):
    """z -> per-layer w latents with w_avg tracking and truncation
    (reference: generator_sres.py:112-171)."""

    z_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 2
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998

    def setup(self):
        features = [self.z_dim] + [self.w_dim] * self.num_layers
        self.fcs = [
            FullyConnectedLayer(fi, fo, activation="lrelu", lrate_mul=self.lr_multiplier,
                                name=f"fc{idx}")
            for idx, (fi, fo) in enumerate(zip(features[:-1], features[1:]))
        ]
        self._w_avg = self.variable("ema", "w_avg", lambda: jnp.zeros((self.w_dim,), jnp.float32))

    def __call__(self, z: jax.Array, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None, update_emas: bool = False) -> jax.Array:
        assert_shape(z, (None, self.z_dim))
        if truncation_cutoff is None:
            truncation_cutoff = self.num_ws

        x = z.astype(jnp.float32)
        x = x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + 1e-8)
        for fc in self.fcs:
            x = fc(x)

        w_avg = self._w_avg
        if update_emas:
            # Global batch mean (cross-device reduce is implicit under pjit).
            mean = jnp.mean(jax.lax.stop_gradient(x), axis=0)
            w_avg.value = mean + (w_avg.value - mean) * self.w_avg_beta

        x = jnp.tile(x[:, None, :], (1, self.num_ws, 1))
        if truncation_psi != 1.0:
            truncated = w_avg.value + (x[:, :truncation_cutoff] - w_avg.value) * truncation_psi
            x = x.at[:, :truncation_cutoff].set(truncated)
        return x


# ---------------------------------------------------------------------------


class SynthesisInput(nn.Module):
    """Fourier-feature input grid (fourfeats=True only; generator_sres.py:176-222).

    The random frequencies/phases are draw-once constants; they live in the
    "consts" collection so checkpoint conversion can carry them over.
    """

    w_dim: int
    channels: int
    size: tuple[int, int]          # (width, height)
    sampling_rate: float
    bandwidth: float

    @nn.compact
    def __call__(self, batch_size: int) -> jax.Array:
        def init_features(key):
            kf, kp = jax.random.split(key)
            freqs = jax.random.normal(kf, (self.channels, 2))
            radii = jnp.sqrt(jnp.sum(jnp.square(freqs), axis=1, keepdims=True))
            freqs = freqs / (radii * jnp.exp(jnp.square(radii)) ** 0.25) * self.bandwidth
            phases = jax.random.uniform(kp, (self.channels,)) - 0.5
            w, h = self.size
            # affine_grid(align_corners=False) coordinates scaled by size/(2*sr).
            xs = ((jnp.arange(w) + 0.5) * 2 / w - 1) * (0.5 * w / self.sampling_rate)
            ys = ((jnp.arange(h) + 0.5) * 2 / h - 1) * (0.5 * h / self.sampling_rate)
            gx, gy = jnp.meshgrid(xs, ys)
            grid = jnp.stack([gx, gy], axis=-1)                       # [h, w, 2]
            feats = jnp.einsum("cd,hwd->chw", freqs, grid) + phases[:, None, None]
            return jnp.sin(feats * (2 * np.pi))[None]                 # [1, C, h, w]

        features = self.variable("consts", "features",
                                 lambda: init_features(self.make_rng("params"))).value
        weight = self.param("weight", nn.initializers.normal(1.0), (self.channels, self.channels))
        feats = jnp.einsum("nchw,kc->nkhw", features, weight / math.sqrt(self.channels))
        return jnp.tile(feats, (batch_size, 1, 1, 1))


# ---------------------------------------------------------------------------


class SynthesisLayer(nn.Module):
    """Alias-free synthesis layer: modulated conv + filtered leaky ReLU with
    per-layer designed Kaiser / radial-jinc resampling filters
    (reference: generator_sres.py:227-360)."""

    w_dim: int
    is_torgb: bool
    is_critically_sampled: bool
    use_fp16: bool
    in_channels: int
    out_channels: int
    in_size: tuple[int, int]       # (width, height)
    out_size: tuple[int, int]
    in_sampling_rate: float
    out_sampling_rate: float
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False
    conv_clamp: Optional[float] = 256.0
    magnitude_ema_beta: float = 0.999
    half_dtype: Any = jnp.bfloat16
    resample_impl: str = "conv"

    def setup(self):
        k = 1 if self.is_torgb else self.conv_kernel
        self.kernel = k
        self.tmp_sampling_rate = max(self.in_sampling_rate, self.out_sampling_rate) * (
            1 if self.is_torgb else self.lrelu_upsampling
        )

        self.affine = FullyConnectedLayer(self.w_dim, self.in_channels, bias_init=1.0)
        self.weight = self.param("weight", nn.initializers.normal(1.0),
                                 (self.out_channels, self.in_channels, k, k))
        self.bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        # Up/downsampling filter design (static; generator_sres.py:280-301).
        self.up_factor = int(np.rint(self.tmp_sampling_rate / self.in_sampling_rate))
        assert self.in_sampling_rate * self.up_factor == self.tmp_sampling_rate
        up_taps = self.filter_size * self.up_factor if self.up_factor > 1 and not self.is_torgb else 1
        self.up_filter = design_lowpass_filter(
            numtaps=up_taps, cutoff=self.in_cutoff, width=self.in_half_width * 2,
            fs=self.tmp_sampling_rate)

        self.down_factor = int(np.rint(self.tmp_sampling_rate / self.out_sampling_rate))
        assert self.out_sampling_rate * self.down_factor == self.tmp_sampling_rate
        down_taps = self.filter_size * self.down_factor if self.down_factor > 1 and not self.is_torgb else 1
        down_radial = self.use_radial_filters and not self.is_critically_sampled
        self.down_filter = design_lowpass_filter(
            numtaps=down_taps, cutoff=self.out_cutoff, width=self.out_half_width * 2,
            fs=self.tmp_sampling_rate, radial=down_radial)

        in_size = np.asarray(self.in_size)
        out_size = np.asarray(self.out_size)
        pad_total = (out_size - 1) * self.down_factor + 1
        pad_total -= (in_size + k - 1) * self.up_factor
        pad_total += up_taps + down_taps - 2
        pad_lo = (pad_total + self.up_factor) // 2
        pad_hi = pad_total - pad_lo
        self.padding = [int(pad_lo[0]), int(pad_hi[0]), int(pad_lo[1]), int(pad_hi[1])]
        self._magnitude_ema = self.variable("ema", "magnitude_ema",
                                            lambda: jnp.ones((), jnp.float32))

    def __call__(self, x: jax.Array, w: jax.Array, force_fp32: bool = False,
                 update_emas: bool = False) -> jax.Array:
        assert_shape(x, (None, self.in_channels, int(self.in_size[1]), int(self.in_size[0])))
        assert_shape(w, (x.shape[0], self.w_dim))

        magnitude_ema = self._magnitude_ema
        if update_emas:
            mag = jnp.mean(jnp.square(jax.lax.stop_gradient(x).astype(jnp.float32)))
            magnitude_ema.value = mag + (magnitude_ema.value - mag) * self.magnitude_ema_beta
        input_gain = jax.lax.rsqrt(magnitude_ema.value)

        styles = self.affine(w)
        if self.is_torgb:
            styles = styles * (1 / math.sqrt(self.in_channels * (self.kernel ** 2)))

        dtype = self.half_dtype if (self.use_fp16 and not force_fp32) else jnp.float32
        x = modulated_conv2d(x.astype(dtype), self.weight, styles,
                             padding=self.kernel - 1, demodulate=not self.is_torgb,
                             input_gain=input_gain)

        gain = 1.0 if self.is_torgb else math.sqrt(2.0)
        slope = 1.0 if self.is_torgb else 0.2
        impl = self.resample_impl
        if impl == "auto":
            # Hardware-keyed measured policy (ops/filtered_lrelu.auto_impl_policy):
            # fused vs matrix per layer on known chips, matrix on unknown ones.
            impl = auto_impl_policy(self.up_factor,
                                    int(self.in_size[0]) * int(self.in_size[1]),
                                    use_fp16=self.use_fp16)
        x = filtered_lrelu(x, fu=self.up_filter, fd=self.down_filter,
                           b=self.bias.astype(x.dtype), up=self.up_factor,
                           down=self.down_factor, padding=self.padding, gain=gain,
                           slope=slope, clamp=self.conv_clamp, impl=impl)
        assert_shape(x, (None, self.out_channels, int(self.out_size[1]), int(self.out_size[0])))
        assert x.dtype == dtype
        return x


# ---------------------------------------------------------------------------


def synthesis_layer_plan(img_width: int, img_height: int, img_channels: int,
                         channel_base: int = 32768, channel_max: int = 512,
                         num_layers: int = 14, num_critical: int = 2,
                         first_cutoff: float = 2.0, first_stopband: float = 2 ** 2.1,
                         last_stopband_rel: float = 2 ** 0.3, margin_size: int = 10):
    """Static per-layer schedule: cutoffs, stopbands, sampling rates, sizes and
    channel counts (reference: generator_sres.py:410-427), incl. the non-square
    per-axis size scaling with the last two layers pinned to the image size."""
    img_resolution = max(img_width, img_height)
    last_cutoff = img_resolution / 2
    last_stopband = last_cutoff * last_stopband_rel
    exponents = np.minimum(np.arange(num_layers + 1) / (num_layers - num_critical), 1)
    cutoffs = first_cutoff * (last_cutoff / first_cutoff) ** exponents
    stopbands = first_stopband * (last_stopband / first_stopband) ** exponents

    sampling_rates = np.exp2(np.ceil(np.log2(np.minimum(stopbands * 2, img_resolution))))
    half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
    sizes_x = np.ceil(sampling_rates * min(1, img_width / img_height)) + margin_size * 2
    sizes_y = np.ceil(sampling_rates * min(1, img_height / img_width)) + margin_size * 2
    sizes_x[-2:] = img_width
    sizes_y[-2:] = img_height
    channels = np.rint(np.minimum((channel_base / 2) / cutoffs, channel_max))
    channels[-1] = img_channels
    return dict(cutoffs=cutoffs, stopbands=stopbands, sampling_rates=sampling_rates,
                half_widths=half_widths, sizes_x=sizes_x, sizes_y=sizes_y, channels=channels)


class SynthesisNetwork(nn.Module):
    """Alias-free synthesis stack: num_layers + ToRGB, each consuming the
    per-layer conditioning map (reference: generator_sres.py:375-477)."""

    w_dim: int
    img_width: int
    img_height: int
    img_channels: int
    cond_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    fourfeats: bool = False
    output_scale: float = 0.25
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    resample_impl: str = "conv"
    # Rematerialize each synthesis layer in the backward pass (jax.checkpoint
    # per layer): peak HBM holds one layer's supersampled buffers instead of
    # all 15, trading one recompute forward for the micro-batch headroom the
    # reference gets from eager per-op memory reuse. Variable-transparent:
    # same param tree either way.
    block_remat: bool = False

    @property
    def num_ws(self) -> int:
        return self.num_layers + 1

    @property
    def img_resolution(self) -> int:
        return max(self.img_width, self.img_height)

    def plan(self):
        return synthesis_layer_plan(
            self.img_width, self.img_height, self.img_channels, self.channel_base,
            self.channel_max, self.num_layers, self.num_critical, self.first_cutoff,
            self.first_stopband, self.last_stopband_rel, self.margin_size)

    def setup(self):
        p = self.plan()
        sizes_x, sizes_y = p["sizes_x"], p["sizes_y"]
        rates, cutoffs, half_widths, channels = (
            p["sampling_rates"], p["cutoffs"], p["half_widths"], p["channels"])

        if self.fourfeats:
            self.input = SynthesisInput(
                w_dim=self.w_dim, channels=int(channels[0]),
                size=(int(sizes_x[0]), int(sizes_y[0])),
                sampling_rate=float(rates[0]), bandwidth=float(cutoffs[0]))

        # static_argnums counts `self` as 0: (force_fp32, update_emas) are
        # python bools.
        layer_cls = (nn.remat(SynthesisLayer, static_argnums=(3, 4))
                     if self.block_remat else SynthesisLayer)
        layers = []
        names = []
        for idx in range(self.num_layers + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == self.num_layers
            is_critical = idx >= self.num_layers - self.num_critical
            use_fp16 = rates[idx] * (2 ** self.num_fp16_res) > self.img_resolution
            in_channels = self.cond_channels
            if idx > 0 or self.fourfeats:
                in_channels += int(channels[prev])
            layer = layer_cls(
                w_dim=self.w_dim, is_torgb=is_torgb, is_critically_sampled=is_critical,
                use_fp16=bool(use_fp16), in_channels=in_channels,
                out_channels=int(channels[idx]),
                in_size=(int(sizes_x[prev]), int(sizes_y[prev])),
                out_size=(int(sizes_x[idx]), int(sizes_y[idx])),
                in_sampling_rate=int(rates[prev]), out_sampling_rate=int(rates[idx]),
                in_cutoff=float(cutoffs[prev]), out_cutoff=float(cutoffs[idx]),
                in_half_width=float(half_widths[prev]), out_half_width=float(half_widths[idx]),
                conv_clamp=self.conv_clamp, resample_impl=self.resample_impl,
                name=f"L{idx}_{int(sizes_x[idx])}_{int(sizes_y[idx])}_{int(channels[idx])}",
            )
            layers.append(layer)
            names.append(layer.name)
        self.layers = layers
        self.layer_names = names

    def __call__(self, ws: jax.Array, conds: list[jax.Array],
                 force_fp32: bool = False, update_emas: bool = False) -> jax.Array:
        assert_shape(ws, (None, self.num_ws, self.w_dim))
        x = self.input(ws.shape[0]) if self.fourfeats else None
        for i, layer in enumerate(self.layers):
            cond = conds[i]
            x = cond if x is None else jnp.concatenate([x, cond.astype(x.dtype)], axis=1)
            # Positional: under block_remat the trailing bools are
            # jax.checkpoint static_argnums.
            x = layer(x, ws[:, i].astype(jnp.float32), force_fp32, update_emas)
        if self.output_scale != 1:
            x = x * self.output_scale
        assert_shape(x, (None, self.img_channels, self.img_height, self.img_width))
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Conditioning-pyramid resamplers (static filters, replicate edge padding;
# reference: generator_sres.py:481-522).


class KaiserDownsample2d:
    def __init__(self, scale: int, filter_size: int = 6, cutoff: float = 1.0,
                 width: float = 6.0, sampling_rate: float = 4.0, pad: bool = True,
                 impl: str = "conv"):
        self.scale = scale
        self.pad = pad
        self.impl = impl
        self.filter = kaiser_resample_filter(scale, filter_size, cutoff, width, sampling_rate)

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 4
        p = int(self.pad) * self.scale
        if self.pad:
            x = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p)], mode="edge")
        return downsample2d(x, self.filter, down=self.scale, padding=-p, impl=self.impl)


class KaiserUpsample2d:
    def __init__(self, scale: int, filter_size: int = 6, cutoff: float = 1.0,
                 width: float = 6.0, sampling_rate: float = 4.0, pad: bool = True,
                 impl: str = "conv"):
        self.scale = scale
        self.pad = pad
        self.impl = impl
        self.filter = kaiser_resample_filter(scale, filter_size, cutoff, width, sampling_rate)

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 4
        p = int(self.pad)
        if self.pad:
            x = jnp.pad(x, [(0, 0), (0, 0), (p, p), (p, p)], mode="edge")
        return upsample2d(x, self.filter, up=self.scale, padding=-p * self.scale,
                          impl=self.impl)


# ---------------------------------------------------------------------------


class Generator(nn.Module):
    """SG3 generator: mapping + synthesis + conditioning pyramid
    (reference: generator_sres.py:527-610)."""

    z_dim: int
    w_dim: int
    img_width: int
    img_height: int
    img_channels: int
    cond_width: int
    cond_height: int
    cond_context: int
    margin_size: int = 10
    fourfeats: bool = False
    num_fp16_res: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    resample_impl: str = "conv"
    block_remat: bool = False

    @property
    def cond_channels(self) -> int:
        return self.img_channels * (2 * self.cond_context + 1)

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim, img_width=self.img_width, img_height=self.img_height,
            img_channels=self.img_channels, cond_channels=self.cond_channels,
            margin_size=self.margin_size, fourfeats=self.fourfeats,
            num_fp16_res=self.num_fp16_res, channel_base=self.channel_base,
            channel_max=self.channel_max, num_layers=self.num_layers,
            resample_impl=self.resample_impl, block_remat=self.block_remat)
        self.mapping = MappingNetwork(z_dim=self.z_dim, w_dim=self.w_dim,
                                      num_ws=self.synthesis.num_ws)

        # Per-layer conditioning resamplers (static). Layers sharing a
        # sampling rate get the SAME resample (e.g. the 14-layer 144x256 plan
        # has 15 layer slots but only 5 distinct scales), so the pyramid is
        # computed once per distinct scale and shared — exactness-preserving
        # dedup of what the reference evaluates per layer
        # (reference: generator_sres.py:581-610).
        rates = self.synthesis.plan()["sampling_rates"]
        cond_edge = max(self.cond_width, self.cond_height)
        keys = []
        resample_by_key = {}
        for idx in range(self.synthesis.num_ws):
            # in_sampling_rate of layer idx == rates[max(idx-1, 0)]
            cond_scale = rates[max(idx - 1, 0)] / cond_edge
            if cond_scale < 1:
                key = ("down", math.ceil(1 / cond_scale))
            elif cond_scale > 1:
                key = ("up", math.ceil(cond_scale))
            else:
                key = ("id", 1)
            if key not in resample_by_key:
                if key[0] == "down":
                    resample_by_key[key] = KaiserDownsample2d(scale=key[1],
                                                              impl=self.resample_impl)
                elif key[0] == "up":
                    resample_by_key[key] = KaiserUpsample2d(scale=key[1],
                                                            impl=self.resample_impl)
                else:
                    resample_by_key[key] = lambda x: x
            keys.append(key)
        self._resample_keys = keys
        self._resample_by_key = resample_by_key

    def prep_cond(self, cond: jax.Array) -> list[jax.Array]:
        """Build per-layer conditioning maps: pad lr video to square + margin,
        Kaiser-resample the raw frames once per DISTINCT layer scale,
        center-crop/pad per layer geometry, then unfold the +/-context
        temporal window into channels (reference: generator_sres.py:581-610).

        The reference unfolds first and resamples per layer; because the
        spatial resampling is per-channel-plane linear filtering, it commutes
        with both the temporal unfold (which only duplicates frames into
        channels, ~(1+2*context)x) and the crop, so resampling the t raw
        frames once per distinct scale computes identical values with ~18x
        fewer resampling FLOPs on the production plan (5 distinct scales for
        15 layer slots, 3 channels vs 27, t vs t_out windows)."""
        assert_shape(cond, (None, self.img_channels, None, self.cond_height, self.cond_width))
        n, c, t, h, w = cond.shape
        edge = max(self.cond_width, self.cond_height)
        px0 = (edge - w) // 2 + self.margin_size
        px1 = (edge - w + 1) // 2 + self.margin_size
        py0 = (edge - h) // 2 + self.margin_size
        py1 = (edge - h + 1) // 2 + self.margin_size
        cond = jnp.pad(cond, [(0, 0), (0, 0), (0, 0), (py0, py1), (px0, px1)], mode="edge")

        # Per-frame stack for resampling: [n*t, c, H, W].
        frames = cond.transpose(0, 2, 1, 3, 4).reshape(n * t, c, cond.shape[3], cond.shape[4])

        # One resample per distinct scale.
        levels = {key: resample(frames)
                  for key, resample in self._resample_by_key.items()}

        # Temporal unfold indices: windows of 1 + 2*context, stride 1.
        s = 1 + 2 * self.cond_context
        t_out = t - s + 1
        idx = np.arange(t_out)[:, None] + np.arange(s)[None, :]          # [t_out, s]

        plan = self.synthesis.plan()
        sizes_x, sizes_y = plan["sizes_x"], plan["sizes_y"]
        conds = []
        cache = {}
        for i, key in enumerate(self._resample_keys):
            # Layer i's in_size is sizes[i-1] (sizes[0] for the first layer).
            prev = max(i - 1, 0)
            in_w = int(sizes_x[prev])
            in_h = int(sizes_y[prev])
            full_key = (key, in_h, in_w)
            if full_key in cache:
                conds.append(cache[full_key])
                continue
            layer_cond = levels[key]
            x0 = max(0, (layer_cond.shape[3] - in_w) // 2)
            y0 = max(0, (layer_cond.shape[2] - in_h) // 2)
            layer_cond = layer_cond[:, :, y0:y0 + in_h, x0:x0 + in_w]
            pxa = (in_w - layer_cond.shape[3]) // 2
            pxb = (in_w - layer_cond.shape[3] + 1) // 2
            pya = (in_h - layer_cond.shape[2]) // 2
            pyb = (in_h - layer_cond.shape[2] + 1) // 2
            if pxa or pxb or pya or pyb:
                layer_cond = jnp.pad(layer_cond, [(0, 0), (0, 0), (pya, pyb), (pxa, pxb)],
                                     mode="edge")
            # Unfold: [n, t, c, h, w] -> windows [n, t_out, c, s, h, w]
            # -> [(n t_out), c*s, h, w] (c-major, s-minor channel layout, as
            # the reference's unfold produces).
            y5 = layer_cond.reshape(n, t, c, in_h, in_w)
            windows = y5[:, idx]                                          # [n, t_out, s, c, h, w]
            windows = windows.transpose(0, 1, 3, 2, 4, 5)                 # [n, t_out, c, s, h, w]
            out = windows.reshape(n * t_out, c * s, in_h, in_w)
            cache[full_key] = out
            conds.append(out)
        return conds

    def __call__(self, z: jax.Array, cond: jax.Array, truncation_psi: float = 1.0,
                 truncation_cutoff: Optional[int] = None, update_emas: bool = False,
                 **synthesis_kwargs) -> jax.Array:
        assert_shape(cond, (z.shape[0], self.img_channels, None, self.cond_height, self.cond_width))
        out_seq_length = cond.shape[2] - 2 * self.cond_context
        assert out_seq_length > 0
        conds = self.prep_cond(cond)
        # Map once per video, broadcast per frame (z is identical across frames).
        ws = self.mapping(z, truncation_psi=truncation_psi,
                          truncation_cutoff=truncation_cutoff, update_emas=update_emas)
        ws = jnp.repeat(ws, out_seq_length, axis=0)                      # [(n t), num_ws, w]
        img = self.synthesis(ws, conds, update_emas=update_emas, **synthesis_kwargs)
        n = z.shape[0]
        return img.reshape(n, out_seq_length, self.img_channels,
                           self.img_height, self.img_width).transpose(0, 2, 1, 3, 4)


# ---------------------------------------------------------------------------


class VideoGenerator(nn.Module):
    """Super-res video generator wrapper (reference: generator_sres.py:616-681)."""

    hr_height: int = 256
    hr_width: int = 256
    lr_height: int = 32
    lr_width: int = 32
    temporal_context: int = 4
    latent_z_dim: int = 512
    latent_w_dim: int = 512
    margin_size: int = 10
    fourfeats: bool = False
    num_fp16_res: int = 4
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    resample_impl: str = "conv"
    block_remat: bool = False

    def setup(self):
        self.SG3 = Generator(
            z_dim=self.latent_z_dim, w_dim=self.latent_w_dim,
            img_width=self.hr_width, img_height=self.hr_height, img_channels=3,
            cond_width=self.lr_width, cond_height=self.lr_height,
            cond_context=self.temporal_context, margin_size=self.margin_size,
            fourfeats=self.fourfeats, num_fp16_res=self.num_fp16_res,
            channel_base=self.channel_base, channel_max=self.channel_max,
            num_layers=self.num_layers, resample_impl=self.resample_impl,
            block_remat=self.block_remat)

    def __call__(self, lr_video: jax.Array, z: Optional[jax.Array] = None,
                 magnitude_ema_beta: float = 1.0, **kwargs) -> jax.Array:
        """lr video [N, 3, T + 2*context, lh, lw] -> hr video [N, 3, T, hh, hw].

        One z per video (sampled from the "noise" rng stream unless injected).
        """
        batch = lr_video.shape[0]
        out_seq_length = lr_video.shape[2] - 2 * self.temporal_context
        assert out_seq_length > 0
        if z is None:
            z = jax.random.normal(self.make_rng("noise"), (batch, self.latent_z_dim), jnp.float32)
        update_emas = magnitude_ema_beta < 1
        return self.SG3(z, lr_video, update_emas=update_emas, **kwargs)


def sample_video_segments(apply_fn, variables, lr_video, segment_length: int = 8,
                          temporal_context: int = 4, z=None, rng=None,
                          prefetch: int = 1):
    """Chunked hr synthesis: unfold the lr video into overlapping windows of
    segment_length + 2*context (stride segment_length), run the generator per
    window with the same z, yield hr segments.

    This is THE long-video mechanism (reference: generator_sres.py:662-681).
    Host-level loop: every window has identical shapes, so the jitted apply
    compiles once and streams segments without ever materializing the full
    hr video. `prefetch` windows are dispatched ahead of the one being
    yielded, so the device keeps synthesizing while the consumer fetches and
    encodes the previous segment (JAX dispatch is async; a consumer-side
    `np.asarray` blocks only on its own segment). prefetch=0 restores fully
    serialized dispatch; each in-flight segment holds one extra hr segment
    plus its synthesis workspace on device.
    """
    import collections as _collections

    import jax as _jax

    n, c, t, h, w = lr_video.shape
    out_t = t - 2 * temporal_context
    assert out_t > 0 and out_t % segment_length == 0
    if z is None:
        assert rng is not None, "need z or rng"
        z = _jax.random.normal(rng, (n, variables["params"]["SG3"]["mapping"]["fc0"]["weight"].shape[1]))
    win = segment_length + 2 * temporal_context
    pending = _collections.deque()
    for start in range(0, out_t, segment_length):
        window = _jax.lax.dynamic_slice_in_dim(lr_video, start, win, axis=2)
        pending.append(apply_fn(variables, window, z=z))
        while len(pending) > max(prefetch, 0):
            yield pending.popleft()
    while pending:
        yield pending.popleft()
