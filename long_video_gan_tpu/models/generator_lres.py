"""Stage-1 low-resolution video generator (36x64, long sequences).

TPU-native reimplementation of the reference's lres generator
(model/generator_lres.py:649-878): an unconditional 3D-conv video GAN driven by
a multi-timescale "blurred noise" temporal latent. Differences from the
reference are all about the execution model, not semantics:

  * modulated conv3d lowers to one `lax.conv_general_dilated` (MXU) with the
    style modulation fused into the activations and demodulation as an einsum
    epilogue — no grouped-conv trick needed;
  * magnitude EMA buffers live in the flax "ema" collection and their
    cross-device mean is implicit in the sharded `jnp.mean` (vs the eager
    per-layer NCCL all_reduce at generator_lres.py:304-312);
  * the reference's 2^31-element CUDA chunk wrappers (generator_lres.py:30-70)
    are unnecessary: XLA has no such limit and very long videos shard over the
    mesh time axis instead;
  * fp16 layers map to bfloat16 (TPU-native half precision).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import bias_act
from ..ops.filters import design_kaiser_lowpass
from ..utils.misc import assert_shape
from .common import (
    FullyConnectedLayer,
    MagnitudeEMA,
    SpatialBilinearUpsample,
    TemporalKaiserDownsample,
    TemporalLinearUpsample,
    center_crop,
    normalize_2nd_moment,
)

# ---------------------------------------------------------------------------


def temporal_modulated_conv3d(
    x: jax.Array,                 # [N, Ci, T, H, W]
    weight: jax.Array,            # [Co, Ci, kt, kh, kw]
    style: jax.Array,             # [N, Ci, T] — per-timestep styles
    input_gain: Optional[jax.Array] = None,
    padding: tuple[int, int, int] = (0, 0, 0),
    demodulate: bool = True,
) -> jax.Array:
    """StyleGAN-style modulated conv3d with per-timestep styles.

    Semantics contract: model/generator_lres.py:83-125. Modulation happens on
    the activation side (x * style), demodulation via the einsum
    "oizyx,nit->not" over squared weights/styles, both computed in fp32.
    """
    assert x.ndim == 5
    batch, in_channels = x.shape[0], x.shape[1]
    assert_shape(weight, (None, in_channels, None, None, None))
    assert_shape(style, (batch, in_channels, None))

    weight = weight.astype(jnp.float32)
    style = style.astype(jnp.float32)

    if demodulate:
        weight = weight / jnp.max(jnp.abs(weight), axis=(1, 2, 3, 4), keepdims=True)
        style = style / jnp.max(jnp.abs(style), axis=(1, 2), keepdims=True)

    num_inputs = np.prod(weight.shape[1:])
    weight = weight / math.sqrt(num_inputs)

    if demodulate:
        demod = jnp.einsum("oizyx,nit->not", jnp.square(weight), jnp.square(style))
        demod = jax.lax.rsqrt(demod + 1e-8)          # [N, Co, T]

    if input_gain is not None:
        assert input_gain.ndim == 0
        x = x * input_gain.astype(x.dtype)

    # Activation-side modulation, then a single dense conv3d on the MXU.
    x = x * style[:, :, :, None, None].astype(x.dtype)
    pt, ph, pw = padding
    dn = jax.lax.conv_dimension_numbers(x.shape, weight.shape, ("NCDHW", "OIDHW", "NCDHW"))
    y = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), window_strides=(1, 1, 1),
        padding=((pt, pt), (ph, ph), (pw, pw)), dimension_numbers=dn,
    )

    if demodulate:
        y = y * demod[:, :, :, None, None].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------


class BlurredNoise(nn.Module):
    """Multi-timescale temporal latent: white noise blurred by a bank of
    Kaiser low-pass filters at log-spaced sampling rates.

    Reference semantics: model/generator_lres.py:321-387. The grouped conv1d
    is expressed as a standard 1->blur_widths channel conv (each noise channel
    convolved with every filter), which XLA lowers to an MXU matmul.
    """

    channels: int = 1024
    min_sampling_rate: float = 250.0
    max_sampling_rate: float = 10000.0
    blur_widths: int = 128
    cutoff: float = 2.0
    width: float = 12.0
    sampling_rate_base: float = 2.0
    normalize_per_filter: float = 1.0

    def setup(self):
        assert self.channels % self.blur_widths == 0
        self.noise_channels = self.channels // self.blur_widths
        self.kernel_size = int(np.ceil(self.max_sampling_rate / 2))

        if self.sampling_rate_base > 1:
            lo = math.log(self.min_sampling_rate, self.sampling_rate_base)
            hi = math.log(self.max_sampling_rate, self.sampling_rate_base)
            rates = self.sampling_rate_base ** np.linspace(lo, hi, self.blur_widths)
            rates = np.clip(rates, self.min_sampling_rate, self.max_sampling_rate)
        else:
            rates = np.linspace(self.min_sampling_rate, self.max_sampling_rate, self.blur_widths)

        filters = np.zeros((self.blur_widths, self.kernel_size), dtype=np.float32)
        for i, rate in enumerate(rates):
            taps = int(np.ceil(rate / 2))
            filters[i, -taps:] = design_kaiser_lowpass(taps, self.cutoff, self.width, rate)

        if self.normalize_per_filter > 0:
            self.output_scale = (1.0 / np.sqrt((filters ** 2).sum(axis=1)))[None, :, None]
        self.blur_filters = filters                   # static numpy constant

    def __call__(self, batch_size: int, seq_length: int,
                 noise: Optional[jax.Array] = None) -> jax.Array:
        """Sample (or take injected) white noise and blur it.

        `noise` has shape [N, noise_channels, seq_length + kernel_size - 1];
        injecting it explicitly is the parity/testing path (replacing torch
        Generator seeding, which is not reproducible cross-framework).
        """
        input_len = seq_length + self.kernel_size - 1
        if noise is None:
            noise = jax.random.normal(
                self.make_rng("noise"), (batch_size, self.noise_channels, input_len), jnp.float32
            )
        assert_shape(noise, (batch_size, self.noise_channels, input_len))
        return self.blur(noise)

    def blur(self, noise: jax.Array) -> jax.Array:
        n, c, t_in = noise.shape
        assert c == self.noise_channels
        x = noise.reshape(n * c, 1, t_in)
        w = jnp.asarray(self.blur_filters[:, None, :])  # [blur_widths, 1, taps]
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCH", "OIH", "NCH"))
        feats = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=((0, 0),), dimension_numbers=dn
        )                                               # [(n c), blur_widths, T]
        if self.normalize_per_filter > 0:
            scale = 1.0 + self.normalize_per_filter * (self.output_scale - 1.0)
            feats = feats * jnp.asarray(scale, feats.dtype)
        t = feats.shape[-1]
        return feats.reshape(n, c * self.blur_widths, t)


# ---------------------------------------------------------------------------


class LatentMappingNetwork(nn.Module):
    """Per-timestep MLP mapping temporal embedding -> w (generator_lres.py:442-479)."""

    temporal_emb_dim: int = 1024
    latent_w_dim: int = 1024
    num_layers: int = 2
    activation: str = "lrelu"
    lrate_mul: float = 0.01
    normalize_input: bool = True

    def setup(self):
        layers = []
        for index in range(self.num_layers):
            in_dim = self.temporal_emb_dim if index == 0 else self.latent_w_dim
            layers.append(FullyConnectedLayer(
                in_dim, self.latent_w_dim, activation=self.activation,
                lrate_mul=self.lrate_mul, name=f"layer_{index}",
            ))
        self.layers = layers

    def __call__(self, temporal_emb: jax.Array) -> jax.Array:
        assert_shape(temporal_emb, (None, self.temporal_emb_dim, None))
        if self.normalize_input:
            temporal_emb = normalize_2nd_moment(temporal_emb)
        n, c, t = temporal_emb.shape
        x = temporal_emb.transpose(0, 2, 1).reshape(n * t, c)
        for layer in self.layers:
            x = layer(x)
        return x.reshape(n, t, self.latent_w_dim).transpose(0, 2, 1)


# ---------------------------------------------------------------------------


class Synthesis3dResBlock(nn.Module):
    """Residual modulated-conv3d block with optional temporal/spatial x2 up.

    Reference semantics: model/generator_lres.py:485-592 (two modulated convs,
    1x1x1 skip, magnitude-EMA input gains, lrelu clamp 256, upsample then
    center-crop bookkeeping).
    """

    latent_dim: int
    in_channels: int
    out_channels: Optional[int] = None
    out_width: Optional[int] = None
    out_height: Optional[int] = None
    temporal_ksize: int = 1
    spatial_ksize: int = 1
    temporal_up: bool = False
    spatial_up: bool = False
    activation: str = "lrelu"
    activation_clamp: Optional[float] = 256.0
    magnitude_ema: bool = True
    demodulate: bool = True
    half_dtype: Any = jnp.bfloat16
    use_half: bool = False

    @property
    def out_ch(self) -> int:
        return self.out_channels or self.in_channels

    def setup(self):
        ic, oc = self.in_channels, self.out_ch
        kt, ks = self.temporal_ksize, self.spatial_ksize
        self.affine_0 = FullyConnectedLayer(self.latent_dim, ic, bias_init=1.0)
        self.affine_1 = FullyConnectedLayer(self.latent_dim, ic, bias_init=1.0)
        self.weight_0 = self.param("weight_0", nn.initializers.normal(1.0), (ic, ic, kt, ks, ks))
        self.weight_1 = self.param("weight_1", nn.initializers.normal(1.0), (oc, ic, kt, ks, ks))
        self.weight_skip = self.param("weight_skip", nn.initializers.normal(1.0), (oc, ic, 1, 1, 1))
        self.bias_0 = self.param("bias_0", nn.initializers.zeros, (ic,))
        self.bias_1 = self.param("bias_1", nn.initializers.zeros, (oc,))
        if self.magnitude_ema:
            self.input_magnitude_ema_0 = MagnitudeEMA()
            self.input_magnitude_ema_1 = MagnitudeEMA()
        if self.temporal_up:
            self.temporal_upsample = TemporalLinearUpsample()
        if self.spatial_up:
            self.spatial_upsample = SpatialBilinearUpsample()

    def __call__(self, x: jax.Array, latent: jax.Array, magnitude_ema_beta: float = 1.0,
                 out_seq_length: Optional[int] = None, dtype: Optional[Any] = None) -> jax.Array:
        assert_shape(x, (None, self.in_channels, None, None, None))
        batch, in_t = x.shape[0], x.shape[2]
        assert_shape(latent, (batch, self.latent_dim, in_t))

        latent_flat = latent.transpose(0, 2, 1).reshape(batch * in_t, self.latent_dim)
        style_0 = self.affine_0(latent_flat).reshape(batch, in_t, -1).transpose(0, 2, 1)

        dtype = dtype if dtype is not None else (self.half_dtype if self.use_half else jnp.float32)
        x = x.astype(dtype)

        if self.magnitude_ema:
            x = x * self.input_magnitude_ema_0(x, magnitude_ema_beta).astype(dtype)

        padding = (self.temporal_ksize // 2, self.spatial_ksize // 2, self.spatial_ksize // 2)
        h = temporal_modulated_conv3d(x, self.weight_0, style_0, padding=padding, demodulate=True)
        h = bias_act(h, self.bias_0.astype(h.dtype), act=self.activation, clamp=self.activation_clamp)

        style_1 = self.affine_1(latent_flat).reshape(batch, in_t, -1).transpose(0, 2, 1)
        gain_1 = self.input_magnitude_ema_1(h, magnitude_ema_beta) if self.magnitude_ema else None
        h = temporal_modulated_conv3d(h, self.weight_1, style_1, gain_1, padding, demodulate=True)

        skip_gain = 1.0 / math.sqrt(self.in_channels)
        w_skip = (self.weight_skip * skip_gain).astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, w_skip.shape, ("NCDHW", "OIDHW", "NCDHW"))
        skip = jax.lax.conv_general_dilated(
            x, w_skip, window_strides=(1, 1, 1), padding=((0, 0),) * 3, dimension_numbers=dn
        )
        h = (skip + h) * math.sqrt(0.5)

        if self.temporal_up:
            h = self.temporal_upsample(h)
        h = center_crop(h, seq_length=out_seq_length)
        if self.spatial_up:
            h = self.spatial_upsample(h)
        h = center_crop(h, width=self.out_width, height=self.out_height)

        out = bias_act(h, self.bias_1.astype(h.dtype), act=self.activation, clamp=self.activation_clamp)
        assert_shape(out, (None, self.out_ch, None, self.out_height, self.out_width))
        return out


class ToRGB(nn.Module):
    """Non-demodulated 1x1x1 modulated conv to RGB (generator_lres.py:598-641)."""

    latent_dim: int
    in_channels: int
    activation_clamp: Optional[float] = 256.0
    magnitude_ema: bool = True
    half_dtype: Any = jnp.bfloat16
    use_half: bool = False

    def setup(self):
        self.affine = FullyConnectedLayer(self.latent_dim, self.in_channels, bias_init=1.0)
        self.weight = self.param("weight", nn.initializers.normal(1.0), (3, self.in_channels, 1, 1, 1))
        self.bias = self.param("bias", nn.initializers.zeros, (3,))
        if self.magnitude_ema:
            self.input_magnitude_ema = MagnitudeEMA()

    def __call__(self, x: jax.Array, latent: jax.Array, magnitude_ema_beta: float = 1.0,
                 dtype: Optional[Any] = None) -> jax.Array:
        assert_shape(x, (None, self.in_channels, None, None, None))
        batch, in_t = x.shape[0], x.shape[2]
        assert_shape(latent, (batch, self.latent_dim, in_t))

        latent_flat = latent.transpose(0, 2, 1).reshape(batch * in_t, self.latent_dim)
        style = self.affine(latent_flat).reshape(batch, in_t, -1).transpose(0, 2, 1)

        dtype = dtype if dtype is not None else (self.half_dtype if self.use_half else jnp.float32)
        x = x.astype(dtype)
        gain = self.input_magnitude_ema(x, magnitude_ema_beta) if self.magnitude_ema else None
        y = temporal_modulated_conv3d(x, self.weight, style, gain, demodulate=False)
        return bias_act(y, self.bias.astype(y.dtype), act="linear", clamp=self.activation_clamp)


# ---------------------------------------------------------------------------


class VideoGenerator(nn.Module):
    """Stage-1 generator: 6 temporal + 4 spatial residual blocks + ToRGB.

    Architecture contract: model/generator_lres.py:649-713. Construction math
    (scales, per-layer sizes, temporal bookkeeping) matches the reference
    exactly so converted checkpoints line up layer-for-layer.
    """

    out_height: int = 36
    out_width: int = 64
    temporal_emb_dim: int = 1024
    latent_w_dim: int = 1024
    temporal_ksize: int = 3
    spatial_ksize: int = 3
    temporal_padding: int = 8
    spatial_padding: int = 0
    output_scale: float = 0.25
    num_fp16_layers: int = 0          # mapped to bfloat16 on TPU
    channel_max: int = 512            # 512 == reference-exact; lower for tests
    embedding_kwargs: dict = None
    mapping_kwargs: dict = None
    # Rematerialize each residual block in the backward pass (jax.checkpoint
    # per block): peak HBM drops from sum-of-all-block-residuals to
    # one-block's-residuals + per-block inputs, letting training run larger
    # micro-batches. The reference gets the same effect implicitly from eager
    # per-op reuse; a whole-loss checkpoint was measured ineffective on v5e
    # (train/gan_lres.py:78-81). Numerics are identical; only recompute cost
    # (~1 extra forward) is added.
    block_remat: bool = False

    # ---- static architecture derivation (host-side, config-only) ----

    def _plan(self):
        long_edge = max(self.out_height, self.out_width)
        scales = tuple(max(1, long_edge // (2 ** (2 + i))) for i in range(5))
        heights = [math.ceil(self.out_height / s) + 2 * self.spatial_padding for s in scales]
        widths = [math.ceil(self.out_width / s) + 2 * self.spatial_padding for s in scales]
        t_cfg = dict(spatial_ksize=self.spatial_ksize, temporal_ksize=self.temporal_ksize)
        s_cfg = dict(spatial_ksize=self.spatial_ksize)
        ch = lambda c: min(c, self.channel_max)  # noqa: E731 — channel_max=512 is reference-exact
        temporal = [
            dict(in_channels=ch(512), out_height=heights[0], out_width=widths[0], temporal_up=True, **t_cfg),
            dict(in_channels=ch(512), out_height=heights[1], out_width=widths[1], temporal_up=True, spatial_up=True, **t_cfg),
            dict(in_channels=ch(512), temporal_up=True, **t_cfg),
            dict(in_channels=ch(512), out_channels=ch(512), out_height=heights[2], out_width=widths[2], temporal_up=True, spatial_up=True, **t_cfg),
            dict(in_channels=ch(512), out_channels=ch(256), temporal_up=True, **t_cfg),
            dict(in_channels=ch(256), **t_cfg),
        ]
        spatial = [
            dict(in_channels=ch(256), out_channels=ch(128), out_height=heights[3], out_width=widths[3], spatial_up=True, **s_cfg),
            dict(in_channels=ch(128), **s_cfg),
            dict(in_channels=ch(128), out_channels=ch(64), out_height=heights[4], out_width=widths[4],
                 spatial_up=heights[4] != heights[3], **s_cfg),
            dict(in_channels=ch(64), out_height=self.out_height, out_width=self.out_width, **s_cfg),
        ]
        return heights, widths, temporal, spatial

    def setup(self):
        heights, widths, temporal_cfg, spatial_cfg = self._plan()
        num_layers = len(temporal_cfg) + len(spatial_cfg) + 1

        # fp16 (here: bf16) opt-in for the last N layers, counted from ToRGB
        # backwards (reference :694-696).
        use_half = [False] * num_layers
        for i in range(min(self.num_fp16_layers, num_layers)):
            use_half[num_layers - 1 - i] = True

        # nn.remat is variable-transparent: the wrapped class produces the
        # exact same param/ema tree, so checkpoints are interchangeable with
        # block_remat off. static_argnums counts `self` as 0: (beta,
        # out_seq_length, dtype) are python scalars/types.
        block_cls = (nn.remat(Synthesis3dResBlock, static_argnums=(3, 4, 5))
                     if self.block_remat else Synthesis3dResBlock)
        self.temporal_layers = [
            block_cls(self.latent_w_dim, use_half=use_half[i], name=f"temporal_layers_{i}", **cfg)
            for i, cfg in enumerate(temporal_cfg)
        ]
        self.spatial_layers = [
            block_cls(self.latent_w_dim, use_half=use_half[len(temporal_cfg) + i],
                      name=f"spatial_layers_{i}", **cfg)
            for i, cfg in enumerate(spatial_cfg)
        ]
        last_out = spatial_cfg[-1].get("out_channels") or spatial_cfg[-1]["in_channels"]
        self.to_rgb = ToRGB(self.latent_w_dim, in_channels=last_out, use_half=use_half[-1])

        self.spatial_input = self.param(
            "spatial_input", nn.initializers.normal(1.0),
            (1, temporal_cfg[0]["in_channels"], 1, heights[0], widths[0]),
        )
        self.temporal_emb = BlurredNoise(self.temporal_emb_dim, **(self.embedding_kwargs or {}))
        self.latent_mapping = LatentMappingNetwork(
            self.temporal_emb_dim, self.latent_w_dim, **(self.mapping_kwargs or {})
        )
        self.temporal_downsample_latent = TemporalKaiserDownsample()
        self.w_to_temp_input = FullyConnectedLayer(self.latent_w_dim, temporal_cfg[0]["in_channels"])

        self._temporal_ups = [cfg.get("temporal_up", False) for cfg in temporal_cfg]
        self._spatial_ups = (
            [cfg.get("spatial_up", False) for cfg in temporal_cfg]
            + [cfg.get("spatial_up", False) for cfg in spatial_cfg]
        )

    @property
    def noise_kernel_size(self) -> int:
        """BlurredNoise kernel size, derivable from config (usable outside apply)."""
        kw = self.embedding_kwargs or {}
        return int(np.ceil(kw.get("max_sampling_rate", 10000.0) / 2))

    @property
    def noise_channels(self) -> int:
        kw = self.embedding_kwargs or {}
        return self.temporal_emb_dim // int(kw.get("blur_widths", 128))

    @property
    def total_temporal_scale(self) -> int:
        return 2 ** sum(cfg.get("temporal_up", False) for cfg in self._plan()[2])

    @property
    def total_spatial_scale(self) -> int:
        _, _, t_cfg, s_cfg = self._plan()
        return 2 ** sum(cfg.get("spatial_up", False) for cfg in t_cfg + s_cfg)

    def compute_seq_lengths(self, seq_length: int) -> tuple[int, list[int]]:
        """Per-temporal-layer output lengths incl. the 2*temporal_padding halo
        (reference: generator_lres.py:818-830)."""
        t_cfg = self._plan()[2]
        seq_lengths = [seq_length]
        scale = 1
        for cfg in reversed(t_cfg):
            if cfg.get("temporal_up", False):
                scale *= 2
            seq_lengths.append(math.ceil(seq_length / scale) + 2 * self.temporal_padding)
        input_seq_length = seq_lengths.pop()
        seq_lengths.reverse()
        return input_seq_length, seq_lengths

    # ---- forward paths ----

    def sample_temporal_emb(self, batch_size: int, seq_length: int,
                            noise: Optional[jax.Array] = None) -> jax.Array:
        input_len = self.compute_seq_lengths(seq_length)[0]
        emb_len = input_len * self.total_temporal_scale
        return self.temporal_emb(batch_size, emb_len, noise=noise)

    def compute_latent_ws(self, temporal_emb: jax.Array, seq_length: int) -> list[jax.Array]:
        assert_shape(temporal_emb, (None, self.temporal_emb_dim, None))
        latent_w = self.latent_mapping(temporal_emb)
        input_seq_length, seq_lengths = self.compute_seq_lengths(seq_length)

        # ws for the spatial layers + ToRGB (full temporal rate, seq_length).
        num_spatial = len(self.spatial_layers) + 1
        w_layer = center_crop(latent_w, seq_length=seq_lengths.pop())
        latent_ws = [w_layer for _ in range(num_spatial)]

        # ws for the temporal layers, progressively Kaiser-downsampled.
        seq_lengths.reverse()
        seq_lengths.append(input_seq_length)
        for temporal_up, layer_len in zip(reversed(self._temporal_ups), seq_lengths):
            if temporal_up:
                latent_w = self.temporal_downsample_latent(latent_w)
            latent_ws.insert(0, center_crop(latent_w, seq_length=layer_len))
        latent_ws.insert(0, latent_ws[0])
        return latent_ws

    def synthesize_video(self, temporal_input: jax.Array, latent_ws: Sequence[jax.Array],
                         seq_length: int, magnitude_ema_beta: float = 1.0,
                         dtype: Optional[Any] = None, return_features: bool = False):
        in_len, seq_lengths = self.compute_seq_lengths(seq_length)
        assert_shape(temporal_input, (None, self.temporal_layers[0].in_channels, in_len))

        x = (temporal_input[:, :, :, None, None] + self.spatial_input) * math.sqrt(0.5)
        feats = []
        w_index = 0
        # All-positional calls: under block_remat the static args must be
        # positional for jax.checkpoint's static_argnums.
        for layer, layer_len in zip(self.temporal_layers, seq_lengths):
            x = layer(x, latent_ws[w_index], magnitude_ema_beta, layer_len, dtype)
            if return_features:
                feats.append(x)
            w_index += 1
        for layer in self.spatial_layers:
            x = layer(x, latent_ws[w_index], magnitude_ema_beta, None, dtype)
            if return_features:
                feats.append(x)
            w_index += 1
        video = self.to_rgb(x, latent_ws[w_index], magnitude_ema_beta, dtype=dtype)
        video = video.astype(jnp.float32) * self.output_scale
        if return_features:
            feats.append(video)
            return feats
        return video

    def __call__(self, batch_size: int, seq_length: int, magnitude_ema_beta: float = 1.0,
                 noise: Optional[jax.Array] = None, dtype: Optional[Any] = None) -> jax.Array:
        """Generate [batch, 3, seq_length, out_height, out_width] videos.

        RNG comes from the flax "noise" rng stream unless `noise` is injected.
        """
        temporal_emb = self.sample_temporal_emb(batch_size, seq_length, noise=noise)
        latent_ws = self.compute_latent_ws(temporal_emb, seq_length)
        in_len = self.compute_seq_lengths(seq_length)[0]

        w0 = latent_ws.pop(0)                                        # [N, w, T_in]
        n = w0.shape[0]
        temporal_input = self.w_to_temp_input(
            w0.transpose(0, 2, 1).reshape(n * in_len, self.latent_w_dim)
        ).reshape(n, in_len, -1).transpose(0, 2, 1)

        return self.synthesize_video(temporal_input, latent_ws, seq_length,
                                     magnitude_ema_beta, dtype)


def sample_video_segments(apply_fn, variables, batch_size: int, seq_length: int,
                          segment_length: int = 8, noise=None, rng=None):
    """Stream a long lres video in segments.

    Mirrors the reference's mechanism (model/generator_lres.py:778-816): the
    lres stage is cheap enough at 36x64 to synthesize the whole video through
    all layers in one jitted call; only the *output* splits into segments for
    downstream streaming (the sres stage is the one that genuinely windows its
    input — generator_sres.sample_video_segments).
    """
    if noise is None:
        assert rng is not None, "need noise or rng"
        video = apply_fn(variables, batch_size, seq_length, rng)
    else:
        video = apply_fn(variables, batch_size, seq_length, noise=noise)
    for start in range(0, video.shape[2], segment_length):
        yield video[:, :, start:start + segment_length]
