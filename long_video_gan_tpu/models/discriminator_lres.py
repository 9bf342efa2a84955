"""Stage-1 low-resolution video discriminator.

TPU-native reimplementation of the reference's 3D-conv discriminator
(model/discriminator_lres.py): pads 36x64 videos to square 64x64, runs 4
residual Conv3d blocks with binomial-filtered spatial/temporal downsampling,
then a temporal Conv1d epilogue that flattens space and scores one logit per
clip. All convs are dense NCDHW convolutions on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.filters import binomial_filter
from ..ops.upfirdn2d import downsample2d
from ..utils.misc import assert_shape
from .common import FullyConnectedLayer, TemporalLinearDownsample

# ---------------------------------------------------------------------------


class Conv1dLayer(nn.Module):
    """Equalized-lr conv1d over the time axis (reference: discriminator_lres.py:74-127)."""

    in_channels: int
    out_channels: Optional[int] = None
    kernel_size: int = 1
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    weight_std_init: float = 1.0
    bias_init: float = 0.0
    downsample: bool = False

    @property
    def out_ch(self) -> int:
        return self.out_channels or self.in_channels

    def setup(self):
        assert self.activation in activation_funcs
        std = self.weight_std_init / self.lr_multiplier
        self.weight = self.param(
            "weight", lambda k: jax.random.normal(k, (self.out_ch, self.in_channels, self.kernel_size)) * std
        )
        if self.use_bias:
            self._bias = self.param(
                "_bias",
                lambda k: jnp.full((self.out_ch,), self.bias_init / self.lr_multiplier,
                                   jnp.float32),
            )
        if self.downsample:
            self._downsample = TemporalLinearDownsample(scale=2)

    def __call__(self, x: jax.Array) -> jax.Array:
        weight_gain = self.lr_multiplier / math.sqrt(self.in_channels * self.kernel_size)
        w = (self.weight * weight_gain).astype(x.dtype)
        pad = self.kernel_size // 2
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCH", "OIH", "NCH"))
        y = jax.lax.conv_general_dilated(x, w, window_strides=(1,), padding=((pad, pad),),
                                         dimension_numbers=dn)
        if self.use_bias:
            b = self._bias * self.lr_multiplier if self.lr_multiplier != 1 else self._bias
            y = y + b.astype(y.dtype)[None, :, None]
        if self.downsample:
            y = self._downsample(y)
        return bias_act(y, act=self.activation)


class Conv3dLayer(nn.Module):
    """Equalized-lr conv3d with optional fused binomial downsampling
    (reference: discriminator_lres.py:133-179)."""

    in_channels: int
    out_channels: int
    spatial_ksize: int
    temporal_ksize: int
    use_bias: bool = True
    spatial_down: bool = False
    temporal_down: bool = False
    activation: str = "linear"
    conv_clamp: Optional[float] = None

    def setup(self):
        assert self.activation in activation_funcs
        shape = (self.out_channels, self.in_channels, self.temporal_ksize,
                 self.spatial_ksize, self.spatial_ksize)
        self.weight = self.param("weight", nn.initializers.normal(1.0), shape)
        if self.use_bias:
            self._bias = self.param("_bias", nn.initializers.zeros, (self.out_channels,))
        if self.spatial_down or self.temporal_down:
            self.downsample = Downsample3d(self.spatial_down, self.temporal_down)

    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = self.in_channels * self.temporal_ksize * self.spatial_ksize ** 2
        w = (self.weight * (1.0 / math.sqrt(fan_in))).astype(x.dtype)
        pt, ps = self.temporal_ksize // 2, self.spatial_ksize // 2
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCDHW", "OIDHW", "NCDHW"))
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding=((pt, pt), (ps, ps), (ps, ps)),
            dimension_numbers=dn)
        if self.spatial_down or self.temporal_down:
            y = self.downsample(y)
        b = self._bias.astype(y.dtype) if self.use_bias else None
        return bias_act(y, b, act=self.activation, clamp=self.conv_clamp)


class Downsample3d(nn.Module):
    """Binomial [1,3,3,1] spatial and/or temporal x2 downsampling of NCTHW
    (reference: discriminator_lres.py:185-213)."""

    spatial_down: bool = True
    temporal_down: bool = True

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5
        f = binomial_filter()
        if self.spatial_down:
            n, c, t, h, w = x.shape
            y = downsample2d(x.reshape(n, c * t, h, w), f, down=2)
            x = y.reshape(n, c, t, y.shape[2], y.shape[3])
        if self.temporal_down:
            n, c, t, h, w = x.shape
            y = downsample2d(x.reshape(n, c, t, h * w), f.reshape(-1, 1), down=(1, 2))
            x = y.reshape(n, c, y.shape[2], h, w)
        return x


# ---------------------------------------------------------------------------


class DiscriminatorBlock(nn.Module):
    """Residual 3D block (reference: discriminator_lres.py:262-333)."""

    in_channels: int
    out_channels: int
    vid_channels: int = 0
    spatial_ksize: int = 3
    temporal_ksize: int = 5
    spatial_ksize_1: Optional[int] = None
    temporal_ksize_1: Optional[int] = None
    spatial_down: bool = True
    temporal_down: bool = True
    conv_clamp: Optional[float] = 256.0
    use_fp16: bool = False
    half_dtype: Any = jnp.bfloat16

    def setup(self):
        if self.vid_channels > 0:
            self.conv_vid = Conv3dLayer(self.vid_channels, self.in_channels, 1, 1,
                                        activation="lrelu", conv_clamp=self.conv_clamp)
        self.conv_0 = Conv3dLayer(self.in_channels, self.in_channels,
                                  self.spatial_ksize, self.temporal_ksize,
                                  activation="lrelu", conv_clamp=self.conv_clamp)
        self.conv_1 = Conv3dLayer(self.in_channels, self.out_channels,
                                  self.spatial_ksize_1 or self.spatial_ksize,
                                  self.temporal_ksize_1 or self.temporal_ksize,
                                  spatial_down=self.spatial_down, temporal_down=self.temporal_down,
                                  activation="lrelu", conv_clamp=self.conv_clamp)
        self.conv_skip = Conv3dLayer(self.in_channels, self.out_channels, 1, 1, use_bias=False,
                                     spatial_down=self.spatial_down, temporal_down=self.temporal_down,
                                     conv_clamp=self.conv_clamp)

    def __call__(self, x: jax.Array) -> jax.Array:
        assert x.ndim == 5
        x = x.astype(self.half_dtype if self.use_fp16 else jnp.float32)
        if self.vid_channels > 0:
            x = self.conv_vid(x)
        hidden = self.conv_0(x)
        skip = self.conv_skip(x)
        hidden = self.conv_1(hidden)
        return (hidden + skip) * math.sqrt(0.5)


class DiscriminatorEpilogue(nn.Module):
    """Space-flattening temporal epilogue: 4 conv1d over time + 2 FC -> logit
    (reference: discriminator_lres.py:339-412)."""

    in_res: int = 4
    in_seq_length: int = 16
    in_channels: int = 512
    channels: int = 1024
    temporal_ksize: int = 3
    num_conv1d_layers: int = 4
    num_linear_layers: int = 2
    conv_clamp: Optional[float] = 256.0
    num_downsamples: int = 0

    def setup(self):
        assert self.num_downsamples <= self.num_conv1d_layers
        assert self.in_seq_length % (2 ** self.num_downsamples) == 0
        conv1ds = []
        for index in range(self.num_conv1d_layers):
            if index == 0:
                in_ch, ksize = (self.in_res ** 2) * self.in_channels, 1
            else:
                in_ch, ksize = self.channels, self.temporal_ksize
            conv1ds.append(Conv1dLayer(in_ch, self.channels, kernel_size=ksize,
                                       activation="lrelu",
                                       downsample=index < self.num_downsamples,
                                       name=f"conv1d_{index}"))
        self.conv1d_layers = conv1ds

        linears = []
        for index in range(self.num_linear_layers):
            in_ch = (self.in_seq_length * self.channels // (2 ** self.num_downsamples)
                     if index == 0 else self.channels)
            last = index == self.num_linear_layers - 1
            linears.append(FullyConnectedLayer(in_ch, 1 if last else self.channels,
                                               activation="linear" if last else "lrelu",
                                               name=f"linear_{index}"))
        self.linear_layers = linears

    def __call__(self, x: jax.Array) -> jax.Array:
        assert_shape(x, (None, self.in_channels, self.in_seq_length, self.in_res, self.in_res))
        n, c, t, h, w = x.shape
        feats = x.astype(jnp.float32)
        # n c t h w -> n (c h w) t
        feats = feats.transpose(0, 1, 3, 4, 2).reshape(n, c * h * w, t)
        for layer in self.conv1d_layers:
            feats = layer(feats)
        feats = feats.reshape(n, -1)              # n (c t)
        for layer in self.linear_layers:
            feats = layer(feats)
        return feats


# ---------------------------------------------------------------------------


class VideoDiscriminator(nn.Module):
    """Stage-1 video discriminator (reference: discriminator_lres.py:418-476).

    `channels_max=512` is reference-exact; lower values scale the hard-coded
    32->512 channel ladder for tests.
    """

    seq_length: int
    max_edge: int
    channels: int = 3
    channels_base: int = 2048          # kept for config parity (unused upstream too)
    channels_max: int = 512
    spatial_ksize: int = 3
    temporal_ksize: int = 5
    spatial_ksize_1: Optional[int] = None
    temporal_ksize_1: Optional[int] = None
    conv_clamp: Optional[float] = 256.0
    num_fp16_res: int = 0
    epilogue_kwargs: dict = None

    def _block_cfgs(self):
        ch = lambda c: min(c, self.channels_max)  # noqa: E731
        kwargs = dict(spatial_ksize=self.spatial_ksize, temporal_ksize=self.temporal_ksize,
                      spatial_ksize_1=self.spatial_ksize_1, temporal_ksize_1=self.temporal_ksize_1,
                      conv_clamp=self.conv_clamp)
        return [
            dict(in_channels=ch(32), out_channels=ch(64), vid_channels=self.channels,
                 spatial_ksize=self.spatial_ksize, temporal_ksize=1, temporal_down=False,
                 spatial_down=self.max_edge > 32, use_fp16=self.num_fp16_res > 0,
                 conv_clamp=self.conv_clamp),
            dict(in_channels=ch(64), out_channels=ch(128), use_fp16=self.num_fp16_res > 1,
                 temporal_down=self.seq_length >= 4, **kwargs),
            dict(in_channels=ch(128), out_channels=ch(256), use_fp16=self.num_fp16_res > 2,
                 temporal_down=self.seq_length >= 8, **kwargs),
            dict(in_channels=ch(256), out_channels=ch(512), use_fp16=self.num_fp16_res > 3,
                 temporal_down=self.seq_length >= 16, **kwargs),
        ]

    def setup(self):
        cfgs = self._block_cfgs()
        self.blocks = [DiscriminatorBlock(name=f"blocks_{i}", **cfg) for i, cfg in enumerate(cfgs)]

        spatial_scale = 1
        temporal_scale = 1
        for cfg in cfgs:
            spatial_scale *= 2 if cfg.get("spatial_down", True) else 1
            temporal_scale *= 2 if cfg.get("temporal_down", True) else 1
        self.epilogue = DiscriminatorEpilogue(
            in_res=self.max_edge // spatial_scale,
            in_seq_length=self.seq_length // temporal_scale,
            in_channels=cfgs[-1]["out_channels"],
            **(self.epilogue_kwargs or {}),
        )

    def __call__(self, videos: jax.Array) -> jax.Array:
        assert_shape(videos, (None, self.channels, self.seq_length, None, None))
        assert videos.shape[3] == self.max_edge or videos.shape[4] == self.max_edge
        px = (self.max_edge - videos.shape[4]) // 2
        py = (self.max_edge - videos.shape[3]) // 2
        feats = jnp.pad(videos, [(0, 0), (0, 0), (0, 0), (py, py), (px, px)])
        for block in self.blocks:
            feats = block(feats)
        return self.epilogue(feats)
