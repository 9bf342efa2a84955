"""Stage-2 super-resolution discriminator.

TPU-native reimplementation of the reference's StyleGAN2-style 2D
discriminator (model/discriminator_sres.py): the bilinearly upsampled lr video
and the hr video are concatenated and time folds into channels
(img_channels = 2 * 3 * seq_length), then resnet blocks walk resolutions
256 -> 4 and an epilogue scores one logit per clip.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import activation_funcs, bias_act
from ..ops.conv2d_resample import conv2d_resample
from ..ops.filters import setup_filter
from ..ops.upfirdn2d import downsample2d
from .common import FullyConnectedLayer, SpatialBilinearUpsample

# ---------------------------------------------------------------------------


class Conv2dLayer(nn.Module):
    """Equalized-lr conv2d with fused FIR up/downsampling
    (reference: discriminator_sres.py:140-206)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None

    def setup(self):
        assert self.activation in activation_funcs
        self._filter = setup_filter(list(self.resample_filter))
        self.weight = self.param("weight", nn.initializers.normal(1.0),
                                 (self.out_channels, self.in_channels,
                                  self.kernel_size, self.kernel_size))
        if self.use_bias:
            self.bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

    def __call__(self, x: jax.Array, gain: float = 1.0) -> jax.Array:
        weight_gain = 1.0 / math.sqrt(self.in_channels * self.kernel_size ** 2)
        w = (self.weight * weight_gain).astype(x.dtype)
        x = conv2d_resample(x, w, f=self._filter, up=self.up, down=self.down,
                            padding=self.kernel_size // 2, flip_weight=self.up == 1)
        act_gain = activation_funcs[self.activation].def_gain * gain
        act_clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        b = self.bias.astype(x.dtype) if self.use_bias else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=act_clamp)


# ---------------------------------------------------------------------------


class DiscriminatorBlock(nn.Module):
    """Resnet block walking one resolution (reference: discriminator_sres.py:212-349).

    Supports the reference's 'orig', 'resnet' (used by the release config) and
    'resnet2' (filter-downsample skip with channel doubling) architectures.
    """

    in_channels: int          # 0 = first block (fromrgb)
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: tuple = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False
    half_dtype: Any = jnp.bfloat16

    def setup(self):
        assert self.architecture in ("orig", "skip", "resnet", "resnet2")
        self._filter = setup_filter(list(self.resample_filter))
        if self.in_channels == 0 or self.architecture == "skip":
            self.fromrgb = Conv2dLayer(self.img_channels, self.tmp_channels, kernel_size=1,
                                       activation=self.activation, conv_clamp=self.conv_clamp)
        self.conv0 = Conv2dLayer(self.tmp_channels, self.tmp_channels, kernel_size=3,
                                 activation=self.activation, conv_clamp=self.conv_clamp)
        self.conv1 = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=3,
                                 activation=self.activation, down=2,
                                 resample_filter=self.resample_filter, conv_clamp=self.conv_clamp)
        if self.architecture == "resnet":
            self.skip = Conv2dLayer(self.tmp_channels, self.out_channels, kernel_size=1,
                                    use_bias=False, down=2, resample_filter=self.resample_filter)

    def __call__(self, x: Optional[jax.Array], img: Optional[jax.Array],
                 force_fp32: bool = False):
        dtype = self.half_dtype if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = self.fromrgb(img)
            x = x + y if x is not None else y
            img = downsample2d(img, self._filter) if self.architecture == "skip" else None

        if self.architecture == "resnet":
            y = self.skip(x)
            x = self.conv0(x)
            x = self.conv1(x)
            x = (x + y) * float(np.sqrt(0.5))
        elif self.architecture == "resnet2":
            y = downsample2d(x, self._filter)
            y = jnp.concatenate([y, y], axis=1)[:, : self.out_channels]
            x = self.conv0(x)
            x = self.conv1(x)
            x = (x + y) * float(np.sqrt(0.5))
        else:
            x = self.conv0(x)
            x = self.conv1(x)
        assert x.dtype == dtype
        return x, img


class MinibatchStdLayer(nn.Module):
    """Append per-group feature-stddev channels (reference: discriminator_sres.py:352-376).

    Note: groups form over the *global* batch under pjit, vs the reference's
    per-GPU batch; the release config disables this layer (mbstd_num_channels=0).
    """

    group_size: Optional[int]
    num_channels: int = 1

    def __call__(self, x: jax.Array) -> jax.Array:
        n, c, h, w = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        cc = c // f
        y = x.reshape(g, -1, f, cc, h, w)
        y = y - jnp.mean(y, axis=0)
        y = jnp.mean(jnp.square(y), axis=0)
        y = jnp.sqrt(y + 1e-8)
        y = jnp.mean(y, axis=(2, 3, 4))
        y = y.reshape(-1, f, 1, 1)
        y = jnp.tile(y, (g, 1, h, w))
        return jnp.concatenate([x, y.astype(x.dtype)], axis=1)


class DiscriminatorEpilogue(nn.Module):
    """Final conv + FC head (reference: discriminator_sres.py:379-447)."""

    in_channels: int
    height: int
    width: int
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None
    output_dim: int = 1
    pool_mode: str = "fully_connected"

    def setup(self):
        assert self.pool_mode in ("fully_connected", "average")
        if self.mbstd_num_channels > 0:
            self.mbstd = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels)
        self.conv = Conv2dLayer(self.in_channels + self.mbstd_num_channels, self.in_channels,
                                kernel_size=3, activation=self.activation,
                                conv_clamp=self.conv_clamp)
        self.fc = FullyConnectedLayer(self.in_channels * self.height * self.width,
                                      self.in_channels, activation=self.activation)
        self.out = FullyConnectedLayer(self.in_channels, self.output_dim)

    def __call__(self, x: jax.Array, conditioning: Optional[jax.Array] = None) -> jax.Array:
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = self.mbstd(x)
        x = self.conv(x)
        if self.pool_mode == "fully_connected":
            x = self.fc(x.reshape(x.shape[0], -1))
        else:
            x = jnp.mean(x, axis=(2, 3))
        x = self.out(x)
        if conditioning is not None:
            x = jnp.sum(x * conditioning, axis=1, keepdims=True) / float(np.sqrt(conditioning.shape[1]))
        return x


# ---------------------------------------------------------------------------


class VideoDiscriminator(nn.Module):
    """Stage-2 discriminator on (upsampled-lr, hr) video pairs
    (reference: discriminator_sres.py:450-532)."""

    channels: int = 3
    seq_length: int = 8
    lr_height: int = 32
    lr_width: int = 32
    hr_height: int = 256
    hr_width: int = 256
    channels_base: int = 16384
    channels_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    minibatch_std_group_size: int = 4
    minibatch_std_num_channels: int = 0
    architecture: str = "resnet"
    pool_mode: str = "fully_connected"

    @property
    def resolution(self) -> int:
        return max(self.hr_height, self.hr_width)

    @property
    def block_resolutions(self) -> list[int]:
        res_log2 = int(np.log2(self.resolution))
        return [2 ** i for i in range(res_log2, 2, -1)]

    def setup(self):
        resolution = self.resolution
        res_log2 = int(np.log2(resolution))
        channels_dict = {res: min(self.channels_base // res, self.channels_max)
                         for res in self.block_resolutions + [4]}
        fp16_resolution = max(2 ** (res_log2 + 1 - self.num_fp16_res), 8)
        img_channels = 2 * self.channels * self.seq_length

        blocks = {}
        for res in self.block_resolutions:
            blocks[f"b{res}"] = DiscriminatorBlock(
                in_channels=channels_dict[res] if res < resolution else 0,
                tmp_channels=channels_dict[res],
                out_channels=channels_dict[res // 2],
                resolution=res, img_channels=img_channels,
                use_fp16=res >= fp16_resolution, conv_clamp=self.conv_clamp,
                architecture=self.architecture, name=f"b{res}")
        self._blocks = [blocks[f"b{res}"] for res in self.block_resolutions]

        self.b4 = DiscriminatorEpilogue(
            channels_dict[4], height=4, width=4,
            mbstd_group_size=self.minibatch_std_group_size,
            mbstd_num_channels=self.minibatch_std_num_channels,
            output_dim=1, conv_clamp=self.conv_clamp, pool_mode=self.pool_mode)

        self.upsample = SpatialBilinearUpsample(resolution // max(self.lr_height, self.lr_width))

    def upsample_lr(self, lr_video: jax.Array) -> jax.Array:
        """Bilinear-upsample the lr conditioning video to hr resolution.

        Exposed for the trainer's run_D, which concatenates lr+hr on the time
        axis before ADA so both get identical transforms
        (model/video_gan_sres.py:315-325)."""
        return self.upsample(lr_video)

    def __call__(self, lr_video: jax.Array, hr_video: jax.Array) -> jax.Array:
        if lr_video.shape[3] == self.lr_height and lr_video.shape[4] == self.lr_width:
            lr_video = self.upsample(lr_video)
        else:
            assert lr_video.shape[3] == self.hr_height and lr_video.shape[4] == self.hr_width

        videos = jnp.concatenate([lr_video, hr_video], axis=1)
        p = (videos.shape[4] - videos.shape[3]) // 2
        videos = jnp.pad(videos, [(0, 0), (0, 0), (0, 0), (p, p), (0, 0)])
        n, c, t, h, w = videos.shape
        videos = videos.reshape(n, c * t, h, w)

        feats = None
        for block in self._blocks:
            feats, videos = block(feats, videos)
        return self.b4(feats)
