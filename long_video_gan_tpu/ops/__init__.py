"""TPU-native op layer: resampling / activation primitives.

Replaces the reference's torch_utils/ops CUDA extension family (upfirdn2d,
bias_act, filtered_lrelu) with XLA-fused and MXU-matrix formulations. There is
deliberately no JIT plugin compiler (torch_utils/custom_ops.py) — XLA is the
JIT — but each op keeps an `impl=` switch for backend selection, mirroring the
reference's ref/cuda switch.
"""

from .bias_act import activation_funcs, bias_act
from .conv2d_resample import conv2d_resample
from .filtered_lrelu import filtered_lrelu
from .filters import (
    binomial_filter,
    design_kaiser_lowpass,
    design_lowpass_filter,
    filter_size,
    kaiser_resample_filter,
    setup_filter,
    tent_filter,
    wavelet_lowpass,
)
from .grid_sample import affine_grid, grid_sample
from .upfirdn2d import downsample2d, filter2d, upfirdn2d, upsample2d

__all__ = [
    "activation_funcs", "bias_act", "conv2d_resample", "filtered_lrelu",
    "binomial_filter", "design_kaiser_lowpass", "design_lowpass_filter",
    "filter_size", "kaiser_resample_filter", "setup_filter", "tent_filter",
    "wavelet_lowpass", "affine_grid", "grid_sample",
    "downsample2d", "filter2d", "upfirdn2d", "upsample2d",
]
