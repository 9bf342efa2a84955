"""2D convolution with optional FIR up/downsampling (NCHW).

Reference contract: torch_utils/ops/conv2d_resample.py:46-141 — padding is
interpreted w.r.t. the upsampled image and applied once up front. The
reference's five CUDA fast paths exist to pick good cuDNN kernels; on TPU we
keep only the distinctions that change FLOPs (strided conv for downsampling,
upsample-then-conv for upsampling) and let XLA schedule the rest.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .upfirdn2d import parse_padding, upfirdn2d as _upfirdn2d_fn


def _conv2d(x, w, stride=1, padding=(0, 0, 0, 0), groups=1, flip_weight=True):
    """Plain 2D conv. flip_weight=True == correlation (torch conv2d semantics)."""
    if not flip_weight and (w.shape[2] > 1 or w.shape[3] > 1):
        w = jnp.flip(w, axis=(2, 3))
    px0, px1, py0, py1 = padding
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=((py0, py1), (px0, px1)), dimension_numbers=dn,
        feature_group_count=groups,
    )


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False, impl="conv"):
    """Conv2d fused with FIR up/downsampling.

    Args:
      x: [N, inC, H, W]; w: [outC, inC // groups, kh, kw]; f: FIR filter
      prepared by `filters.setup_filter` (None = identity); `up`/`down` integer
      factors; `padding` relative to the upsampled image (negative = crop).
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    out_channels, in_channels_per_group, kh, kw = w.shape
    fw, fh = _filter_size(f)
    px0, px1, py0, py1 = parse_padding(padding)

    # Account for up/downsampling in the padding (reference :82-91).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # Downsampling only: FIR (with padding) then strided conv.
    if down > 1 and up == 1:
        x = _upfirdn2d_fn(x, f, padding=[px0, px1, py0, py1],
                                 flip_filter=flip_filter, impl=impl)
        return _conv2d(x, w, stride=down, groups=groups, flip_weight=flip_weight)

    # Upsampling (with optional downsampling): zero-stuff + FIR, conv, decimate.
    if up > 1:
        x = _upfirdn2d_fn(x, f, up=up, padding=[px0, px1, py0, py1],
                                 gain=up**2, flip_filter=flip_filter, impl=impl)
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        if down > 1:
            x = _upfirdn2d_fn(x, f, down=down, flip_filter=flip_filter, impl=impl)
        return x

    # Plain conv: padding folds straight into the conv op (supports negative).
    return _conv2d(x, w, padding=(px0, px1, py0, py1), groups=groups, flip_weight=flip_weight)


def _filter_size(f):
    if f is None:
        return 1, 1
    f = np.asarray(f)
    return int(f.shape[-1]), int(f.shape[0])
