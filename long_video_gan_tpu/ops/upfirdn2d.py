"""upfirdn2d — pad, upsample, FIR-filter, downsample a batch of 2D maps.

TPU-native design notes
-----------------------
The reference implements this as a hand-tiled CUDA kernel family
(torch_utils/ops/upfirdn2d.{cu,cpp,h}) plus a slow torch fallback
(torch_utils/ops/upfirdn2d.py:167-211). On TPU there is no need for a custom
kernel for correctness *or* for fusion: the whole pad→zero-stuff→FIR→decimate
pipeline is exactly one `lax.conv_general_dilated` call —

  * zero-insertion upsampling  -> `lhs_dilation=(upy, upx)`
  * padding (incl. negative)   -> conv `padding=((py0, py1'), (px0, px1'))`
  * FIR filtering              -> depthwise conv (`feature_group_count=C`)
  * decimation                 -> `window_strides=(downy, downx)`

so XLA sees a single fusible HLO and schedules it on the VPU/MXU with no
intermediate HBM round-trips. Separable filters run as two 1-D depthwise convs
(fewer FLOPs), matching the reference's separable decomposition
(torch_utils/ops/upfirdn2d.py:243-245).

Gradients (any order) are free: `conv_general_dilated` has exact JAX
transpose/JVP rules, which subsumes the reference's hand-derived adjoint
(swap up/down, flip filter — torch_utils/ops/upfirdn2d.py:250-266).

An additional `impl="matrix"` backend expresses the same linear operator as two
dense banded resampling matrices applied via einsum — this rides the MXU and is
the fast path for small fixed spatial sizes (36x64 .. 288x512) where the
operator matrices fit comfortably in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Argument parsing (same conventions as the reference wrappers).


def parse_scaling(scaling) -> tuple[int, int]:
    if isinstance(scaling, (int, np.integer)):
        scaling = [scaling, scaling]
    sx, sy = (int(s) for s in scaling)
    assert sx >= 1 and sy >= 1
    return sx, sy


def parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, (int, np.integer)):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _as_filter(f) -> np.ndarray:
    if f is None:
        return np.ones([1, 1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)
    return f


# ---------------------------------------------------------------------------
# Core op.


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1.0, impl="conv"):
    """Upsample, FIR filter, and downsample a batch of 2D maps `[N, C, H, W]`.

    Performs, per channel (reference contract, torch_utils/ops/upfirdn2d.py:118-156):
      1. zero-insertion upsample by `up` (int or `[upx, upy]`),
      2. zero-pad by `padding` (int, `[x, y]`, or `[x0, x1, y0, y1]`; negative = crop),
      3. convolve with FIR filter `f` ([fh, fw] full, [taps] separable, None identity),
      4. keep every `down`-th sample.

    `flip_filter=False` means convolution, True means correlation. `gain`
    scales the output magnitude. Returns `[N, C, outH, outW]` with
    outH = (H*upy + pady0 + pady1 - fh) // downy + 1 (likewise for W).
    """
    assert x.ndim == 4, f"expected NCHW input, got shape {x.shape}"
    if impl in ("fused", "packed", "pallas", "auto"):
        # Those selectors exist only for the filtered_lrelu composite; a plain
        # upfirdn2d rides the MXU banded-matrix path.
        impl = "matrix"
    assert impl in ("conv", "matrix")
    f = _as_filter(f)
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)

    in_h, in_w = x.shape[2], x.shape[3]
    up_w = in_w * upx + px0 + px1
    up_h = in_h * upy + py0 + py1
    fw, fh = int(f.shape[-1]), int(f.shape[0])
    assert up_w >= fw and up_h >= fh, (
        f"upsampled buffer {up_h}x{up_w} smaller than filter {fh}x{fw}"
    )

    if impl == "matrix":
        return _upfirdn2d_matrix(
            x, f, (upx, upy), (downx, downy), (px0, px1, py0, py1), flip_filter, float(gain)
        )
    return _upfirdn2d_conv(
        x, f, (upx, upy), (downx, downy), (px0, px1, py0, py1), flip_filter, float(gain)
    )


def _upfirdn2d_conv(x, f, up, down, padding, flip_filter, gain):
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    channels = x.shape[1]
    separable = f.ndim == 1

    # Overall magnitude gain: gain ** (ndim/2) per pass so two separable passes
    # compose to `gain` (reference: upfirdn2d.py:196).
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = f[::-1] if separable else f[::-1, ::-1]
    f = jnp.asarray(np.ascontiguousarray(f), dtype=x.dtype)

    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, 1), ("NCHW", "OIHW", "NCHW"))

    # lhs_dilation zero-stuffs *between* samples: size (H-1)*upy + 1. The
    # reference zero-pads each sample to a full stride (size H*upy), i.e. it has
    # up-1 extra trailing zeros; fold those into the high-side conv padding.
    pad_h = (py0, py1 + upy - 1)
    pad_w = (px0, px1 + upx - 1)

    if separable:
        fw = f.shape[0]
        kx = jnp.tile(f.reshape(1, 1, 1, fw), (channels, 1, 1, 1))
        ky = jnp.tile(f.reshape(1, 1, fw, 1), (channels, 1, 1, 1))
        x = jax.lax.conv_general_dilated(
            x, kx, window_strides=(1, 1), padding=(pad_h, pad_w),
            lhs_dilation=(upy, upx), dimension_numbers=dn, feature_group_count=channels,
        )
        x = jax.lax.conv_general_dilated(
            x, ky, window_strides=(downy, downx), padding=((0, 0), (0, 0)),
            dimension_numbers=dn, feature_group_count=channels,
        )
    else:
        fh, fw = f.shape
        k = jnp.tile(f.reshape(1, 1, fh, fw), (channels, 1, 1, 1))
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(downy, downx), padding=(pad_h, pad_w),
            lhs_dilation=(upy, upx), dimension_numbers=dn, feature_group_count=channels,
        )
    return x


# ---------------------------------------------------------------------------
# MXU path: express the 1-D resampling along each axis as a dense banded
# operator R[out, in] and contract with einsum. Static per (shape, filter)
# tuple, cached host-side. Only valid for separable (or 1x... full) filters.


def _axis_matrix(in_size, up, down, pad0, pad1, f1d, flip_filter, gain):
    """Dense [out, in] operator: zero-stuff(up) -> pad -> FIR -> decimate."""
    f = np.asarray(f1d, dtype=np.float32)
    if flip_filter:
        f = f[::-1]
    fw = f.shape[0]
    up_size = in_size * up + pad0 + pad1
    out_size = (up_size - fw) // down + 1
    rows = np.arange(out_size)[:, None]            # output index
    ktap = np.arange(fw)[None, :]                  # filter tap index
    src = rows * down + ktap - pad0                # index into zero-stuffed signal
    in_idx, rem = np.divmod(src, up)
    valid = (rem == 0) & (in_idx >= 0) & (in_idx < in_size)
    # Convolution => flipped filter tap per position.
    vals = np.broadcast_to(f[::-1][None, :] * gain, src.shape)
    r = np.zeros([out_size, in_size], dtype=np.float32)
    np.add.at(r, (np.broadcast_to(rows, src.shape)[valid], in_idx[valid]), vals[valid])
    return r


@functools.lru_cache(maxsize=256)
def _axis_matrix_cached(in_size, up, down, pad0, pad1, taps_bytes, taps_len, flip_filter, gain):
    f = np.frombuffer(taps_bytes, dtype=np.float32, count=taps_len)
    return _axis_matrix(in_size, up, down, pad0, pad1, f, flip_filter, gain)


def _upfirdn2d_matrix(x, f, up, down, padding, flip_filter, gain):
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    if f.ndim == 2:
        # Only separable filters map onto two banded matrices; outer-product
        # 2-D filters of rank 1 could be factored, but all hot filters in this
        # codebase are separable already. Fall back otherwise.
        return _upfirdn2d_conv(x, f, up, down, padding, flip_filter, gain)
    per_pass_gain = float(gain) ** 0.5
    taps = np.ascontiguousarray(f, dtype=np.float32)
    rh = _axis_matrix_cached(x.shape[2], upy, downy, py0, py1, taps.tobytes(), taps.shape[0],
                             bool(flip_filter), per_pass_gain)
    rw = _axis_matrix_cached(x.shape[3], upx, downx, px0, px1, taps.tobytes(), taps.shape[0],
                             bool(flip_filter), per_pass_gain)
    rh = jnp.asarray(rh, dtype=x.dtype)
    rw = jnp.asarray(rw, dtype=x.dtype)
    # [N,C,H,W] x [H',H] x [W',W] -> [N,C,H',W'] — two MXU matmuls.
    x = jnp.einsum("nchw,yh->ncyw", x, rh)
    x = jnp.einsum("ncyw,xw->ncyx", x, rw)
    return x


# ---------------------------------------------------------------------------
# Convenience wrappers (padding arithmetic identical to the reference,
# torch_utils/ops/upfirdn2d.py:277-387).


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0, impl="conv"):
    """FIR-filter NCHW maps; output is same-size by default."""
    px0, px1, py0, py1 = parse_padding(padding)
    f_arr = _as_filter(f)
    fw, fh = int(f_arr.shape[-1]), int(f_arr.shape[0])
    p = [px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0, impl="conv"):
    """Upsample NCHW maps by `up` with FIR filter `f`."""
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    f_arr = _as_filter(f)
    fw, fh = int(f_arr.shape[-1]), int(f_arr.shape[0])
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy, impl=impl)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0, impl="conv"):
    """Downsample NCHW maps by `down` with FIR filter `f`."""
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    f_arr = _as_filter(f)
    fw, fh = int(f_arr.shape[-1]), int(f_arr.shape[0])
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain, impl=impl)
