"""filtered_lrelu — StyleGAN3's fused upsample -> bias -> leaky ReLU -> clamp ->
downsample, for a batch of 2D maps [N, C, H, W].

Semantics contract (matches the reference op documented at
torch_utils/ops/filtered_lrelu.py:56-116):

  1. add channel bias `b`
  2. zero-stuff upsample by `up`, pad by `padding`, convolve with `fu`
     (overall gain up**2 so DC magnitude is preserved)
  3. multiply by `gain`, leaky-ReLU with `slope`, clamp to [-clamp, clamp]
  4. convolve with `fd`, decimate by `down`

  out_w = (in_w*up + px0 + px1 - (fu_w-1) - (fd_w-1) + (down-1)) // down

TPU-native design: the reference needs 1755 LoC of CUDA with a bit-packed sign
tensor so the backward can re-apply lrelu slopes without keeping the up-sampled
activation alive (filtered_lrelu.{cu,cpp}). On TPU we compose the op out of the
conv-based `upfirdn2d` + `bias_act`; under jit XLA fuses the pointwise middle
stage into the two convolutions. Memory behaviour differs from CUDA eager mode:
XLA plans the intermediate up-buffer lifetime itself and `jax.checkpoint`
(rematerialization) around the enclosing synthesis layer gives the same
"don't keep the x4 buffer for backward" effect as the reference's sign tensor,
without a custom VJP — while keeping exact, arbitrary-order autodiff (R1 needs
grad-of-grad through this op; reference handles that at
filtered_lrelu.py:238-263 with a hand-derived adjoint).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import numpy as np

from .bias_act import bias_act as _bias_act_fn
from .upfirdn2d import parse_padding, upfirdn2d as _upfirdn2d_fn

# Tests set this True (with pallas_call monkeypatched to interpret mode) so
# the fused kernel is exercised on the CPU suite.
FORCE_FUSED_ON_CPU = False


@functools.lru_cache(maxsize=1)
def _device_kind() -> str:
    try:
        return jax.devices()[0].device_kind.lower()
    except Exception:
        return "unknown"


def auto_impl_policy(up_factor: int, in_pixels: int,
                     use_fp16: bool = True) -> str:
    """Backend choice for `impl="auto"`, keyed on the DETECTED accelerator.

    Measured END-TO-END on the hardware the thresholds were taken on (isolated
    per-op timings mislead here: in the full graph the fused kernel's
    VMEM-resident intermediates overlap with neighbouring ops, so it wins
    whole-model even on layers where it loses in isolation — bench.py r3:
    fused 154.0 f/s vs mixed-by-per-op-table 145.2 vs matrix 119.9). Unknown
    hardware (other TPU generations, CPU, GPU) falls back to the composed
    `matrix` path, which is always correct and never pathological, rather
    than silently applying another chip's crossover points.
    """
    del up_factor, in_pixels  # per-shape crossovers refuted by end-to-end data
    kind = _device_kind()
    if "v5 lite" in kind or "v5e" in kind:
        # v5e: the lane-packed fused Pallas kernel for every bf16 layer
        # (in-kernel packing, ~181 TF/s on its executed FLOPs at the hot
        # layers — bench.py r3: packed 175 f/s vs fused-v3 158.9 vs matrix
        # 119.9); the composed einsum path only for the f32 head layers,
        # where the Pallas kernels' f32 MXU matmuls measured ~5x slower
        # per-op and the maps are tiny (BASELINE.md round-3 budget).
        return "packed" if use_fp16 else "matrix"
    return "matrix"


def filtered_lrelu(
    x: jax.Array,
    fu=None,
    fd=None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = math.sqrt(2.0),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
    impl: str = "conv",
) -> jax.Array:
    assert x.ndim == 4, f"expected NCHW input, got {x.shape}"
    if impl == "pallas":
        from .pallas.filtered_lrelu_kernel import filtered_lrelu_pallas

        return filtered_lrelu_pallas(x, fu, fd, b, up=up, down=down, padding=padding,
                                     gain=gain, slope=slope, clamp=clamp)
    if impl in ("fused", "packed"):
        # Whole-image 4-matmul Pallas kernels with custom VJP — the production
        # TPU paths ("fused": one image per lane row, ops/pallas/
        # filtered_lrelu_fused.py; "packed": k images packed along lanes with
        # block-diagonal W operators, ops/pallas/filtered_lrelu_packed.py).
        # Identity resamples (ToRGB: up == down == 1, trivial filters) stay on
        # the composed path, as do non-TPU backends (Mosaic kernels only
        # compile for TPU; the CPU test suite exercises the kernels in
        # interpret mode explicitly).
        import jax

        fu_w, fu_h = _filter_size(fu)
        fd_w, fd_h = _filter_size(fd)
        trivial = up == 1 and down == 1 and fu_w * fu_h == 1 and fd_w * fd_h == 1
        kernel_ok = jax.default_backend() != "cpu" or FORCE_FUSED_ON_CPU
        if not (trivial or flip_filter) and kernel_ok:
            if impl == "packed":
                from .pallas.filtered_lrelu_packed import filtered_lrelu_packed

                return filtered_lrelu_packed(x, fu, fd, b, up=up, down=down,
                                             padding=padding, gain=gain,
                                             slope=slope, clamp=clamp)
            from .pallas.filtered_lrelu_fused import filtered_lrelu_fused

            return filtered_lrelu_fused(x, fu, fd, b, up=up, down=down,
                                        padding=padding, gain=gain, slope=slope,
                                        clamp=clamp)
        impl = "matrix"
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    assert gain > 0 and slope >= 0
    assert clamp is None or clamp >= 0
    px0, px1, py0, py1 = parse_padding(padding)

    fu_w, fu_h = _filter_size(fu)
    fd_w, fd_h = _filter_size(fd)
    in_h, in_w = x.shape[2], x.shape[3]
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    x = _bias_act_fn(x, b)
    x = _upfirdn2d_fn(
        x, fu, up=up, padding=[px0, px1, py0, py1], gain=up**2, flip_filter=flip_filter, impl=impl
    )
    x = _bias_act_fn(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = _upfirdn2d_fn(x, fd, down=down, flip_filter=flip_filter, impl=impl)

    assert x.shape[2] == out_h and x.shape[3] == out_w, (
        f"filtered_lrelu shape mismatch: got {x.shape[2:]}, expected {(out_h, out_w)}"
    )
    return x


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    f = np.asarray(f)
    assert 1 <= f.ndim <= 2
    return int(f.shape[-1]), int(f.shape[0])
