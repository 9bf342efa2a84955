"""Pallas TPU kernel: fully-fused filtered_lrelu (separable filters).

Motivation (profiled on v5e, 144x256 sres synthesis): the composed
upfirdn->lrelu->upfirdn chain materializes the 2x-supersampled intermediate in
HBM between four dot/conv ops, and the pointwise lrelu+clamp stage alone costs
as much as a conv at the big layers. This kernel computes, per output tile,
entirely in VMEM:

    x tile --(dense W-up matmul)--> --(banded H-up matmul)-->
    bias+lrelu+gain+clamp --(banded H-down matmul)--> --(dense W-down matmul)
    --> out tile

so the supersampled intermediate never leaves VMEM and the activation fuses
for free. The banded H matrices are tile-invariant (the band is
shift-periodic when the output tile height is aligned to the resampling
factors), so they load once; W matrices are the same dense banded operators
the `impl="matrix"` backend uses (MXU-friendly contraction over the full
width).

Semantics contract == ops.filtered_lrelu (reference torch op semantics at
torch_utils/ops/filtered_lrelu.py:56-116); validated against the composed op
in tests. Forward-only: the training path keeps the composed implementation
(autodiff'd by JAX).

Status (v1): numerically superior — matches the f32 CPU oracle to 2e-7 where
the composed TPU path drifts ~2e-2 from default-precision convs — but the
per-sample unrolled 2-D matmuls underutilize the MXU (Mosaic requires plain
2-D dots and 128-aligned lane merges, which the arbitrary layer widths don't
offer). Throughput work queued: lane-aligned [H, W, B] layout with banded-H
matmuls + polyphase shifted-add W filtering on sublanes. Until then the
composed `impl="matrix"` path remains the default; select this kernel with
`filtered_lrelu(..., impl="pallas")` when exactness matters.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..upfirdn2d import parse_padding


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def _prep_taps(f, gain_per_axis: float) -> np.ndarray:
    """Flip (convolution) and scale the 1-D taps."""
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim == 1
    return f[::-1] * gain_per_axis


def _w_matrix(in_size, up, down, pad0, pad1, taps) -> np.ndarray:
    """Dense [out, in] operator: zero-stuff(up) -> pad -> FIR(taps, already
    flipped+scaled) -> decimate(down)."""
    lw = taps.shape[0]
    up_size = in_size * up + pad0 + pad1
    out_size = (up_size - lw) // down + 1
    r = np.zeros([out_size, in_size], dtype=np.float32)
    rows = np.arange(out_size)[:, None]
    k = np.arange(lw)[None, :]
    s = rows * down + k - pad0
    xi, rem = np.divmod(s, up)
    valid = (rem == 0) & (xi >= 0) & (xi < in_size)
    vals = np.broadcast_to(taps[None, :], s.shape)
    np.add.at(r, (np.broadcast_to(rows, s.shape)[valid], xi[valid]), vals[valid])
    return r


def _h_band_matrices(ob: int, up: int, down: int, py0: int, lu: int, ld: int,
                     fu: np.ndarray, fd: np.ndarray):
    """Tile-invariant banded blocks for the H axis.

    For output-row tile t (rows [t*OB, t*OB+OB)):
      z rows needed:  hu0 = down*OB*t, count HUB = down*(OB-1) + ld
      x rows needed (in the top-padded input): xi0 = (down*OB/up)*t, count HIB

    A_up[r, c] encodes U(hu0+r) = sum_k fu[k] * X(hu0+r+k-py0 zero-stuffed),
    with c the padded-x row index relative to xi0; tile-invariant because
    down*OB is a multiple of up.
    """
    assert (down * ob) % up == 0
    hub = down * (ob - 1) + ld
    pad_top = _cdiv(py0, up)
    # padded-x relative column for (r, k): c = (r + k - py0)//up + pad_top
    hib = (hub - 1 + lu - 1 - py0) // up + pad_top + 1
    a_up = np.zeros([hub, hib], dtype=np.float32)
    for r in range(hub):
        for k in range(lu):
            s = r + k - py0
            if s % up == 0:
                c = s // up + pad_top
                if 0 <= c < hib:
                    a_up[r, c] += fu[k]
    a_dn = np.zeros([ob, hub], dtype=np.float32)
    for o in range(ob):
        for k in range(ld):
            a_dn[o, o * down + k] += fd[k]
    return a_up, a_dn, pad_top, hib


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "gain", "slope", "clamp",
                     "fu_taps", "fd_taps", "ob", "bb"),
)
def _filtered_lrelu_pallas(
    x: jax.Array,            # [B, H, W] (batch*channels flattened; bias pre-added)
    up: int, down: int, padding: tuple, gain: float, slope: float,
    clamp: Optional[float], fu_taps: tuple, fd_taps: tuple,
    ob: int = 16, bb: int = 16,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    px0, px1, py0, py1 = padding
    fu = _prep_taps(np.asarray(fu_taps), float(up))
    fd = _prep_taps(np.asarray(fd_taps), 1.0)
    lu, ld = fu.shape[0], fd.shape[0]
    b, h, w = x.shape

    hu = h * up + py0 + py1 - lu + 1
    ho = (hu - ld) // down + 1
    wu = w * up + px0 + px1 - lu + 1
    wo = (wu - ld) // down + 1

    # Static operators.
    rw_up = _w_matrix(w, up, 1, px0, px1, fu)           # [wu, w]
    rw_dn = _w_matrix(wu, 1, down, 0, 0, fd)            # [wo, wu]
    a_up, a_dn, pad_top, hib = _h_band_matrices(ob, up, down, py0, lu, ld, fu, fd)
    hub = a_up.shape[0]

    # Top/bottom pre-padding so every tile's x window is in range, then gather
    # the (overlapping) per-tile row windows up front: BlockSpec indexing is
    # block-aligned, so overlapping windows enter the kernel as their own axis.
    # Extra HBM read traffic is ~hib/row_stride (~2.6x) of the *small* input —
    # negligible next to the removed supersampled-intermediate round trips.
    num_h_tiles = _cdiv(ho, ob)
    row_stride = (down * ob) // up
    max_row = (num_h_tiles - 1) * row_stride + hib
    pad_bot = max(0, max_row - (h + pad_top))
    xp = jnp.pad(x, [(0, 0), (pad_top, pad_bot), (0, 0)])
    rows = (np.arange(num_h_tiles)[:, None] * row_stride + np.arange(hib)[None, :])
    xw = jnp.take(xp, jnp.asarray(rows.reshape(-1)), axis=1)
    xw = xw.reshape(b, num_h_tiles, hib, w)

    out_dtype = x.dtype
    num_b_tiles = _cdiv(b, bb)
    if b % bb != 0:
        xw = jnp.pad(xw, [(0, num_b_tiles * bb - b), (0, 0), (0, 0), (0, 0)])
    # Kernel tile layout [hib, bb, w]: every matmul below is a plain 2-D dot
    # with only adjacent-axis merges in between (Mosaic-friendly).
    xw = xw.transpose(1, 2, 0, 3)                        # [T, hib, B, w]

    a_up_j = jnp.asarray(a_up)
    a_dn_j = jnp.asarray(a_dn)
    rw_up_t = jnp.asarray(rw_up.T)                      # [w, wu]
    rw_dn_t = jnp.asarray(rw_dn.T)                      # [wu, wo]

    neg_slope = float(slope)
    act_gain = float(gain)
    act_clamp = float(clamp) if clamp is not None else None

    def kernel(x_ref, a_up_ref, a_dn_ref, rwu_ref, rwd_ref, o_ref):
        a_up = a_up_ref[...]
        a_dn = a_dn_ref[...]
        rwu = rwu_ref[...]
        rwd = rwd_ref[...]
        # Per-sample 2-D matmul chain, unrolled over the bb batch lane: Mosaic
        # supports only plain 2-D dots, and lane-axis merges need 128-aligned
        # widths which the arbitrary layer sizes don't have.
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        for bi in range(bb):
            xt = x_ref[0, :, bi, :].astype(jnp.float32)          # [hib, w]
            t1 = dot(a_up, xt)                                   # [hub, w]
            t2 = dot(t1, rwu)                                    # [hub, wu]
            z = jnp.where(t2 >= 0, t2, t2 * neg_slope) * act_gain
            if act_clamp is not None:
                z = jnp.clip(z, -act_clamp, act_clamp)
            t3 = dot(z, rwd)                                     # [hub, wo]
            t4 = dot(a_dn, t3)                                   # [ob, wo]
            o_ref[:, bi, :] = t4.astype(out_dtype)

    grid = (num_h_tiles, num_b_tiles)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hib, bb, w), lambda j, i: (j, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hub, hib), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ob, hub), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wu), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wu, wo), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ob, bb, wo), lambda j, i: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (num_h_tiles * ob, num_b_tiles * bb, wo), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_b_tiles * bb * num_h_tiles
            * (hub * hib * w + hub * w * wu + hub * wu * wo + ob * hub * wo),
            bytes_accessed=xw.size * 4 + b * ho * wo * 4,
            transcendentals=0,
        ),
    )(xw, a_up_j, a_dn_j, rw_up_t, rw_dn_t)
    # [Ho_pad, B_pad, wo] -> [B, Ho, wo]
    return out.transpose(1, 0, 2)[:b, :ho, :wo]


def filtered_lrelu_pallas(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                          gain=math.sqrt(2.0), slope=0.2, clamp=None):
    """Drop-in fused forward for `ops.filtered_lrelu` on NCHW batches.

    Requirements: separable (1-D) or None filters. Forward-only (no grad
    rule); training uses the composed implementation.
    """
    assert x.ndim == 4
    n, c, h, w = x.shape
    px0, px1, py0, py1 = parse_padding(padding)
    fu_arr = np.ones(1, np.float32) if fu is None else np.asarray(fu, np.float32)
    fd_arr = np.ones(1, np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu_arr.ndim == 1 and fd_arr.ndim == 1, "pallas path needs separable filters"

    if b is not None:
        x = x + b.reshape(1, -1, 1, 1).astype(x.dtype)

    flat = x.reshape(n * c, h, w)
    out = _filtered_lrelu_pallas(
        flat, up=int(up), down=int(down), padding=(px0, px1, py0, py1),
        gain=float(gain), slope=float(slope),
        clamp=None if clamp is None else float(clamp),
        fu_taps=tuple(float(v) for v in fu_arr),
        fd_taps=tuple(float(v) for v in fd_arr))
    return out.reshape(n, c, out.shape[1], out.shape[2])
