"""Pallas TPU kernel v3: whole-image fused filtered_lrelu as 4 MXU matmuls.

The op (reference semantics: torch_utils/ops/filtered_lrelu.py:56-116) is a
separable linear resample -> pointwise -> separable linear resample. For one
image X [H, W] the whole thing is

    out = Ad @ act( Au @ X @ Bu^T ) @ Bd^T

with Au/Bu the banded [out,in] up+FIR operators (zero-stuff, pad, filter) and
Ad/Bd the FIR+decimate operators — the same matrices the composed
impl="matrix" path uses (ops/upfirdn2d._axis_matrix). The kernel runs one
image per grid program with all four matrices resident in VMEM, so the
2x-supersampled buffer act(Au X Bu^T) NEVER touches HBM — the property the
reference buys with 1755 LoC of CUDA (filtered_lrelu.cu:139 keeps it in
registers/smem). HBM traffic is exactly read-X + write-out.

Versus the earlier kernels: v1/v2 decomposed into polyphase VPU stages and
lost to arbitrary-offset sublane relayouts (see filtered_lrelu_v2.py notes).
v3 trades tap-exact FLOPs for dense MXU matmuls — at SG3's sizes
(H,W <= 556, K 128-556) the MXU eats these at near peak, and the matmul
shapes need no relayouts at all: W stays on lanes end to end.

Backward: custom VJP with the adjoint

    dX = Au^T @ ( act'(U) * (Ad^T @ dY @ Bd) ) @ Bu,   U = Au @ X @ Bu^T

run as one more 6-matmul kernel that recomputes U on-chip instead of storing
a sign tensor (the reference stores 2 bits/element instead,
filtered_lrelu.cpp:84-96; recompute is cheaper than the HBM round-trip here).
Second-order autodiff is not defined for this impl — training G needs only
first order (R1 runs on the discriminators, which don't use this op); the
composed path remains for anything higher-order.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..upfirdn2d import _axis_matrix, parse_padding


@functools.lru_cache(maxsize=256)
def _operators(h, w, up, down, padding, fu_taps, fd_taps):
    """The four banded [out,in] operators (f32 numpy), plus output sizes."""
    px0, px1, py0, py1 = padding
    fu = np.asarray(fu_taps, np.float32)
    fd = np.asarray(fd_taps, np.float32)
    # Per-axis gain `up` so the two up passes compose to the contract's up**2.
    au = _axis_matrix(h, up, 1, py0, py1, fu, False, float(up))
    bu = _axis_matrix(w, up, 1, px0, px1, fu, False, float(up))
    hu = au.shape[0]
    wu = bu.shape[0]
    ad = _axis_matrix(hu, 1, down, 0, 0, fd, False, 1.0)
    bd = _axis_matrix(wu, 1, down, 0, 0, fd, False, 1.0)
    return au, bu, ad, bd


def _act_factory(gain, slope, clamp):
    def act(u):
        z = jnp.where(u >= 0, u, u * slope) * gain
        if clamp is not None:
            z = jnp.clip(z, -clamp, clamp)
        return z

    return act


def _act_grad_factory(gain, slope, clamp):
    def act_grad(u):
        g = jnp.where(u >= 0, gain, gain * slope)
        if clamp is not None:
            zg = jnp.where(u >= 0, u, u * slope) * gain
            g = jnp.where((zg > -clamp) & (zg < clamp), g, 0.0)
        return g

    return act_grad


def _mm(a, b):
    # bf16 operands are exact on the MXU; f32 operands must request HIGHEST
    # or Mosaic lowers them as a single bf16 pass (measured on v5e: ~5e-3
    # forward / 4e-2 grad error vs a true-f32 oracle on the f32 layers).
    # The f32 layers are the three smallest in the production plan, so the
    # 3-pass cost is noise.
    precision = (None if a.dtype == jnp.bfloat16
                 else jax.lax.Precision.HIGHEST)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=precision)


def _col_tile_windows(mat: np.ndarray, tile: int = 128, kalign: int = 128):
    """For each `tile`-wide output column block of a banded RHS operator
    [I, O], the kalign-aligned input-row window [i0, i1) that covers its
    nonzeros. Static (trace-time) — the band structure is data-independent."""
    i_dim, o_dim = mat.shape
    wins = []
    for c0 in range(0, o_dim, tile):
        sub = mat[:, c0:c0 + tile]
        nz = np.nonzero(np.any(sub != 0, axis=1))[0]
        if nz.size == 0:
            wins.append((c0, 0, 0))
            continue
        i0 = (int(nz.min()) // kalign) * kalign
        i1 = min(i_dim, (int(nz.max()) // kalign + 1) * kalign)
        wins.append((c0, i0, i1))
    return wins


def _row_tile_windows(mat: np.ndarray, tile: int = 128, kalign: int = 128):
    """Same for a banded LHS operator [O, I]: per output ROW block, the
    aligned input-column window."""
    o_dim, i_dim = mat.shape
    wins = []
    for r0 in range(0, o_dim, tile):
        sub = mat[r0:r0 + tile, :]
        nz = np.nonzero(np.any(sub != 0, axis=0))[0]
        if nz.size == 0:
            wins.append((r0, 0, 0))
            continue
        i0 = (int(nz.min()) // kalign) * kalign
        i1 = min(i_dim, (int(nz.max()) // kalign + 1) * kalign)
        wins.append((r0, i0, i1))
    return wins


def _banded_rhs_mm(t, mat_ref, mat_np, out_cols):
    """t [M, I] @ banded mat [I, O] via per-column-tile windows (static
    slices only — tile-aligned, so no relayouts). Skips the zero K-tiles the
    dense matmul would stream."""
    pieces = []
    for c0, i0, i1 in _col_tile_windows(mat_np):
        width = min(128, out_cols - c0)
        if i1 <= i0:
            pieces.append(jnp.zeros((t.shape[0], width), jnp.float32))
            continue
        pieces.append(_mm(t[:, i0:i1], mat_ref[i0:i1, c0:c0 + width]))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)


def _banded_lhs_mm(mat_ref, mat_np, x, out_rows):
    """banded mat [O, I] @ x [I, N] via per-row-tile windows."""
    pieces = []
    for r0, i0, i1 in _row_tile_windows(mat_np):
        height = min(128, out_rows - r0)
        if i1 <= i0:
            pieces.append(jnp.zeros((height, x.shape[1]), jnp.float32))
            continue
        pieces.append(_mm(mat_ref[r0:r0 + height, i0:i1], x[i0:i1, :]))
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=0)


def _banded_flops(mat_np, rhs: bool, other_dim: int) -> int:
    wins = _col_tile_windows(mat_np) if rhs else _row_tile_windows(mat_np)
    total = 0
    for _, i0, i1 in wins:
        total += 2 * 128 * (i1 - i0) * other_dim
    return total


def _ceil(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _vmem_budget_bytes() -> int:
    """Scratch budget per grid step (env-tunable: LVG_FUSED_VMEM_MB)."""
    import os

    return int(float(os.environ.get("LVG_FUSED_VMEM_MB", "8")) * (1 << 20))


def _pick_block_images(h, wp, hup, wup, wop, itemsize, *, budget_bytes=None):
    """Images per grid step, bounded by VMEM (padded-layout accounting)."""
    if budget_bytes is None:
        budget_bytes = _vmem_budget_bytes()
    per_image = (h * wp + 160 * wop) * itemsize * 2       # in/out double-buffered
    per_image += hup * wp * 2                             # t1 scratch (bf16/f32)
    per_image += hup * wup * 6 + hup * wop * 6            # u/t3 f32 + bf16 copies
    mats = (hup * h + wp * wup + wup * wop + hup * 2 * h) * itemsize
    k = max(1, int((budget_bytes - mats) // max(per_image, 1)))
    return min(k, 16)


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "gain", "slope", "clamp",
                     "fu_taps", "fd_taps"),
)
def _fused_fwd(x, *, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = x.shape
    au, bu, ad, bd = _operators(h, w, up, down, padding, fu_taps, fd_taps)
    hu, wu = au.shape[0], bu.shape[0]
    ho, wo = ad.shape[0], bd.shape[0]
    act = _act_factory(float(gain), float(slope),
                       None if clamp is None else float(clamp))

    mat_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = x.dtype

    # Lane/sublane-aligned padded layout: every W-ish dim to a lane tile (128),
    # the row-stack stride HUP to a sublane tile (16) so per-image rows of the
    # shared scratch stay tile-aligned and ALL reshapes/stacks are free.
    # Zero padding is exact: lrelu/clamp keep 0 -> 0 and zero rows/cols of the
    # operators contribute nothing.
    wp = _ceil(w, 128)
    wup = _ceil(wu, 128)
    wop = _ceil(wo, 128)
    hup = _ceil(hu, 16)

    au_np = np.pad(au, [(0, hup - hu), (0, 0)])                      # [HUP, H]
    but_np = np.pad(bu.T, [(0, wp - w), (0, wup - wu)])              # [WP, WUP]
    ad_np = np.pad(ad, [(0, 0), (0, hup - hu)])                      # [Ho, HUP]
    bdt_np = np.pad(bd.T, [(0, wup - wu), (0, wop - wo)])            # [WUP, WOP]
    au_j = jnp.asarray(au_np, mat_dtype)
    but_j = jnp.asarray(but_np, mat_dtype)
    ad_j = jnp.asarray(ad_np, mat_dtype)
    bdt_j = jnp.asarray(bdt_np, mat_dtype)

    k = _pick_block_images(h, wp, hup, wup, wop, x.dtype.itemsize)
    bp = (b + k - 1) // k * k
    x = jnp.pad(x, [(0, bp - b), (0, 0), (0, wp - w)])

    def kernel(x_ref, au_ref, but_ref, ad_ref, bdt_ref, o_ref, t1_ref):
        # Per-image H-resample dots rows-stack into the aligned scratch, then
        # the two big W-axis matmuls + activation run batched over all k
        # images. Every matmul is block-banded: only the 128-tiles inside the
        # operator's band are contracted (the dense operators are ~95% zeros).
        for j in range(k):
            t1 = _banded_lhs_mm(au_ref, au_np, x_ref[j], hup)    # [HUP, WP]
            t1_ref[j * hup:(j + 1) * hup, :] = t1.astype(mat_dtype)
        u = _banded_rhs_mm(t1_ref[...], but_ref, but_np, wup)    # [k*HUP, WUP]
        z = act(u).astype(mat_dtype)
        t3 = _banded_rhs_mm(z, bdt_ref, bdt_np, wop).astype(mat_dtype)
        for j in range(k):
            o_ref[j] = _banded_lhs_mm(
                ad_ref, ad_np, t3[j * hup:(j + 1) * hup, :], ho).astype(out_dtype)

    flops_img = (_banded_flops(au_np, False, wp) + _banded_flops(but_np, True, hup)
                 + _banded_flops(bdt_np, True, hup) + _banded_flops(ad_np, False, wop))
    out = pl.pallas_call(
        kernel,
        grid=(bp // k,),
        in_specs=[
            pl.BlockSpec((k, h, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hup, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, wup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ho, hup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wup, wop), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, ho, wop), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ho, wop), out_dtype),
        scratch_shapes=[pltpu.VMEM((k * hup, wp), mat_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=flops_img * bp,
            bytes_accessed=(bp * (h * wp + ho * wop)) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, au_j, but_j, ad_j, bdt_j)
    return out[:b, :, :wo]


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "gain", "slope", "clamp",
                     "fu_taps", "fd_taps"),
)
def _fused_bwd(x, dy, *, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = x.shape
    au, bu, ad, bd = _operators(h, w, up, down, padding, fu_taps, fd_taps)
    hu, wu = au.shape[0], bu.shape[0]
    ho, wo = ad.shape[0], bd.shape[0]
    act_grad = _act_grad_factory(float(gain), float(slope),
                                 None if clamp is None else float(clamp))

    mat_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    au_j = jnp.asarray(au, mat_dtype)
    but_j = jnp.asarray(bu.T, mat_dtype)     # [W, Wu]
    aut_j = jnp.asarray(au.T, mat_dtype)     # [H, Hu]
    bu_j = jnp.asarray(bu, mat_dtype)        # [Wu, W]
    adt_j = jnp.asarray(ad.T, mat_dtype)     # [Hu, Ho]
    bd_j = jnp.asarray(bd, mat_dtype)        # [Wo, Wu]
    out_dtype = x.dtype

    # Same padded-layout VMEM accounting as the forward (the bwd kernel holds
    # roughly 2x the scratch per image, hence the //2).
    k = max(1, _pick_block_images(h, _ceil(w, 128), _ceil(hu, 16), _ceil(wu, 128),
                                  _ceil(wo, 128), x.dtype.itemsize) // 2)
    bp = (b + k - 1) // k * k
    if bp != b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])
        dy = jnp.pad(dy, [(0, bp - b), (0, 0), (0, 0)])

    def kernel(x_ref, dy_ref, au_ref, but_ref, aut_ref, bu_ref, adt_ref,
               bd_ref, o_ref):
        for j in range(k):
            xt = x_ref[j]
            t1 = _mm(au_ref[...], xt)                        # [Hu, W]
            u = _mm(t1.astype(mat_dtype), but_ref[...])      # [Hu, Wu]
            g = act_grad(u)
            dyt = dy_ref[j]
            s1 = _mm(adt_ref[...], dyt)                      # [Hu, Wo]
            dz = _mm(s1.astype(mat_dtype), bd_ref[...])      # [Hu, Wu]
            du = (dz * g)
            dt1 = _mm(du.astype(mat_dtype), bu_ref[...])     # [Hu, W]
            o_ref[j] = _mm(aut_ref[...], dt1.astype(mat_dtype)).astype(out_dtype)

    flops_img = 2 * (2 * (hu * h * w + hu * w * wu)
                     + hu * ho * wo + hu * wo * wu + hu * wu * w + h * hu * w)
    dx = pl.pallas_call(
        kernel,
        grid=(bp // k,),
        in_specs=[
            pl.BlockSpec((k, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, ho, wo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hu, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, wu), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hu), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wu, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hu, ho), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wo, wu), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h, w), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_img * bp,
            bytes_accessed=(bp * (2 * h * w + ho * wo)) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
    )(x, dy, au_j, but_j, aut_j, bu_j, adt_j, bd_j)
    return dx[:b] if bp != b else dx


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _fused_op(x, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    return _fused_fwd(x, up=up, down=down, padding=padding, gain=gain,
                      slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)


def _fused_op_fwd(x, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    # First-order grads never differentiate this rule (the custom_vjp
    # intercepts); only a second differentiation linearizes it as plain code —
    # the guard below turns that into a clear error (see _first_order_only).
    x = _first_order_only(x)
    y = _fused_fwd(x, up=up, down=down, padding=padding, gain=gain,
                   slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)
    return y, x


@jax.custom_jvp
def _first_order_only(x):
    """Identity whose JVP rule raises: makes the fused kernel's
    first-order-only constraint structural instead of an accident of which
    losses currently differentiate through G (only R1-on-D does 2nd-order
    today). Applied to the VJP's *inputs* so any attempt to linearize the
    backward (the first step of a second differentiation, forward- or
    reverse-mode) fails with this message BEFORE reaching the Pallas call,
    whose own missing rules produce an undiagnosable lowering error."""
    return x


@_first_order_only.defjvp
def _first_order_only_jvp(primals, tangents):
    raise NotImplementedError(
        "filtered_lrelu_fused is first-order only: its VJP is a Pallas kernel "
        "with no differentiation rule of its own. For second-order use (e.g. "
        "an R1 penalty on G), select resample_impl='matrix' — the composed "
        "path differentiates to any order.")


def _fused_op_bwd(up, down, padding, gain, slope, clamp, fu_taps, fd_taps,
                  x, dy):
    x = _first_order_only(x)
    dy = _first_order_only(dy)
    dx = _fused_bwd(x, dy, up=up, down=down, padding=padding, gain=gain,
                    slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)
    return (dx,)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def filtered_lrelu_fused(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                         gain=math.sqrt(2.0), slope=0.2, clamp=None):
    """Drop-in fused filtered_lrelu (NCHW), differentiable (1st order).

    Bias is added outside the kernel (XLA fuses it into the producing op) so
    its gradient needs no custom rule.
    """
    assert x.ndim == 4
    n, c, h, w = x.shape
    px0, px1, py0, py1 = parse_padding(padding)
    fu_arr = np.ones(1, np.float32) if fu is None else np.asarray(fu, np.float32)
    fd_arr = np.ones(1, np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu_arr.ndim == 1 and fd_arr.ndim == 1, "fused path needs separable filters"

    if b is not None:
        x = x + b.reshape(1, -1, 1, 1).astype(x.dtype)
    flat = x.reshape(n * c, h, w)
    out = _fused_op(flat, int(up), int(down), (px0, px1, py0, py1),
                    float(gain), float(slope),
                    None if clamp is None else float(clamp),
                    tuple(float(v) for v in fu_arr),
                    tuple(float(v) for v in fd_arr))
    return out.reshape(n, c, out.shape[1], out.shape[2])
