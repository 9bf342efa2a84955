"""Bilinear grid sampling (NCHW), differentiable to arbitrary order.

Equivalent of torch's `grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False)` as used by the ADA geometric warp
(model/ada_augment.py:299-300 via torch_utils/ops/grid_sample_gradfix.py).
The reference needs a gradfix wrapper because torch's native op lacks 2nd-order
gradients; in JAX the gather/lerp formulation below differentiates freely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Sample `x` [N, C, H, W] at normalized coords `grid` [N, Ho, Wo, 2].

    grid[..., 0] = x-coordinate in [-1, 1], grid[..., 1] = y-coordinate.
    align_corners=False convention: -1 maps to -0.5 pixels, +1 to size-0.5.
    Out-of-bounds samples read zeros.

    The four bilinear corners are fetched with ONE 2x2-patch gather instead of
    four independent element gathers (measured r4: the four gathers were the
    dominant cost of the ADA/in_augment warp on TPU — ~270 ms/step of sres
    update_G). The source is zero-padded by one pixel on every side and the
    patch start is the shifted-by-one top-left corner, clipped so the slice
    stays in bounds; corners whose true index is out of range read either the
    zero pad or a masked-off neighbour, and the per-corner validity masks are
    folded into the lerp weights, so values are identical to the four-gather
    formulation (same arithmetic, zeros padding mode).
    """
    n, c, h, w = x.shape
    out_hw = grid.shape[1:3]
    gx = (grid[..., 0] + 1.0) * (w / 2) - 0.5    # [N, Ho, Wo]
    gy = (grid[..., 1] + 1.0) * (h / 2) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    # Per-corner validity (zeros padding mode).
    vx0 = (x0 >= 0) & (x0 < w)
    vx1 = (x0 + 1 >= 0) & (x0 + 1 < w)
    vy0 = (y0 >= 0) & (y0 < h)
    vy1 = (y0 + 1 >= 0) & (y0 + 1 < h)

    # One gather of 2x2 patches from the one-pixel zero-padded source.
    xp = jnp.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)])
    sy = jnp.clip(y0 + 1, 0, h).astype(jnp.int32).reshape(n, -1)
    sx = jnp.clip(x0 + 1, 0, w).astype(jnp.int32).reshape(n, -1)
    starts = jnp.stack([sy, sx], axis=-1)        # [N, P, 2]

    def gather_one(src, idx):
        # offset_dims (0,2,3) => output [C, P, 2, 2]: channel-first, so the
        # final result needs no transpose back to NCHW.
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(0, 2, 3), collapsed_slice_dims=(),
            start_index_map=(1, 2))
        return jax.lax.gather(
            src, idx, dnums, slice_sizes=(c, 2, 2),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    patches = jax.vmap(gather_one)(xp, starts)   # [N, C, P, 2, 2]
    patches = patches.reshape(n, c, *out_hw, 2, 2)

    f = lambda m: m.astype(x.dtype)[:, None]     # [N,1,Ho,Wo] # noqa: E731
    wx = wx.astype(x.dtype)[:, None]
    wy = wy.astype(x.dtype)[:, None]
    w00 = (1 - wx) * (1 - wy) * (f(vx0) * f(vy0))
    w01 = wx * (1 - wy) * (f(vx1) * f(vy0))
    w10 = (1 - wx) * wy * (f(vx0) * f(vy1))
    w11 = wx * wy * (f(vx1) * f(vy1))
    return (patches[..., 0, 0] * w00 + patches[..., 0, 1] * w01
            + patches[..., 1, 0] * w10 + patches[..., 1, 1] * w11)


def affine_grid(theta: jax.Array, size: tuple[int, int, int, int]) -> jax.Array:
    """Generate a sampling grid for 2D affine matrices `theta` [N, 2, 3].

    Matches torch.nn.functional.affine_grid(align_corners=False): output
    [N, H, W, 2] with xy coordinates in [-1, 1] at pixel centres.
    """
    n, _, h, w = size
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (2.0 / w) - 1.0
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (2.0 / h) - 1.0
    gx, gy = jnp.meshgrid(xs, ys)                     # [H, W]
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)         # [H, W, 3]
    # [N, 2, 3] @ [H*W, 3]^T -> [N, 2, H*W] -> [N, H, W, 2]
    out = jnp.einsum("nij,hwj->nhwi", theta.astype(jnp.float32), base)
    return out
