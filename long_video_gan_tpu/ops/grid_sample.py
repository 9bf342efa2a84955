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
    """
    n, c, h, w = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2) - 0.5    # [N, Ho, Wo]
    gy = (grid[..., 1] + 1.0) * (h / 2) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        # [N, C, Ho, Wo] gather via take_along_axis on flattened spatial dim.
        flat = x.reshape(n, c, h * w)
        idx = (iyc * w + ixc).reshape(n, 1, -1)
        vals = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (n, c, idx.shape[-1])), axis=2)
        vals = vals.reshape(n, c, *ix.shape[1:])
        return vals * valid[:, None].astype(x.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[:, None].astype(x.dtype)
    wy = wy[:, None].astype(x.dtype)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


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
