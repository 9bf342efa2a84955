"""Unit tests for ops/grid_sample.py (the single-gather 2x2-patch rewrite).

The production implementation fetches all four bilinear corners with one
patch gather from a zero-padded source; these tests pin it to (a) a naive
four-gather formulation written independently here, and (b) torch's
`F.grid_sample(mode='bilinear', padding_mode='zeros', align_corners=False)`
— the exact op the reference uses for the ADA warp
(/root/reference/torch_utils/ops/grid_sample_gradfix.py:28,
/root/reference/model/ada_augment.py:300).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.ops.grid_sample import affine_grid, grid_sample


def _naive_grid_sample(x, grid):
    """Straightforward four-gather bilinear sampler (zeros padding)."""
    n, c, h, w = x.shape
    gx = (grid[..., 0] + 1.0) * (w / 2) - 0.5
    gy = (grid[..., 1] + 1.0) * (h / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[:, None]
    wy = (gy - y0)[:, None]

    def gather(ix, iy):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = x.reshape(n, c, h * w)
        idx = (iyc * w + ixc).reshape(n, 1, -1)
        vals = jnp.take_along_axis(
            flat, jnp.broadcast_to(idx, (n, c, idx.shape[-1])), axis=2)
        return vals.reshape(n, c, *ix.shape[1:]) * valid[:, None].astype(x.dtype)

    top = gather(x0, y0) * (1 - wx) + gather(x0 + 1, y0) * wx
    bot = gather(x0, y0 + 1) * (1 - wx) + gather(x0 + 1, y0 + 1) * wx
    return top * (1 - wy) + bot * wy


def _random_case(rng, n=2, c=3, h=7, w=11, ho=9, wo=5, spread=1.6):
    x = jnp.asarray(rng.standard_normal((n, c, h, w)).astype(np.float32))
    # spread > 1 puts a good fraction of samples out of bounds.
    grid = jnp.asarray(
        rng.uniform(-spread, spread, size=(n, ho, wo, 2)).astype(np.float32))
    return x, grid


def test_matches_naive_formulation(rng):
    x, grid = _random_case(rng)
    got = np.asarray(grid_sample(x, grid))
    want = np.asarray(_naive_grid_sample(x, grid))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_matches_naive_far_out_of_bounds(rng):
    """Coordinates several image-sizes away must read zeros, not garbage."""
    x, _ = _random_case(rng)
    grid = jnp.asarray(
        rng.uniform(-25.0, 25.0, size=(2, 6, 6, 2)).astype(np.float32))
    got = np.asarray(grid_sample(x, grid))
    want = np.asarray(_naive_grid_sample(x, grid))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # Sanity: fully-out-of-bounds rows really are zero.
    far = jnp.full((2, 3, 3, 2), 9.0)
    np.testing.assert_array_equal(np.asarray(grid_sample(x, far)), 0.0)


def test_exact_integer_and_boundary_coords(rng):
    """Pixel centres and the +-1 edges (where floor/validity logic is
    most fragile: corners straddling the first/last row and column)."""
    x, _ = _random_case(rng, h=4, w=6)
    n, c, h, w = x.shape
    # Pixel-centre coords of every pixel => identity resample.
    theta = jnp.broadcast_to(
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (n, 2, 3))
    grid = affine_grid(theta, (n, c, h, w))
    np.testing.assert_allclose(
        np.asarray(grid_sample(x, grid)), np.asarray(x), rtol=1e-5, atol=1e-5)
    # Exactly the normalized border +-1 (half-pixel outside the last centre).
    edges = jnp.asarray(np.array(
        [[[[-1.0, -1.0], [1.0, -1.0]], [[-1.0, 1.0], [1.0, 1.0]]]],
        dtype=np.float32))
    edges = jnp.broadcast_to(edges, (n, 2, 2, 2))
    got = np.asarray(grid_sample(x, edges))
    want = np.asarray(_naive_grid_sample(x, edges))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.oracle
def test_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x, grid = _random_case(rng, n=3, c=2, h=9, w=5, ho=7, wo=8)
    got = np.asarray(grid_sample(x, grid))
    want = F.grid_sample(
        torch.from_numpy(np.asarray(x)), torch.from_numpy(np.asarray(grid)),
        mode="bilinear", padding_mode="zeros", align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_grads_first_and_second_order(rng):
    """R1 differentiates twice through the ADA warp (update_r1 -> run_D ->
    AugmentPipe -> grid_sample), so both orders must exist and be finite,
    and the first-order d/dx must match the naive formulation."""
    x, grid = _random_case(rng, n=1, c=2, h=6, w=6, ho=5, wo=5)

    def loss(fn, x):
        return jnp.sum(fn(x, grid) ** 2)

    g_new = jax.grad(lambda x: loss(grid_sample, x))(x)
    g_ref = jax.grad(lambda x: loss(_naive_grid_sample, x))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)

    # grad-of-grad (the R1 pattern: d/dx of |d/dx loss|^2).
    def r1(x):
        g = jax.grad(lambda x: loss(grid_sample, x))(x)
        return jnp.sum(g ** 2)

    gg = jax.grad(r1)(x)
    assert np.isfinite(np.asarray(gg)).all()

    # grad wrt the grid coordinates (the affine params path).
    gc = jax.grad(lambda g: jnp.sum(grid_sample(x, g) ** 2))(grid)
    assert np.isfinite(np.asarray(gc)).all()


def test_bf16_input_dtype(rng):
    x, grid = _random_case(rng)
    y = grid_sample(x.astype(jnp.bfloat16), grid)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y, dtype=np.float32),
        np.asarray(grid_sample(x, grid)), rtol=0.05, atol=0.05)
