"""Numerical parity: our SG3 super-res generator vs the PyTorch reference,
on a reduced config (same architecture family, fewer layers/channels)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")

CFG = dict(z_dim=32, w_dim=32, img_width=64, img_height=36, img_channels=3,
           cond_width=16, cond_height=9, cond_context=2, margin_size=4)
REF_SYN = dict(num_fp16_res=0, channel_base=1024, channel_max=32, num_layers=6)

# Production config (reference train_sres.py:293-317,350-354 /
# generator_sres.py:616-644 defaults), fp16 off so CPU forwards compare in f32.
FULL_CFG = dict(z_dim=512, w_dim=512, img_width=256, img_height=144,
                img_channels=3, cond_width=64, cond_height=36, cond_context=4,
                margin_size=10)
FULL_SYN = dict(num_fp16_res=0)


@pytest.fixture(scope="module")
def torch_G():
    import torch

    ref = import_reference("model.generator_sres")
    torch.manual_seed(0)
    G = ref.Generator(**CFG, **REF_SYN)
    G.eval().requires_grad_(False)
    return G


def test_sres_generator_parity(torch_G):
    import torch

    from long_video_gan_tpu.io.convert_torch import torch_state_to_variables
    from long_video_gan_tpu.models.generator_sres import Generator

    G = Generator(**CFG, **REF_SYN)
    rng = np.random.default_rng(3)
    z = rng.standard_normal((2, CFG["z_dim"])).astype(np.float32)
    cond = rng.standard_normal((2, 3, 8, CFG["cond_height"], CFG["cond_width"])).astype(np.float32)

    variables = jax.eval_shape(lambda: G.init({"params": jax.random.key(0)},
                                              jnp.zeros_like(z), jnp.zeros_like(cond)))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = torch_state_to_variables(torch_G.state_dict(), variables)

    with torch.no_grad():
        want = torch_G(torch.from_numpy(z), torch.from_numpy(cond)).numpy()
    got = np.asarray(G.apply(variables, jnp.asarray(z), jnp.asarray(cond)))

    assert got.shape == want.shape == (2, 3, 4, 36, 64)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_layer_geometry_matches_reference(torch_G):
    """Every layer's in/out size, sampling rate and channel count must match
    the reference's printed architecture (SURVEY hard-part: non-square
    alias-free geometry, generator_sres.py:410-426,296-301)."""
    from long_video_gan_tpu.models.generator_sres import Generator

    G = Generator(**CFG, **REF_SYN)
    # Introspect our layers by binding an initialized module.
    variables = G.init({"params": jax.random.key(0)},
                       jnp.zeros((1, CFG["z_dim"])),
                       jnp.zeros((1, 3, 5, CFG["cond_height"], CFG["cond_width"])))
    bound = G.bind(variables)
    ours = bound.synthesis.layers

    for name, layer in zip(torch_G.synthesis.layer_names, ours):
        t_layer = getattr(torch_G.synthesis, name)
        assert tuple(int(v) for v in t_layer.in_size) == tuple(layer.in_size), name
        assert tuple(int(v) for v in t_layer.out_size) == tuple(layer.out_size), name
        assert int(t_layer.in_sampling_rate) == int(layer.in_sampling_rate), name
        assert int(t_layer.out_sampling_rate) == int(layer.out_sampling_rate), name
        assert t_layer.in_channels == layer.in_channels, name
        assert t_layer.out_channels == layer.out_channels, name
        assert list(t_layer.padding) == list(layer.padding), name
        assert t_layer.up_factor == layer.up_factor and t_layer.down_factor == layer.down_factor


@pytest.fixture(scope="module")
def torch_G_full():
    import torch

    ref = import_reference("model.generator_sres")
    torch.manual_seed(0)
    G = ref.Generator(**FULL_CFG, **FULL_SYN)
    G.eval().requires_grad_(False)
    return G


def test_layer_geometry_matches_reference_fullsize(torch_G_full):
    """Per-layer geometry at the PRODUCTION 144x256 / 14-layer / 512-ch
    non-square config (construction only — no forward).
    Reference: model/generator_sres.py:410-426,296-301."""
    from long_video_gan_tpu.models.generator_sres import Generator

    G = Generator(**FULL_CFG, **FULL_SYN)
    variables = jax.eval_shape(
        lambda: G.init({"params": jax.random.key(0)},
                       jnp.zeros((1, FULL_CFG["z_dim"])),
                       jnp.zeros((1, 3, 9, FULL_CFG["cond_height"],
                                  FULL_CFG["cond_width"]))))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    bound = G.bind(variables)
    ours = bound.synthesis.layers
    names = torch_G_full.synthesis.layer_names
    assert len(names) == len(ours) == 15  # 14 layers + ToRGB

    for name, layer in zip(names, ours):
        t_layer = getattr(torch_G_full.synthesis, name)
        assert tuple(int(v) for v in t_layer.in_size) == tuple(layer.in_size), name
        assert tuple(int(v) for v in t_layer.out_size) == tuple(layer.out_size), name
        assert int(t_layer.in_sampling_rate) == int(layer.in_sampling_rate), name
        assert int(t_layer.out_sampling_rate) == int(layer.out_sampling_rate), name
        assert t_layer.in_channels == layer.in_channels, name
        assert t_layer.out_channels == layer.out_channels, name
        assert list(t_layer.padding) == list(layer.padding), name
        assert t_layer.up_factor == layer.up_factor, name
        assert t_layer.down_factor == layer.down_factor, name
        assert np.asarray(t_layer.up_filter).shape == np.asarray(layer.up_filter).shape \
            if t_layer.up_filter is not None else True, name
    # Output geometry of the last two layers is pinned to the image size.
    assert tuple(int(v) for v in ours[-1].out_size) == (256, 144)


def test_sres_generator_parity_fullsize(torch_G_full):
    """One full-size forward: converted weights + shared inputs, f32 on CPU.
    Minimum temporal window (9 lr frames -> 1 hr frame) keeps the CPU cost
    bounded while exercising every layer at production geometry."""
    import torch

    from long_video_gan_tpu.io.convert_torch import torch_state_to_variables
    from long_video_gan_tpu.models.generator_sres import Generator

    G = Generator(**FULL_CFG, **FULL_SYN)
    rng = np.random.default_rng(11)
    z = rng.standard_normal((1, FULL_CFG["z_dim"])).astype(np.float32)
    cond = rng.standard_normal(
        (1, 3, 9, FULL_CFG["cond_height"], FULL_CFG["cond_width"])).astype(np.float32)

    variables = jax.eval_shape(lambda: G.init({"params": jax.random.key(0)},
                                              jnp.zeros_like(z), jnp.zeros_like(cond)))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = torch_state_to_variables(torch_G_full.state_dict(), variables)

    with torch.no_grad():
        want = torch_G_full(torch.from_numpy(z), torch.from_numpy(cond)).numpy()
    got = np.asarray(G.apply(variables, jnp.asarray(z), jnp.asarray(cond)))

    assert got.shape == want.shape == (1, 3, 1, 144, 256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)
