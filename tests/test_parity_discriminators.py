"""Numerical parity: our discriminators vs the PyTorch reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def _convert(torch_module, our_module, *example_args):
    from long_video_gan_tpu.io.convert_torch import torch_state_to_variables

    variables = jax.eval_shape(
        lambda: our_module.init({"params": jax.random.key(0)}, *example_args)
    )
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    return torch_state_to_variables(torch_module.state_dict(), variables)


def test_lres_discriminator_parity():
    import torch

    ref = import_reference("model.discriminator_lres")
    from long_video_gan_tpu.models.discriminator_lres import VideoDiscriminator

    torch.manual_seed(0)
    D_t = ref.VideoDiscriminator(seq_length=16, max_edge=64)
    D_t.eval().requires_grad_(False)
    D = VideoDiscriminator(seq_length=16, max_edge=64)

    rng = np.random.default_rng(0)
    video = rng.standard_normal((2, 3, 16, 36, 64)).astype(np.float32)
    variables = _convert(D_t, D, jnp.asarray(video))

    with torch.no_grad():
        want = D_t(torch.from_numpy(video)).numpy()
    got = np.asarray(D.apply(variables, jnp.asarray(video)))
    assert got.shape == want.shape == (2, 1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sres_discriminator_parity():
    import torch

    ref = import_reference("model.discriminator_sres")
    from long_video_gan_tpu.models.discriminator_sres import VideoDiscriminator

    cfg = dict(seq_length=2, lr_height=16, lr_width=16, hr_height=64, hr_width=64,
               channels_base=1024, channels_max=64, num_fp16_res=0)
    torch.manual_seed(0)
    D_t = ref.VideoDiscriminator(**cfg)
    D_t.eval().requires_grad_(False)
    D = VideoDiscriminator(**cfg)

    rng = np.random.default_rng(1)
    lr = rng.standard_normal((2, 3, 2, 16, 16)).astype(np.float32)
    hr = rng.standard_normal((2, 3, 2, 64, 64)).astype(np.float32)
    variables = _convert(D_t, D, jnp.asarray(lr), jnp.asarray(hr))

    with torch.no_grad():
        want = D_t(torch.from_numpy(lr), torch.from_numpy(hr)).numpy()
    got = np.asarray(D.apply(variables, jnp.asarray(lr), jnp.asarray(hr)))
    assert got.shape == want.shape == (2, 1)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_sres_discriminator_nonsquare_parity():
    """Non-square hr (144x256 aspect) exercises the pad-to-square path."""
    import torch

    ref = import_reference("model.discriminator_sres")
    from long_video_gan_tpu.models.discriminator_sres import VideoDiscriminator

    cfg = dict(seq_length=2, lr_height=9, lr_width=16, hr_height=36, hr_width=64,
               channels_base=512, channels_max=32, num_fp16_res=0)
    torch.manual_seed(1)
    D_t = ref.VideoDiscriminator(**cfg)
    D_t.eval().requires_grad_(False)
    D = VideoDiscriminator(**cfg)

    rng = np.random.default_rng(2)
    lr = rng.standard_normal((1, 3, 2, 9, 16)).astype(np.float32)
    hr = rng.standard_normal((1, 3, 2, 36, 64)).astype(np.float32)
    variables = _convert(D_t, D, jnp.asarray(lr), jnp.asarray(hr))

    with torch.no_grad():
        want = D_t(torch.from_numpy(lr), torch.from_numpy(hr)).numpy()
    got = np.asarray(D.apply(variables, jnp.asarray(lr), jnp.asarray(hr)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
