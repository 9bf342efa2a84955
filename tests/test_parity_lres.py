"""End-to-end numerical parity: our lres generator vs the PyTorch reference.

Constructs the reference VideoGenerator on CPU, converts its state_dict into
our flax variables, feeds both the *same* injected noise, and compares the
generated videos. This is the strongest correctness oracle available without
the released checkpoints (which require network access).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import has_reference, import_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def torch_G():
    import torch

    ref_gen = import_reference("model.generator_lres")
    torch.manual_seed(0)
    G = ref_gen.VideoGenerator()  # full default 36x64 config
    G.eval().requires_grad_(False)
    return G


def test_lres_generator_parity(torch_G):
    import torch

    from long_video_gan_tpu.io.convert_torch import torch_state_to_variables
    from long_video_gan_tpu.models.generator_lres import VideoGenerator

    seq_length = 8
    G = VideoGenerator()
    variables = jax.eval_shape(
        lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, seq_length)
    )
    # eval_shape gives the tree structure without the (slow) real init.
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    variables = torch_state_to_variables(torch_G.state_dict(), variables)

    # Same white noise into both pipelines.
    rng = np.random.default_rng(7)
    in_len = G.compute_seq_lengths(seq_length)[0]
    emb_len = in_len * G.total_temporal_scale
    noise = rng.standard_normal(
        (1, torch_G.temporal_emb.noise_channels, emb_len + torch_G.temporal_emb.kernel_size - 1)
    ).astype(np.float32)

    # Reference forward, staged to allow noise injection.
    import einops

    with torch.no_grad():
        emb_t = torch_G.temporal_emb.blur(torch.from_numpy(noise))
        ws_t = torch_G.compute_latent_ws(emb_t, seq_length)
        ti_t = einops.rearrange(
            torch_G.w_to_temp_input(einops.rearrange(ws_t.pop(0), "n c t -> (n t) c")),
            "(n t) c -> n c t", t=in_len,
        )
        want = torch_G.synthesize_video(ti_t, ws_t, seq_length).numpy()

    got = np.asarray(G.apply(variables, 1, seq_length, noise=jnp.asarray(noise)))

    assert got.shape == want.shape == (1, 3, seq_length, 36, 64)
    # fp32 CPU both sides; tolerance covers conv-algorithm differences through
    # 11 modulated-conv layers.
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-3)


def test_seq_length_bookkeeping_matches_reference(torch_G):
    from long_video_gan_tpu.models.generator_lres import VideoGenerator

    G = VideoGenerator()
    for t in (8, 16, 128, 160, 256):
        assert G.compute_seq_lengths(t) == tuple(torch_G.compute_seq_lengths(t)) or \
            G.compute_seq_lengths(t) == torch_G.compute_seq_lengths(t)
    assert G.total_temporal_scale == torch_G.total_temporal_scale
    assert G.total_spatial_scale == torch_G.total_spatial_scale
