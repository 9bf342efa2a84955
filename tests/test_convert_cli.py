"""End-to-end checkpoint conversion: pickle a reference module the way the
reference's own ckpt() does (persistence-embedded source), run the
convert_checkpoint CLI on it, and verify the converted generator reproduces
the torch output."""

import pickle
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, has_reference, import_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_convert_cli_roundtrip(tmp_path):
    import torch

    ref_gen = import_reference("model.generator_sres")
    cfg = dict(hr_height=36, hr_width=64, lr_height=9, lr_width=16, temporal_context=2,
               latent_z_dim=32, latent_w_dim=32, margin_size=4, num_fp16_res=0)
    torch.manual_seed(0)
    # The sres VideoGenerator config is fully expressible through init_kwargs,
    # exactly like the released pickles.
    G_t = ref_gen.VideoGenerator(**cfg)
    G_t.eval().requires_grad_(False)
    # NOTE: reduced-size SG3 isn't reachable through VideoGenerator kwargs in
    # the reference, so this test uses the full wrapper config at small
    # resolution (still ~1M params at 36x64 hr? -> use the direct state_dict
    # path instead if slow).
    pkl_path = tmp_path / "g_ema.pkl"
    with open(pkl_path, "wb") as fp:
        pickle.dump(G_t, fp)

    out_path = tmp_path / "g_ema.lvg"
    result = subprocess.run(
        [sys.executable, "convert_checkpoint.py", "--pkl", str(pkl_path),
         "--kind", "sres", "--output", str(out_path),
         "--reference", REFERENCE_DIR],
        capture_output=True, text=True, cwd="/root/repo")
    assert result.returncode == 0, result.stderr[-2000:]

    from long_video_gan_tpu.io.checkpoint import load_generator

    G, variables, config = load_generator(str(out_path))
    assert config["kind"] == "generator_sres"

    rng = np.random.default_rng(0)
    lr = rng.standard_normal((1, 3, 6, 9, 16)).astype(np.float32)
    z = rng.standard_normal((1, 32)).astype(np.float32)
    with torch.no_grad():
        want = G_t.SG3(torch.from_numpy(z), torch.from_numpy(lr)).numpy()
    got = np.asarray(G.apply(variables, jnp.asarray(lr), z=jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
