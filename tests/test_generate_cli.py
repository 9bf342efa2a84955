"""End-to-end test of the generate.py CLI (two-stage chunked inference).

Drives the click command in-process on tiny-preset-scale checkpoints: lres-only
and lres->sres runs, mp4 outputs, --save-lres, --save-frames, and the
reference's --save-index selected-frame PNGs (reference generate.py:19-90).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from click.testing import CliRunner

from long_video_gan_tpu.io.checkpoint import save_generator
from long_video_gan_tpu.models.generator_lres import VideoGenerator as LresG
from long_video_gan_tpu.models.generator_sres import VideoGenerator as SresG


LRES_KWARGS = dict(out_height=8, out_width=16, temporal_emb_dim=64, latent_w_dim=64,
                   temporal_padding=2, channel_max=32,
                   embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                         blur_widths=16))
SRES_KWARGS = dict(hr_height=32, hr_width=64, lr_height=8, lr_width=16,
                   temporal_context=2, latent_z_dim=32, latent_w_dim=32,
                   margin_size=4, num_fp16_res=0, channel_base=1024, channel_max=32,
                   num_layers=6)


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    root = tmp_path_factory.mktemp("generate_ckpts")

    G_l = LresG(**LRES_KWARGS)
    v_l = G_l.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 8)
    lres_path = root / "lres.lvg"
    save_generator(str(lres_path), v_l, dict(kind="generator_lres", kwargs=LRES_KWARGS))

    G_s = SresG(**SRES_KWARGS)
    lr = jnp.zeros((1, 3, 8, 8, 16))
    v_s = G_s.init({"params": jax.random.key(2), "noise": jax.random.key(3)}, lr)
    sres_path = root / "sres.lvg"
    save_generator(str(sres_path), v_s, dict(kind="generator_sres", kwargs=SRES_KWARGS))

    return str(lres_path), str(sres_path)


def test_generate_two_stage(checkpoints, tmp_path):
    from generate import main

    lres_path, sres_path = checkpoints
    out = tmp_path / "video.mp4"
    result = CliRunner().invoke(main, [
        "--lres", lres_path, "--sres", sres_path, "--output", str(out),
        "--frames", "5", "--segment-length", "4", "--seed", "7",
        "--save-lres", "--save-frames", "--save-index", "0", "-i", "3",
        "--save-index", "99",  # out of range: silently dropped
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    assert out.is_file() and out.stat().st_size > 0
    assert (tmp_path / "video-lres.mp4").is_file()
    # --save-frames: one PNG per generated frame.
    frames = sorted((tmp_path / "video").glob("*.png"))
    assert [p.name for p in frames] == [f"{i:06d}.png" for i in range(5)]
    # --save-index: exactly the requested in-range frames.
    assert (tmp_path / "video-frame0000.png").is_file()
    assert (tmp_path / "video-frame0003.png").is_file()
    assert not (tmp_path / "video-frame0099.png").exists()


def test_generate_lres_only(checkpoints, tmp_path):
    from generate import main

    lres_path, _ = checkpoints
    out = tmp_path / "video.mp4"
    result = CliRunner().invoke(main, [
        "--lres", lres_path, "--output", str(out),
        "--frames", "6", "--seed", "3", "--save-index", "1",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    # No sres: only the low-res video (plus requested frames) is written.
    assert (tmp_path / "video-lres.mp4").is_file()
    assert not out.exists()
    png = tmp_path / "video-frame0001.png"
    assert png.is_file()
    from PIL import Image

    w, h = Image.open(png).size
    assert (h, w) == (8, 16)


def test_generate_deterministic_at_fixed_seed(checkpoints, tmp_path):
    """Same seed -> identical frames (the reference's fixed-seed contract,
    reference generate.py:21)."""
    from generate import main

    lres_path, sres_path = checkpoints
    frames = []
    for run in ("a", "b"):
        out = tmp_path / run / "v.mp4"
        result = CliRunner().invoke(main, [
            "--lres", lres_path, "--sres", sres_path, "--output", str(out),
            "--frames", "4", "--segment-length", "4", "--seed", "11",
            "--save-index", "2",
        ], catch_exceptions=False)
        assert result.exit_code == 0, result.output
        from PIL import Image

        frames.append(np.asarray(Image.open(tmp_path / run / "v-frame0002.png")))
    np.testing.assert_array_equal(frames[0], frames[1])
