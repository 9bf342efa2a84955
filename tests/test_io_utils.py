"""IO + utils coverage: checkpoint roundtrip, video/image writers, misc."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.io.checkpoint import (
    load_checkpoint,
    load_generator,
    save_checkpoint,
    save_generator,
)
from long_video_gan_tpu.utils.misc import EasyDict, assert_shape
from long_video_gan_tpu.utils.video import (
    get_next_run_dir,
    make_grid,
    save_image_grid,
    to_uint8,
    write_video_grid,
)


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {"params": {"w": rng.standard_normal((3, 4)).astype(np.float32),
                       "b": np.zeros(4, np.float32)},
            "step": np.asarray(7, np.int32)}
    path = str(tmp_path / "ckpt.lvg")
    save_checkpoint(path, tree, dict(note="hello", step=7))
    loaded, config = load_checkpoint(path)
    assert config["note"] == "hello"
    np.testing.assert_array_equal(loaded["params"]["w"], tree["params"]["w"])
    assert int(loaded["step"]) == 7


def test_checkpoint_rejects_garbage(tmp_path):
    path = tmp_path / "bad.lvg"
    path.write_bytes(b"definitely not a checkpoint")
    with pytest.raises(ValueError, match="not a long_video_gan_tpu checkpoint"):
        load_checkpoint(str(path))


def test_generator_checkpoint_roundtrip(tmp_path):
    from long_video_gan_tpu.models.generator_lres import VideoGenerator

    kwargs = dict(out_height=8, out_width=16, temporal_emb_dim=64, latent_w_dim=64,
                  temporal_padding=2, channel_max=16,
                  embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                        blur_widths=16))
    G = VideoGenerator(**kwargs)
    variables = G.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 4)
    path = str(tmp_path / "g.lvg")
    save_generator(path, variables, dict(kind="generator_lres", kwargs=kwargs))
    G2, vars2, _ = load_generator(path)
    a = G.apply(variables, 1, 4, rngs={"noise": jax.random.key(2)})
    b = G2.apply(vars2, 1, 4, rngs={"noise": jax.random.key(2)})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_video_grid_writer(tmp_path, rng):
    video = rng.standard_normal((4, 3, 5, 16, 24)).astype(np.float32) * 0.5
    path = tmp_path / "out.mp4"
    write_video_grid(video, path, fps=10)
    produced = path.exists() or (tmp_path / "out.mp4.frames").exists()
    assert produced
    if path.exists():
        import cv2

        cap = cv2.VideoCapture(str(path))
        assert cap.isOpened()
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert n == 5


def test_image_grid_and_helpers(tmp_path, rng):
    imgs = rng.standard_normal((6, 3, 8, 8)).astype(np.float32)
    grid = make_grid(to_uint8(imgs))
    assert grid.shape in {(16, 24, 3), (24, 16, 3)}
    save_image_grid(imgs, tmp_path / "grid.png")
    assert (tmp_path / "grid.png").exists()

    d1 = get_next_run_dir(str(tmp_path / "runs"))
    assert d1.endswith("00000")


def test_misc_helpers(rng):
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    with pytest.raises(AttributeError):
        _ = d.missing

    x = np.zeros((2, 3, 4))
    assert_shape(x, (2, None, 4))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3, 5))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 3))


def test_module_summary():
    from long_video_gan_tpu.models.common import FullyConnectedLayer
    from long_video_gan_tpu.utils.profiling import module_summary

    table = module_summary(FullyConnectedLayer(4, 8), jnp.zeros((1, 4)))
    assert "FullyConnectedLayer" in table
