"""Data pipeline tests over a synthetic ZIP-shard dataset."""

import numpy as np
import pytest

from long_video_gan_tpu.data.dataset import (
    VideoDataset,
    VideoDatasetPerImage,
    VideoDatasetTwoRes,
)
from long_video_gan_tpu.data.loader import get_infinite_data_iter
from long_video_gan_tpu.data.tools.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(root), [(9, 16), (18, 32)], num_videos=3,
                           frames_per_video=24, num_partitions=2)
    return str(root)


def test_video_dataset_basic(dataset_dir):
    ds = VideoDataset(dataset_dir, seq_length=8, height=9, width=16)
    assert len(ds) == 3
    item = ds.sample(0, np.random.default_rng(0))
    assert item["video"].shape == (3, 8, 9, 16)
    assert item["video"].dtype == np.float32
    assert -1.0 <= item["video"].min() and item["video"].max() <= 1.0
    assert item["spacing"] == 1


def test_video_dataset_spacing(dataset_dir):
    ds = VideoDataset(dataset_dir, seq_length=4, height=9, width=16,
                      min_spacing=1, max_spacing=4)
    spacings = {ds.sample(0, np.random.default_rng(i))["spacing"] for i in range(30)}
    assert spacings.issubset({1, 2, 3, 4}) and len(spacings) > 1


def test_video_dataset_min_length_filter(dataset_dir):
    ds = VideoDataset(dataset_dir, seq_length=8, height=9, width=16,
                      min_spacing=1, max_spacing=1, min_video_length=100)
    assert len(ds) == 0


def test_two_res_pairing(dataset_dir):
    ds = VideoDatasetTwoRes(dataset_dir, seq_length=4, lr_height=9, lr_width=16,
                            hr_height=18, hr_width=32)
    item = ds.sample(1, np.random.default_rng(3))
    assert item["lr_video"].shape == (3, 4, 9, 16)
    assert item["hr_video"].shape == (3, 4, 18, 32)
    # Same content at both resolutions: downsampled hr should correlate with lr.
    lr = item["lr_video"]
    hr = item["hr_video"][:, :, ::2, ::2]
    corr = np.corrcoef(lr.ravel(), hr.ravel())[0, 1]
    assert corr > 0.9


def test_per_image_dataset_weighting(dataset_dir):
    ds = VideoDatasetPerImage(dataset_dir, height=9, width=16)
    assert len(ds) == 3 * 24
    item = ds.sample(0, np.random.default_rng(0))
    assert item["video"].shape == (3, 1, 9, 16)
    assert item["num_samples_from_source"] == 24


def test_infinite_loader_batches_and_sharding(dataset_dir):
    ds = VideoDataset(dataset_dir, seq_length=4, height=9, width=16)
    loader = get_infinite_data_iter(ds, batch_size=2, seed=7, num_workers=2, prefetch=2)
    try:
        b1 = next(loader)
        b2 = next(loader)
        assert b1["video"].shape == (2, 3, 4, 9, 16)
        assert not np.array_equal(b1["video"], b2["video"])
    finally:
        loader.close()

    # Two shards cover disjoint indices per epoch but the same global stream.
    l0 = get_infinite_data_iter(ds, batch_size=1, seed=7, shard_id=0, num_shards=2,
                                num_workers=1, prefetch=1)
    l1 = get_infinite_data_iter(ds, batch_size=1, seed=7, shard_id=1, num_shards=2,
                                num_workers=1, prefetch=1)
    try:
        a = next(l0)["video"]
        b = next(l1)["video"]
        assert not np.array_equal(a, b)
    finally:
        l0.close()
        l1.close()


def test_loader_dataset_smaller_than_batch(dataset_dir):
    """Regression: a dataset smaller than the batch must still stream batches
    (with replacement) instead of spinning through empty epochs forever."""
    ds = VideoDataset(dataset_dir, seq_length=4, height=9, width=16)   # 3 videos
    loader = get_infinite_data_iter(ds, batch_size=8, seed=3, num_workers=1, prefetch=1)
    try:
        batch = next(loader)
        assert batch["video"].shape[0] == 8
        batch2 = next(loader)
        assert batch2["video"].shape[0] == 8
    finally:
        loader.close()
