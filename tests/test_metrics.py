"""Metrics suite tests: statistics math against closed forms, and the full
metric pipeline end-to-end with stub detectors over synthetic data."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from long_video_gan_tpu.metrics.feature_stats import (
    FeatureStats,
    frechet_distance,
    inception_score_from_probs,
    kid_from_features,
)


def test_feature_stats_mean_cov_matches_numpy(rng):
    x = rng.standard_normal((500, 8)).astype(np.float32)
    stats = FeatureStats(capture_mean_cov=True)
    for i in range(0, 500, 64):
        stats.append(x[i:i + 64])
    mean, cov = stats.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-4)


def test_feature_stats_weighted(rng):
    x = rng.standard_normal((100, 4)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, size=100)
    stats = FeatureStats(capture_mean_cov=True)
    stats.append(x, weights=w)
    mean, _ = stats.get_mean_cov()
    np.testing.assert_allclose(mean, (x * w[:, None]).sum(0) / w.sum(), rtol=1e-5)


def test_feature_stats_max_items(rng):
    stats = FeatureStats(capture_all=True, max_items=10)
    stats.append(rng.standard_normal((8, 4)))
    stats.append(rng.standard_normal((8, 4)))
    assert stats.num_items == 10 and stats.get_all().shape == (10, 4)


def test_feature_stats_save_load(tmp_path, rng):
    stats = FeatureStats(capture_mean_cov=True, max_items=50)
    stats.append(rng.standard_normal((50, 6)))
    p = str(tmp_path / "stats.npz")
    stats.save(p)
    loaded = FeatureStats.load(p)
    np.testing.assert_allclose(loaded.get_mean_cov()[0], stats.get_mean_cov()[0])
    assert loaded.is_full()


def test_frechet_distance_closed_form():
    # Identical Gaussians -> 0; mean shift of d with identity covs -> |d|^2.
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)
    mu2 = np.full(4, 0.5)
    assert frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(4 * 0.25, abs=1e-6)


def test_kid_zero_for_same_distribution(rng):
    x = rng.standard_normal((400, 16)).astype(np.float32)
    same = kid_from_features(x, x.copy(), num_subsets=20, max_subset_size=100)
    shifted = kid_from_features(x, x + 2.0, num_subsets=20, max_subset_size=100)
    assert abs(same) < 0.3
    assert shifted > same + 1.0


def test_inception_score_bounds():
    # Uniform probs -> IS == 1; one-hot spread over classes -> IS == num classes.
    uniform = np.full((100, 10), 0.1)
    mean, _ = inception_score_from_probs(uniform, num_splits=2)
    assert mean == pytest.approx(1.0, rel=1e-3)
    onehot = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
    mean, _ = inception_score_from_probs(onehot, num_splits=2)
    assert mean > 8.0


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def metric_env(tmp_path_factory):
    from long_video_gan_tpu.data.tools.synthetic import make_synthetic_dataset
    from long_video_gan_tpu.models.generator_lres import VideoGenerator as LresG
    from long_video_gan_tpu.models.generator_sres import VideoGenerator as SresG

    root = tmp_path_factory.mktemp("metric_data")
    make_synthetic_dataset(str(root), [(8, 16), (32, 64)], num_videos=3,
                           frames_per_video=24, num_partitions=1)

    lres = LresG(out_height=8, out_width=16, temporal_emb_dim=64, latent_w_dim=64,
                 temporal_padding=2, channel_max=32,
                 embedding_kwargs=dict(min_sampling_rate=10, max_sampling_rate=40,
                                       blur_widths=16))
    lres_vars = lres.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, 1, 4)

    sres = SresG(hr_height=32, hr_width=64, lr_height=8, lr_width=16, temporal_context=2,
                 latent_z_dim=32, latent_w_dim=32, margin_size=4, num_fp16_res=0,
                 channel_base=1024, channel_max=32, num_layers=6)
    sres_vars = sres.init({"params": jax.random.key(2), "noise": jax.random.key(3)},
                          jnp.zeros((1, 3, 5, 8, 16)))
    return dict(root=str(root), lres=(lres, lres_vars), sres=(sres, sres_vars))


def test_fvd_pipeline_end_to_end(metric_env, tmp_path):
    """The fvd protocol (two-stage sampling with random temporal offsets +
    cached dataset stats) at smoke scale: a registered 4-frame variant keeps
    CPU compile time manageable while exercising the identical code path as
    fvd2048_16f/_128f."""
    from long_video_gan_tpu.metrics import metric_main
    from long_video_gan_tpu.metrics.metric_main import _compute_fvd, register_metric

    if not metric_main.is_valid_metric("fvd_tiny_test"):
        @register_metric
        def fvd_tiny_test(opts):
            return dict(fvd_tiny_test=_compute_fvd(opts, max_real=8, num_gen=8,
                                                   num_frames=4))

    kwargs = dict(
        G=metric_env["sres"], lr_G=metric_env["lres"],
        dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                            height=32, width=64),
        detector="stub:16", batch_size=4, max_items_override=8,
        cache_dir=str(tmp_path / "cache"),
    )
    result = metric_main.calc_metric(metric="fvd_tiny_test", **kwargs)
    val = result["results"]["fvd_tiny_test"]
    assert np.isfinite(val) and val >= 0

    # Cache hit on second run: same dataset stats path, still finite.
    result2 = metric_main.calc_metric(metric="fvd_tiny_test", **kwargs)
    assert np.isfinite(result2["results"]["fvd_tiny_test"])


def test_fid_pipeline_single_stage(metric_env, tmp_path):
    from long_video_gan_tpu.metrics import metric_main

    result = metric_main.calc_metric(
        metric="fid50k_full",
        G=metric_env["lres"],
        dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                            height=8, width=16),
        detector="stub:16", batch_size=8, max_items_override=16,
        cache_dir=str(tmp_path / "cache"))
    assert np.isfinite(result["results"]["fid50k_full"])


def test_is_metric(metric_env, tmp_path):
    from long_video_gan_tpu.metrics import metric_main

    result = metric_main.calc_metric(
        metric="is50k", G=metric_env["lres"],
        dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                            height=8, width=16),
        detector="stub:8", batch_size=8, max_items_override=16,
        cache_dir=str(tmp_path / "cache"))
    assert result["results"]["is50k_mean"] >= 1.0


def test_fvd_cond_dataset_mode(metric_env, tmp_path):
    """sres G conditioned on REAL lr clips (the in-training sres metric path,
    reference metric_utils.py:351-358,409-423): cond_dataset_kwargs set, no
    lr_G — the conditioning windows come from the dataset."""
    from long_video_gan_tpu.metrics import metric_main
    from long_video_gan_tpu.metrics.metric_main import _compute_fvd, register_metric

    if not metric_main.is_valid_metric("fvd_tiny_cond_test"):
        @register_metric
        def fvd_tiny_cond_test(opts):
            return dict(fvd_tiny_cond_test=_compute_fvd(opts, max_real=8, num_gen=8,
                                                        num_frames=4))

    result = metric_main.calc_metric(
        metric="fvd_tiny_cond_test",
        G=metric_env["sres"],
        dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                            height=32, width=64),
        cond_dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                                 height=8, width=16),
        detector="stub:16", batch_size=4, max_items_override=8,
        cache_dir=str(tmp_path / "cache"))
    val = result["results"]["fvd_tiny_cond_test"]
    assert np.isfinite(val) and val >= 0


def test_fid_cond_dataset_mode(metric_env, tmp_path):
    """Image metric through the cond path: per-frame windows drawn without
    replacement with per-video weighting (reference :418-423)."""
    from long_video_gan_tpu.metrics import metric_main

    result = metric_main.calc_metric(
        metric="fid50k_full",
        G=metric_env["sres"],
        dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                            height=32, width=64),
        cond_dataset_kwargs=dict(dataset_dir=metric_env["root"], seq_length=1,
                                 height=8, width=16),
        detector="stub:16", batch_size=4, max_items_override=8,
        cache_dir=str(tmp_path / "cache"))
    assert np.isfinite(result["results"]["fid50k_full"])
