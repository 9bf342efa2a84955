"""Metric plumbing: options, cached dataset statistics, generator sampling.

Reimplements the reference's metrics/metric_utils.py for the functional JAX
stack: feature extraction streams batches through a detector (host torchscript
or stub — see detectors.py), dataset-side statistics cache to disk keyed by a
blake2b hash of the configuration (reference :248-277), and generator-side
extraction reproduces the two-stage sampling protocol including the random
temporal offsets (reference :334-442, the lr_G path at :404-408).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .detectors import get_detector
from .feature_stats import FeatureStats


@dataclass
class MetricOptions:
    """Everything a metric computation needs (reference :29-46).

    G / lr_G are (module, variables) pairs; dataset_kwargs configure
    data.dataset classes. `detector` overrides the default detector spec —
    tests pass "stub:<dim>".
    """

    G: Optional[tuple] = None
    lr_G: Optional[tuple] = None
    dataset_kwargs: dict = field(default_factory=dict)
    cond_dataset_kwargs: dict = field(default_factory=dict)
    num_runs: int = 1
    batch_size: int = 16
    normalize_weighting: bool = True
    single_sample_per_video: bool = False
    replace_cache: bool = False
    verbose: bool = False
    cache_dir: Optional[str] = None
    detector: Optional[str] = None
    seed: int = 0
    # Test/CI knob: caps feature counts of every metric (e.g. 64 for smoke).
    max_items_override: Optional[int] = None

    def cache_path(self, tag: str, **key_kwargs) -> Optional[str]:
        cache_dir = self.cache_dir or os.path.join(
            os.environ.get("LVG_CACHE_DIR", os.path.expanduser("~/.cache/long_video_gan_tpu")),
            "metric_stats")
        args = json.dumps(dict(tag=tag, **key_kwargs), sort_keys=True, default=str)
        digest = hashlib.blake2b(args.encode("utf-8"), digest_size=16).hexdigest()
        return os.path.join(cache_dir, f"{tag}-{digest}.npz")


def _to_uint8(video: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(video) * 127.5 + 128, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------


def compute_feature_stats_for_dataset(
    opts: MetricOptions,
    detector_spec: str,
    detector_kwargs: Optional[dict] = None,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
    seq_length: Optional[int] = None,
    frame_spacing: int = 1,
    dataset_kwargs_override: Optional[dict] = None,
) -> FeatureStats:
    """Stream real data through the detector (reference :230-330), with the
    per-video weighting for image metrics and a disk cache."""
    from ..data.dataset import VideoDataset, VideoDatasetPerImage

    if opts.max_items_override is not None:
        max_items = min(max_items or opts.max_items_override, opts.max_items_override)
    dataset_kwargs = dict(opts.dataset_kwargs)
    dataset_kwargs.update(dataset_kwargs_override or {})
    if seq_length is not None:
        dataset_kwargs["seq_length"] = seq_length

    cache_path = opts.cache_path(
        "dataset-stats", detector=detector_spec, detector_kwargs=detector_kwargs,
        dataset=dataset_kwargs, capture_all=capture_all, capture_mean_cov=capture_mean_cov,
        max_items=max_items, spacing=frame_spacing,
        weighting=opts.normalize_weighting, single=opts.single_sample_per_video)
    if cache_path and os.path.isfile(cache_path) and not opts.replace_cache:
        return FeatureStats.load(cache_path)

    detector = get_detector(opts.detector or detector_spec)
    detector_kwargs = detector_kwargs or {}
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    rng = np.random.default_rng(opts.seed)

    video_metric = dataset_kwargs.get("seq_length", 1) > 1
    if video_metric:
        ds = VideoDataset(min_spacing=frame_spacing, max_spacing=frame_spacing,
                          **dataset_kwargs)
    else:
        ds = VideoDatasetPerImage(**dataset_kwargs)

    order = rng.permutation(len(ds))
    idx = 0
    while not stats.is_full() and idx < len(order):
        batch_videos, batch_weights = [], []
        while len(batch_videos) < opts.batch_size and idx < len(order):
            item = ds.sample(int(order[idx]), rng)
            batch_videos.append(item["video"])
            if "num_samples_from_source" in item and opts.normalize_weighting:
                batch_weights.append(1.0 / item["num_samples_from_source"])
            idx += 1
        videos = _to_uint8(np.stack(batch_videos))                  # [N, C, T, H, W]
        if video_metric:
            feats = detector(videos, **detector_kwargs)
        else:
            feats = detector(videos[:, :, 0], **detector_kwargs)    # [N, C, H, W]
        weights = np.asarray(batch_weights) if batch_weights else None
        stats.append(feats, weights=weights)
        if opts.verbose:
            print(f"  dataset features: {stats.num_items}")

    if cache_path:
        os.makedirs(os.path.dirname(cache_path), exist_ok=True)
        stats.save(cache_path)
    return stats


# ---------------------------------------------------------------------------


def compute_feature_stats_for_generator(
    opts: MetricOptions,
    detector_spec: str,
    detector_kwargs: Optional[dict] = None,
    capture_all: bool = False,
    capture_mean_cov: bool = False,
    max_items: Optional[int] = None,
    seq_length: int = 1,
    frame_spacing: int = 1,
    subsample_factor: int = 1,
    batch_size: Optional[int] = None,
) -> FeatureStats:
    """Sample the generator pipeline and stream features (reference :334-442).

    Protocols covered:
      * single-stage lres G (lr-only metrics),
      * sres G conditioned on real lr clips from `opts.cond_dataset_kwargs`
        (in-training sres metrics, reference :351-358,409-423),
      * two-stage lres -> sres: the lres G generates
        seq*spacing + 2*context + total_temporal_scale frames, a random
        temporal offset crops away the extra frames so statistics are
        offset-invariant (reference :399-408), then the sres G super-resolves
        and frames optionally subsample (fvd2048_128f_subsample8f).
    """
    import jax

    if opts.max_items_override is not None:
        max_items = min(max_items or opts.max_items_override, opts.max_items_override)
    detector = get_detector(opts.detector or detector_spec)
    detector_kwargs = detector_kwargs or {}
    stats = FeatureStats(capture_all=capture_all, capture_mean_cov=capture_mean_cov,
                         max_items=max_items)
    rng = np.random.default_rng(opts.seed + 1)

    gen_len = seq_length * frame_spacing * subsample_factor
    batch = batch_size or max(1, 64 // max(gen_len, 1))

    if opts.lr_G is not None:
        lr_module, lr_vars = opts.lr_G
        sr_module, sr_vars = opts.G
        context = sr_module.temporal_context
        extra = lr_module.total_temporal_scale
        lr_len = gen_len + 2 * context + extra
        lres_apply = jax.jit(lambda v, rng_key: lr_module.apply(
            v, batch, lr_len, rngs={"noise": rng_key}), static_argnums=())
        sres_apply = jax.jit(lambda v, w, z: sr_module.apply(v, w, z=z))

        def sample_batch(key):
            k1, k2, k3 = jax.random.split(key, 3)
            lr = lres_apply(lr_vars, k1)
            off = int(jax.random.randint(k2, (), 0, extra + 1))
            lr = jax.lax.dynamic_slice_in_dim(lr, off, gen_len + 2 * context, axis=2)
            z = jax.random.normal(k3, (batch, sr_module.latent_z_dim))
            hr = sres_apply(sr_vars, lr, z)
            return np.asarray(hr), None
    elif opts.cond_dataset_kwargs:
        # In-training sres metrics: G is the super-res generator conditioned
        # on REAL lr clips drawn from the cond dataset (reference
        # metric_utils.py:351-358 builds the dataset, :409-423 samples it).
        # Image metrics (seq 1) draw per-frame windows without replacement
        # with per-video weighting; video metrics sample clips with
        # replacement until the stats are full.
        from ..data.dataset import VideoDataset, VideoDatasetPerImage

        module, variables = opts.G
        context = module.temporal_context
        cond_kwargs = dict(opts.cond_dataset_kwargs)
        cond_kwargs["seq_length"] = gen_len + 2 * context
        video_metric = seq_length > 1
        ds = (VideoDataset(**cond_kwargs) if video_metric
              else VideoDatasetPerImage(**cond_kwargs))
        order = rng.permutation(len(ds))
        cursor = {"i": 0}
        sres_apply = jax.jit(lambda v, lr, z: module.apply(v, lr, z=z))

        def sample_batch(key):
            items = []
            while len(items) < batch:
                if video_metric:
                    idx = int(order[cursor["i"] % len(order)])
                elif cursor["i"] >= len(order):
                    break  # finite per-image dataset exhausted
                else:
                    idx = int(order[cursor["i"]])
                cursor["i"] += 1
                items.append(ds.sample(idx, rng))
            if not items:
                return None, None
            lr = np.stack([it["video"] for it in items])
            z = jax.random.normal(key, (len(items), module.latent_z_dim))
            hr = sres_apply(variables, lr, z)
            weights = None
            if not video_metric and opts.normalize_weighting and \
                    "num_samples_from_source" in items[0]:
                weights = np.asarray(
                    [1.0 / it["num_samples_from_source"] for it in items])
            return np.asarray(hr), weights
    else:
        module, variables = opts.G
        extra = module.total_temporal_scale
        lr_len = gen_len + extra
        apply_fn = jax.jit(lambda v, rng_key: module.apply(
            v, batch, lr_len, rngs={"noise": rng_key}))

        def sample_batch(key):
            k1, k2 = jax.random.split(key)
            video = apply_fn(variables, k1)
            off = int(jax.random.randint(k2, (), 0, extra + 1))
            video = jax.lax.dynamic_slice_in_dim(video, off, gen_len, axis=2)
            return np.asarray(video), None

    i = 0
    while not stats.is_full():
        key = jax.random.key(opts.seed * 100003 + i)
        video, weights = sample_batch(key)                          # [N, C, T', H, W]
        if video is None:  # finite cond dataset exhausted (image metrics)
            break
        video = video[:, :, ::frame_spacing * subsample_factor][:, :, :seq_length]
        videos = _to_uint8(video)
        if seq_length > 1:
            feats = detector(videos, **detector_kwargs)
        else:
            feats = detector(videos[:, :, 0], **detector_kwargs)
        stats.append(feats, weights=weights)
        if opts.verbose:
            print(f"  generator features: {stats.num_items}")
        i += 1
    return stats
