"""Cached URL fetch (dnnlib.open_url equivalent) — file:// round trip."""

import os
import pathlib

import pytest

from long_video_gan_tpu.utils.fetch import fetch_url, is_url, resolve_path


def test_file_url_fetch_and_cache(tmp_path):
    src = tmp_path / "payload.bin"
    src.write_bytes(b"\x00\x01payload\xff" * 100)
    url = src.as_uri()
    cache = str(tmp_path / "cache")

    p1 = fetch_url(url, cache_dir=cache, verbose=False)
    assert pathlib.Path(p1).read_bytes() == src.read_bytes()
    assert p1.startswith(cache)
    assert p1.endswith("payload.bin")

    # Cache hit: source may vanish, fetch still succeeds.
    src.unlink()
    p2 = fetch_url(url, cache_dir=cache, verbose=False)
    assert p2 == p1 and os.path.isfile(p2)


def test_resolve_path_passthrough(tmp_path):
    local = str(tmp_path / "x.lvg")
    assert resolve_path(local) == local
    assert not is_url(local)
    assert is_url("https://example.com/a.pkl")


def test_fetch_failure_raises(tmp_path):
    url = (tmp_path / "missing.bin").as_uri()
    with pytest.raises(RuntimeError, match="failed to fetch"):
        fetch_url(url, cache_dir=str(tmp_path / "c"), num_attempts=2, verbose=False)
