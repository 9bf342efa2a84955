"""Cached URL fetching — the equivalent of the reference's dnnlib.util.open_url
(/root/reference/dnnlib/util.py:396-492): download with retries into a
content-keyed cache and return the local path.

Used by generate.py / convert_checkpoint.py / metric detectors when given an
http(s):// (or file://) location instead of a local path. In zero-egress
environments remote fetches fail fast with a clear error; file:// URLs and the
cache still work, so the call sites stay uniform.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import time
import urllib.error
import urllib.parse
import urllib.request

DEFAULT_CACHE_DIR = os.path.join(
    os.environ.get("LVG_CACHE_DIR", os.path.expanduser("~/.cache/long_video_gan_tpu")),
    "downloads")


def is_url(spec: str) -> bool:
    return spec.startswith(("http://", "https://", "file://"))


def fetch_url(url: str, cache_dir: str | None = None, num_attempts: int = 5,
              verbose: bool = True) -> str:
    """Return a local path for `url`, downloading into the cache on miss.

    The cache key is md5(url) + the URL's basename (mirrors the reference's
    layout so caches are recognizable). Writes are atomic (tmp + os.replace),
    safe under concurrent callers.
    """
    assert is_url(url), f"not a URL: {url!r}"
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    key = hashlib.md5(url.encode("utf-8")).hexdigest()
    name = os.path.basename(urllib.parse.urlparse(url).path) or "download"
    dest = os.path.join(cache_dir, f"{key}-{name}")
    if os.path.isfile(dest):
        return dest

    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{dest}.tmp.{os.getpid()}"
    last_err: Exception | None = None
    for attempt in range(num_attempts):
        try:
            if verbose:
                print(f"Downloading {url} (attempt {attempt + 1}/{num_attempts}) ...")
            with urllib.request.urlopen(url, timeout=60) as resp, open(tmp, "wb") as fp:
                shutil.copyfileobj(resp, fp, length=1 << 20)
            os.replace(tmp, dest)
            return dest
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            last_err = e
            if os.path.exists(tmp):
                os.remove(tmp)
            if attempt + 1 < num_attempts:
                time.sleep(min(2.0 ** attempt, 30.0))
    raise RuntimeError(
        f"failed to fetch {url} after {num_attempts} attempts "
        f"(offline environment? pass a local path instead): {last_err}")


def resolve_path(spec: str, cache_dir: str | None = None) -> str:
    """Local path passthrough; URLs go through the cache."""
    return fetch_url(spec, cache_dir) if is_url(spec) else spec
