"""Tracing / profiling helpers (aux subsystem; SURVEY section 5).

The reference wraps hot functions in torch profiler record_function scopes and
reports wall-clock + GPU memory per tick (torch_utils/misc.py:100-105,
train_lres.py:129-148). TPU equivalents:

  * `trace(dir)` — context manager around `jax.profiler` producing an xplane
    trace viewable in TensorBoard / Perfetto (op-level device timings);
  * `annotate(name)` — `jax.named_scope`, labels ops inside jit so traces and
    HLO dumps carry model-structure names (flax modules are auto-annotated);
  * `device_memory_stats()` — per-device live/peak HBM bytes;
  * `host_memory_gb()` — process RSS.
"""

from __future__ import annotations

import contextlib
import os


def annotate(name: str):
    import jax

    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/lvg_profile"):
    import jax

    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield log_dir


def device_memory_stats() -> dict:
    """Per-device memory statistics in bytes (empty dict on backends that
    don't expose them, e.g. CPU)."""
    import jax

    out = {}
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(dev)] = dict(
                bytes_in_use=stats.get("bytes_in_use", 0),
                peak_bytes_in_use=stats.get("peak_bytes_in_use", 0),
                bytes_limit=stats.get("bytes_limit", 0),
            )
    return out


def peak_device_memory_gb() -> float:
    stats = device_memory_stats()
    if not stats:
        return 0.0
    return max(s["peak_bytes_in_use"] for s in stats.values()) / 2**30


def host_memory_gb() -> float:
    try:
        import psutil

        return psutil.Process(os.getpid()).memory_info().rss / 2**30
    except Exception:
        try:
            with open("/proc/self/statm") as fp:
                pages = int(fp.read().split()[1])
            return pages * os.sysconf("SC_PAGE_SIZE") / 2**30
        except Exception:
            return 0.0


def module_summary(module, *args, rngs=None, **kwargs) -> str:
    """Architecture table: per-module params/shapes (replaces the reference's
    hook-based print_module_summary, torch_utils/misc.py:196-269)."""
    import flax.linen as nn
    import jax

    rngs = rngs or {"params": jax.random.key(0), "noise": jax.random.key(1)}
    return nn.tabulate(module, rngs, depth=2)(*args, **kwargs)
