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


def categorize_hlo_op(name: str) -> str:
    """Coarse HLO-op category for trace summaries (shared by
    scripts/trace_ops.py and scripts/profile_train.py --trace)."""
    n = name.lower()
    if "flr" in n or "packed" in n or "custom-call" in n and "mosaic" in n:
        return "pallas filtered_lrelu"
    if n.startswith("%convolution") or "conv" in n.split(".")[0]:
        return "conv"
    if n.startswith("%dot") or "dot" in n.split(".")[0]:
        return "dot (resample/mapping)"
    if "fusion" in n:
        return "fusion (elementwise/reduce)"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "relayout"
    if "dynamic" in n or "slice" in n or "concatenate" in n or "pad" in n or "gather" in n:
        return "slice/concat/pad/gather"
    return "other"


def xplane_op_times(trace_dir: str) -> list:
    """[(hlo op name, device seconds)] from the newest xplane under trace_dir
    (device plane only — the 'XLA Ops' line)."""
    import glob

    # The xplane proto ships under different names per TF/plugin version; in
    # this image only the tensorflow.tsl path exists (the plugin wheel does
    # not bundle xplane_pb2).
    xplane_pb2 = None
    for modpath in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                    "tsl.profiler.protobuf.xplane_pb2",
                    "tensorboard_plugin_profile.protobuf.xplane_pb2",
                    "xprof.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(modpath)
            break
        except ImportError:
            continue
    assert xplane_pb2 is not None, "no xplane_pb2 proto module available"

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True),
                   key=os.path.getmtime)
    assert paths, f"no xplane written under {trace_dir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fp:
        xs.ParseFromString(fp.read())

    rows = []
    for plane in xs.planes:
        if "TPU" not in plane.name and "Axon" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                rows.append((ev_meta.get(ev.metadata_id, "?"),
                             ev.duration_ps / 1e12))
    return rows


def print_op_summary(rows, top: int = 30) -> None:
    """Grouped + top-N op table from xplane_op_times rows."""
    import collections

    per_op = collections.Counter()
    per_cat = collections.Counter()
    for name, dur in rows:
        per_op[name] += dur
        per_cat[categorize_hlo_op(name)] += dur
    total = sum(per_op.values()) or 1e-12

    print(f"\ndevice time total = {total * 1e3:.1f} ms\n")
    print(f"{'category':<32}{'ms':>9}{'%':>7}")
    for cat, dur in per_cat.most_common():
        print(f"{cat:<32}{dur * 1e3:>9.2f}{100 * dur / total:>6.1f}%")
    print(f"\ntop {top} ops by total self time:")
    print(f"{'op':<72}{'ms':>9}{'%':>7}")
    for name, dur in per_op.most_common(top):
        print(f"{name[:71]:<72}{dur * 1e3:>9.2f}{100 * dur / total:>6.1f}%")


def module_summary(module, *args, rngs=None, **kwargs) -> str:
    """Architecture table: per-module params/shapes (replaces the reference's
    hook-based print_module_summary, torch_utils/misc.py:196-269)."""
    import flax.linen as nn
    import jax

    rngs = rngs or {"params": jax.random.key(0), "noise": jax.random.key(1)}
    return nn.tabulate(module, rngs, depth=2)(*args, **kwargs)
