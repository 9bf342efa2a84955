"""Bounded JAX backend initialization for the axon TPU tunnel.

On this infra the axon TPU plugin's device init BLOCKS FOREVER when the tunnel
relay accepts connections but the TPU side is dead (observed 2026-08-17: port
answers TCP, never answers the RPC). Python cannot interrupt a thread blocked
in C, so a wedged in-process init is unrecoverable — the only safe patterns
are (a) a watchdog thread that aborts the whole process with a diagnosis, and
(b) doing the flaky FIRST contact in an expendable subprocess that can be
killed and retried, which is how a flapping tunnel is survived.

Every user-facing entry point (bench, train CLIs, generate, calc_metrics)
funnels through init_backend_with_watchdog so a dead tunnel yields a one-line
diagnosis and a nonzero exit instead of a silent hang. The reference has no
analog (CUDA init fails fast); this is an artifact of the tunnel transport.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading
import time
from typing import Callable, Optional

_PROBE_SRC = "import jax; jax.devices()"

# Process-wide: once the backend initialized successfully, later calls are
# instant and must not spawn probe subprocesses.
_initialized = False


def init_backend_with_watchdog(
    timeout: float = 120.0,
    *,
    deadline: Optional[float] = None,
    probe_interval: float = 30.0,
    diagnostic: Optional[Callable[[], None]] = None,
    exit_code: int = 3,
):
    """Initialize the JAX backend, bounded against a dead axon tunnel.

    timeout:   per-attempt bound (watchdog on the final in-process init, and
               per-subprocess-probe bound when `deadline` is set).
    deadline:  if set and > timeout, first probe the backend in expendable
               subprocesses, retrying every `probe_interval` seconds until one
               answers or `deadline` seconds have passed — this survives a
               tunnel that comes back mid-wait, which a single blocking
               in-process init cannot (its wedged connection never recovers).
    diagnostic: optional callable invoked just before aborting (e.g. emit a
               machine-readable JSON line for a driver to record).
    On failure: prints a one-line diagnosis to stderr and os._exit(exit_code)
    (a Python exception cannot be delivered to a thread blocked in C).
    Returns jax.devices() on success.
    """
    global _initialized

    def fail(msg: str) -> None:
        if diagnostic is not None:
            try:
                diagnostic()
            except Exception:
                pass
        print(f"long_video_gan_tpu: {msg}", file=sys.stderr, flush=True)
        os._exit(exit_code)

    if _initialized:
        import jax

        return jax.devices()

    start = time.monotonic()
    if deadline is not None and deadline > timeout:
        attempt = 0
        while True:
            attempt += 1
            left = deadline - (time.monotonic() - start)
            if left <= 0:
                fail(f"backend init: tunnel still unreachable after {attempt - 1} "
                     f"probes over {deadline:.0f}s — aborting")
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", _PROBE_SRC],
                    timeout=min(timeout, max(left, 10.0)), capture_output=True)
                if proc.returncode == 0:
                    break
                why = (proc.stderr or b"").decode(errors="replace").strip().splitlines()
                why_tail = why[-1] if why else f"rc={proc.returncode}"
                print(f"backend probe {attempt} failed ({why_tail}); "
                      f"{left - probe_interval:.0f}s of deadline left",
                      file=sys.stderr, flush=True)
            except subprocess.TimeoutExpired:
                print(f"backend probe {attempt} timed out after "
                      f"{min(timeout, max(left, 10.0)):.0f}s (tunnel not answering); "
                      f"retrying", file=sys.stderr, flush=True)
            if deadline - (time.monotonic() - start) <= probe_interval:
                fail(f"backend init: tunnel still unreachable after {attempt} "
                     f"probes over {deadline:.0f}s — aborting")
            time.sleep(probe_interval)

    done = threading.Event()

    def _watchdog() -> None:
        if not done.wait(timeout):
            fail(f"jax backend init did not complete within {timeout:.0f}s — "
                 f"TPU tunnel unreachable")

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    devices = jax.devices()
    done.set()
    _initialized = True
    return devices
