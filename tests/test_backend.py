"""Bounded backend init (utils/backend.py).

The fail paths call os._exit (the only way out of a C-blocked init), so they
are exercised in subprocesses; the happy and flap-recovery paths run in-process
on the forced-CPU test backend.
"""

import json
import subprocess
import sys
import textwrap

import pytest

import long_video_gan_tpu.utils.backend as backend_mod
from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

# Env for subprocess tests: force CPU so jax never touches a real tunnel.
_CPU_ENV = {"JAX_PLATFORMS": "cpu"}


def _run(src: str, timeout=120):
    import os

    env = dict(os.environ, **_CPU_ENV)
    return subprocess.run([sys.executable, "-c", textwrap.dedent(src)],
                          capture_output=True, text=True, timeout=timeout, env=env)


def test_happy_path_returns_devices():
    devices = init_backend_with_watchdog(60.0)
    assert len(devices) >= 1


def test_flap_recovery(tmp_path, monkeypatch):
    # First probe exits 1, second exits 0 (tunnel "came back"); the util must
    # ride through and land the in-process init.
    flag = tmp_path / "came_back"
    monkeypatch.setattr(backend_mod, "_initialized", False)
    monkeypatch.setattr(
        backend_mod, "_PROBE_SRC",
        f"import os,sys; p={str(flag)!r}; seen=os.path.exists(p); "
        f"open(p,'w').write('x'); sys.exit(0 if seen else 1)")
    devices = init_backend_with_watchdog(30.0, deadline=90.0, probe_interval=0.2)
    assert len(devices) >= 1
    assert flag.exists()


def test_dead_tunnel_exits_3_with_diagnosis():
    # Simulated dead tunnel: every probe hangs; expect rc=3, a stderr
    # diagnosis, and the diagnostic JSON line on stdout.
    proc = _run("""
        import json
        import long_video_gan_tpu.utils.backend as b
        b._PROBE_SRC = "import time; time.sleep(60)"
        b.init_backend_with_watchdog(
            2.0, deadline=5.0, probe_interval=0.5,
            diagnostic=lambda: print(json.dumps({"error": "tunnel"}), flush=True))
        print("UNREACHABLE")
    """)
    assert proc.returncode == 3
    assert "UNREACHABLE" not in proc.stdout
    assert "unreachable" in proc.stderr or "aborting" in proc.stderr
    assert json.loads(proc.stdout.strip().splitlines()[-1]) == {"error": "tunnel"}


def test_in_process_hang_exits_3():
    # Watchdog-only mode (no deadline): a hanging in-process init aborts.
    proc = _run("""
        import sys, types
        import long_video_gan_tpu.utils.backend as b
        fake = types.ModuleType("jax")
        def _hang():
            import time; time.sleep(60)
        fake.devices = _hang
        sys.modules["jax"] = fake
        b.init_backend_with_watchdog(2.0)
        print("UNREACHABLE")
    """)
    assert proc.returncode == 3
    assert "UNREACHABLE" not in proc.stdout
    assert "did not complete" in proc.stderr


@pytest.mark.parametrize("cli", ["train_lres.py", "train_sres.py"])
def test_train_cli_backend_init_is_bounded(cli):
    # Regression (round-4 verify finding): main() used to call
    # is_main_process() -> jax.process_index() BEFORE the platform override +
    # watchdog, so a dead tunnel hung the CLI forever with no diagnosis. Every
    # backend-touching API here hangs; the CLI must still abort via its own
    # watchdog (rc=3 + one-line diagnosis) — a timeout instead means some JAX
    # call sneaked in ahead of the watchdog again.
    proc = _run(f"""
        import time
        import jax
        def hang(*a, **k):
            time.sleep(120)
        jax.devices = hang
        jax.process_index = hang
        jax.process_count = hang
        jax.local_devices = hang
        import os, sys
        os.environ["LVG_INIT_TIMEOUT"] = "2"
        os.environ.pop("LVG_PLATFORM", None)
        sys.path.insert(0, "/root/repo")
        sys.argv = ["{cli}", "--dataset", "/nonexistent", "--preset", "tiny"]
        import runpy
        runpy.run_path("/root/repo/{cli}", run_name="__main__")
        print("UNREACHABLE")
    """, timeout=60)
    assert proc.returncode == 3, (proc.returncode, proc.stdout, proc.stderr)
    assert "did not complete" in proc.stderr


def test_bench_emits_diagnostic_json_on_dead_tunnel():
    # bench.py end-to-end with a simulated dead tunnel: last stdout line must
    # be machine-readable with an "error" field (self-describing artifact).
    proc = _run("""
        import sys
        sys.argv = ["bench.py"]
        import long_video_gan_tpu.utils.backend as b
        b._PROBE_SRC = "import time; time.sleep(60)"
        import os
        os.environ["LVG_BENCH_INIT_TIMEOUT"] = "2"
        os.environ["LVG_BENCH_INIT_DEADLINE"] = "5"
        sys.path.insert(0, "/root/repo")
        import bench
        bench.main()
    """)
    assert proc.returncode == 3
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    assert line["error"] == "tpu-tunnel-unreachable"
    assert line["metric"].startswith("sres_synthesis")
    assert line["value"] is None
