"""Test configuration: run everything on a virtual 8-device CPU mesh.

jax.sharding code runs unchanged on CPU, so multi-chip sharding logic gets real
multi-device coverage without TPU hardware (the driver separately dry-runs the
multichip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU explicitly
# so the suite runs on the virtual 8-device host mesh. Initialize the backend
# eagerly (before any test imports torch) — torch-first initialization of the
# TPU plugin can wedge.
jax.config.update("jax_platforms", "cpu")
# Machine-keyed cache dir: /tmp is shared across machine generations on this
# infra and XLA:CPU AOT entries compiled elsewhere fail feature checks at load
# time (cpu_aot_loader SIGILL warnings + wasted load attempts).
import hashlib as _hashlib

_mach = "unknown"
try:
    with open("/proc/cpuinfo") as _f:
        for _line in _f:
            if _line.startswith("flags"):
                _mach = _hashlib.blake2s(_line.encode(), digest_size=6).hexdigest()
                break
except OSError:
    pass
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_tests_{_mach}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native JPEG decoder up front so test_native_jpeg runs instead of
# skipping (production builds it on first use in data/jpeg._load_native; the
# suite should exercise the same artifact it would build).
try:
    from pathlib import Path as _Path

    from long_video_gan_tpu.native.build import build as _build_native

    if not (_Path(_build_native.__code__.co_filename).parent
            / "libjpeg_decoder.so").is_file():
        _build_native(verbose=False)
except Exception as _e:  # missing g++/libjpeg: the test module will skip
    print(f"conftest: native JPEG build unavailable ({_e})")

REFERENCE_DIR = "/root/reference"

# ----------------------------------------------------------------- test tiers
# smoke: full signal in ~6 min on one core (pytest -m smoke) — includes one
#        real (tiny) trainer step, which is most of the time.
# oracle: numerical comparisons against the PyTorch reference checkout.
# slow: heavy compiles (full-size models, multi-step training, Pallas).
_ORACLE_MODULES = {
    "test_augment", "test_bias_act", "test_convert_cli", "test_filtered_lrelu",
    "test_parity_discriminators", "test_parity_lres", "test_parity_sres",
    "test_upfirdn2d", "test_accept_reference",
}
_SLOW_MODULES = {
    "test_parity_lres", "test_parity_sres", "test_parity_discriminators",
    "test_convert_cli", "test_train_steps", "test_pallas_kernel",
    "test_generators", "test_temporal_sharding", "test_multihost",
    "test_pallas_fused", "test_i3d", "test_inception_v3", "test_metrics",
    "test_c3d", "test_accept_reference", "test_tpu_selftest",
    "test_generate_cli",
}

collect_ignore = ["multihost_worker.py"]


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.smoke)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def import_reference(module_name: str):
    """Import a module from the reference checkout as a numerical oracle.

    Shims `pkg_resources` (removed from modern setuptools) which the reference's
    conv2d_gradfix imports for a torch version check.
    """
    import importlib
    import sys
    import types

    if "pkg_resources" not in sys.modules:
        try:
            from packaging.version import parse as _parse
        except Exception:  # pragma: no cover
            def _parse(v):
                return tuple(int(p) for p in v.split("+")[0].split(".") if p.isdigit())
        shim = types.ModuleType("pkg_resources")
        shim.parse_version = _parse
        sys.modules["pkg_resources"] = shim

    sys.path.insert(0, REFERENCE_DIR)
    try:
        return importlib.import_module(module_name)
    finally:
        sys.path.pop(0)


def require_reference():
    """Skip marker for oracle tests that compare against the PyTorch reference.

    The reference checkout is used strictly as a black-box numerical oracle
    (imported read-only, never copied).
    """
    return pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")
