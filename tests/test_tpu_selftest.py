"""Harness test for scripts/tpu_selftest.py (the on-device kernel validator).

The real run happens on TPU (`python bench.py --selftest`); here we verify the
harness itself on CPU with a small plan: it passes when the impl agrees with
the reference path, and FAILS when a fault is injected — i.e. the comparator
actually has teeth.
"""

import importlib
import importlib.util
import sys
from pathlib import Path

# `ops/__init__` re-exports the function under the submodule's name; go via
# importlib to get the module object itself.
flr_mod = importlib.import_module("long_video_gan_tpu.ops.filtered_lrelu")

_SPEC = importlib.util.spec_from_file_location(
    "tpu_selftest", Path(__file__).parent.parent / "scripts" / "tpu_selftest.py")
tpu_selftest = importlib.util.module_from_spec(_SPEC)
sys.modules["tpu_selftest"] = tpu_selftest
_SPEC.loader.exec_module(tpu_selftest)

SMALL = dict(frames=2, img_width=64, img_height=36, channel_max=32,
             verbose=False)


def test_selftest_passes_on_agreeing_impl():
    # On CPU, "packed"/"fused" fall back to the composed path unless forced,
    # so "matrix" vs matrix exercises the full harness wiring (geometry
    # harvest, vjp, tolerances) with an impl that must agree.
    assert tpu_selftest.run_selftest(impls=("matrix",), **SMALL)


def test_selftest_detects_injected_fault(monkeypatch):
    orig = flr_mod.filtered_lrelu

    def faulty(x, *args, impl="conv", **kwargs):
        out = orig(x, *args, impl="matrix" if impl == "packed" else impl, **kwargs)
        if impl == "packed":
            out = out * 1.2  # simulated lowering bug in the packed kernel
        return out

    monkeypatch.setattr(flr_mod, "filtered_lrelu", faulty)
    assert not tpu_selftest.run_selftest(impls=("packed",), **SMALL)


def test_selftest_layer_filter_still_has_teeth(monkeypatch):
    # bench.py's pre-headline guard restricts the sweep to one layer index
    # (the previously-miscompiled L3 geometry); the filtered run must still
    # exercise a real geometry and catch a fault there.
    orig = flr_mod.filtered_lrelu

    def faulty(x, *args, impl="conv", **kwargs):
        out = orig(x, *args, impl="matrix" if impl == "packed" else impl, **kwargs)
        if impl == "packed":
            out = out * 1.2
        return out

    monkeypatch.setattr(flr_mod, "filtered_lrelu", faulty)
    assert not tpu_selftest.run_selftest(impls=("packed",), layer_indices=(3,),
                                         **SMALL)
    monkeypatch.setattr(flr_mod, "filtered_lrelu", orig)
    assert tpu_selftest.run_selftest(impls=("matrix",), layer_indices=(3,),
                                     **SMALL)


SMALL_MODEL = dict(segment=2, hr=(128, 72), lr=(32, 18), channel_max=32)


def test_model_selftest_passes_on_agreeing_impl():
    assert tpu_selftest.run_model_selftest(impls=("matrix",), **SMALL_MODEL)


def test_model_selftest_detects_fault(monkeypatch):
    # The generator binds filtered_lrelu at import; patch ITS binding.
    gs = importlib.import_module("long_video_gan_tpu.models.generator_sres")
    orig = gs.filtered_lrelu

    def faulty(x, *args, impl="conv", **kwargs):
        out = orig(x, *args, impl="matrix" if impl == "packed" else impl, **kwargs)
        if impl == "packed":
            out = out * 1.1
        return out

    monkeypatch.setattr(gs, "filtered_lrelu", faulty)
    assert not tpu_selftest.run_model_selftest(impls=("packed",), **SMALL_MODEL)
