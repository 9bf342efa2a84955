"""Trace-summary helpers (utils/profiling.py)."""

from long_video_gan_tpu.utils.profiling import categorize_hlo_op, print_op_summary


def test_categorize_hlo_op():
    assert categorize_hlo_op("%convolution.42") == "conv"
    assert categorize_hlo_op("%dot.7") == "dot (resample/mapping)"
    assert categorize_hlo_op("%custom-call.3 mosaic") == "pallas filtered_lrelu"
    assert categorize_hlo_op("flr_packed_fwd") == "pallas filtered_lrelu"
    assert categorize_hlo_op("%fusion.12") == "fusion (elementwise/reduce)"
    assert categorize_hlo_op("%copy.1") == "relayout"
    assert categorize_hlo_op("%dynamic-slice.4") == "slice/concat/pad/gather"
    assert categorize_hlo_op("%rng.0") == "other"


def test_print_op_summary_totals(capsys):
    rows = [("%convolution.1", 0.010), ("%dot.2", 0.005), ("%convolution.1", 0.010)]
    print_op_summary(rows, top=5)
    out = capsys.readouterr().out
    assert "device time total = 25.0 ms" in out
    assert "conv" in out and "80.0%" in out
