"""End-to-end north-star acceptance harness on stand-in artifacts.

Runs scripts/accept_reference.py exactly as it would run on the released
pickles (reference README.md:29-33) — but with locally-pickled reference
modules and a stub detector path — so the day real artifacts appear the
acceptance is a single, already-exercised invocation (VERDICT r2 missing #2).
"""

import json
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference, import_reference

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference repo not mounted")


def test_accept_reference_on_standins(tmp_path):
    import torch

    # Stand-in "released pickles": the reference's own module classes, random
    # weights, pickled the way the reference's ckpt() persists them.
    ref_lres = import_reference("model.generator_lres")
    ref_sres = import_reference("model.generator_sres")
    torch.manual_seed(0)
    G_l = ref_lres.VideoGenerator()  # released lres config is the default
    G_l.eval().requires_grad_(False)
    # lr must match the stand-in lres's default 36x64 output (the script pipes
    # lres frames into SG3 exactly like generate.py); hr 72x128 keeps the CPU
    # cost of the elementwise comparison small.
    G_s = ref_sres.VideoGenerator(hr_height=72, hr_width=128, lr_height=36,
                                  lr_width=64, temporal_context=2,
                                  latent_z_dim=32, latent_w_dim=32,
                                  margin_size=4, num_fp16_res=0)
    G_s.eval().requires_grad_(False)
    # The persistence decorator records the non-default sres config in
    # G_s.init_kwargs automatically (reference torch_utils/persistence.py:110),
    # exactly as the released pickles carry it.

    lres_pkl = tmp_path / "standin_lres.pkl"
    sres_pkl = tmp_path / "standin_sres.pkl"
    with open(lres_pkl, "wb") as fp:
        pickle.dump(G_l, fp)
    with open(sres_pkl, "wb") as fp:
        pickle.dump(G_s, fp)

    work = tmp_path / "accept"
    result = subprocess.run(
        [sys.executable, "scripts/accept_reference.py",
         "--lres-pkl", str(lres_pkl), "--sres-pkl", str(sres_pkl),
         "--reference", REFERENCE_DIR, "--workdir", str(work),
         "--frames", "4", "--skip-fvd"],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    assert result.returncode == 0, (result.stdout[-3000:], result.stderr[-3000:])

    summary = json.loads((work / "summary.json").read_text())
    assert summary["accepted"] is True
    assert summary["phases"]["convert"]["ok"]
    assert summary["phases"]["lres_fixed_seed"]["ok"]
    assert summary["phases"]["lres_fixed_seed"]["max_abs_err"] <= 2e-3
    assert summary["phases"]["sres_fixed_seed"]["ok"]
    assert summary["phases"]["fvd"]["skipped"] is True
