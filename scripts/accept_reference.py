"""One-command north-star acceptance vs the reference checkpoints.

BASELINE.json's quality/determinism north star ("fixed-seed generation
bit-close to the reference after converting the released pickles; FVD within
2%") is environment-blocked here (no egress: no released pickles, no
pretrained detector weights). This script makes acceptance a single invocation
the moment those artifacts exist:

    python scripts/accept_reference.py \
        --lres-pkl horseback_lres.pkl --sres-pkl horseback_sres.pkl \
        --detector-dir /path/with/i3d.pt --dataset datasets/horseback_0144x0256 \
        [--reference /root/reference] [--workdir out/accept]

Phases (each reported in the final JSON summary):
  1. convert   — both pickles -> arrays-only .lvg checkpoints
                 (convert_checkpoint.py; reference README.md:29-33).
  2. lres      — fixed-seed frame comparison vs the torch reference on CPU:
                 ONE noise stream (numpy seed --seed) is injected into both
                 pipelines (the reference's staged forward and ours), frames
                 compared elementwise. This is the cross-framework version of
                 `generate.py --seed=49 --save-lres`
                 (/root/reference/generate.py:19-90): torch's internal randn
                 stream cannot be reproduced by JAX, so determinism is
                 asserted on identical injected noise, which is the stronger
                 statement (bit-level input control, not seed coincidence).
  3. sres      — same z + same lres window through the reference SG3 stack
                 and ours; frames compared elementwise.
  4. fvd       — calc_metrics.py fvd2048_128f,fvd2048_16f with the converted
                 checkpoints per the protocol at /root/reference/README.md:
                 110-131 (optional: needs --dataset and --detector-dir).

Tested end-to-end in the slow tier with locally-pickled stand-in modules and
a random-weight detector file (tests/test_accept_reference.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import click

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:  # run as `python scripts/accept_reference.py`
    sys.path.insert(0, str(REPO))


def _run(cmd, env=None):
    print("+", " ".join(str(c) for c in cmd), flush=True)
    proc = subprocess.run([str(c) for c in cmd], cwd=str(REPO), env=env,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        print(proc.stderr[-4000:])
        raise RuntimeError(f"command failed (rc={proc.returncode}): {cmd[0]}")
    return proc.stdout


@click.command()
@click.option("--lres-pkl", type=str, required=True, help="Reference lres G_ema pickle")
@click.option("--sres-pkl", type=str, default=None, help="Reference sres G_ema pickle")
@click.option("--detector-dir", type=str, default=None,
              help="Directory holding i3d.pt (pretrained FVD detector)")
@click.option("--dataset", "dataset_dir", type=str, default=None,
              help="Real dataset dir for FVD (e.g. datasets/horseback_0144x0256)")
@click.option("--reference", "reference_dir", type=str, default="/root/reference")
@click.option("--workdir", type=str, default="out/accept")
@click.option("--seed", type=int, default=49, help="Noise seed (reference generate.py default)")
@click.option("--frames", type=int, default=16, help="Frames compared in phases 2-3")
@click.option("--tol", type=float, default=2e-3,
              help="Elementwise tolerance on [-1,1]-scale frames (fp32 CPU both sides)")
@click.option("--max-items", type=int, default=None,
              help="Cap metric items (stand-in testing; full protocol = unset)")
@click.option("--skip-fvd", is_flag=True, default=False)
def main(lres_pkl, sres_pkl, detector_dir, dataset_dir, reference_dir, workdir,
         seed, frames, tol, max_items, skip_fvd):
    import numpy as np

    work = Path(workdir)
    work.mkdir(parents=True, exist_ok=True)
    summary: dict = {"seed": seed, "frames": frames, "tol": tol, "phases": {}}

    # ---- phase 1: convert ------------------------------------------------
    lres_lvg = work / "lres.lvg"
    _run([sys.executable, "convert_checkpoint.py", "--pkl", lres_pkl,
          "--kind", "lres", "--output", lres_lvg, "--reference", reference_dir])
    sres_lvg = None
    if sres_pkl is not None:
        sres_lvg = work / "sres.lvg"
        _run([sys.executable, "convert_checkpoint.py", "--pkl", sres_pkl,
              "--kind", "sres", "--output", sres_lvg, "--reference", reference_dir])
    summary["phases"]["convert"] = {"ok": True, "lres": str(lres_lvg),
                                    "sres": str(sres_lvg) if sres_lvg else None}
    print("[accept] phase 1 OK: converted", flush=True)

    # ---- phase 2: lres fixed-noise frame comparison (CPU) ----------------
    import jax

    jax.config.update("jax_platforms", "cpu")

    import pickle

    import torch

    sys.path.insert(0, reference_dir)
    import jax.numpy as jnp

    from long_video_gan_tpu.io.checkpoint import load_generator
    from long_video_gan_tpu.io.convert_torch import install_reference_unpickle_shims

    install_reference_unpickle_shims()
    with open(lres_pkl, "rb") as fp:
        torch_lres = pickle.load(fp)
    torch_lres.eval().requires_grad_(False)

    G, variables, _ = load_generator(str(lres_lvg))
    rng = np.random.default_rng(seed)
    in_len = G.compute_seq_lengths(frames)[0]
    emb_len = in_len * G.total_temporal_scale
    noise = rng.standard_normal(
        (1, torch_lres.temporal_emb.noise_channels,
         emb_len + torch_lres.temporal_emb.kernel_size - 1)).astype(np.float32)

    import einops

    with torch.no_grad():
        emb_t = torch_lres.temporal_emb.blur(torch.from_numpy(noise))
        ws_t = torch_lres.compute_latent_ws(emb_t, frames)
        ti_t = einops.rearrange(
            torch_lres.w_to_temp_input(einops.rearrange(ws_t.pop(0), "n c t -> (n t) c")),
            "(n t) c -> n c t", t=in_len)
        want_lr = torch_lres.synthesize_video(ti_t, ws_t, frames).numpy()
    got_lr = np.asarray(G.apply(variables, 1, frames, noise=jnp.asarray(noise)))

    lres_max_err = float(np.max(np.abs(got_lr - want_lr)))
    lres_ok = bool(got_lr.shape == want_lr.shape and lres_max_err <= tol)
    summary["phases"]["lres_fixed_seed"] = {
        "ok": lres_ok, "max_abs_err": lres_max_err,
        "shape": list(got_lr.shape)}
    print(f"[accept] phase 2 {'OK' if lres_ok else 'FAIL'}: lres max|err| = "
          f"{lres_max_err:.2e} (tol {tol})", flush=True)

    # ---- phase 3: sres fixed-z frame comparison (CPU) ---------------------
    if sres_pkl is not None:
        with open(sres_pkl, "rb") as fp:
            torch_sres = pickle.load(fp)
        torch_sres.eval().requires_grad_(False)

        Gs, s_vars, _ = load_generator(str(sres_lvg))
        ctx = Gs.temporal_context
        # Edge-padded lres window, reference segment convention.
        pad = np.concatenate([np.repeat(want_lr[:, :, :1], ctx, axis=2), want_lr,
                              np.repeat(want_lr[:, :, -1:], ctx, axis=2)], axis=2)
        window = pad[:, :, :frames + 2 * ctx].astype(np.float32)
        z = rng.standard_normal((1, Gs.latent_z_dim)).astype(np.float32)
        with torch.no_grad():
            want_hr = torch_sres.SG3(torch.from_numpy(z),
                                     torch.from_numpy(window)).numpy()
        got_hr = np.asarray(Gs.apply(s_vars, jnp.asarray(window), z=jnp.asarray(z)))
        sres_max_err = float(np.max(np.abs(got_hr - want_hr)))
        sres_ok = bool(got_hr.shape == want_hr.shape and sres_max_err <= tol)
        summary["phases"]["sres_fixed_seed"] = {
            "ok": sres_ok, "max_abs_err": sres_max_err,
            "shape": list(got_hr.shape)}
        print(f"[accept] phase 3 {'OK' if sres_ok else 'FAIL'}: sres max|err| = "
              f"{sres_max_err:.2e} (tol {tol})", flush=True)

    # ---- phase 4: FVD protocol -------------------------------------------
    if not skip_fvd and dataset_dir is not None:
        env = dict(os.environ)
        if detector_dir is not None:
            env["LVG_DETECTOR_DIR"] = detector_dir
        metrics_out = work / "metrics.jsonl"
        cmd = [sys.executable, "calc_metrics.py",
               "-m", "fvd2048_128f", "-m", "fvd2048_16f",
               "--lres", lres_lvg, "--dataset", dataset_dir,
               "--output", metrics_out, "--seed", seed]
        if sres_lvg is not None:
            cmd += ["--sres", sres_lvg]
        if max_items is not None:
            cmd += ["--max-items", max_items]
        _run(cmd, env=env)
        results = [json.loads(line) for line in
                   metrics_out.read_text().splitlines() if line.strip()]
        summary["phases"]["fvd"] = {"ok": True, "results": results}
        print(f"[accept] phase 4 OK: {results}", flush=True)
    else:
        summary["phases"]["fvd"] = {"ok": None, "skipped": True}

    ok = all(p.get("ok") is not False for p in summary["phases"].values())
    summary["accepted"] = ok
    (work / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
