"""On-device numerical validation of the production Pallas kernels.

CPU CI exercises the fused/packed filtered_lrelu kernels in interpret mode
(tests/test_pallas_{fused,packed}.py); this script asserts the REAL Mosaic
lowering on the attached TPU. For every distinct production layer geometry of
the 144x256 sres plan it compares `packed` and `fused` against the composed
`matrix` path — forward AND custom-VJP (grads wrt x and b) — at the exact
shapes/dtypes/filters the model runs. A Mosaic lowering bug (bf16 rounding,
VMEM window clipping) would pass CPU CI and still corrupt production output;
this is the runtime check that catches it. Reference analog: the dual
CUDA/reference impls compared at runtime
(/root/reference/torch_utils/ops/filtered_lrelu.py:121-153).

Usage:
    python scripts/tpu_selftest.py [--impls packed,fused] [--frames 24]
Prints one line per (geometry, impl); exits 0 iff everything passed.
Also callable as `python bench.py --selftest`.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# (forward, grad) max-abs-error tolerances relative to the reference output's
# max magnitude. bf16 has ~3 decimal digits; the two paths round at different
# points (the kernel keeps VMEM intermediates in f32, the composed path
# round-trips through bf16 between ops), so a few bf16 ulps of headroom.
TOLS = {"bfloat16": (0.03, 0.06), "float32": (1e-4, 1e-3)}


def run_selftest(impls=("packed", "fused"), frames: int = 24,
                 verbose: bool = True, img_width: int = 256,
                 img_height: int = 144, channel_max: int = 512,
                 layer_indices=None) -> bool:
    """Validate kernel impls against the composed `matrix` oracle on-device.

    `layer_indices` restricts the sweep to those production layer indices —
    used by bench.py's pre-headline guard, which checks the single geometry
    (L3, 31x38 conv input, up4, bf16) where a Mosaic scratch-reuse miscompile
    silently corrupted output for two rounds (BASELINE.md round 4)."""
    import importlib

    import jax
    import jax.numpy as jnp

    from long_video_gan_tpu.models.generator_sres import SynthesisNetwork

    # Via importlib: ops/__init__ re-exports the function under the
    # submodule's name. Late-bound so test fault injection is honored.
    flr_mod = importlib.import_module("long_video_gan_tpu.ops.filtered_lrelu")
    filtered_lrelu = flr_mod.filtered_lrelu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # Real production layer stack (BASELINE.md round-3 per-layer table) —
    # harvest the exact filter taps / paddings / factors per layer.
    net = SynthesisNetwork(w_dim=512, img_width=img_width, img_height=img_height,
                           img_channels=3, cond_channels=27, num_fp16_res=4,
                           channel_max=channel_max)
    plan = net.plan()
    conds = [jnp.zeros((1, 27, int(plan["sizes_y"][max(i - 1, 0)]),
                        int(plan["sizes_x"][max(i - 1, 0)])), jnp.float32)
             for i in range(net.num_ws)]
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, net.num_ws, 512)), conds))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    layers = net.bind(variables).layers

    rng = np.random.default_rng(0)
    all_ok = True
    seen = set()
    for li, layer in enumerate(layers):
        if layer_indices is not None and li not in layer_indices:
            continue
        if layer.up_factor == 1 and layer.down_factor == 1:
            continue  # trivial resample short-circuits to the composed path
        h_in, w_in = int(layer.in_size[1]), int(layer.in_size[0])
        h_c, w_c = h_in + layer.kernel - 1, w_in + layer.kernel - 1
        wdt = jnp.bfloat16 if layer.use_fp16 else jnp.float32
        sig = (h_c, w_c, layer.out_channels, layer.up_factor, layer.down_factor,
               tuple(layer.padding), str(np.dtype(wdt)),
               np.asarray(layer.up_filter).shape, np.asarray(layer.down_filter).shape)
        if sig in seen:
            continue  # identical geometry already validated
        seen.add(sig)

        x = jnp.asarray(rng.standard_normal((frames, layer.out_channels, h_c, w_c)), wdt)
        b = jnp.asarray(rng.standard_normal(layer.out_channels), jnp.float32)

        def make(impl):
            def f(x, b):
                return filtered_lrelu(
                    x, layer.up_filter, layer.down_filter, b.astype(x.dtype),
                    up=layer.up_factor, down=layer.down_factor,
                    padding=tuple(layer.padding),
                    gain=1.0 if layer.is_torgb else float(np.sqrt(2.0)),
                    slope=1.0 if layer.is_torgb else 0.2,
                    clamp=layer.conv_clamp, impl=impl)

            @jax.jit
            def fwd_and_grads(x, b, cot):
                out, vjp = jax.vjp(f, x, b)
                gx, gb = vjp(cot)
                return out, gx, gb

            return fwd_and_grads

        # Build the cotangent at the true output shape/dtype.
        ref_run = make("matrix")
        try:
            probe = jax.eval_shape(
                lambda x, b: filtered_lrelu(
                    x, layer.up_filter, layer.down_filter, b.astype(x.dtype),
                    up=layer.up_factor, down=layer.down_factor,
                    padding=tuple(layer.padding),
                    gain=1.0 if layer.is_torgb else float(np.sqrt(2.0)),
                    slope=1.0 if layer.is_torgb else 0.2,
                    clamp=layer.conv_clamp, impl="matrix"), x, b)
            cot = jnp.asarray(rng.standard_normal(probe.shape), probe.dtype)
        except Exception as e:
            print(f"L{li} geometry probe failed: {e}")
            all_ok = False
            continue

        # The composed-oracle's XLA matmuls would otherwise run at the TPU
        # default (one-pass bf16) precision, making the REFERENCE the least
        # precise f32 path in the comparison (observed: uniform ~3e-3 "errors"
        # on every f32 row, identical for packed and fused). The kernels'
        # Mosaic dots accumulate in f32; hold the oracle to the same bar.
        with jax.default_matmul_precision("highest"):
            out_ref, gx_ref, gb_ref = jax.device_get(ref_run(x, b, cot))
        ftol, gtol = TOLS[str(np.dtype(wdt))]

        for impl in impls:
            try:
                out, gx, gb = jax.device_get(make(impl)(x, b, cot))
            except Exception as e:
                print(f"L{li} {h_c}x{w_c} up{layer.up_factor} {impl}: "
                      f"FAIL (raised: {str(e)[:140]})")
                all_ok = False
                continue
            checks = []
            for name, got, want, tol in (
                    ("fwd", out, out_ref, ftol),
                    ("d_x", gx, gx_ref, gtol),
                    ("d_b", gb, gb_ref, gtol)):
                got = np.asarray(got, np.float32)
                want = np.asarray(want, np.float32)
                scale = float(np.max(np.abs(want))) or 1.0
                err = float(np.max(np.abs(got - want)))
                ok = err <= tol * scale
                checks.append((name, err / scale, ok))
                all_ok &= ok
            status = " ".join(f"{n}={e:.1e}{'' if ok else '<FAIL>'}"
                              for n, e, ok in checks)
            verdict = "ok " if all(ok for *_, ok in checks) else "FAIL"
            if verbose:
                print(f"L{li:>2} {h_c:>3}x{w_c:<3} ch{layer.out_channels:<4} "
                      f"up{layer.up_factor} dn{layer.down_factor} "
                      f"{str(np.dtype(wdt))[:8]:>8} {impl:>6}: {verdict} {status}",
                      flush=True)

    print(f"tpu_selftest: {'PASS' if all_ok else 'FAIL'} "
          f"({len(seen)} distinct geometries x {len(impls)} impls, fwd+VJP)")
    return all_ok


def run_model_selftest(impls=("packed", "fused"), segment: int = 16,
                       tol: float = 0.05, hr=(256, 144), lr=(64, 36),
                       channel_max: int = 512) -> bool:
    """Whole-model check: one full sres segment synthesized with each kernel
    policy must match the composed `matrix` policy end-to-end (same device,
    same params/inputs). Catches accumulation/layout effects a per-layer
    comparison can miss. Tolerance is relative max-abs error on the final
    f32 video (the bf16 stack gives each policy its own rounding points)."""
    import jax
    import jax.numpy as jnp

    from long_video_gan_tpu.models.generator_sres import VideoGenerator

    context = 4
    rng = np.random.default_rng(0)
    lr_shape = (1, 3, segment + 2 * context, lr[1], lr[0])
    lr_video = jnp.asarray(rng.standard_normal(lr_shape).astype(np.float32) * 0.2)

    def synth(impl):
        G = VideoGenerator(hr_height=hr[1], hr_width=hr[0], lr_height=lr[1],
                           lr_width=lr[0], temporal_context=context,
                           num_fp16_res=4, channel_max=channel_max,
                           resample_impl=impl)
        shapes = jax.eval_shape(
            lambda: G.init({"params": jax.random.key(0), "noise": jax.random.key(1)},
                           jnp.zeros(lr_shape, jnp.float32)))
        fill_rng = np.random.default_rng(7)

        def fill(path, s):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if "ema" in name or "magnitude" in name:
                return np.ones(s.shape, s.dtype)
            if np.issubdtype(s.dtype, np.floating):
                return (fill_rng.standard_normal(s.shape) * 0.1).astype(s.dtype)
            return np.zeros(s.shape, s.dtype)

        variables = jax.tree_util.tree_map_with_path(fill, shapes)
        z = jnp.asarray(np.random.default_rng(3).standard_normal(
            (1, G.latent_z_dim)).astype(np.float32))
        return np.asarray(jax.jit(lambda v, w, z: G.apply(v, w, z=z))(
            variables, lr_video, z), np.float32)

    ref = synth("matrix")
    scale = float(np.max(np.abs(ref))) or 1.0
    all_ok = True
    for impl in impls:
        got = synth(impl)
        err = float(np.max(np.abs(got - ref))) / scale
        ok = err <= tol
        all_ok &= ok
        print(f"model selftest [{impl} vs matrix], {segment}-frame segment: "
              f"rel_err={err:.2e} {'ok' if ok else '<FAIL>'}", flush=True)
    return all_ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="packed,fused")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--skip-model", action="store_true",
                    help="skip the whole-model segment comparison")
    args = ap.parse_args()

    from long_video_gan_tpu.utils.backend import init_backend_with_watchdog

    init_backend_with_watchdog(float(os.environ.get("LVG_INIT_TIMEOUT", "120")))
    impls = tuple(args.impls.split(","))
    ok = run_selftest(impls, args.frames)
    if not args.skip_model:
        ok = run_model_selftest(impls) and ok
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
