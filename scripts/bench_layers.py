"""Per-layer time budget of the sres synthesis stack on real TPU.

For every layer of the production 144x256 plan, times (a) the modulated conv
and (b) the filtered_lrelu, per resampling impl, at the exact shapes/dtypes the
model uses (segment 16 + 2*4 context -> 24 frames). Prints a table + totals.

Usage: python scripts/bench_layers.py [--impls matrix,fused] [--iters 5]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="matrix,fused")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--segment", type=int, default=24)  # frames incl. context
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from long_video_gan_tpu.models.generator_sres import (
        SynthesisNetwork, modulated_conv2d)
    from long_video_gan_tpu.ops.filtered_lrelu import filtered_lrelu

    # Build the real layer stack once to harvest exact per-layer configs.
    net = SynthesisNetwork(w_dim=512, img_width=256, img_height=144,
                           img_channels=3, cond_channels=27, num_fp16_res=4)
    plan = net.plan()
    conds = [jnp.zeros((1, 27, int(plan["sizes_y"][max(i - 1, 0)]),
                        int(plan["sizes_x"][max(i - 1, 0)])), jnp.float32)
             for i in range(net.num_ws)]
    variables = jax.eval_shape(
        lambda: net.init(jax.random.key(0), jnp.zeros((1, net.num_ws, 512)), conds))
    variables = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables)
    layers = net.bind(variables).layers

    rng = np.random.default_rng(0)
    frames = args.segment
    impls = args.impls.split(",")

    R = 8  # on-device repeats per call: amortizes the ~26 ms axon round-trip

    def timeit(fn, *xs):
        """Net per-op seconds via R on-device repeats + control subtraction.

        SERIAL dependency: iteration i's input is scaled by a scalar derived
        from iteration i-1's OUTPUT. The round-2 harness used x*(1+i*eps),
        which XLA defeats for (partially) LINEAR ops by factoring the scalar
        out and hoisting the op: op(x*s) == s*op(x) — the resample matmuls and
        the modulated conv are linear in x, so their cost vanished from the
        loop and the round-2 per-layer table under-measured them.
        """
        x0 = xs[0]

        @jax.jit
        def run(*xs):
            def body(i, carry):
                s, seed = carry
                xi = xs[0] * (1.0 + seed * 1e-12).astype(x0.dtype)
                out = jnp.sum(fn(xi, *xs[1:]).astype(jnp.float32))
                return (s + out, out * 1e-20)
            return jax.lax.fori_loop(0, R, body,
                                     (jnp.float32(0), jnp.float32(0)))[0]

        @jax.jit
        def ctrl(*xs):
            def body(i, carry):
                s, seed = carry
                xi = xs[0] * (1.0 + seed * 1e-12).astype(x0.dtype)
                out = jnp.sum(xi[..., :1].astype(jnp.float32))
                return (s + out, out * 1e-20)
            return jax.lax.fori_loop(0, R, body,
                                     (jnp.float32(0), jnp.float32(0)))[0]

        def med(f):
            float(f(*xs))
            ts = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                float(f(*xs))
                ts.append(time.perf_counter() - t0)
            return sorted(ts)[len(ts) // 2]

        return max(0.0, (med(run) - med(ctrl)) / R)

    totals = {impl: 0.0 for impl in impls}
    conv_total = 0.0
    print(f"{'L':>2} {'shape in':>14} {'ch':>9} {'up':>2} {'dn':>2} {'dt':>8} "
          f"{'conv ms':>8} " + " ".join(f"{('flr:'+i):>10}" for i in impls))
    for li, layer in enumerate(layers):
        # layer.in_channels already includes the per-layer cond concat (27ch).
        cin = layer.in_channels
        k = layer.kernel
        wdt = jnp.bfloat16 if layer.use_fp16 else jnp.float32
        h_in, w_in = int(layer.in_size[1]), int(layer.in_size[0])
        x = jnp.asarray(rng.standard_normal((frames, cin, h_in, w_in)), wdt)
        w = jnp.asarray(rng.standard_normal((layer.out_channels, cin, k, k)),
                        jnp.float32)
        s = jnp.asarray(rng.standard_normal((frames, cin)), jnp.float32)

        conv = jax.jit(lambda x, w, s: modulated_conv2d(
            x, w, s, demodulate=not layer.is_torgb, padding=k - 1))
        t_conv = timeit(conv, x, w, s)
        conv_total += t_conv

        h_c, w_c = h_in + k - 1, w_in + k - 1
        xc = jnp.asarray(rng.standard_normal((frames, layer.out_channels, h_c, w_c)), wdt)
        b = jnp.asarray(rng.standard_normal(layer.out_channels), jnp.float32)
        row = ""
        for impl in impls:
            flr = jax.jit(lambda x, b, impl=impl: filtered_lrelu(
                x, layer.up_filter, layer.down_filter, b.astype(x.dtype),
                up=layer.up_factor, down=layer.down_factor,
                padding=tuple(layer.padding),
                gain=1.0 if layer.is_torgb else float(np.sqrt(2.0)),
                slope=1.0 if layer.is_torgb else 0.2,
                clamp=layer.conv_clamp, impl=impl))
            try:
                t = timeit(flr, xc, b)
            except Exception as e:
                t = float("nan")
                print(f"  [{impl} L{li} failed: {str(e)[:120]}]")
            totals[impl] += 0.0 if np.isnan(t) else t
            row += f" {t*1000:10.2f}"
        print(f"{li:>2} {h_in:>5}x{w_in:<6} {cin:>4}->{layer.out_channels:<4} "
              f"{layer.up_factor:>2} {layer.down_factor:>2} "
              f"{str(np.dtype(wdt).name)[:4]:>8} {t_conv*1000:8.2f}" + row)

    print(f"\nconv total: {conv_total*1000:.1f} ms")
    for impl in impls:
        print(f"filtered_lrelu total [{impl}]: {totals[impl]*1000:.1f} ms")


if __name__ == "__main__":
    main()
