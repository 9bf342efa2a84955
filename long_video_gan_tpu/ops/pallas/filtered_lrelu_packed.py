"""Pallas TPU kernel v4: lane-packed fused filtered_lrelu.

Same math as the v3 whole-image kernel (filtered_lrelu_fused.py): for one
image X [H, W],  out = Ad @ act( Au @ X @ Bu^T ) @ Bd^T  with the banded
up/down FIR operators of ops/upfirdn2d._axis_matrix. v3's economics problem
(BASELINE.md round-3 budget): W rides the 128-lane axis, so every W-ish dim
pays ceil(w/128) lane padding — e.g. the hot 92x148 layers execute 256/148 =
1.73x the lanes their matmuls need. v4 packs k images side by side along the
LANE axis at raw stride w, so lane occupancy is ~1 for any w:

    xs  = [X_0 | X_1 | ... | X_{k-1}]                 # packed in VMEM
    t1  = Au @ xs                                      # H ops act on rows:
    u   = t1 @ blockdiag(Bu)^T                         #   packing-transparent
    z   = act(u)
    out = Ad @ ( z @ blockdiag(Bd)^T )                 # then unpack columns

Both H-axis operators apply to the packed layout natively (they act on rows;
packed columns are independent). Only the W-axis operators become
block-diagonal, and the existing 128-tile band-window machinery skips their
zero tiles automatically — executed-FLOP cut at the production 144x256 plan
is ~17% vs v3 (k=4-8). g super-images additionally stack along SUBLANES
(v3's row-stack scratch) so the two big W-axis matmuls keep M = g*hup.

Two designs that measured SLOWER than v3 on v5e, kept here as negative
results: (a) lane packing with XLA-side transposes — the kernel itself hit
187 TF/s but XLA lowered the pack to 4 full relayout passes (bias fusion,
physical transpose, reshape relayout, lane pad) costing ~8 ms per hot layer,
2x the kernel time; (b) lane packing without sublane stacking (g=1) — with
M = hup ~ 336 the W-pass matmuls are too small to feed the MXU (~69 TF/s).
v4 therefore packs INSIDE the kernel: blocks arrive in the natural
[g*k, h, w] layout and k static lane-offset VMEM copies (cheap VPU work on
the smallest tensors in the op, pre-supersampling) build the packed scratch.

Reference semantics: torch_utils/ops/filtered_lrelu.py:56-116 (shape/gain
contract), filtered_lrelu.cu:139- (the register-resident supersampled buffer
this kernel keeps in VMEM instead). Backward is the same adjoint as v3, one
packed kernel that recomputes u on-chip; first-order only (structurally
guarded via _first_order_only).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..upfirdn2d import parse_padding
from .filtered_lrelu_fused import (
    _act_factory,
    _act_grad_factory,
    _banded_flops,
    _banded_lhs_mm,
    _banded_rhs_mm,
    _ceil,
    _first_order_only,
    _operators,
)


def _packed_vmem_budget_bytes() -> int:
    """Per-grid-step VMEM budget (env-tunable: LVG_PACKED_VMEM_MB).

    Default from an end-to-end bench.py sweep on v5e (frames/s at chain 8):
    16 MB 165.3, 24 MB 176.8, **32 MB 179.9**, 48 MB 171.8, 64 MB 173.7,
    96 MB 173.9 — smaller grid blocks overlap better with neighbouring ops
    until k/g collapse below MXU-feeding sizes."""
    return int(float(os.environ.get("LVG_PACKED_VMEM_MB", "32")) * (1 << 20))


def _block_diag(mat: np.ndarray, k: int) -> np.ndarray:
    o, i = mat.shape
    out = np.zeros((k * o, k * i), np.float32)
    for j in range(k):
        out[j * o:(j + 1) * o, j * i:(j + 1) * i] = mat
    return out


def _candidates(env_k: str):
    """(candidate ks, forced?) — a forced k bypasses the VMEM-budget gate."""
    force_k = os.environ.get(env_k)
    if force_k:
        return [int(force_k)], True
    return [8, 6, 4, 3, 2, 1], False


def _pick_g(per_super_bytes: int, fixed_bytes: int, hup: int) -> int:
    """Super-images stacked per grid step: enough that the W-pass M (= g*hup)
    feeds the MXU, within the remaining VMEM (env-forceable: LVG_PACKED_G)."""
    force_g = os.environ.get("LVG_PACKED_G")
    if force_g:
        return int(force_g)
    budget = _packed_vmem_budget_bytes()
    g = max(1, int((budget - fixed_bytes) // max(per_super_bytes, 1)))
    # Past M ~ 2048 the matmuls gain nothing and bigger blocks hurt
    # pipelining; cap images-per-step like v3 did.
    while g > 1 and (g - 1) * hup >= 2048:
        g -= 1
    return min(g, 8)


@functools.lru_cache(maxsize=256)
def _packed_fwd_plan(h, w, up, down, padding, fu_taps, fd_taps, itemsize):
    """Pick k (images lane-packed per super-image) and g (super-images
    sublane-stacked per grid step), and build the padded operators. Static
    per shape/dtype: k scored by executed banded FLOPs per image among
    candidates whose block-diagonal operators fit the operator share of the
    VMEM budget; g then fills the rest of the budget."""
    au, bu, ad, bd = _operators(h, w, up, down, padding, fu_taps, fd_taps)
    hu, wu = au.shape[0], bu.shape[0]
    ho, wo = ad.shape[0], bd.shape[0]
    hup = _ceil(hu, 16)
    wp = _ceil(w, 128)
    wop = _ceil(wo, 128)
    msize = itemsize if itemsize == 2 else 4
    op_budget = _packed_vmem_budget_bytes() // 2

    best = None
    cands, forced = _candidates("LVG_PACKED_K")
    for k in cands:
        kwp = _ceil(k * w, 128)
        kwup = _ceil(k * wu, 128)
        kwop = _ceil(k * wo, 128)
        ops_bytes = ((hup * h + ho * hup) + (kwp * kwup + kwup * kwop)) * msize
        if ops_bytes > op_budget and k != 1 and not forced:
            continue
        au_np = np.pad(au, [(0, hup - hu), (0, 0)])
        butP = np.pad(_block_diag(bu, k).T, [(0, kwp - k * w), (0, kwup - k * wu)])
        ad_np = np.pad(ad, [(0, 0), (0, hup - hu)])
        bdtP = np.pad(_block_diag(bd, k).T, [(0, kwup - k * wu), (0, kwop - k * wo)])
        flops = (_banded_flops(au_np, False, kwp) + _banded_flops(butP, True, hup)
                 + _banded_flops(bdtP, True, hup) + _banded_flops(ad_np, False, kwop))
        per_img = flops / k
        if best is None or per_img < best[0] * 0.999:
            best = (per_img, k, au_np, butP, ad_np, bdtP, flops, ops_bytes)
    per_img, k, au_np, butP, ad_np, bdtP, flops, ops_bytes = best
    kwp, kwup = butP.shape
    kwop = bdtP.shape[1]
    hpad = _ceil(h, 16)
    per_super = (
        2 * k * (h * wp + ho * wop) * itemsize            # in/out double-buffered
        + hpad * kwp * itemsize                           # per-si staging slab
        + hup * kwp * msize                               # t1 scratch rows
        + hup * kwup * (4 + msize)                        # u (f32) + z
        + hup * kwop * 4                                   # t3 rows (f32)
    )
    g = _pick_g(per_super, ops_bytes, hup)
    return dict(k=k, g=g, au=au_np, but=butP, ad=ad_np, bdt=bdtP, hu=hu,
                wu=wu, ho=ho, wo=wo, hup=hup, flops=flops * g)


@functools.lru_cache(maxsize=256)
def _packed_bwd_plan(h, w, up, down, padding, fu_taps, fd_taps, itemsize):
    """Same for the backward kernel (larger working set -> its own k, g)."""
    au, bu, ad, bd = _operators(h, w, up, down, padding, fu_taps, fd_taps)
    hu, wu = au.shape[0], bu.shape[0]
    ho, wo = ad.shape[0], bd.shape[0]
    hup = _ceil(hu, 16)
    wp = _ceil(w, 128)
    wop = _ceil(wo, 128)
    msize = itemsize if itemsize == 2 else 4
    op_budget = _packed_vmem_budget_bytes() // 2

    best = None
    cands, forced = _candidates("LVG_PACKED_K")
    for k in cands:
        kwp = _ceil(k * w, 128)
        kwup = _ceil(k * wu, 128)
        kwop = _ceil(k * wo, 128)
        ops_bytes = ((hup * h + h * hup + hup * ho)
                     + (kwp * kwup + kwup * kwp + kwop * kwup)) * msize
        if ops_bytes > op_budget and k != 1 and not forced:
            continue
        au_np = np.pad(au, [(0, hup - hu), (0, 0)])
        aut_np = np.pad(au.T, [(0, 0), (0, hup - hu)])
        adt_np = np.pad(ad.T, [(0, hup - hu), (0, 0)])
        butP = np.pad(_block_diag(bu, k).T, [(0, kwp - k * w), (0, kwup - k * wu)])
        buP = np.pad(_block_diag(bu, k), [(0, kwup - k * wu), (0, kwp - k * w)])
        bdP = np.pad(_block_diag(bd, k), [(0, kwop - k * wo), (0, kwup - k * wu)])
        flops = (_banded_flops(au_np, False, kwp) + _banded_flops(butP, True, hup)
                 + _banded_flops(adt_np, False, kwop) + _banded_flops(bdP, True, hup)
                 + _banded_flops(buP, True, hup) + _banded_flops(aut_np, False, kwp))
        per_img = flops / k
        if best is None or per_img < best[0] * 0.999:
            best = (per_img, k, au_np, aut_np, adt_np, butP, buP, bdP, flops,
                    ops_bytes)
    per_img, k, au_np, aut_np, adt_np, butP, buP, bdP, flops, ops_bytes = best
    kwp, kwup = butP.shape
    kwop = bdP.shape[0]
    hpad = _ceil(h, 16)
    hopad = _ceil(ho, 16)
    per_super = (
        2 * k * (2 * h * wp + ho * wop) * itemsize        # x, dx, dy streams
        + (hpad * kwp + hopad * kwop) * itemsize          # per-si staging slabs
        + 2 * hup * kwp * msize                           # t1, dt1 rows
        + hup * kwup * (3 * 4 + msize)                    # u, g, dz (f32) + du
        + hup * kwop * msize                               # s1 rows
    )
    g = _pick_g(per_super, ops_bytes, hup)
    return dict(k=k, g=g, au=au_np, aut=aut_np, adt=adt_np, but=butP, bu=buP,
                bd=bdP, hu=hu, wu=wu, ho=ho, wo=wo, hup=hup, flops=flops * g)


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "gain", "slope", "clamp",
                     "fu_taps", "fd_taps"),
)
def _packed_fwd(x, *, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = x.shape
    plan = _packed_fwd_plan(h, w, up, down, padding, fu_taps, fd_taps,
                            x.dtype.itemsize)
    k, g, hup, ho, wo = plan["k"], plan["g"], plan["hup"], plan["ho"], plan["wo"]
    au_np, but_np, ad_np, bdt_np = plan["au"], plan["but"], plan["ad"], plan["bdt"]
    kwp, kwup = but_np.shape
    kwop = bdt_np.shape[1]
    act = _act_factory(float(gain), float(slope),
                       None if clamp is None else float(clamp))

    mat_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = x.dtype
    au_j = jnp.asarray(au_np, mat_dtype)
    but_j = jnp.asarray(but_np, mat_dtype)
    ad_j = jnp.asarray(ad_np, mat_dtype)
    bdt_j = jnp.asarray(bdt_np, mat_dtype)

    kg = k * g
    bp = (b + kg - 1) // kg * kg
    if bp != b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])

    hpad = _ceil(h, 16)

    def kernel(x_ref, au_ref, but_ref, ad_ref, bdt_ref, o_ref, xs_ref, t1_ref):
        # Blocks arrive in the natural [g*k, h, w] layout; packing happens
        # in VMEM: k static lane-offset copies per super-image (the cheapest
        # tensors in the op — pre-supersampling), then every matmul runs on
        # the lane-dense packed layout. Per-super-image H-passes row-stack
        # into the t1 scratch; the two big W-axis matmuls + activation run
        # batched over all g super-images (M = g*hup). Lane-pad zeros are
        # exact: act keeps 0 -> 0 and the operators' zero rows/cols
        # contribute nothing.
        #
        # Each si stages into its OWN sublane-aligned slab (rows si*hpad..):
        # reusing one staging buffer across si miscompiles on real Mosaic —
        # the first si's consuming matmul reads the buffer before that si's
        # staging stores land (observed v5e, bf16, small single-lane-tile
        # plans: selftest L3/L4 fwd rel_err ~1; interpret mode was exact).
        # Disjoint per-si regions sidestep the ordering bug at ~2x staging
        # VMEM, which the plan accounts for.
        for si in range(g):
            r0 = si * hpad
            if kwp != k * w:
                xs_ref[r0:r0 + h, k * w:] = jnp.zeros((h, kwp - k * w), x_ref.dtype)
            for j in range(k):
                xs_ref[r0:r0 + h, j * w:(j + 1) * w] = x_ref[si * k + j]
            t1 = _banded_lhs_mm(au_ref, au_np, xs_ref[r0:r0 + h, :], hup)
            t1_ref[si * hup:(si + 1) * hup, :] = t1.astype(mat_dtype)
        u = _banded_rhs_mm(t1_ref[...], but_ref, but_np, kwup)
        z = act(u).astype(mat_dtype)
        t3 = _banded_rhs_mm(z, bdt_ref, bdt_np, kwop)
        for si in range(g):
            op = _banded_lhs_mm(
                ad_ref, ad_np, t3[si * hup:(si + 1) * hup, :].astype(mat_dtype),
                ho).astype(out_dtype)
            for j in range(k):
                o_ref[si * k + j] = op[:, j * wo:(j + 1) * wo]

    out = pl.pallas_call(
        kernel,
        grid=(bp // kg,),
        in_specs=[
            pl.BlockSpec((kg, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hup, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kwp, kwup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ho, hup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kwup, kwop), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kg, ho, wo), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, ho, wo), out_dtype),
        scratch_shapes=[pltpu.VMEM((g * hpad, kwp), x.dtype),
                        pltpu.VMEM((g * hup, kwp), mat_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=plan["flops"] * (bp // kg),
            bytes_accessed=bp * (h * w + ho * wo) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, au_j, but_j, ad_j, bdt_j)
    return out[:b]


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "gain", "slope", "clamp",
                     "fu_taps", "fd_taps"),
)
def _packed_bwd(x, dy, *, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = x.shape
    plan = _packed_bwd_plan(h, w, up, down, padding, fu_taps, fd_taps,
                            x.dtype.itemsize)
    k, g, hup, ho, wo = plan["k"], plan["g"], plan["hup"], plan["ho"], plan["wo"]
    au_np, aut_np, adt_np = plan["au"], plan["aut"], plan["adt"]
    but_np, bu_np, bd_np = plan["but"], plan["bu"], plan["bd"]
    kwp, kwup = but_np.shape
    kwop = bd_np.shape[0]
    act_grad = _act_grad_factory(float(gain), float(slope),
                                 None if clamp is None else float(clamp))

    mat_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    out_dtype = x.dtype
    au_j = jnp.asarray(au_np, mat_dtype)
    aut_j = jnp.asarray(aut_np, mat_dtype)
    adt_j = jnp.asarray(adt_np, mat_dtype)
    but_j = jnp.asarray(but_np, mat_dtype)
    bu_j = jnp.asarray(bu_np, mat_dtype)
    bd_j = jnp.asarray(bd_np, mat_dtype)

    kg = k * g
    bp = (b + kg - 1) // kg * kg
    if bp != b:
        x = jnp.pad(x, [(0, bp - b), (0, 0), (0, 0)])
        dy = jnp.pad(dy, [(0, bp - b), (0, 0), (0, 0)])

    hpad = _ceil(h, 16)
    hopad = _ceil(ho, 16)

    def kernel(x_ref, dy_ref, au_ref, but_ref, aut_ref, bu_ref, adt_ref,
               bd_ref, o_ref, xs_ref, dys_ref, t1_ref, s1_ref):
        # dX = Au^T @ ( act'(U) * (Ad^T @ dY @ Bd) ) @ Bu, U recomputed
        # on-chip (no sign/residual tensor touches HBM). In-VMEM lane
        # packing for x and dY; H-passes per super-image into row-stack
        # scratches; W-passes batched (M = g*hup). Per-si staging slabs,
        # not one reused buffer — see the forward kernel's ordering note.
        for si in range(g):
            r0 = si * hpad
            q0 = si * hopad
            if kwp != k * w:
                xs_ref[r0:r0 + h, k * w:] = jnp.zeros((h, kwp - k * w), x_ref.dtype)
            if kwop != k * wo:
                dys_ref[q0:q0 + ho, k * wo:] = jnp.zeros((ho, kwop - k * wo),
                                                         dy_ref.dtype)
            for j in range(k):
                xs_ref[r0:r0 + h, j * w:(j + 1) * w] = x_ref[si * k + j]
                dys_ref[q0:q0 + ho, j * wo:(j + 1) * wo] = dy_ref[si * k + j]
            t1_ref[si * hup:(si + 1) * hup, :] = _banded_lhs_mm(
                au_ref, au_np, xs_ref[r0:r0 + h, :], hup).astype(mat_dtype)
            s1_ref[si * hup:(si + 1) * hup, :] = _banded_lhs_mm(
                adt_ref, adt_np, dys_ref[q0:q0 + ho, :], hup).astype(mat_dtype)
        u = _banded_rhs_mm(t1_ref[...], but_ref, but_np, kwup)
        gu = act_grad(u)
        dz = _banded_rhs_mm(s1_ref[...], bd_ref, bd_np, kwup)
        du = (dz * gu).astype(mat_dtype)
        dt1 = _banded_rhs_mm(du, bu_ref, bu_np, kwp)
        for si in range(g):
            dxp = _banded_lhs_mm(
                aut_ref, aut_np, dt1[si * hup:(si + 1) * hup, :].astype(mat_dtype),
                h).astype(out_dtype)
            for j in range(k):
                o_ref[si * k + j] = dxp[:, j * w:(j + 1) * w]

    dx = pl.pallas_call(
        kernel,
        grid=(bp // kg,),
        in_specs=[
            pl.BlockSpec((kg, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kg, ho, wo), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hup, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kwp, kwup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, hup), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kwup, kwp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hup, ho), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kwop, kwup), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kg, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, h, w), out_dtype),
        scratch_shapes=[pltpu.VMEM((g * hpad, kwp), x.dtype),
                        pltpu.VMEM((g * hopad, kwop), dy.dtype),
                        pltpu.VMEM((g * hup, kwp), mat_dtype),
                        pltpu.VMEM((g * hup, kwop), mat_dtype)],
        cost_estimate=pl.CostEstimate(
            flops=plan["flops"] * (bp // kg),
            bytes_accessed=bp * (2 * h * w + ho * wo) * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, dy, au_j, but_j, aut_j, bu_j, adt_j, bd_j)
    return dx[:b]


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8))
def _packed_op(x, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    return _packed_fwd(x, up=up, down=down, padding=padding, gain=gain,
                       slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)


def _packed_op_fwd(x, up, down, padding, gain, slope, clamp, fu_taps, fd_taps):
    x = _first_order_only(x)
    y = _packed_fwd(x, up=up, down=down, padding=padding, gain=gain,
                    slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)
    return y, x


def _packed_op_bwd(up, down, padding, gain, slope, clamp, fu_taps, fd_taps,
                   x, dy):
    x = _first_order_only(x)
    dy = _first_order_only(dy)
    dx = _packed_bwd(x, dy, up=up, down=down, padding=padding, gain=gain,
                     slope=slope, clamp=clamp, fu_taps=fu_taps, fd_taps=fd_taps)
    return (dx,)


_packed_op.defvjp(_packed_op_fwd, _packed_op_bwd)


def filtered_lrelu_packed(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                          gain=math.sqrt(2.0), slope=0.2, clamp=None):
    """Drop-in lane-packed fused filtered_lrelu (NCHW), 1st-order
    differentiable. Bias is added outside the kernel (XLA fuses it into the
    producing op)."""
    assert x.ndim == 4
    n, c, h, w = x.shape
    px0, px1, py0, py1 = parse_padding(padding)
    fu_arr = np.ones(1, np.float32) if fu is None else np.asarray(fu, np.float32)
    fd_arr = np.ones(1, np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu_arr.ndim == 1 and fd_arr.ndim == 1, "packed path needs separable filters"

    if b is not None:
        x = x + b.reshape(1, -1, 1, 1).astype(x.dtype)
    flat = x.reshape(n * c, h, w)
    out = _packed_op(flat, int(up), int(down), (px0, px1, py0, py1),
                     float(gain), float(slope),
                     None if clamp is None else float(clamp),
                     tuple(float(v) for v in fu_arr),
                     tuple(float(v) for v in fd_arr))
    return out.reshape(n, c, out.shape[1], out.shape[2])
