"""Pallas TPU kernel: the fused conv-FFN half of a Turtle block.

Computes, in ONE pass over the feature map:

    out = x + scale * pw2( act( dw3x3( pw1( LN(x) ) ) ) )

covering the reference's GatedFeedForward (gate act), FeedForward (gelu, no
dwconv, gamma scale) and ReducedAttn (gelu, beta scale) chains
(turtle_arch.py:162-213, :627-665) plus their pre-LayerNorm/residual wiring
(turtle_arch.py:727-734). These chains are the bandwidth hot spot: XLA
materialises the (H, W, hidden) maps in HBM between ops (~5 GB of traffic
per full-res 720p block); fused, traffic drops to ~3 reads of x + 1 write.

Mosaic constraints shape the design (all discovered empirically on v5e —
several of these HANG the compiler rather than erroring):
  * rank-3 dot_general, sublane-merging reshapes, lane-dim slices at
    non-128 offsets, and bf16<->int32 bitcasts hang or fail -> everything is
    strictly 2D, and the gate halves' weights are pre-split host-side;
  * manual HBM DMA requires 128-aligned lane dims (C=64 levels fail) -> no
    manual DMA: the image is flattened to (H*W, C) rows and each program
    reads THREE blocked inputs of one image row — above/main/below — via
    clamped index maps (Mosaic double-buffers blocked inputs natively);
  * pltpu.roll only rotates 32-bit data -> the dw taps run on an fp32
    hidden scratch; the ±W row taps are W-aligned slice reads, only the
    ±1 column taps roll;
  * column wrap-around of the flattened ±1 taps (and the roll's circular
    wrap) is cancelled by an iota-derived in-kernel column mask (mask
    INPUTS pad (rows,1) fp32 to 128 lanes — tens of MB of VMEM); the
    clamped above/below rows on the first/last image row (which would
    otherwise inject garbage — the reference zero-pads AFTER pw1,
    turtle_arch.py:170-172) by first/last-row masks;
  * W % 8 == 0 is required for aligned row blocks (callers fall back to the
    XLA path otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5
# v5e exposes far more VMEM than the 16MB default scoped limit; the kernel
# requests a raised limit and budgets well inside it. 48MB is the measured
# optimum: an 80MB budget gives S=8 strips (~9% faster in isolation) but
# OOMs scoped vmem in the full bf16 720p graph (113MB > the 109MB cap).
# Retried 64MB after the r3 channel-block fusion slimmed the graph: still
# errors at compile — 48MB stands. Env-tunable for strip-size experiments
# (the channels-major scratch is ~40% smaller in real VMEM than the
# accounting assumes, so larger budgets may fit now).
import os as _os

_VMEM_BUDGET = int(_os.environ.get("TURTLE_KERNEL_VMEM_MB", "48")) * 1024 * 1024
# tried 60MB for the gate kernel alone (S=8 strips, ~9% in isolation): with
# the residual-pair inputs the real usage hits 112MB and OOMs scoped vmem —
# 48MB stands as the measured optimum
_VMEM_BUDGET_FFN = _VMEM_BUDGET
_VMEM_LIMIT = 100 * 1024 * 1024


def _erf_as(v):
    # Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7 — far below bf16 noise.
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(v)
    av = jnp.abs(v)
    t = 1.0 / (1.0 + p * av)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-av * av))


def _erf_rational(v):
    # XLA's ErfImpl32 rational approximation (math.cc): x*p(x^2)/q(x^2) on
    # |x| <= 4 (erf saturates to +-1 beyond at f32) — NO exp and NO
    # data-dependent reciprocal argument, one divide total; ~2 ulp f32,
    # strictly tighter than the A&S poly. The VPU pays ~11 FMA + 1 div
    # here vs 7 FMA + 1 div + 1 exp for A&S; exp is the multi-pass op.
    alpha = (-2.72614225801306e-10, 2.77068142495902e-08,
             -2.10102402082508e-06, -5.69250639462346e-05,
             -7.34990630326855e-04, -2.95459980854025e-03,
             -1.60960333262415e-02)
    beta = (-1.45660718464996e-05, -2.13374055278905e-04,
            -1.68282697438203e-03, -7.37332916720468e-03,
            -1.42647390514189e-02)
    # clamp at erfinv(1 - 2^-23) like XLA itself, so the poly never leaves
    # [-1, 1] (at 4.0 it returns 1.0000002 — ADVICE r3)
    x = jnp.clip(v, -3.832506856, 3.832506856)
    w = x * x
    p = alpha[0]
    for a in alpha[1:]:
        p = p * w + a
    p = p * x
    q = beta[0]
    for b_ in beta[1:]:
        q = q * w + b_
    return p / q


# jax.lax.erf HANGS the Mosaic compiler (r2) — both paths here are plain
# polynomial VPU code. On-chip A/B (2026-08-20, 720p headline): rational
# 5.499 fps vs A&S 5.449 — the exp is the multi-pass VPU op; the rational
# form is also ~2 ulp f32 (tighter than A&S 1.5e-7), so it's the default.
# TURTLE_ERF=as forces the A&S poly back for A/B.
_erf = (_erf_as if _os.environ.get("TURTLE_ERF") == "as"
        else _erf_rational)

# DEBUG-ONLY cost ablation (tools/ablate_ffn.py): TURTLE_ABLATE=
#   "notaps"  -> only the centre dw tap (no rolls/masks/neighbour adds)
#   "nogelu"  -> identity activation
#   "noln"    -> LN replaced by a plain fp32 cast
# All three BREAK numerics — they exist to attribute the kernels' VPU
# time between the tap machinery, the gelu polynomial and the LN. Never
# set in production; the bench artifacts stamp env overrides.
_ABLATE = _os.environ.get("TURTLE_ABLATE", "")


def _gelu_exact(v):
    if _ABLATE == "nogelu":
        return v
    return 0.5 * v * (1.0 + _erf(v * (2.0 ** -0.5)))


def _ln_2d_f32(x, ln_w, ln_b, ln_mode):
    """Channel LN on (rows, c) fp32. The r4 ablation (tools/ablate_ffn.py)
    attributed ~3.2 ms of the 10.9 ms dec1 gate kernel to this (lane
    reduces over a half-empty c=64 vreg); routing the mean/var reductions
    through ones-column MXU dots was tried and measured 10.92 -> 10.18 ms
    in ISOLATION but 5.641 -> 5.454 fps on the WHOLE graph — in context
    the MXU is the contended unit and the VPU lane-reduces overlap for
    free. Lane reduces stay; do not re-route LN to the MXU."""
    xf = x.astype(jnp.float32)
    if ln_mode == "none" or _ABLATE == "noln":
        return xf
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    g = ln_w[:].astype(jnp.float32)
    if ln_mode == "bias_free":
        return xf * inv * g
    return (xf - mu) * inv * g + ln_b[:].astype(jnp.float32)


def _ln_2d(x, ln_w, ln_b, ln_mode):
    return _ln_2d_f32(x, ln_w, ln_b, ln_mode).astype(x.dtype)


# r5: TRANSPOSED (sublane) LN for the channels-major kernels. The LN
# reductions over c=64 lanes half-fill every vreg (~6 lane-rotate+adds
# per 8 pixels); transposing the block to (c, rows) via the exact
# identity-contraction trick (_cm_to_rows, proven on chip) turns them
# into SUBLANE reductions (~10 vector ops per 128 pixels, ~10x fewer)
# and runs the normalize pass at full lane occupancy. The transpose
# itself is MXU work (c x c x rows — 128x128 slots/pixel at c=64, about
# half of what the measured-negative MXU-LN ones-dots added), so this is
# a VPU-for-MXU trade judged ONLY by the whole-graph bench.
# TURTLE_LN_T=0 restores the lane-reduce LN for A/B.
_LN_T = _os.environ.get("TURTLE_LN_T", "1") != "0"


def _ident2(c: int, dtype):
    """(c, c) identity from iotas (in-kernel; exact in bf16)."""
    return (jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)).astype(dtype)


def _t_cols(xpart, ident, interpret):
    """(rows, c) -> (c, rows) fp32: contract the identity's dim 1 with the
    block's channel dim — each output element is a single 1.0 * x product,
    so the transpose is numerically EXACT."""
    return _dg_f32(ident, xpart, ((1,), (1,)), interpret)


def _ln_t_f32(xT, ln_w, ln_b, ln_mode):
    """Channel LN on a TRANSPOSED (c, rows) fp32 block: mean/var reduce
    over SUBLANES, ln_w/ln_b arrive as (c, 1) columns (host-reshaped —
    an in-kernel (1,c)<->(c,1) transpose is a Mosaic hang trigger)."""
    if ln_mode == "none" or _ABLATE == "noln":
        return xT
    mu = jnp.mean(xT, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xT - mu), axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + _LN_EPS)
    g = ln_w[:].astype(jnp.float32)
    if ln_mode == "bias_free":
        return xT * inv * g
    return (xT - mu) * inv * g + ln_b[:].astype(jnp.float32)


def _fill_ln_scratch(xn_ref, x_top, x_mid, x_bot, ln_w, ln_b, ln_mode, *,
                     w, sw, n, f0, fl, ln_t, cdt, interpret, ln=True):
    """Write the LN'd halo/main/halo blocks into the scratch: pixels-major
    (n, c), or TRANSPOSED (c, n) with sublane LN reduces when ln_t (all
    lane slice offsets 0 / w / w+sw are 128-multiples by the ln_t gate).
    ln=False writes the raw fp32 cast (the CHM kv-embedding frames have no
    LayerNorm) — transposed, that also HALVES the fp32 scratch's physical
    lane padding at c=64."""
    if ln_t:
        idm = _ident2(x_mid.shape[-1], cdt)

        def tf(xp):
            t = _t_cols(xp, idm, interpret)
            return _ln_t_f32(t, ln_w, ln_b, ln_mode) if ln else t

        xn_ref[:, 0:w] = tf(x_top)
        xn_ref[:, w:w + sw] = tf(x_mid)
        xn_ref[:, w + sw:n] = tf(x_bot)
        xn_ref[:, 0:w] = xn_ref[:, 0:w] * (1.0 - f0)
        xn_ref[:, w + sw:n] = xn_ref[:, w + sw:n] * (1.0 - fl)
    else:
        if ln:
            xn_ref[0:w, :] = _ln_2d_f32(x_top, ln_w, ln_b, ln_mode)
            xn_ref[w:w + sw, :] = _ln_2d_f32(x_mid, ln_w, ln_b, ln_mode)
            xn_ref[w + sw:n, :] = _ln_2d_f32(x_bot, ln_w, ln_b, ln_mode)
        else:
            xn_ref[0:w, :] = x_top.astype(jnp.float32)
            xn_ref[w:w + sw, :] = x_mid.astype(jnp.float32)
            xn_ref[w + sw:n, :] = x_bot.astype(jnp.float32)
        xn_ref[0:w, :] = xn_ref[0:w, :] * (1.0 - f0)
        xn_ref[w + sw:n, :] = xn_ref[w + sw:n, :] * (1.0 - fl)


def _ln_t_ok(w: int) -> bool:
    """ln_t legality: the (c, n) scratch's lane slices at 0 / w / w+sw
    must be 128-multiples (same class of constraint as channels-major)."""
    return _LN_T and w % 128 == 0


def _col_wrap_masks(n: int, w: int):
    """In-kernel column-wrap masks, fp32 (n, 1): cml zeroes rows at col 0
    (where the +1-shift roll wraps in the previous row's last pixel), cmr
    zeroes col w-1. Computed from an iota instead of passed as inputs —
    (rows, 1) fp32 mask INPUTS pad to 128 lanes in VMEM (~34 MB across the
    six masks at 720p strip sizes, and a 103 MB scoped-vmem compile OOM at
    256x256); iota + rem lowers fine on Mosaic (smoke-tested on chip)."""
    col = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0),
                      jnp.int32(w))
    return ((col != 0).astype(jnp.float32),
            (col != w - 1).astype(jnp.float32))


def _border_masks(sw: int, w: int):
    """Boundary-position masks over the sw main strip rows (bias-path
    corrections only; the shipped configs are bias-free so these are
    normally never emitted): ml/mr mark image columns 0 / w-1, mt/mb the
    strip's first / last image row."""
    r = jax.lax.broadcasted_iota(jnp.int32, (sw, 1), 0)
    col = jax.lax.rem(r, jnp.int32(w))
    return ((col == 0).astype(jnp.float32),
            (col == w - 1).astype(jnp.float32),
            (r < w).astype(jnp.float32),
            (r >= sw - w).astype(jnp.float32))


def _dw_kernel(xa, xm, xb, ln_w, ln_b, *rest, mode, ln_mode, s_rows, w_img,
               e_dim, has_b1, residual, n_pair, pair_4d=(), has_po=False,
               ffw2_ln_mode=None, ln_t=False, interpret=False):
    """Strip program: S image rows per step + one halo row each side (the
    halo rows arrive as separate clamped row blocks).

    Per gate half: ONE pw1 MXU matmul into the fp32 hidden scratch (bias
    excluded so zeroed border halos stay zero), then the depthwise 3x3 as
    9 multiply-add taps — the ±W row taps are aligned slice reads, the ±1
    column taps are two fp32 rolls masked at the row wrap. The pw1/dw
    biases' boundary behaviour is reconstructed with outer-product
    corrections (only when biases exist; the shipped configs have none on
    these convs).

    rest layout: ((xa2, xm2, xb2) x n_pair — extra addend streams, e.g.
    the attention branch(es) whose residual add fuses here instead of
    materialising the summed map; with has_po each map also gets its own
    po matrix, + one shared bias), w1_a, wd9_a, (w1_b, wd9_b if gate),
    bias_vecs (9 or 18 if has_b1: s_all/s_l/s_r/s_t/s_b/s_tl/s_tr/s_bl/
    s_br per half), w2, b2, scale, then out_ref, xn_ref, h1_ref. The
    column-wrap / border masks are generated in-kernel from an iota
    (_col_wrap_masks / _border_masks)."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    if n_pair:
        pairs = [take(3) for _ in range(n_pair)]
        wpos = take(n_pair) if has_po else None
        bpo = take(1)[0] if has_po else None
    w1_a, wd9_a = take(2)
    w1_b, wd9_b = take(2) if mode == "gate" else (w1_a, wd9_a)
    sv_a = take(9) if has_b1 else None
    sv_b = (take(9) if mode == "gate" else sv_a) if has_b1 else None
    w2, b2, scale = take(3)
    if ffw2_ln_mode is not None:
        # chained pointwise-FFW second half (the ReducedAttn+FFW block
        # runs as ONE kernel: y = this chain's output is consumed here
        # in-registers, never round-tripping HBM)
        f2_lnw, f2_lnb, w4, b4, w5, b5, g2 = take(7)
    out_ref, xn_ref, h1_ref = rest[idx:]

    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    cml_x, cmr_x = _col_wrap_masks(n, w)

    if n_pair:
        # the block residual x + attn(x) fuses here: LN (and the final
        # residual) see the SUM without it ever hitting HBM. With has_po
        # the attention branch(es) arrive UNPROJECTED and their
        # project_out matmuls run on the MXU here — the projected maps
        # never exist. Multiple maps (CHM's per-history-frame value maps
        # with composed attn@W_po matrices) accumulate in fp32.
        def pair_sum(xr, k):
            acc = xr[0].astype(jnp.float32)
            for j in range(n_pair):
                ref = pairs[j][k]
                a2 = ref[0, 0] if (pair_4d and pair_4d[j]) else ref[0]
                if has_po:
                    # wpo_j is batch-blocked (1, C, C): a DATA-DEPENDENT
                    # per-batch po' = blockdiag(attn^T) @ W_po slice
                    a2 = jnp.dot(a2, wpos[j][0],
                                 preferred_element_type=jnp.float32
                                 ).astype(xm.dtype)
                    if j == 0:
                        a2 = a2 + bpo[:].astype(xm.dtype)
                acc = acc + a2.astype(jnp.float32)
            return acc.astype(xm.dtype)

        x_top = pair_sum(xa, 0)
        x_mid = pair_sum(xm, 1)
        x_bot = pair_sum(xb, 2)
    else:
        x_top, x_mid, x_bot = xa[0], xm[0], xb[0]
    cdt = xm.dtype
    # clamped halo rows at the image border must act zero-padded
    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    _fill_ln_scratch(xn_ref, x_top, x_mid, x_bot, ln_w, ln_b, ln_mode,
                     w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t, cdt=cdt,
                     interpret=interpret)

    xn_cdt = xn_ref[:].astype(cdt)

    def dw_half(w1h, wd9h, sv):
        # pw1 ONCE on the MXU (bias excluded so the zeroed halos stay
        # zero), 9 multiply-add taps on the VPU — shared _tm_chain
        return _tm_chain(xn_cdt, w1h, wd9h, h1_ref, cml_x, cmr_x,
                         w=w, sw=sw, n=n, e_dim=e_dim, sv=sv, f0=f0, fl=fl,
                         xn_t=ln_t, interpret=interpret)

    if mode == "linear":
        # projection-only: out = dw3x3(pw1(LN(x))) — the qkv/kv/v front of
        # the attention blocks
        out_ref[0] = dw_half(w1_a, wd9_a, sv_a).astype(out_ref.dtype)
        return

    if mode == "gate":
        hdb = dw_half(w1_b, wd9_b, sv_b)
        act = _gelu_exact(dw_half(w1_a, wd9_a, sv_a)) * hdb
    else:
        act = _gelu_exact(dw_half(w1_a, wd9_a, sv_a))

    out = jnp.dot(act.astype(cdt), w2[:], preferred_element_type=jnp.float32)
    out = (out + b2[:].astype(jnp.float32)) * scale[:].astype(jnp.float32)
    if residual:
        out = out + x_mid.astype(jnp.float32)
    if ffw2_ln_mode is not None:
        # stage B: out2 = y + gamma * pw5(gelu(pw4(LN2(y)))) — pointwise,
        # so no extra halo. y is cast through the model dtype exactly as
        # the two-kernel version round-tripped it via HBM (bitwise parity)
        y = out.astype(out_ref.dtype)
        if ln_t:
            # LN2 transposed too: y is (sw, c) in registers; one identity
            # contraction, sublane reduces, then contract dim 0 of both
            ynT = _ln_t_f32(_t_cols(y, _ident2(y.shape[-1], cdt),
                                    interpret),
                            f2_lnw, f2_lnb, ffw2_ln_mode).astype(cdt)
            hd = _dg_f32(ynT, w4[:], ((0,), (0,)), interpret)
        else:
            yn = _ln_2d_f32(y, f2_lnw, f2_lnb, ffw2_ln_mode).astype(cdt)
            hd = jnp.dot(yn, w4[:], preferred_element_type=jnp.float32)
        hd = hd + b4[:].astype(jnp.float32)
        o2 = jnp.dot(_gelu_exact(hd).astype(cdt), w5[:],
                     preferred_element_type=jnp.float32)
        o2 = (o2 + b5[:].astype(jnp.float32)) * g2[:].astype(jnp.float32)
        out = o2 + y.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _col_wrap_masks_lane(n: int, w: int):
    """Lane-axis variants of _col_wrap_masks, (1, n) fp32, for the
    channels-major hidden layout (pixels ride the lane dim there)."""
    col = jax.lax.rem(jax.lax.broadcasted_iota(jnp.int32, (1, n), 1),
                      jnp.int32(w))
    return ((col != 0).astype(jnp.float32),
            (col != w - 1).astype(jnp.float32))


def _chan_major_ok(e_dim: int, w: int, has_b1: bool,
                   new_site: bool = False) -> bool:
    """The channels-major hidden layout wins when the hidden width pads
    badly on the lane dim (>= 1.5x, i.e. e in {64, 160, ...}) and the ±w
    row taps stay legal: 128-aligned lane slices when w % 128 == 0, or —
    r5 (the 1080p widths are 960/480/240, w % 128 = 64/96/112, which
    gated the biggest layout win off the whole 1080p graph, VERDICT r4
    weak #3) — roll-then-slice-at-0 row taps (`roll(h, n-k)[:, 0:sw] ==
    h[:, k:k+sw]`, exact, no wrap for k+sw <= n) at any w % 8 == 0, at
    the cost of up to 6 extra lane-roll passes per chain (_cm_chain).
    has_b1 gates OFF the callers whose cm kernels don't carry bias
    columns (multi_dw / qkv_stats / chm_stats); fused_block_ffn's
    _dw_gate_cm_kernel supports biases directly (see _cm_chain) and
    passes has_b1=False.
    TURTLE_CHAN_MAJOR=0 forces the token-major layout
    everywhere (A/B measurement knob); =1 forces channels-major wherever
    it is legal (bias support, w % 8). TURTLE_CHAN_MAJOR_NEW=0 reverts
    only the sites (new_site=True) that landed after the 5.32 fps
    measurement; TURTLE_CM_ROLL=0 disables only the roll-tap widths —
    finer A/B isolation."""
    # r5 whole-graph A/B: roll-tap cm is NEGATIVE at the tiled-320
    # protocol (1.109 vs 1.147 fps) and at the 1080p e=320 shape (16.1 vs
    # 15.5 ms isolated) despite a neutral-positive isolated probe at the
    # tiled gate shape — 3rd instance of isolated readings inverting in
    # context. Default OFF; TURTLE_CM_ROLL=1 re-enables for A/B.
    roll_ok = (w % 128 != 0 and w % 8 == 0
               and _os.environ.get("TURTLE_CM_ROLL") == "1")
    legal = (not has_b1) and (w % 128 == 0 or roll_ok)
    force = _os.environ.get("TURTLE_CHAN_MAJOR")
    if force == "0":
        return False
    if new_site and _os.environ.get("TURTLE_CHAN_MAJOR_NEW") == "0":
        return False
    if force == "1":
        return legal
    pad_e = 128 * ((e_dim + 127) // 128)
    return legal and 2 * pad_e >= 3 * e_dim


def _dg_f32(a, b, dims, interpret: bool):
    """dot_general with fp32 accumulation. Under interpret (CPU) the
    operands are pre-cast to fp32: the CPU DotThunk has no BF16 support
    for non-canonical dimension numbers, and the cast is numerically
    equivalent (bf16 products are exact in fp32 either way)."""
    if interpret:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _cm_chain(xn_cdt, w1h, wdTh, h1t_ref, cml_l, cmr_l, *, w, sw, n, e_dim,
              interpret=False, b1_col=None, bd_col=None, f0=None, fl=None,
              xn_t=False):
    """CHANNELS-MAJOR pw1 + dw3x3 chain: the hidden activations live
    transposed (e, rows) so a badly-lane-padding e (64 -> 128, 160 -> 256)
    rides SUBLANES (granularity 8, zero waste) through the VPU-bound tap
    arithmetic. h^T = w1^T @ xn^T comes straight out of dot_general
    dimension numbers (no transpose op); ±1 column taps are fp32 LANE
    rolls, ±w row taps 128-multiple lane slices. wdTh: 9 (e, 1) fp32 tap
    refs. Returns the fp32 (e, sw) accumulator.

    Biases need NO inclusion-exclusion machinery here (unlike
    _tm_bias_map): the pw1 bias adds to the hidden scratch as an (e, 1)
    sublane-column broadcast, the clamped top/bottom halo row bands are
    re-zeroed (128-multiple lane slices — the reference zero-pads AFTER
    pw1+bias, turtle_arch.py:170-172), and the existing roll wrap masks
    already zero the out-of-image column taps bias-and-all. The dw bias
    is one (e, 1) broadcast add on the accumulator."""
    h1t_ref[:] = _dg_f32(w1h[:], xn_cdt, ((0,), (0 if xn_t else 1,)),
                         interpret)
    if b1_col is not None:
        h1t_ref[:] = h1t_ref[:] + b1_col[:].astype(jnp.float32)
        # zeroed border halos must stay zero post-bias (exact padded-conv
        # semantics at the image top/bottom)
        h1t_ref[:, 0:w] = h1t_ref[:, 0:w] * (1.0 - f0)
        h1t_ref[:, n - w:n] = h1t_ref[:, n - w:n] * (1.0 - fl)
    roll_taps = w % 128 != 0

    def row_slice(base, lo):
        # ±w row taps: 128-multiple lane slices where legal; otherwise
        # roll-then-slice-at-0 (roll(h, n-lo)[:, p] = h[(p+lo) mod n];
        # p+lo <= sw-1+2w < n, so the wrapped tail never enters the read)
        if lo == 0 or not roll_taps:
            return base[:, lo:lo + sw]
        return pltpu.roll(base, shift=n - lo, axis=1)[:, 0:sw]

    if _ABLATE == "notaps":  # debug cost attribution only
        return row_slice(h1t_ref[:], w) * wdTh[4][:]
    acc = jnp.zeros((e_dim, sw), jnp.float32)
    for dj in (-1, 0, 1):
        if dj == -1:
            base = pltpu.roll(h1t_ref[:], shift=1, axis=1) * cml_l
        elif dj == 1:
            base = pltpu.roll(h1t_ref[:], shift=n - 1, axis=1) * cmr_l
        else:
            base = h1t_ref[:]
        for di in (-1, 0, 1):
            lo = w + di * w
            k = (di + 1) * 3 + (dj + 1)
            acc = acc + row_slice(base, lo) * wdTh[k][:]
    if bd_col is not None:
        acc = acc + bd_col[:].astype(jnp.float32)
    return acc


def _tm_bias_map_img(sv, sw, w, mt, mb):
    """Like _tm_bias_map but with the top/bottom border-row masks given
    DIRECTLY as (sw, 1) fp32 (image-row identities, not strip-relative
    positions) — the two-stage chained kernel's output windows start at
    image row i*s - 1, where the f0/(r < w) encoding breaks."""
    ml, mr, _, _ = _border_masks(sw, w)
    s_all, s_l, s_r, s_t, s_b, s_tl, s_tr, s_bl, s_br = [
        v[:].astype(jnp.float32) for v in sv]
    return (s_all - ml * s_l - mr * s_r - mt * s_t - mb * s_b
            + (mt * ml) * s_tl + (mt * mr) * s_tr
            + (mb * ml) * s_bl + (mb * mr) * s_br)


def _img_row_masks(i, s_rows, w, h_img, n_rows, halo):
    """Row masks over an n_rows buffer whose row r maps to image row
    i*s_rows - halo + r // w: (valid, mt, mb) fp32 (n_rows, 1) — valid
    marks in-image rows, mt/mb the first/last image row."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, 1), 0)
    img = i * s_rows - halo + r // jnp.int32(w)
    valid = ((img >= 0) & (img < h_img)).astype(jnp.float32)
    mt = (img == 0).astype(jnp.float32)
    mb = (img == h_img - 1).astype(jnp.float32)
    return valid, mt, mb


def _tm_bias_map(sv, sw, w, f0, fl):
    """pw1/dw bias boundary reconstruction (token-major): the reference
    zero-pads AFTER pw1 (turtle_arch.py:170-172), so the halo taps carry no
    bias — subtract the per-edge tap-bias sums by inclusion-exclusion.
    sv: 9 (e,) refs s_all/s_l/s_r/s_t/s_b/s_tl/s_tr/s_bl/s_br."""
    ml, mr, mt, mb = _border_masks(sw, w)
    s_all, s_l, s_r, s_t, s_b, s_tl, s_tr, s_bl, s_br = [
        v[:].astype(jnp.float32) for v in sv]
    return (s_all - ml * s_l - mr * s_r
            - f0 * mt * s_t - fl * mb * s_b
            + f0 * (mt * ml) * s_tl
            + f0 * (mt * mr) * s_tr
            + fl * (mb * ml) * s_bl
            + fl * (mb * mr) * s_br)


def _tap_bias_vecs(wd9, b1f, bdf):
    """Host-side packing of the 9 inclusion-exclusion bias vectors
    _tm_bias_map consumes: s_all/s_l/s_r/s_t/s_b/s_tl/s_tr/s_bl/s_br,
    with tb[k] = the pw1 bias's contribution through dw tap k."""
    tb = wd9 * b1f[None, :]
    return [tb.sum(0) + bdf,
            tb[0] + tb[3] + tb[6], tb[2] + tb[5] + tb[8],
            tb[:3].sum(0), tb[6:].sum(0),
            tb[0], tb[2], tb[6], tb[8]]


def _proj_tap_args(p, wd9, e_dim, has_b1, zeros):
    """Token-major per-projection kernel args: [w1, wd9] + the 9 bias
    vectors when any pw1/dw bias exists."""
    args = [p["w1"], wd9]
    if has_b1:
        b1f = (p.get("b1") if p.get("b1") is not None
               else zeros((e_dim,))).astype(jnp.float32)
        bdf = (p.get("bd") if p.get("bd") is not None
               else zeros((e_dim,))).astype(jnp.float32)
        args += _tap_bias_vecs(wd9, b1f, bdf)
    return args


def _tm_chain(xn_cdt, w1h, wd9h, h1_ref, cml_x, cmr_x, *, w, sw, n, e_dim,
              sv=None, f0=None, fl=None, mt_mb=None, xn_t=False,
              interpret=False):
    """TOKEN-MAJOR pw1 + dw3x3 tap chain (the pixels-major twin of
    _cm_chain, shared by every fused kernel): ONE pw1 MXU matmul into the
    (n, e) fp32 hidden scratch, then the depthwise 3x3 as 9 multiply-add
    taps — ±w row taps are aligned slice reads, ±1 column taps fp32
    sublane rolls masked at the row wrap. wd9h: (9, e) fp32 tap-weight
    ref. Returns the fp32 (sw, e) accumulator (bias boundary corrections
    included when sv is given)."""
    if xn_t:
        # transposed LN scratch (c, n): contract the channel dim of both
        # operands — the hidden still lands (n, e), no layout change below
        h1_ref[:] = _dg_f32(xn_cdt, w1h[:], ((0,), (0,)), interpret)
    else:
        h1_ref[:] = jnp.dot(xn_cdt, w1h[:],
                            preferred_element_type=jnp.float32)
    if _ABLATE == "notaps":  # debug cost attribution only
        return h1_ref[w:w + sw, :] * wd9h[4].astype(jnp.float32)
    acc = jnp.zeros((sw, e_dim), jnp.float32)
    for dj in (-1, 0, 1):
        if dj == -1:
            base = pltpu.roll(h1_ref[:], shift=1, axis=0) * cml_x
        elif dj == 1:
            base = pltpu.roll(h1_ref[:], shift=n - 1, axis=0) * cmr_x
        else:
            base = h1_ref[:]
        for di in (-1, 0, 1):
            lo = w + di * w
            k = (di + 1) * 3 + (dj + 1)
            acc = acc + base[lo:lo + sw, :] * wd9h[k].astype(jnp.float32)
    if sv is not None:
        if mt_mb is not None:
            acc = acc + _tm_bias_map_img(sv, sw, w, *mt_mb)
        else:
            acc = acc + _tm_bias_map(sv, sw, w, f0, fl)
    return acc


def _cm_to_rows(acc, n_keep=None):
    """(e, rows) fp32 -> (rows, e) fp32 via an identity matmul. Each output
    element is a single 1.0 * x product (every other term is 0 * y), so
    the transpose is numerically EXACT — the cast-to-model-dtype afterwards
    matches the pixels-major path bitwise. With n_keep the identity is
    rectangular (e, n_keep): transpose and channel-slice in one dot (the
    sub-8 couts — the ending conv's 3 — keep every sublane shape >= 8 and
    only the dot's N dim is narrow, a pattern the token-major path already
    proves on chip)."""
    e = acc.shape[0]
    cols = e if n_keep is None else n_keep
    ident = (jax.lax.broadcasted_iota(jnp.int32, (e, cols), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (e, cols), 1)
             ).astype(jnp.float32)
    return jax.lax.dot_general(acc, ident,
                               dimension_numbers=(((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _cm_sq_row(aT):
    """Squared-norm row (1, e) of a channels-major (e, rows) activation —
    the lane-dim reduction lands in the right orientation via a ones-row
    contraction (trivial MXU work)."""
    af = aT.astype(jnp.float32)
    ones = jnp.ones((1, aT.shape[1]), jnp.float32)
    return jax.lax.dot_general(ones, af * af,
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dw_gate_cm_kernel(xa, xm, xb, ln_w, ln_b, *rest, mode, ln_mode, s_rows,
                       w_img, e_dim, residual, n_pair, pair_4d=(),
                       has_po=False, has_b1=False, ln_t=False,
                       interpret=False):
    """CHANNELS-MAJOR gate/linear/gelu strip program.

    Same chain as _dw_kernel's gate mode, but the hidden activations live
    TRANSPOSED as (e, rows): the VPU pads the minor (lane) dim to 128, so
    a 160-wide hidden (c=64 levels, expansion 2.5) wastes 1.6x of every
    tap/gelu/gate op in the (rows, e) layout — in (e, rows) the hidden dim
    rides SUBLANES (granularity 8, zero padding) and the pixel dim is an
    exact lane multiple. No transpose ops exist anywhere: dot_general
    dimension numbers produce h^T = w1^T @ xn^T directly from the
    pixels-major LN scratch, and the output dot act^T-contracted-on-e
    lands back in pixels-major. The ±1 column taps become LANE rolls
    (fp32, smoke-tested on chip), the ±w row taps 128-multiple lane
    slices (hence the w % 128 gate), and the gate halves sublane slices.

    rest layout: ((xa2, xm2, xb2) x n_pair, + n_pair wpo matrices and one
    shared bpo if has_po), w1_a, w1_b, 9 x wdT_a (e, 1) fp32, 9 x wdT_b,
    (b1_a, bd_a, b1_b, bd_b (e, 1) fp32 cols if has_b1 — single-chain
    modes carry just b1_a, bd_a), w2, b2, scale, then out_ref, xn_ref,
    h1t_ref ((e, n) fp32 scratch)."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    if n_pair:
        pairs = [take(3) for _ in range(n_pair)]
        wpos = take(n_pair) if has_po else None
        bpo = take(1)[0] if has_po else None
    b1_a = bd_a = b1_b = bd_b = None
    if mode == "gate":
        w1_a, w1_b = take(2)
        wdT_a = take(9)
        wdT_b = take(9)
        if has_b1:
            b1_a, bd_a, b1_b, bd_b = take(4)
    else:  # linear / gelu
        w1_a = take(1)[0]
        wdT_a = take(9)
        if has_b1:
            b1_a, bd_a = take(2)
    w2, b2, scale = take(3)
    out_ref, xn_ref, h1t_ref = rest[idx:]

    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    cml_l, cmr_l = _col_wrap_masks_lane(n, w)

    if n_pair:
        def pair_sum(xr, k):
            acc = xr[0].astype(jnp.float32)
            for j in range(n_pair):
                ref = pairs[j][k]
                a2 = ref[0, 0] if (pair_4d and pair_4d[j]) else ref[0]
                if has_po:
                    a2 = jnp.dot(a2, wpos[j][0],
                                 preferred_element_type=jnp.float32
                                 ).astype(xm.dtype)
                    if j == 0:
                        a2 = a2 + bpo[:].astype(xm.dtype)
                acc = acc + a2.astype(jnp.float32)
            return acc.astype(xm.dtype)

        x_top = pair_sum(xa, 0)
        x_mid = pair_sum(xm, 1)
        x_bot = pair_sum(xb, 2)
    else:
        x_top, x_mid, x_bot = xa[0], xm[0], xb[0]
    cdt = xm.dtype
    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    _fill_ln_scratch(xn_ref, x_top, x_mid, x_bot, ln_w, ln_b, ln_mode,
                     w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t, cdt=cdt,
                     interpret=interpret)

    xn_cdt = xn_ref[:].astype(cdt)

    def dw_half_cm(w1h, wdTh, b1c=None, bdc=None):
        return _cm_chain(xn_cdt, w1h, wdTh, h1t_ref, cml_l, cmr_l,
                         w=w, sw=sw, n=n, e_dim=e_dim, interpret=interpret,
                         b1_col=b1c, bd_col=bdc, f0=f0, fl=fl, xn_t=ln_t)

    if mode == "linear":
        out_ref[0] = _cm_to_rows(dw_half_cm(w1_a, wdT_a, b1_a, bd_a)
                                 ).astype(out_ref.dtype)
        return

    if mode == "gate":
        hdb = dw_half_cm(w1_b, wdT_b, b1_b, bd_b)
        act = _gelu_exact(dw_half_cm(w1_a, wdT_a, b1_a, bd_a)) * hdb
    else:  # gelu
        act = _gelu_exact(dw_half_cm(w1_a, wdT_a, b1_a, bd_a))
    out = _dg_f32(act.astype(cdt), w2[:], ((0,), (0,)), interpret)
    out = (out + b2[:].astype(jnp.float32)) * scale[:].astype(jnp.float32)
    if residual:
        out = out + x_mid.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _multi_dw_kernel(xa, xm, xb, ln_w, ln_b, *rest, n_out, ln_mode, s_rows,
                     w_img, e_dim, has_b1, chan_major=False, ln_t=False,
                     interpret=False):
    """Multi-output strip program: ONE LN pass over the strip, then N
    independent pw1 + depthwise-3x3 projection chains, each written to its
    own output (e.g. the q/k/v thirds of an attention projection, with the
    pw/dw weights pre-split host-side so no in-kernel lane slicing is
    needed). Same halo/mask machinery as _dw_kernel; chan_major runs the
    chains transposed (_cm_chain) with an exact identity-matmul transpose
    back before each write."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    projs = []
    for _ in range(n_out):
        if chan_major:
            w1 = take(1)[0]
            projs.append((w1, take(9), None))
            continue
        w1, wd9 = take(2)
        sv = take(9) if has_b1 else None
        projs.append((w1, wd9, sv))
    out_refs = rest[idx: idx + n_out]
    xn_ref, h1_ref = rest[idx + n_out:]

    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    cdt = xm.dtype
    _fill_ln_scratch(xn_ref, xa[0], xm[0], xb[0], ln_w, ln_b, ln_mode,
                     w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t, cdt=cdt,
                     interpret=interpret)

    xn_cdt = xn_ref[:].astype(cdt)

    if chan_major:
        cml_l, cmr_l = _col_wrap_masks_lane(n, w)
        for (w1h, wdTh, _), out_ref in zip(projs, out_refs):
            acc = _cm_chain(xn_cdt, w1h, wdTh, h1_ref, cml_l, cmr_l,
                            w=w, sw=sw, n=n, e_dim=e_dim,
                            interpret=interpret, xn_t=ln_t)
            out_ref[0] = _cm_to_rows(acc).astype(out_ref.dtype)
        return

    cml_x, cmr_x = _col_wrap_masks(n, w)
    for (w1h, wd9h, sv), out_ref in zip(projs, out_refs):
        acc = _tm_chain(xn_cdt, w1h, wd9h, h1_ref, cml_x, cmr_x,
                        w=w, sw=sw, n=n, e_dim=e_dim, sv=sv, f0=f0, fl=fl,
                        xn_t=ln_t, interpret=interpret)
        out_ref[0] = acc.astype(out_ref.dtype)


def _qkv_stats_kernel(xa, xm, xb, ln_w, ln_b, *rest, ln_mode, s_rows, w_img,
                      e_dim, has_b1, chan_major=False, ln_t=False,
                      interpret=False):
    """Channel-attention front: the q/k/v projection chains of one block,
    but q and k NEVER leave VMEM — the kernel writes only the v map plus
    the fp32 statistics channel attention actually needs (turtle_arch.py
    :589-625): the Gram matrix g = q^T k (c, c) and the per-channel-token
    squared norms of q and k, accumulated across row strips. The (H, W, c)
    q/k maps (2 full-map writes + 2 reads per block in the split-proj
    design) disappear; the softmax runs on the tiny (heads, ctok, ctok)
    scores in XLA and the attention application itself folds into the FFN
    kernel's pair/po path as po' = blockdiag(attn^T) @ W_po.

    rest: 3 x (w1, wd9, [9 bias vecs]) for q/k/v, then v_ref (blocked
    rows), g_ref (1, e, e) fp32, s_ref (1, 8, 2e) fp32 (row 0 =
    [sum q^2 | sum k^2]), xn_ref, h1_ref."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    projs = []
    for _ in range(3):
        if chan_major:
            w1 = take(1)[0]
            projs.append((w1, take(9), None))
            continue
        w1, wd9 = take(2)
        sv = take(9) if has_b1 else None
        projs.append((w1, wd9, sv))
    v_ref, g_ref, s_ref = rest[idx: idx + 3]
    xn_ref, h1_ref = rest[idx + 3:]

    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w

    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    cdt = xm.dtype
    _fill_ln_scratch(xn_ref, xa[0], xm[0], xb[0], ln_w, ln_b, ln_mode,
                     w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t, cdt=cdt,
                     interpret=interpret)

    xn_cdt = xn_ref[:].astype(cdt)

    if chan_major:
        # channels-major chains: q^T/k^T stay (e, rows) — the gram and the
        # squared-norm rows contract over the lane (pixel) dim directly,
        # and only the v map pays the exact identity-matmul transpose
        cml_l, cmr_l = _col_wrap_masks_lane(n, w)
        ch = lambda p: _cm_chain(xn_cdt, p[0], p[1], h1_ref,  # noqa: E731
                                 cml_l, cmr_l, w=w, sw=sw, n=n, e_dim=e_dim,
                                 interpret=interpret, xn_t=ln_t)
        qT = ch(projs[0]).astype(cdt)
        kT = ch(projs[1]).astype(cdt)
        v_ref[0] = _cm_to_rows(ch(projs[2])).astype(v_ref.dtype)
        g = _dg_f32(qT, kT, ((1,), (1,)), interpret)

        @pl.when(i == 0)
        def _zero_cm():
            g_ref[0] = jnp.zeros_like(g_ref[0])
            s_ref[0] = jnp.zeros_like(s_ref[0])

        g_ref[0] = g_ref[0] + g
        s_ref[0, 0:1, :] = (s_ref[0, 0:1, :] + jnp.concatenate(
            [_cm_sq_row(qT), _cm_sq_row(kT)], axis=1))
        return

    cml_x, cmr_x = _col_wrap_masks(n, w)

    def chain(w1h, wd9h, sv):
        return _tm_chain(xn_cdt, w1h, wd9h, h1_ref, cml_x, cmr_x,
                         w=w, sw=sw, n=n, e_dim=e_dim, sv=sv, f0=f0, fl=fl,
                         xn_t=ln_t, interpret=interpret)

    # cast to the model dtype first: the gram must see exactly the values
    # the written q/k maps would have held (pallas == xla parity)
    q = chain(*projs[0]).astype(cdt)
    k = chain(*projs[1]).astype(cdt)
    v_ref[0] = chain(*projs[2]).astype(v_ref.dtype)

    g = _dg_f32(q, k, ((0,), (0,)), interpret)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    nq = jnp.sum(qf * qf, axis=0, keepdims=True)  # (1, e)
    nk = jnp.sum(kf * kf, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _zero():
        g_ref[0] = jnp.zeros_like(g_ref[0])
        s_ref[0] = jnp.zeros_like(s_ref[0])

    g_ref[0] = g_ref[0] + g
    s_ref[0, 0:1, :] = (s_ref[0, 0:1, :]
                        + jnp.concatenate([nq, nk], axis=1))


def _strip_mem_stats(s: int, w: int, c: int, e: int) -> int:
    n = (s + 2) * w
    return (n * c * 6            # fp32 LN scratch + cast copy
            + 2 * n * e * 4      # pw1 hidden scratch + one rolled base
            + 2 * s * w * e * 4  # acc transient
            + 2 * 2 * s * w * e * 4  # held q/k strips (+ fp32 gram copies)
            + 4 * s * w * c * 2  # double-buffered input blocks
            + 2 * s * w * e * 2  # double-buffered v output
            + 2 * e * e * 4      # gram block
            + 2 * n * 512)       # in-kernel (n,1) wrap-mask vregs


def _pick_strip_stats(h: int, w: int, c: int, e: int) -> int:
    best = 0
    for s in range(1, min(h, 32) + 1):
        if h % s == 0 and _strip_mem_stats(s, w, c, e) <= _VMEM_BUDGET:
            best = s
    return best


def qkv_stats_supported(h: int, w: int, c: int) -> bool:
    return w % 8 == 0 and _pick_strip_stats(h, w, c, c) > 0


def fused_qkv_stats(x, projs, *, ln_w=None, ln_b=None,
                    interpret: bool = False):
    """LN + the 3 q/k/v projection chains of channel attention, emitting
    only (v_map (B,H,W,e), gram (B,e,e) fp32 = q^T k over all pixels,
    stats (B,8,2e) fp32 with row 0 = [sum q^2 | sum k^2]). q/k maps stay
    in VMEM. projs: 3 dicts {w1 (C,E), b1, wd (3,3,E), bd}."""
    b, h, w, c = x.shape
    assert len(projs) == 3
    e_dim = projs[0]["w1"].shape[1]
    assert all(p["w1"].shape[1] == e_dim for p in projs)
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else zeros((c,)),
               ln_b if ln_b is not None else zeros((c,)))
    assert w % 8 == 0

    has_b1 = any(p.get("b1") is not None or p.get("bd") is not None
                 for p in projs)
    chan_major = _chan_major_ok(e_dim, w, has_b1)
    args = []
    for p in projs:
        wd9 = p["wd"].reshape(9, e_dim).astype(jnp.float32)
        if chan_major:
            args += [p["w1"], *[wd9[k][:, None] for k in range(9)]]
            continue
        args += _proj_tap_args(p, wd9, e_dim, has_b1, zeros)

    s_rows = _pick_strip_stats(h, w, c, e_dim)
    assert s_rows, "no feasible strip size; use the XLA path"
    sw = s_rows * w
    n = sw + 2 * w


    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    ln_t = _ln_t_ok(w)
    if ln_t:
        ln_args = (ln_args[0].reshape(c, 1), ln_args[1].reshape(c, 1))
    kernel = functools.partial(
        _qkv_stats_kernel, ln_mode=ln_mode, s_rows=s_rows, w_img=w,
        e_dim=e_dim, has_b1=has_b1, chan_major=chan_major, ln_t=ln_t,
        interpret=interpret)
    last_row = h - 1
    s_ = s_rows
    xf = x.reshape(b, h * w, c)
    v_map, g, stats = pl.pallas_call(
        kernel,
        grid=(b, h // s_rows),
        in_specs=[
            pl.BlockSpec((1, w, c),
                         lambda b_, i: (b_, jnp.maximum(i * s_ - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c),
                         lambda b_, i: (b_, jnp.minimum(i * s_ + s_, last_row),
                                        0),
                         memory_space=pltpu.VMEM),
        ] + [vmem()] * (2 + len(args)),
        out_specs=(
            pl.BlockSpec((1, sw, e_dim), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim, e_dim), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 2 * e_dim), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * w, e_dim), dt),
            jax.ShapeDtypeStruct((b, e_dim, e_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, 8, 2 * e_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, n) if ln_t else (n, c), jnp.float32),
            pltpu.VMEM((e_dim, n) if chan_major else (n, e_dim),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xf, xf, xf, *ln_args, *args)
    return v_map.reshape(b, h, w, e_dim), g, stats


def _chm_stats_kernel(xa, xm, xb, *rest, ln_mode, s_rows, w_img, e_dim,
                      n_frames, chan_major=False, per_frame=False,
                      ln_t=False, interpret=False):
    """CausalHistoryModel front (turtle_arch.py:535-585), one pass: the
    FHR q/k/v chains over LN(x) AND the kv embedding chains over every
    aligned frame x_sp[n] (NO LayerNorm — kv_dwconv(kv(x_sp)), ref :572-578)
    run strip-wise; q, k and all kh maps stay in VMEM. The kernel writes
    only the v and vh value maps plus the fp32 statistics the FHR routing
    consumes: g = q^T k, gh[n] = q^T kh_n, and the squared-norm rows for
    q, k and each kh_n. Bias-free configs only (the shipped ones).

    rest: the aligned-frame input refs (ONE stacked halo/main/halo triple
    indexed [0, nn], or — per_frame=True — nf separate triples), ln_w/ln_b,
    q/k/v (w1, wd9) x3, kv (w1_k, wd9_k, w1_v, wd9_v) shared across
    frames, then v_ref (blocked), vh_ref (blocked, per-frame
    leading dim), g_ref (1, e, e), gh_ref (1, nf, e, e), s_ref
    (1, nf + 2, 8, e) (row 0 of [idx] = sum sq: idx 0 = q, 1 = k,
    2+n = kh_n), xn_ref, h1_ref."""
    idx = 0

    def take(k):
        nonlocal idx
        out = rest[idx: idx + k]
        idx += k
        return out

    if per_frame:
        fr = take(3 * n_frames)
    else:
        xsa, xsm, xsb = take(3)
    ln_w, ln_b = take(2)

    def frame_rows(nn):
        # loads happen here, once per frame iteration (not all upfront)
        if per_frame:
            return fr[3 * nn][0], fr[3 * nn + 1][0], fr[3 * nn + 2][0]
        return xsa[0, nn], xsm[0, nn], xsb[0, nn]

    if chan_major:
        (w1_q, w1_k, w1_v, w1_hk, w1_hv) = take(5)
        wdT_q, wdT_k, wdT_v, wdT_hk, wdT_hv = (take(9), take(9), take(9),
                                               take(9), take(9))
    else:
        (w1_q, wd9_q, w1_k, wd9_k, w1_v, wd9_v,
         w1_hk, wd9_hk, w1_hv, wd9_hv) = take(10)
    v_ref, vh_ref, g_ref, gh_ref, s_ref = rest[idx: idx + 5]
    xn_ref, h1_ref = rest[idx + 5:]

    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    cdt = xm.dtype

    if chan_major:
        cml_l, cmr_l = _col_wrap_masks_lane(n, w)

        def chain_cm(w1h, wdTh):
            return _cm_chain(xn_ref[:].astype(cdt), w1h, wdTh, h1_ref,
                             cml_l, cmr_l, w=w, sw=sw, n=n, e_dim=e_dim,
                             interpret=interpret, xn_t=ln_t)
    else:
        cml_x, cmr_x = _col_wrap_masks(n, w)

    def chain(w1h, wd9h):
        # xn_ref is re-filled per frame, so it is re-read per call
        return _tm_chain(xn_ref[:].astype(cdt), w1h, wd9h, h1_ref,
                         cml_x, cmr_x, w=w, sw=sw, n=n, e_dim=e_dim,
                         xn_t=ln_t, interpret=interpret)

    def fill(top, mid, bot, ln):
        _fill_ln_scratch(xn_ref, top, mid, bot, ln_w, ln_b, ln_mode,
                         w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t,
                         cdt=cdt, interpret=interpret, ln=ln)

    def gram(a, b):
        return _dg_f32(a, b, ((0,), (0,)), interpret)

    def sq(a):
        af = a.astype(jnp.float32)
        return jnp.sum(af * af, axis=0, keepdims=True)  # (1, e)

    @pl.when(i == 0)
    def _zero():
        g_ref[0] = jnp.zeros_like(g_ref[0])
        gh_ref[0] = jnp.zeros_like(gh_ref[0])
        s_ref[0] = jnp.zeros_like(s_ref[0])

    if chan_major:
        # q^T/k^T/kh^T stay (e, rows); grams/norms contract over lanes,
        # only the v/vh maps pay the exact identity-matmul transpose
        def gram_cm(a, bb):
            return _dg_f32(a, bb, ((1,), (1,)), interpret)

        fill(xa[0], xm[0], xb[0], True)
        qT = chain_cm(w1_q, wdT_q).astype(cdt)
        kT = chain_cm(w1_k, wdT_k).astype(cdt)
        v_ref[0] = _cm_to_rows(chain_cm(w1_v, wdT_v)).astype(v_ref.dtype)
        g_ref[0] = g_ref[0] + gram_cm(qT, kT)
        s_ref[0, 0, 0:1, :] = s_ref[0, 0, 0:1, :] + _cm_sq_row(qT)
        s_ref[0, 1, 0:1, :] = s_ref[0, 1, 0:1, :] + _cm_sq_row(kT)
        for nn in range(n_frames):
            fill(*frame_rows(nn), False)
            khT = chain_cm(w1_hk, wdT_hk).astype(cdt)
            vh_ref[0, nn] = _cm_to_rows(chain_cm(w1_hv, wdT_hv)
                                        ).astype(vh_ref.dtype)
            gh_ref[0, nn] = gh_ref[0, nn] + gram_cm(qT, khT)
            s_ref[0, 2 + nn, 0:1, :] = (s_ref[0, 2 + nn, 0:1, :]
                                        + _cm_sq_row(khT))
        return

    # FHR q/k/v over LN(x)
    fill(xa[0], xm[0], xb[0], True)
    q = chain(w1_q, wd9_q).astype(cdt)
    k = chain(w1_k, wd9_k).astype(cdt)
    v_ref[0] = chain(w1_v, wd9_v).astype(v_ref.dtype)
    g_ref[0] = g_ref[0] + gram(q, k)
    s_ref[0, 0, 0:1, :] = s_ref[0, 0, 0:1, :] + sq(q)
    s_ref[0, 1, 0:1, :] = s_ref[0, 1, 0:1, :] + sq(k)

    # kv embedding of each aligned frame (no LN)
    for nn in range(n_frames):
        fill(*frame_rows(nn), False)
        kh = chain(w1_hk, wd9_hk).astype(cdt)
        vh_ref[0, nn] = chain(w1_hv, wd9_hv).astype(vh_ref.dtype)
        gh_ref[0, nn] = gh_ref[0, nn] + gram(q, kh)
        s_ref[0, 2 + nn, 0:1, :] = s_ref[0, 2 + nn, 0:1, :] + sq(kh)


def _strip_mem_chm(s: int, w: int, c: int, e: int, nf: int) -> int:
    n = (s + 2) * w
    return (n * c * 6            # fp32 xn scratch + cast copy
            + 2 * n * e * 4      # pw1 hidden scratch + one rolled base
            + 2 * s * w * e * 4  # acc transient
            + 3 * s * w * e * 4  # held q/k strips + gram fp32 copies
            + 4 * s * w * c * 2 * (1 + nf)  # double-buffered x + x_sp blocks
            + 2 * s * w * e * 2 * (1 + nf)  # double-buffered v + vh outputs
            + (1 + nf) * e * e * 4          # gram blocks
            + 2 * n * 512)                  # in-kernel wrap-mask vregs


def _pick_strip_chm(h: int, w: int, c: int, e: int, nf: int) -> int:
    best = 0
    for s in range(1, min(h, 32) + 1):
        if h % s == 0 and _strip_mem_chm(s, w, c, e, nf) <= _VMEM_BUDGET:
            best = s
    return best


def chm_stats_supported(h: int, w: int, c: int, nf: int) -> bool:
    return w % 8 == 0 and _pick_strip_chm(h, w, c, c, nf) > 0


def fused_chm_stats(x, x_sp, qkv, kv, *, ln_w=None, ln_b=None,
                    interpret: bool = False):
    """x: (B, H, W, C) current frame; x_sp: (B, NF, H, W, C) SAB-aligned
    frames, OR a list of NF (B, H, W, C) maps (per-frame streams — the
    stacked copy never materialises; each frame gets its own halo/main/halo
    block specs). qkv: 3 dicts {w1 (C, C), wd (3, 3, C)} (the ChanAttn q/k/v
    thirds); kv: 2 dicts (the kv embedding halves, shared across frames).
    Bias-free only. Returns (v (B,H,W,C), vh (B,NF,H,W,C), g (B,C,C) fp32,
    gh (B,NF,C,C) fp32, s (B,NF+2,8,C) fp32 norm rows)."""
    b, h, w, c = x.shape
    per_frame = isinstance(x_sp, (list, tuple))
    nf = len(x_sp) if per_frame else x_sp.shape[1]
    e_dim = c
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else zeros((c,)),
               ln_b if ln_b is not None else zeros((c,)))
    assert w % 8 == 0

    chan_major = _chan_major_ok(e_dim, w, False)
    if chan_major:
        w1s, wdTs = [], []
        for p in list(qkv) + list(kv):
            wd9 = p["wd"].reshape(9, e_dim).astype(jnp.float32)
            w1s.append(p["w1"])
            wdTs += [wd9[k][:, None] for k in range(9)]
        args = w1s + wdTs
    else:
        args = []
        for p in qkv:
            args += [p["w1"], p["wd"].reshape(9, e_dim).astype(jnp.float32)]
        for p in kv:
            args += [p["w1"], p["wd"].reshape(9, e_dim).astype(jnp.float32)]

    s_rows = _pick_strip_chm(h, w, c, e_dim, nf)
    assert s_rows, "no feasible strip size; use the XLA path"
    sw = s_rows * w
    n = sw + 2 * w

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    ln_t = _ln_t_ok(w)
    if ln_t:
        ln_args = (ln_args[0].reshape(c, 1), ln_args[1].reshape(c, 1))
    kernel = functools.partial(
        _chm_stats_kernel, ln_mode=ln_mode, s_rows=s_rows, w_img=w,
        e_dim=e_dim, n_frames=nf, chan_major=chan_major,
        per_frame=per_frame, ln_t=ln_t, interpret=interpret)
    last_row = h - 1
    s_ = s_rows
    xf = x.reshape(b, h * w, c)
    hspec = [
        pl.BlockSpec((1, w, c),
                     lambda b_, i: (b_, jnp.maximum(i * s_ - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w, c),
                     lambda b_, i: (b_, jnp.minimum(i * s_ + s_, last_row),
                                    0),
                     memory_space=pltpu.VMEM),
    ]
    if per_frame:
        # one halo/main/halo triple per frame, same clamped index maps as
        # the current-frame specs (the known-good blocked-row pattern)
        xs_ops = []
        for f in x_sp:
            xs_ops += [f.reshape(b, h * w, c)] * 3
        hspec_s = hspec * nf
    else:
        xsf = x_sp.reshape(b, nf, h * w, c)
        xs_ops = [xsf, xsf, xsf]
        hspec_s = [
            pl.BlockSpec((1, nf, w, c),
                         lambda b_, i: (b_, 0, jnp.maximum(i * s_ - 1, 0),
                                        0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, sw, c), lambda b_, i: (b_, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, w, c),
                         lambda b_, i: (b_, 0,
                                        jnp.minimum(i * s_ + s_, last_row),
                                        0),
                         memory_space=pltpu.VMEM),
        ]
    v, vh, g, gh, stats = pl.pallas_call(
        kernel,
        grid=(b, h // s_rows),
        in_specs=hspec + hspec_s + [vmem()] * (2 + len(args)),
        out_specs=(
            pl.BlockSpec((1, sw, e_dim), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, sw, e_dim), lambda b_, i: (b_, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_dim, e_dim), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf, e_dim, e_dim), lambda b_, i: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nf + 2, 8, e_dim), lambda b_, i: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h * w, e_dim), dt),
            jax.ShapeDtypeStruct((b, nf, h * w, e_dim), dt),
            jax.ShapeDtypeStruct((b, e_dim, e_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, nf, e_dim, e_dim), jnp.float32),
            jax.ShapeDtypeStruct((b, nf + 2, 8, e_dim), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, n) if ln_t else (n, c), jnp.float32),
            pltpu.VMEM((e_dim, n) if chan_major else (n, e_dim),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(xf, xf, xf, *xs_ops, *ln_args, *args)
    return (v.reshape(b, h, w, e_dim), vh.reshape(b, nf, h, w, e_dim),
            g, gh, stats)


def _pw_kernel(x_ref, ln_w, ln_b, w1, b1, w2, b2, scale, out_ref, *, mode,
               ln_mode, residual):
    """No-dwconv variant (FFW): plain blocked rows, no halo."""
    x = x_ref[0]
    xn = _ln_2d(x, ln_w, ln_b, ln_mode)
    hd = jnp.dot(xn, w1[:], preferred_element_type=jnp.float32)
    hd = hd + b1[:].astype(jnp.float32)
    if mode == "gate":
        e = hd.shape[-1] // 2
        act = _gelu_exact(hd[:, :e]) * hd[:, e:]
    else:
        act = _gelu_exact(hd)
    out = jnp.dot(act.astype(x.dtype), w2[:],
                  preferred_element_type=jnp.float32)
    out = (out + b2[:].astype(jnp.float32)) * scale[:].astype(jnp.float32)
    if residual:
        out = out + x.astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _pad128(v: int) -> int:
    return -(-v // 128) * 128


def _pad8(v: int) -> int:
    return -(-v // 8) * 8


def _strip_mem(s: int, w: int, c: int, e: int, n_pair: int = 0,
               ffw2_e: int = 0) -> int:
    n = (s + 2) * w
    mem = (n * c * 6            # fp32 LN scratch + cast copy
           + 2 * n * e * 4      # pw1 hidden scratch + one rolled base
           + 4 * s * w * e * 4  # acc/hdb/gelu transients
           + 3 * s * w * c * 4  # out accumulator, residual
           + 4 * s * w * c * 2   # double-buffered main/out blocks
           + 2 * n * 512)        # in-kernel (n,1) wrap-mask vregs
    # each pair map streams in as three more blocked inputs (halo above /
    # main / halo below), double-buffered, plus its po weight matrix
    mem += int(n_pair) * (4 * s * w * c * 2 + 8 * w * c * 2 + 2 * c * c * 2)
    # chained pointwise-FFW stage: LN2 copy + fp32 hidden/gelu transients
    if ffw2_e:
        mem += 3 * s * w * ffw2_e * 4 + 2 * s * w * c * 4
    return mem


def _strip_mem_honest(s: int, w: int, c: int, e: int, chan_major: bool,
                      n_pair: int = 0, ffw2_e: int = 0) -> int:
    """VMEM accounting with the REAL padded tile sizes (VERDICT r3 weak #5):
    the minor (lane) dim of every buffer pads to 128, the sublane dim to
    8 — so a channels-major (e, n) hidden with e = 160 costs e*n fp32
    exactly, while the token-major (n, e) twin pads e to 256; conversely
    (rows, 64) maps really cost (rows, 128). The legacy _strip_mem both
    under-counts c = 64 buffers and over-counts channels-major scratch
    (~40% — its (n, 1) mask charge is a lane-padded column that the cm
    kernel's (1, n) masks never pay)."""
    n = (s + 2) * w
    sw = s * w
    cp = _pad128(c)
    if chan_major:
        # hidden rides sublanes (pad 8); lane dim n is a w-multiple with
        # w % 128 == 0 (the cm legality gate) -> exact
        ep_hid = _pad8(e)
        hid = 2 * ep_hid * n * 4          # hidden scratch + rolled base
        trans = 4 * _pad8(e) * sw * 4     # acc/hdb/gelu transients
        masks = 2 * n * 4                  # (1, n) lane masks
    else:
        ep = _pad128(e)
        hid = 2 * n * ep * 4
        trans = 4 * sw * ep * 4
        masks = 2 * n * 512                # (n, 1) masks pad to 128 lanes
    mem = (n * cp * 6                      # fp32 LN scratch + cast copy
           + hid + trans
           + 3 * sw * cp * 4               # out accumulator, residual
           + 4 * sw * cp * 2               # double-buffered main/out blocks
           + masks)
    mem += int(n_pair) * (4 * sw * cp * 2 + 8 * w * cp * 2
                          + 2 * cp * cp * 2)
    if ffw2_e:
        mem += 3 * sw * _pad128(ffw2_e) * 4 + 2 * sw * cp * 4
    return mem


# the honest accounting admits larger strips (especially channels-major,
# where the legacy charge is ~40% high); its budget rides closer to the
# 100MB scoped-vmem limit. A/B knob: TURTLE_FFN_VMEM_MB.
_VMEM_BUDGET_HONEST = int(_os.environ.get("TURTLE_FFN_VMEM_MB", "80")) \
    * 1024 * 1024


def _pick_strip_honest(h: int, w: int, c: int, e: int, chan_major: bool,
                       n_pair: int = 0, ffw2_e: int = 0) -> int:
    best = 0
    for s in range(1, min(h, 32) + 1):
        if h % s == 0 and _strip_mem_honest(
                s, w, c, e, chan_major, n_pair, ffw2_e) <= _VMEM_BUDGET_HONEST:
            best = s
    return best


def _pick_strip(h: int, w: int, c: int, e: int,
                budget: int = _VMEM_BUDGET, n_pair: int = 0,
                ffw2_e: int = 0) -> int:
    """Rows per strip (divides h) fitting the VMEM budget; bigger strips
    amortise per-program overhead and give the MXU larger matmuls."""
    best = 0
    for s in range(1, min(h, 32) + 1):
        if h % s == 0 and _strip_mem(s, w, c, e, n_pair, ffw2_e) <= budget:
            best = s
    return best


def _pw_rows(rows: int, c: int, ch: int) -> int:
    """Row-block size for the no-dw (_pw_kernel) path, or 0 when no
    feasible block exists. Per-row live bytes: x + LN copy + fp32 hidden +
    ~3 gelu transients + fp32 out accumulator. The ONE source of truth —
    ffn_pallas_supported's promise and fused_block_ffn's grid both use it."""
    s = rows
    while s * (c * 10 + ch * 16) > _VMEM_BUDGET and s % 2 == 0:
        s //= 2
    return s if s * (c * 10 + ch * 16) <= _VMEM_BUDGET else 0


def _pw_rows_fit(rows: int, c: int, ch: int) -> bool:
    return _pw_rows(rows, c, ch) > 0


def block2_supported(h: int, w: int, c: int, e_dim: int,
                     ffw2_e: int) -> bool:
    """Gate for the chained ReducedAttn+FFW block kernel (dw 'gelu' chain
    with a pointwise-FFW stage appended — ONE traversal per block)."""
    return (w % 8 == 0
            and _pick_strip(h, w, c, e_dim, ffw2_e=ffw2_e) > 0
            # chaining lives only in the token-major program; at the
            # shapes that hit it (e == 2c) channels-major never fires,
            # enforce anyway
            and not _chan_major_ok(e_dim, w, False, new_site=True))


def ffn_pallas_supported(h: int, w: int, c: int, e_dim: int,
                         has_dw: bool, has_pair=False) -> bool:
    """e_dim = per-gate-half hidden width (CH//2 for gate, CH otherwise).
    has_pair: False/True or the NUMBER of pair-input maps."""
    if w % 8 or e_dim % 2:
        return False
    if has_dw and _pick_strip(h, w, c, e_dim, n_pair=int(has_pair)) == 0:
        return False
    if not has_dw and not _pw_rows_fit(h * w, c, e_dim):
        # a large odd row factor can leave the halving loop over budget —
        # promise only what the kernel can actually compile
        return False
    return True


def fused_ln_qkv_dw(x, *, ln_w=None, ln_b=None, w1, b1=None, wd, bd=None,
                    interpret: bool = False):
    """dw3x3(pw(LN(x))) in one pass — the qkv/kv/v projection front of the
    attention blocks (turtle_arch.py:238-239 etc.). Returns the (B,H,W,CH)
    hidden map."""
    return fused_block_ffn(x, ln_w=ln_w, ln_b=ln_b, w1=w1, b1=b1, wd=wd,
                           bd=bd, w2=None, mode="linear", residual=False,
                           interpret=interpret)


def _conv3_kernel(xa, xm, xb, w9, bias, ln_w, ln_b, out_ref, xn_ref,
                  acc_ref, *, s_rows, w_img, cout, ln_mode,
                  chan_major=False, ln_t=False, interpret=False):
    """Dense 3x3 conv as 9 shifted MXU matmuls over one row strip,
    optionally preceded by channel LN (the composite v+project_out chain
    of SAB folds into this shape: po o dw3x3 o pw1x1 == one dense conv
    with K[t] = w1 diag(wd[t]) w_po, bias-free).

    Same halo scheme as _dw_kernel: the strip's rows plus one clamped image
    row above/below, flattened (rows, Cin); column shifts are fp32 rolls
    masked at the row wrap; each tap contributes shifted_rows @ W[tap]
    ((rows, Cin) @ (Cin, Cout) on the MXU). XLA's conv lowering leaves
    3-4x on the table at these full-res shapes (measured 3.5-4.2 ms vs
    ~1-1.5 ms here for ending/down convs at 736x1280).

    chan_major: the U-Net's edge convs have SMALL Cout (ending 3, downs
    C/2, input 32/64) that pads to 128 lanes in the (rows, Cout) fp32
    accumulator — 9 tap adds at up to 42x VPU waste. The channels-major
    variant keeps every tap product transposed (Cout, rows): Cout rides
    sublanes (pad 8), the pixel dim is exact lanes; tap matmuls come out
    transposed straight from dot_general dimension numbers, column shifts
    are lane rolls of the small (Cout, n) products, and the output pays
    one exact identity-matmul transpose (_cm_to_rows)."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    cml_x, cmr_x = _col_wrap_masks(n, w)

    f0 = (i == 0).astype(jnp.float32)
    fl = (i == last).astype(jnp.float32)
    cdt = xm.dtype
    # ln_t (r5, chan-major only): the LN scratch lives transposed (cin, n)
    # with sublane reduces; the tap dots contract dim 0 of both operands
    # instead — the (Cout, n) products and everything after are unchanged
    _fill_ln_scratch(xn_ref, xa[0], xm[0], xb[0], ln_w, ln_b, ln_mode,
                     w=w, sw=sw, n=n, f0=f0, fl=fl, ln_t=ln_t, cdt=cdt,
                     interpret=interpret)

    if chan_major:
        # wrap masks over the SLICED sw lanes: rolls happen post-slice
        # (slices are whole image rows, so the roll's wrap-around lane is
        # always a masked col-0 / col-(w-1) position — exact)
        cml_s, cmr_s = _col_wrap_masks_lane(sw, w)
        xn_cdt = xn_ref[:].astype(cdt)
        cpad = acc_ref.shape[0]  # cout padded to a sublane multiple of 8
        acc_ref[:] = jnp.zeros((cpad, sw), jnp.float32)
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                k = (di + 1) * 3 + (dj + 1)
                # (Cpad, n) = w9[k]^T-contraction against the (n, Cin)
                # LN scratch — no transpose op exists anywhere
                lo = w + di * w
                tap = _dg_f32(w9[k], xn_cdt, ((0,), (0 if ln_t else 1,)),
                              interpret)[:, lo:lo + sw]
                if dj == -1:
                    tap = pltpu.roll(tap, shift=1, axis=1) * cml_s
                elif dj == 1:
                    tap = pltpu.roll(tap, shift=sw - 1, axis=1) * cmr_s
                acc_ref[:] = acc_ref[:] + tap
        acc = acc_ref[:] + bias[:].astype(jnp.float32)[:, None]
        out_ref[0] = _cm_to_rows(acc, n_keep=cout).astype(out_ref.dtype)
        return

    # accumulate through a scratch ref: an SSA accumulator lets Mosaic keep
    # all 9 tap-matmul temporaries live at once (measured 222MB vmem at the
    # 368x640x256 up-conv); the ref write serialises them
    acc_ref[:] = jnp.zeros((sw, cout), jnp.float32)
    for dj in (-1, 0, 1):
        if dj == -1:
            base = pltpu.roll(xn_ref[:], shift=1, axis=0) * cml_x
        elif dj == 1:
            base = pltpu.roll(xn_ref[:], shift=n - 1, axis=0) * cmr_x
        else:
            base = xn_ref[:]
        for di in (-1, 0, 1):
            lo = w + di * w
            k = (di + 1) * 3 + (dj + 1)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                base[lo:lo + sw, :].astype(cdt), w9[k],
                preferred_element_type=jnp.float32)
    out_ref[0] = (acc_ref[:] + bias[:].astype(jnp.float32)
                  ).astype(out_ref.dtype)


def conv3x3_pallas_supported(h: int, w: int, cin: int, cout: int) -> bool:
    return w % 8 == 0 and _pick_strip_conv3(h, w, cin, cout) > 0


def _pick_strip_conv3(h: int, w: int, cin: int, cout: int) -> int:
    best = 0
    for s in range(1, min(h, 64) + 1):
        n = (s + 2) * w
        mem = (n * cin * 8          # fp32 scratch + one rolled base
               + 3 * s * w * cout * 4   # fp32 acc scratch + dot transients
               + 4 * s * w * cin * 2    # double-buffered inputs
               + 2 * s * w * cout * 2   # double-buffered output
               + 2 * n * 512)           # in-kernel wrap-mask vregs
        if h % s == 0 and mem <= _VMEM_BUDGET // 2:
            best = s
    return best


def fused_conv3x3(x, weight, bias=None, *, ln_w=None, ln_b=None,
                  interpret: bool = False):
    """3x3 stride-1 pad-1 dense conv on NHWC ``x``, optionally preceded by
    channel LN; weight (3, 3, Cin, Cout). The glue convs of the U-Net
    (input/ending/Down/Up bodies) and the composite SAB v+project_out
    chain."""
    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    dt = x.dtype
    w9 = weight.reshape(9, cin, cout).astype(dt)
    bias_a = (bias if bias is not None else jnp.zeros((cout,), dt))
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else jnp.zeros((cin,), dt),
               ln_b if ln_b is not None else jnp.zeros((cin,), dt))

    s_rows = _pick_strip_conv3(h, w, cin, cout)
    assert s_rows, "no feasible strip size; use the XLA conv"
    sw = s_rows * w
    n = sw + 2 * w

    # channels-major pays off while Cout pads on lanes (< 128); the lane
    # slices at ±w offsets need w % 128 == 0 (same A/B knobs as
    # _chan_major_ok: TURTLE_CHAN_MAJOR=0 kills it, _NEW=0 reverts this
    # post-5.335 site). Sub-8 couts HUNG the Mosaic compiler when used
    # bare (a (3, sw) scratch / M=3 tap dots / K=3 identity contraction —
    # do NOT retry); they are instead padded to a sublane multiple
    # host-side and sliced back inside the exact transpose matmul
    # (_cm_to_rows n_keep). Sub-8 CIN also HANGS (cin=3 input projection:
    # K=3 tap dots against the (n, 3) scratch — timed out on chip, do NOT
    # retry); the input projection stays token-major (its K=3 dots are
    # M=n there, proven on chip).
    force = _os.environ.get("TURTLE_CHAN_MAJOR")
    chan_major = (w % 128 == 0 and cout < 128 and cin >= 8
                  and force != "0"
                  and _os.environ.get("TURTLE_CHAN_MAJOR_NEW") != "0")
    # transposed LN (r5): chan-major branch only (its tap dots consume the
    # scratch whole); pointless without an actual LN
    ln_t = chan_major and ln_mode != "none" and _ln_t_ok(w)
    if ln_t:
        ln_args = (ln_args[0].reshape(cin, 1), ln_args[1].reshape(cin, 1))
    cpad = (cout + 7) // 8 * 8
    if chan_major and cpad != cout:
        w9 = jnp.pad(w9, ((0, 0), (0, 0), (0, cpad - cout)))
        bias_a = jnp.pad(bias_a, (0, cpad - cout))

    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    last_row = h - 1
    s_ = s_rows
    xf = x.reshape(b, h * w, cin)
    out = pl.pallas_call(
        functools.partial(_conv3_kernel, s_rows=s_rows, w_img=w, cout=cout,
                          ln_mode=ln_mode, chan_major=chan_major,
                          ln_t=ln_t, interpret=interpret),
        grid=(b, h // s_rows),
        in_specs=[
            pl.BlockSpec((1, w, cin),
                         lambda b_, i: (b_, jnp.maximum(i * s_ - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sw, cin), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, cin),
                         lambda b_, i: (b_, jnp.minimum(i * s_ + s_, last_row),
                                        0),
                         memory_space=pltpu.VMEM),
        ] + [vmem()] * 4,
        out_specs=pl.BlockSpec((1, sw, cout), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, cout), dt),
        scratch_shapes=[pltpu.VMEM((cin, n) if ln_t else (n, cin),
                                   jnp.float32),
                        pltpu.VMEM((cpad, sw) if chan_major else (sw, cout),
                                   jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xf, xf, xf, w9, bias_a, *ln_args)
    return out.reshape(b, h, w, cout)


def split_proj_supported(h: int, w: int, c: int, e_dim: int,
                         n_out: int) -> bool:
    return w % 8 == 0 and _pick_strip_multi(h, w, c, e_dim, n_out) > 0


def _strip_mem_multi(s: int, w: int, c: int, e: int, n_out: int) -> int:
    n = (s + 2) * w
    return (n * c * 6            # fp32 LN scratch + cast copy
            + 2 * n * e * 4      # pw1 hidden scratch + one rolled base
            + 2 * s * w * e * 4  # acc transients
            + 4 * s * w * c * 2  # double-buffered main input blocks
            + 2 * n_out * s * w * e * 2  # double-buffered outputs
            + 2 * n * 512)       # in-kernel (n,1) wrap-mask vregs


def _pick_strip_multi(h: int, w: int, c: int, e: int, n_out: int) -> int:
    best = 0
    for s in range(1, min(h, 64) + 1):
        if h % s == 0 and _strip_mem_multi(s, w, c, e, n_out) <= _VMEM_BUDGET:
            best = s
    return best


def fused_ln_split_proj(x, projs, *, ln_w=None, ln_b=None,
                        interpret: bool = False):
    """N independent dw3x3(pw(LN(x))) chains in ONE pass over ``x``.

    projs: sequence of dicts {w1: (C, E), b1, wd: (3, 3, E), bd} — the
    pre-split q/k/v (or q/k, k/v) heads of an attention projection. All E
    must be equal. Returns a tuple of (B, H, W, E) arrays.

    vs calling fused_ln_qkv_dw once on the concatenated weights: the outputs
    arrive UNINTERLEAVED (no (B, L, 3, heads, ctok) slicing copies
    downstream) and x / LN(x) are read/computed once for all N chains.
    """
    b, h, w, c = x.shape
    n_out = len(projs)
    e_dim = projs[0]["w1"].shape[1]
    assert all(p["w1"].shape[1] == e_dim for p in projs)
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else zeros((c,)),
               ln_b if ln_b is not None else zeros((c,)))
    assert w % 8 == 0, "fused split-proj kernel needs W % 8 == 0"

    has_b1 = any(p.get("b1") is not None or p.get("bd") is not None
                 for p in projs)
    chan_major = _chan_major_ok(e_dim, w, has_b1, new_site=True)

    args = []
    for p in projs:
        wd9 = p["wd"].reshape(9, e_dim).astype(jnp.float32)
        if chan_major:
            args += [p["w1"], *[wd9[k][:, None] for k in range(9)]]
            continue
        args += _proj_tap_args(p, wd9, e_dim, has_b1, zeros)

    s_rows = _pick_strip_multi(h, w, c, e_dim, n_out)
    assert s_rows, "no feasible strip size; use the XLA path"
    sw = s_rows * w
    n = sw + 2 * w


    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    grid = (b, h // s_rows)
    ln_t = _ln_t_ok(w)
    if ln_t:
        ln_args = (ln_args[0].reshape(c, 1), ln_args[1].reshape(c, 1))
    kernel = functools.partial(
        _multi_dw_kernel, n_out=n_out, ln_mode=ln_mode, s_rows=s_rows,
        w_img=w, e_dim=e_dim, has_b1=has_b1, chan_major=chan_major,
        ln_t=ln_t, interpret=interpret)
    last_row = h - 1
    s_ = s_rows
    xf = x.reshape(b, h * w, c)
    out_spec = pl.BlockSpec((1, sw, e_dim), lambda b_, i: (b_, i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, w, c),
                         lambda b_, i: (b_, jnp.maximum(i * s_ - 1, 0), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c),
                         lambda b_, i: (b_, jnp.minimum(i * s_ + s_, last_row),
                                        0),
                         memory_space=pltpu.VMEM),
        ] + [vmem()] * (2 + len(args)),
        out_specs=tuple(out_spec for _ in range(n_out)),
        out_shape=tuple(jax.ShapeDtypeStruct((b, h * w, e_dim), dt)
                        for _ in range(n_out)),
        scratch_shapes=[
            pltpu.VMEM((c, n) if ln_t else (n, c), jnp.float32),
            pltpu.VMEM((e_dim, n) if chan_major else (n, e_dim),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(xf, xf, xf, *ln_args, *args)
    return tuple(o.reshape(b, h, w, e_dim) for o in outs)


def fused_block_ffn(x, *, x2=None, po_w=None, po_b=None, ln_w=None,
                    ln_b=None, w1, b1=None, wd=None, bd=None, w2=None,
                    b2=None, scale=None, mode: str, residual: bool = True,
                    ffw2=None, interpret: bool = False):
    """Apply the fused FFN chain to NHWC ``x`` (see module docstring).

    w1: (C, CH); wd/bd: (3, 3, CH) or None (no dwconv); w2: (E, C) with
    E = CH//2 for 'gate' else CH; scale: optional (C,) output scale.
    x2: optional second addend map — the block's attention branch; the
    kernel computes over (x + x2) so the residual sum never hits HBM
    (dw path only). po_w (C, C) or (B, C, C) / po_b: optional projection
    applied to x2 in-kernel (the attention project_out), so the projected
    map never materialises either.
    x2 / po_w may also be LISTS of maps / matrices: the kernel sums
    x + sum_j(x2_j @ po_j) (+ po_b once) — CHM's attention apply arrives
    this way (per-history-frame value maps with composed attn@W_po
    matrices), so neither the attention output map, its projection, nor
    the residual sum ever round-trip HBM. A list entry may be a STACKED
    (B, M, H, W, C) array — each of its M maps streams through its own
    block specs indexing the frame dim directly (no per-frame slice copies
    on the XLA side); po_w stays one matrix per FINAL map, stacked frames
    flattened in order.

    ffw2: optional dict {ln_w, ln_b?, w1 (C, F), b1 (F,), w2 (F, C),
    b2 (C,), scale (C,)} — a SECOND, pointwise (no-dw) FFW half chained
    after this chain's output y: out = y + scale*(pw2(gelu(pw1(LN2 y)))
    + b2). The whole ReducedAttn+FFW block (turtle_arch.py:627-665 +
    :184-213 wired per :727-734) becomes ONE map traversal; y is cast
    through the model dtype in-kernel, so the result is bitwise what the
    two-kernel version produced. Token-major dw path only.
    """
    b, h, w, c = x.shape
    x2_entries = (list(x2) if isinstance(x2, (list, tuple))
                  else ([x2] if x2 is not None else []))
    # flatten to per-map streams: (reshaped array, frame index or None)
    x2_flat = []
    for e in x2_entries:
        if e.ndim == 5:
            bq, m, hh, wwid, cc = e.shape
            ef = e.reshape(bq, m, hh * wwid, cc)
            x2_flat += [(ef, j) for j in range(m)]
        else:
            x2_flat.append((e, None))
    if isinstance(x2, (list, tuple)) or (x2 is not None and x2.ndim == 5):
        po_ws = list(po_w) if po_w is not None else None
    else:
        po_ws = [po_w] if po_w is not None else None
    n_pair = len(x2_flat)
    assert po_ws is None or len(po_ws) == n_pair, \
        "po_w must carry one matrix per (flattened) pair map"
    ch = w1.shape[1]
    halo = wd is not None
    dt = x.dtype
    zeros = functools.partial(jnp.zeros, dtype=dt)
    ln_mode = ("none" if ln_w is None
               else ("bias_free" if ln_b is None else "with_bias"))
    ln_args = (ln_w if ln_w is not None else zeros((c,)),
               ln_b if ln_b is not None else zeros((c,)))
    b1f = b1 if b1 is not None else zeros((ch,))
    e_dim = ch // 2 if mode == "gate" else ch
    out_c = ch if mode == "linear" else c
    b2a = b2 if b2 is not None else zeros((out_c,))
    sc = scale if scale is not None else jnp.ones((out_c,), dt)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    xf = x.reshape(b, h * w, c)

    if not halo:
        assert n_pair == 0, "pair-input fusion is dw-path only"
        # the gate branch lane-slices the hidden at offset e_dim in-kernel;
        # non-128-multiple lane offsets HANG the Mosaic compiler (module
        # docstring) — refuse loudly instead (no product config hits this:
        # GFFW always has a dwconv)
        assert mode != "gate" or e_dim % 128 == 0, (
            "gate without dwconv needs 128-aligned halves "
            f"(e_dim={e_dim}); use the XLA path")
        rows = h * w
        s = _pw_rows(rows, c, ch)
        assert s > 0, (
            "no feasible row block for the no-dw kernel; use the XLA path")
        grid = (b, rows // s)
        out = pl.pallas_call(
            functools.partial(_pw_kernel, mode=mode, ln_mode=ln_mode,
                              residual=residual),
            grid=grid,
            in_specs=[pl.BlockSpec((1, s, c), lambda b_, i: (b_, i, 0),
                                   memory_space=pltpu.VMEM),
                      vmem(), vmem(), vmem(), vmem(), vmem(), vmem(), vmem()],
            out_specs=pl.BlockSpec((1, s, c), lambda b_, i: (b_, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, rows, c), dt),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(xf, *ln_args, w1, b1f, w2, b2a, sc)
        return out.reshape(b, h, w, c)

    assert w % 8 == 0, "fused dw-FFN kernel needs W % 8 == 0"


    wd9 = wd.reshape(9, ch).astype(jnp.float32)
    has_b1 = (b1 is not None) or (bd is not None)
    bdf = (bd if bd is not None else zeros((ch,))).astype(jnp.float32)
    b1ff = b1f.astype(jnp.float32)

    def half_args(lo):
        """(w1 half, per-tap dw weights) + optionally 9 bias vectors for
        channels [lo, lo+e_dim) of the hidden dim."""
        w1h = w1[:, lo:lo + e_dim]
        wdh = wd9[:, lo:lo + e_dim]
        b1h = b1ff[lo:lo + e_dim]
        bdh = bdf[lo:lo + e_dim]
        mats = [w1h, wdh]
        if not has_b1:
            return mats
        return mats + _tap_bias_vecs(wdh, b1h, bdh)

    # channels-major layout (_cm_chain). Measured 736x1280 e=160 gate
    # (pad 1.6x): 8.12 -> 6.05 ms; 368x640 e=320 (pad 1.2x): 1.88 -> 2.11
    # ms — the lane-roll/layout overhead eats a 1.2x saving, hence the
    # >= 1.5x pad-ratio gate in _chan_major_ok. Biased chains (the
    # ReducedAttn conv1/conv2 biases) are supported via direct (e, 1)
    # bias columns — pass has_b1=False to the gate.
    chan_major = (mode in ("gate", "linear", "gelu") and ffw2 is None
                  and _chan_major_ok(e_dim, w, False,
                                     new_site=(mode != "gate") or has_b1)
                  # the cm bias-column border re-zeroing writes lane
                  # slices at n-w — illegal at roll-tap widths
                  and not (has_b1 and w % 128 != 0))
    assert ffw2 is None or mode != "linear", "ffw2 needs a full FFN chain"

    a0 = half_args(0)
    wdT = lambda lo: [wd9[k, lo:lo + e_dim][:, None]  # noqa: E731
                      for k in range(9)]
    bcols = lambda lo: [b1ff[lo:lo + e_dim][:, None],  # noqa: E731
                        bdf[lo:lo + e_dim][:, None]]
    if chan_major and mode == "gate":
        args = [a0[0], w1[:, e_dim:2 * e_dim]] + wdT(0) + wdT(e_dim)
        if has_b1:
            args += bcols(0) + bcols(e_dim)
    elif chan_major:
        args = [a0[0]] + wdT(0)
        if has_b1:
            args += bcols(0)
    elif mode == "gate":
        a1 = half_args(e_dim)
        args = a0[:2] + a1[:2] + a0[2:] + a1[2:]
    else:
        args = a0

    ffw2_ln_mode = None
    if ffw2 is not None:
        ffw2_ln_mode = "bias_free" if ffw2.get("ln_b") is None else "with_bias"
    f2e = ffw2["w1"].shape[1] if ffw2 else 0
    # honest padded-size accounting first (bigger strips where the real
    # VMEM allows); the legacy conservative pick is the floor — the shape
    # gate (ffn_pallas_supported) promises exactly the legacy pick
    s_rows = max(
        _pick_strip_honest(h, w, c, e_dim, chan_major, n_pair=n_pair,
                           ffw2_e=f2e),
        _pick_strip(h, w, c, e_dim, budget=_VMEM_BUDGET_FFN, n_pair=n_pair,
                    ffw2_e=f2e))
    assert s_rows, "no feasible strip size; use the XLA path"
    sw = s_rows * w
    n = sw + 2 * w

    w2a = w2 if w2 is not None else zeros((1, out_c))
    args += [w2a, b2a, sc]
    if ffw2 is not None:
        f2_lnw = ffw2["ln_w"]
        f2_lnb = (ffw2["ln_b"] if ffw2.get("ln_b") is not None
                  else zeros((c,)))
        if _ln_t_ok(w):
            # the transposed LN2 consumes (c, 1) columns (_ln_t_f32)
            f2_lnw, f2_lnb = f2_lnw.reshape(c, 1), f2_lnb.reshape(c, 1)
        args += [f2_lnw, f2_lnb,
                 ffw2["w1"], ffw2["b1"], ffw2["w2"], ffw2["b2"],
                 ffw2["scale"]]

    grid = (b, h // s_rows)
    pair_4d_flags = tuple(e.ndim == 5 for e in x2_entries
                          for _ in range(e.shape[1] if e.ndim == 5 else 1))
    ln_t = _ln_t_ok(w)
    if chan_major:
        kernel = functools.partial(
            _dw_gate_cm_kernel, mode=mode, ln_mode=ln_mode, s_rows=s_rows,
            w_img=w, e_dim=e_dim, residual=residual,
            n_pair=n_pair, pair_4d=pair_4d_flags, has_po=po_ws is not None,
            has_b1=has_b1, ln_t=ln_t, interpret=interpret)
    else:
        kernel = functools.partial(
            _dw_kernel, mode=mode, ln_mode=ln_mode, s_rows=s_rows, w_img=w,
            e_dim=e_dim, has_b1=has_b1, residual=residual,
            n_pair=n_pair, pair_4d=pair_4d_flags, has_po=po_ws is not None,
            ffw2_ln_mode=ffw2_ln_mode, ln_t=ln_t, interpret=interpret)
    last_row = h - 1
    s_ = s_rows
    halo_specs = [
        # halo row above / S main rows / halo row below; halos are
        # clamped at the borders (zeroed in-kernel)
        pl.BlockSpec((1, w, c),
                     lambda b_, i: (b_, jnp.maximum(i * s_ - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, sw, c), lambda b_, i: (b_, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, w, c),
                     lambda b_, i: (b_, jnp.minimum(i * s_ + s_, last_row),
                                    0),
                     memory_space=pltpu.VMEM),
    ]
    # transposed-LN kernels take ln_w/ln_b as (c, 1) columns (the in-kernel
    # (1,c)->(c,1) transpose is a hang trigger; host reshape is free)
    ln_in = ((ln_args[0].reshape(c, 1), ln_args[1].reshape(c, 1))
             if ln_t else ln_args)
    inputs = [xf, xf, xf, *ln_in]
    in_specs = list(halo_specs) + [vmem(), vmem()]
    pair_4d = []
    for x2j, frame in x2_flat:
        if frame is None:
            x2f = x2j.reshape(b, h * w, c)
            inputs += [x2f, x2f, x2f]
            in_specs += list(halo_specs)
            pair_4d.append(False)
        else:
            # stacked (B, M, HW, C) buffer: this map's blocks index the
            # frame dim directly — the per-frame map is never sliced out
            inputs += [x2j, x2j, x2j]
            in_specs += [
                pl.BlockSpec(
                    (1, 1, w, c),
                    lambda b_, i, _j=frame: (b_, _j,
                                             jnp.maximum(i * s_ - 1, 0), 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, sw, c),
                    lambda b_, i, _j=frame: (b_, _j, i, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, w, c),
                    lambda b_, i, _j=frame: (b_, _j,
                                             jnp.minimum(i * s_ + s_,
                                                         last_row), 0),
                    memory_space=pltpu.VMEM),
            ]
            pair_4d.append(True)
    if n_pair and po_ws is not None:
        for pwj in po_ws:
            # each po may be (C, C) shared or (B, C, C) per-batch (the
            # fused attention's data-dependent po' matrices);
            # batch-blocked either way
            po_w3 = (pwj[None] if pwj.ndim == 2 else pwj).astype(dt)
            inputs.append(po_w3)
            in_specs.append(pl.BlockSpec(
                (1, c, c),
                lambda b_, i, _l=po_w3.shape[0] - 1: (jnp.minimum(b_, _l),
                                                      0, 0),
                memory_space=pltpu.VMEM))
        inputs.append(po_b if po_b is not None else jnp.zeros((c,), dt))
        in_specs.append(vmem())
    inputs += args
    in_specs += [vmem()] * len(args)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, sw, out_c), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, out_c), dt),
        scratch_shapes=[
            # LN(x) with halo rows; transposed-LN keeps it as (c, n)
            pltpu.VMEM((c, n) if ln_t else (n, c), jnp.float32),
            # pw1 hidden (rollable); channels-major keeps it transposed
            pltpu.VMEM((e_dim, n) if chan_major else (n, e_dim),
                       jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(*inputs).reshape(b, h, w, out_c)
