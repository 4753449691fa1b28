"""Pallas TPU megakernel: a RUN of Channel+GFFW blocks with the level map
resident in VMEM.

A cacheless channel-attention block (turtle_arch.py:589-625 + :162-181,
wired per :727-734) is, per block, two full map traversals in the split
kernel design (qkv-stats kernel + gate-FFN kernel) with a tiny (c, c)
softmax between them. At the coarse U-Net levels the whole map is far
smaller than VMEM (latent 92x160x512 bf16 = 15 MB, enc3/dec3 30 MB vs the
~100 MB scoped limit), so this kernel keeps the map IN VMEM across all
N blocks of a level's Channel run: grid = (batch, n_blocks), the output
block (constant index map, revisited every step) is the working state,
per-block weights stream through block-indexed specs, and the only HBM
traffic for the whole run is one map read + one map write. Per block this
deletes ~5 map round-trips (v write+read, out write+read, x re-read) and
two kernel launches.

In-kernel per grid step (block bi):
  pass 1 (strip fori): LN1 -> q/k/v chains (_tm_chain); q^T k Gram and
     q/k squared-norm columns accumulate in fp32 scratch; v -> VMEM buffer.
  softmax: per-head block-diagonal masked softmax of the normalised Gram
     (rows/cols scaled by 1/max(|q|,eps), temperature per head), then
     po' = blockdiag(attn)^T @ W_po — all (c, c) 2-D ops.
  pass 2 (strip fori): pair = x + (v @ po'); LN2 -> GFFW gate chains ->
     out = pair + pw2(gelu(h_a) * h_b), written back into the working map
     through a one-strip stash (the in-place write must not clobber the
     next strip's halo rows).

Mosaic legality (CLAUDE.md hang list): everything is 2-D; dynamic indexing
only on sublane dims (pl.ds with full-lane rows); the (1, c) <-> (c, 1)
orientation problem of the norm vectors is solved by ACCUMULATING each in
its consumption orientation (columns via a ones-contraction on the MXU,
rows via a sublane reduce) instead of transposing; off-head Gram entries
are masked with an iota-derived block-diagonal mask instead of 64-offset
lane slices (which hang).

Bias-free configs only (the shipped ones: `bias: False` on every conv in
these blocks); LayerNorm biases supported.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turtlevsr_tpu.kernels.ffn import (
    _col_wrap_masks,
    _dg_f32,
    _gelu_exact,
    _ln_2d_f32,
    _tm_chain,
    _VMEM_LIMIT,
)

_EPS = 1e-12


def _chan_gffw_run_kernel(x_ref, ln1w, ln1b, w1q, wd9q, w1k, wd9k, w1v,
                          wd9v, tcol, wpo, ln2w, ln2b, w1a, wd9a, w1b_,
                          wd9b, w2, out_ref, v_ref, xn_ref, h1_ref, h1c_ref,
                          g_ref, nqc_ref, nkr_ref, stash_ref, dma_sem, *,
                          ln_mode, s_rows, w_img, h_img, c, e_dim, ctok,
                          n_strips, interpret):
    bi = pl.program_id(1)
    w = w_img
    sw = s_rows * w
    n = sw + 2 * w
    hw = h_img * w
    cml_x, cmr_x = _col_wrap_masks(n, w)
    cdt = x_ref.dtype

    b0 = pl.program_id(0)

    @pl.when(bi == 0)
    def _load():
        # x stays in HBM (ANY space, no resident VMEM copy); one aligned
        # whole-map DMA seeds the working buffer at block 0
        if interpret:  # the interpreter has no DMA; plain copy
            out_ref[0] = x_ref[b0]
        else:
            cp = pltpu.make_async_copy(x_ref.at[b0], out_ref.at[0], dma_sem)
            cp.start()
            cp.wait()

    g_ref[:] = jnp.zeros_like(g_ref)
    nqc_ref[:] = jnp.zeros_like(nqc_ref)
    nkr_ref[:] = jnp.zeros_like(nkr_ref)

    def fill_ln(top, mid, bot, lwr, lbr, f0, fl):
        # ln refs are (1, 8, c) blocks (sublane-compliant); row 0 is real
        lw, lb = lwr[0, 0:1, :], lbr[0, 0:1, :]
        xn_ref[0:w, :] = _ln_2d_f32(top, lw, lb, ln_mode) * (1.0 - f0)
        xn_ref[w:w + sw, :] = _ln_2d_f32(mid, lw, lb, ln_mode)
        xn_ref[w + sw:n, :] = _ln_2d_f32(bot, lw, lb, ln_mode) * (1.0 - fl)

    unrolled = _os.environ.get("TURTLE_MEGAKERNEL_UNROLL", "1") != "0"

    def strip_rows(si):
        if unrolled:  # static python index: offsets and masks fold
            return (float(si == 0), float(si == n_strips - 1), si * sw,
                    max(si * sw - w, 0), min(si * sw + sw, hw - w))
        f0 = (si == 0).astype(jnp.float32)
        fl = (si == n_strips - 1).astype(jnp.float32)
        # every offset is a multiple of w (w % 8 == 0 gated); Mosaic needs
        # the sublane alignment proven explicitly for dynamic indices
        start = pl.multiple_of(si * sw, 8)
        top = pl.multiple_of(jnp.maximum(si * sw - w, 0), 8)
        bot = pl.multiple_of(jnp.minimum(si * sw + sw, hw - w), 8)
        return f0, fl, start, top, bot

    def strip_loop(body):
        if unrolled:
            for si in range(n_strips):
                body(si, 0)
        else:
            jax.lax.fori_loop(0, n_strips, body, 0, unroll=False)

    def chain_e(w1h, wd9h, e):
        # the c-wide qkv chains and the e-wide gate chains use separate
        # hidden scratches (a ref write must cover the full ref shape)
        href = h1c_ref if e == c else h1_ref
        return _tm_chain(xn_ref[:].astype(cdt), w1h, wd9h, href,
                         cml_x, cmr_x, w=w, sw=sw, n=n, e_dim=e)

    ones_col = jnp.ones((sw, 1), jnp.float32)

    def p1(si, _):
        f0, fl, start, top, bot = strip_rows(si)
        fill_ln(out_ref[0, pl.ds(top, w)], out_ref[0, pl.ds(start, sw)],
                out_ref[0, pl.ds(bot, w)], ln1w, ln1b, f0, fl)
        q = chain_e(w1q[0], wd9q[0], c).astype(cdt)
        k = chain_e(w1k[0], wd9k[0], c).astype(cdt)
        v_ref[pl.ds(start, sw)] = chain_e(w1v[0], wd9v[0], c
                                          ).astype(v_ref.dtype)
        g_ref[:] = g_ref[:] + _dg_f32(q, k, ((0,), (0,)), interpret)
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        # |q|^2 lands as a COLUMN (ones-contraction on the MXU), |k|^2 as
        # a ROW (sublane reduce) — each in the orientation the normalised
        # Gram consumes, so no (1, c) <-> (c, 1) transpose ever exists
        nqc_ref[:] = nqc_ref[:] + jax.lax.dot_general(
            qf * qf, ones_col, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        nkr_ref[:] = nkr_ref[:] + jnp.sum(kf * kf, axis=0, keepdims=True)
        return 0

    strip_loop(p1)

    # --- tiny (c, c) softmax + composed po' ---
    # mirror the XLA chain op-for-op (divide by the norm product, not
    # reciprocal-multiplies) so fp32 parity holds to the ulp
    def safe_norm(ss):
        nz = ss > 0
        nrm = jnp.sqrt(jnp.where(nz, ss, 1.0))
        return jnp.maximum(jnp.where(nz, nrm, 0.0), _EPS)

    sc = g_ref[:] / (safe_norm(nqc_ref[:]) * safe_norm(nkr_ref[:]))
    sc = sc * tcol[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    on_blk = (ri // ctok) == (ci // ctok)
    masked = jnp.where(on_blk, sc, -jnp.inf)
    mx = jnp.max(masked, axis=-1, keepdims=True)
    ex = jnp.exp(masked - mx)
    attn = (ex / jnp.sum(ex, axis=-1, keepdims=True)).astype(cdt)
    # po'[(h,d), z] = sum_c' attn[(h,c'), (h,d)] * wpo[(h,c'), z]
    po = _dg_f32(attn, wpo[0], ((0,), (0,)), interpret).astype(cdt)

    # --- pass 2: pair + LN2 + gate chains, in-place via one-strip stash ---
    def pair(rs, cnt):
        xr = out_ref[0, pl.ds(rs, cnt)]
        a2 = _dg_f32(v_ref[pl.ds(rs, cnt)], po, ((1,), (0,)),
                     interpret).astype(cdt)
        return (xr.astype(jnp.float32) + a2.astype(jnp.float32)).astype(cdt)

    def p2(si, _):
        f0, fl, start, top, bot = strip_rows(si)
        x_mid = pair(start, sw)
        fill_ln(pair(top, w), x_mid, pair(bot, w), ln2w, ln2b, f0, fl)
        hdb = chain_e(w1b_[0], wd9b[0], e_dim)
        act = _gelu_exact(chain_e(w1a[0], wd9a[0], e_dim)) * hdb
        o = _dg_f32(act.astype(cdt), w2[0], ((1,), (0,)), interpret)
        o = (o + x_mid.astype(jnp.float32)).astype(cdt)

        # the write of strip si-1 happens AFTER strip si's halo reads
        if unrolled:
            if si > 0:
                out_ref[0, pl.ds((si - 1) * sw, sw)] = stash_ref[:]
        else:
            @pl.when(si > 0)
            def _flush():
                prev = pl.multiple_of(jnp.maximum(si - 1, 0) * sw, 8)
                out_ref[0, pl.ds(prev, sw)] = stash_ref[:]

        stash_ref[:] = o
        return 0

    strip_loop(p2)
    out_ref[0, pl.ds((n_strips - 1) * sw, sw)] = stash_ref[:]


def _pick_strip_run(h: int, w: int, c: int, e: int) -> int:
    """Strip rows for the in-VMEM passes: transient-bounded, not
    HBM-stream-bounded — keep the per-strip fp32 working set modest."""
    budget = 24 * 1024 * 1024
    best = 0
    for s in range(1, min(h, 16) + 1):
        n = (s + 2) * w
        mem = (n * c * 6 + 2 * n * e * 4 + 4 * s * w * e * 4
               + 4 * s * w * c * 4)
        if h % s == 0 and mem <= budget:
            best = s
    return best


def channel_run_supported(h: int, w: int, c: int, e_dim: int,
                          n_blocks: int) -> bool:
    """Whole-map-resident feasibility: working map + x input + v buffer +
    strip scratch + double-buffered per-block weights inside the scoped
    VMEM limit."""
    if n_blocks < 2 or w % 8 or c % 128:
        return False
    s = _pick_strip_run(h, w, c, e_dim)
    if not s:
        return False
    hw = h * w
    n = (s + 2) * w
    wmem = (3 * c * c + 2 * c * e_dim + e_dim * c + c * c) * 2  # bf16
    mem = (2 * hw * c * 2               # working map + v buffer (x: HBM)
           + n * c * 8 + n * e_dim * 4  # LN + both hidden scratches
           + c * c * 4 * 3              # gram + softmax transients
           + s * w * c * 2              # stash
           + 2 * wmem)                  # double-buffered weight blocks
    return mem <= 88 * 1024 * 1024


def fused_channel_gffw_run(x, blocks, *, heads: int, ln_mode: str,
                           interpret: bool = False):
    """Run ``len(blocks)`` Channel+GFFW blocks over ``x`` with the map
    resident in VMEM. blocks: per-block dicts with pre-split bias-free
    weights:
      ln1_w, ln1_b?, w1_q/wd_q, w1_k/wd_k, w1_v/wd_v ((C,C)/(3,3,C)),
      temp (heads,), wpo (C,C), ln2_w, ln2_b?,
      w1_a/wd_a, w1_b/wd_b ((C,E)/(3,3,E)), w2 (E,C).
    Returns (B, H, W, C)."""
    b, h, w, c = x.shape
    nb = len(blocks)
    e_dim = blocks[0]["w1_a"].shape[1]
    ctok = c // heads
    dt = x.dtype
    s_rows = _pick_strip_run(h, w, c, e_dim)
    assert s_rows, "no feasible strip for the level megakernel"
    n = s_rows * w + 2 * w
    n_strips = h // s_rows

    def stack(key, shape=None):
        arrs = [blk[key] if shape is None else blk[key].reshape(shape)
                for blk in blocks]
        return jnp.stack(arrs, 0)

    zeros_c = jnp.zeros((c,), dt)

    def stack_ln(key):
        # (nb, 8, c): row 0 real, rows 1-7 pad — real-TPU block specs need
        # the block's last two dims (8, c)-compliant
        vecs = jnp.stack([blk.get(key) if blk.get(key) is not None
                          else zeros_c for blk in blocks], 0)
        return jnp.pad(vecs[:, None, :], ((0, 0), (0, 7), (0, 0)))

    def stack_wd(key, e):
        # (nb, 16, e): 9 real tap rows padded to a sublane multiple
        w9 = jnp.stack([blk[key].reshape(9, e).astype(jnp.float32)
                        for blk in blocks], 0)
        return jnp.pad(w9, ((0, 0), (0, 7), (0, 0)))

    # temperature as a fp32 COLUMN per row-channel (sublane broadcast)
    tcol = jnp.stack([
        jnp.repeat(blk["temp"].reshape(heads).astype(jnp.float32), ctok
                   ).reshape(c, 1) for blk in blocks], 0)

    inputs = [
        x.reshape(b, h * w, c),
        stack_ln("ln1_w"), stack_ln("ln1_b"),
        stack("w1_q"), stack_wd("wd_q", c),
        stack("w1_k"), stack_wd("wd_k", c),
        stack("w1_v"), stack_wd("wd_v", c),
        tcol, stack("wpo"),
        stack_ln("ln2_w"), stack_ln("ln2_b"),
        stack("w1_a"), stack_wd("wd_a", e_dim),
        stack("w1_b"), stack_wd("wd_b", e_dim),
        stack("w2"),
    ]
    bspec = lambda *shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda b_, bi: (bi,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        bspec(8, c), bspec(8, c),
        bspec(c, c), bspec(16, c), bspec(c, c), bspec(16, c),
        bspec(c, c), bspec(16, c),
        bspec(c, 1), bspec(c, c),
        bspec(8, c), bspec(8, c),
        bspec(c, e_dim), bspec(16, e_dim),
        bspec(c, e_dim), bspec(16, e_dim),
        bspec(e_dim, c),
    ]
    kernel = functools.partial(
        _chan_gffw_run_kernel, ln_mode=ln_mode, s_rows=s_rows, w_img=w,
        h_img=h, c=c, e_dim=e_dim, ctok=ctok, n_strips=n_strips,
        interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=(b, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h * w, c), lambda b_, bi: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), dt),
        scratch_shapes=[
            pltpu.VMEM((h * w, c), dt),            # v buffer
            pltpu.VMEM((n, c), jnp.float32),       # LN scratch
            pltpu.VMEM((n, e_dim), jnp.float32),   # gate hidden scratch
            pltpu.VMEM((n, c), jnp.float32),       # qkv hidden scratch
            pltpu.VMEM((c, c), jnp.float32),       # gram
            pltpu.VMEM((c, 1), jnp.float32),       # |q|^2 column
            pltpu.VMEM((1, c), jnp.float32),       # |k|^2 row
            pltpu.VMEM((s_rows * w, c), dt),       # one-strip stash
            pltpu.SemaphoreType.DMA,               # x seed copy
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return out.reshape(b, h, w, c)
