"""Pallas-vs-XLA equality at the SHIPPED bench shapes (verdict r1 item 9).

The toy-shape tests pin kernel numerics at dims divisible by everything;
these pin them at the 720p bench geometry — W=1280 rows, the flagship
channel widths (c=64, GFFW hidden 160/gate-half, qkv thirds) — where the
strip/halo/wrap logic actually runs. Interpret mode on CPU with a reduced
row count (the kernels are row-blocked, so H only changes the grid)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from turtlevsr_tpu.kernels.ffn import (fused_block_ffn, fused_conv3x3,
                                       fused_ln_split_proj)
from turtlevsr_tpu.kernels.vjp import _conv3_xla, _ffn_xla, _split_proj_xla
from turtlevsr_tpu.ops.conv import conv2d

W = 1280  # the bench frame width; H reduced (kernels are row-blocked)
H = 8
C = 64    # dec1/enc1/refinement channel width


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape,
                             jnp.float32) * 0.5


def test_gffw_gate_kernel_at_bench_shape():
    hid = 160  # int(64 * 2.5): the flagship GFFW gate-half width
    x = _rand(0, (1, H, W, C))
    p = dict(ln_w=_rand(1, (C,)) * 0.1 + 1.0, ln_b=_rand(2, (C,)) * 0.1,
             w1=_rand(3, (C, 2 * hid)) * 0.1, wd=_rand(4, (3, 3, 2 * hid)),
             w2=_rand(5, (hid, C)) * 0.1)
    got = fused_block_ffn(x, mode="gate", residual=True, interpret=True, **p)
    want = _ffn_xla(x, p, "gate", True, "with_bias")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gffw_pair_and_po_inputs():
    """The FFN kernel's fused attention-residual (pair) and project_out
    (po) inputs vs the XLA chain. The po path is capability-tested but
    disabled in the model at c=64 (measured slower than the saved
    traversal); the pair path is live."""
    hid = 160
    x = _rand(0, (1, H, W, C))
    x2 = _rand(9, (1, H, W, C))
    pw = _rand(8, (C, C)) * 0.2
    pb = _rand(7, (C,)) * 0.1
    p = dict(ln_w=_rand(1, (C,)) * 0.1 + 1.0, ln_b=_rand(2, (C,)) * 0.1,
             w1=_rand(3, (C, 2 * hid)) * 0.1, wd=_rand(4, (3, 3, 2 * hid)),
             w2=_rand(5, (hid, C)) * 0.1)
    for extra in (dict(x2=x2), dict(x2=x2, po_w=pw, po_b=pb)):
        got = fused_block_ffn(x, mode="gate", residual=True, interpret=True,
                              **p, **extra)
        want = _ffn_xla(x, dict(p, **extra), "gate", True, "with_bias")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=str(extra.keys()))


def test_qkv_split_proj_at_bench_shape():
    x = _rand(0, (1, H, W, C))
    projs = [dict(w1=_rand(10 + i, (C, C)) * 0.1, wd=_rand(20 + i, (3, 3, C)))
             for i in range(3)]
    got = fused_ln_split_proj(x, projs, ln_w=_rand(1, (C,)) * 0.1 + 1.0,
                              interpret=True)
    want = _split_proj_xla(x, {"projs": projs, "ln_w": _rand(1, (C,)) * 0.1
                               + 1.0}, "bias_free")
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), atol=2e-5)


def test_conv3x3_at_bench_shape():
    # the ending conv: 64 -> 3 at full width
    x = _rand(0, (1, H, W, C))
    wt = _rand(1, (3, 3, C, 3)) * 0.1
    b = _rand(2, (3,)) * 0.1
    got = fused_conv3x3(x, wt, b, interpret=True)
    want = conv2d(x, wt, b, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("w_img,cin,cout,bias,ln", [
    (1280, 3, 64, True, False),    # input projection (cin<8: token-major)
    (1280, 64, 32, False, False),  # down1_2 (channels-major, cout=32)
    (640, 128, 64, False, False),  # down2_3 (channels-major at half res)
    (1280, 64, 64, False, True),   # SAB v+po composite conv (with LN)
])
def test_conv3x3_chan_major_shapes(w_img, cin, cout, bias, ln):
    """Every distinct 720p conv3x3 geometry the channels-major gate can
    see (w%128==0, cout<128), plus the cin=3 input projection that must
    stay token-major (sub-8 cin tap dots hang Mosaic on chip)."""
    x = _rand(0, (1, H, w_img, cin))
    wt = _rand(1, (3, 3, cin, cout)) * 0.1
    b = _rand(2, (cout,)) * 0.1 if bias else None
    kw = {}
    want_in = x
    if ln:
        kw = dict(ln_w=_rand(3, (cin,)) * 0.1 + 1.0,
                  ln_b=_rand(4, (cin,)) * 0.1)
        m = x.mean(-1, keepdims=True)
        v = ((x - m) ** 2).mean(-1, keepdims=True)
        want_in = (x - m) / jnp.sqrt(v + 1e-5) * kw["ln_w"] + kw["ln_b"]
    got = fused_conv3x3(x, wt, b, interpret=True, **kw)
    want = conv2d(want_in, wt, b, padding=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sab_probs_at_bench_window_grid():
    """The dec1 SAB geometry: 46x80 window grid (3680 tokens), dk=128,
    NF=3 — the exact shapes of the 720p bench attention."""
    from turtlevsr_tpu.kernels.sab import sab_fused_attn_probs
    from turtlevsr_tpu.kernels.vjp import _sab_attn_probs_xla
    from turtlevsr_tpu.ops.attn_utils import local_window_mask

    hq, wq, dk, nf = 46, 80, 128, 3
    hw = hq * wq
    q = _rand(0, (1, hw, dk))
    kt = _rand(1, (1, nf, dk, hw))
    kt = kt.at[:, 0].set(0.0)  # one empty-cache frame
    lm = local_window_mask(hq, wq, 4, jnp.float32)
    temp = jnp.float32(1.3)
    fv = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)  # frame 0 invalid
    got = sab_fused_attn_probs(q, kt, wq, temp, fv, interpret=True)
    want = _sab_attn_probs_xla(q, kt, lm, temp, fv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)
    assert float(jnp.abs(got[:, 0]).max()) == 0.0  # invalid rows exactly zero


def test_sab_av_merge_slot_tiled():
    """Slot-tiled attention@v + lattice merge (kernels/sab.py
    sab_attn_v_merge) vs the einsum + reference-merge chain
    (turtle_t1_arch.py:601-607), at both slot widths: c=64 (pair mode,
    dec1) and c=128 (direct, dec2)."""
    from turtlevsr_tpu.kernels.sab import sab_attn_v_merge
    from turtlevsr_tpu.kernels.vjp import _av_merge_xla

    for c, ws, hh, ww in ((64, 4, 8, 16), (128, 4, 8, 16)):
        h, w = hh * ws, ww * ws
        hw = hh * ww
        d = ws * ws * c
        a = jax.nn.softmax(_rand(0, (3, hw, hw)), axis=-1)
        v = _rand(1, (3, hw, d))
        got = sab_attn_v_merge(a, v, ws, h, w, interpret=True)
        want = _av_merge_xla(a, v, ws, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=f"c={c}")


def test_sab_av_merge_gradients():
    from turtlevsr_tpu.kernels.vjp import _av_merge_xla, sab_av_merge_op

    c, ws, hh, ww = 64, 4, 8, 16
    h, w = hh * ws, ww * ws
    hw = hh * ww
    a = jax.nn.softmax(_rand(3, (2, hw, hw)), axis=-1)
    v = _rand(4, (2, hw, ws * ws * c))

    def loss_k(a, v):
        return jnp.sum(sab_av_merge_op(a, v, (ws, h, w, True)) ** 2)

    def loss_x(a, v):
        return jnp.sum(_av_merge_xla(a, v, ws, h, w) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1))(a, v)
    gx = jax.grad(loss_x, argnums=(0, 1))(a, v)
    for g1, g2 in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-4)


def test_qkv_stats_kernel_at_bench_shape():
    """fused_qkv_stats (q/k maps never leave VMEM) vs the XLA chain: v map,
    gram q^T k and the norm sums, at the dec1 bench width."""
    from turtlevsr_tpu.kernels.ffn import fused_qkv_stats
    from turtlevsr_tpu.kernels.vjp import _qkv_stats_xla

    x = _rand(0, (2, H, W, C))
    ln_w = _rand(1, (C,)) * 0.1 + 1.0
    projs = [dict(w1=_rand(10 + i, (C, C)) * 0.1,
                  wd=_rand(20 + i, (3, 3, C))) for i in range(3)]
    got_v, got_g, got_s = fused_qkv_stats(x, projs, ln_w=ln_w,
                                          interpret=True)
    want_v, want_g, want_s = _qkv_stats_xla(
        x, {"projs": projs, "ln_w": ln_w}, "bias_free")
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=1e-4, atol=1e-2)


def test_gffw_batched_po_input():
    """The FFN kernel's po path with a PER-BATCH (B, C, C) po' matrix (the
    fused channel attention's data-dependent projection)."""
    hid = 160
    x = _rand(0, (2, H, W, C))
    x2 = _rand(9, (2, H, W, C))
    pw = _rand(8, (2, C, C)) * 0.2
    p = dict(ln_w=_rand(1, (C,)) * 0.1 + 1.0,
             w1=_rand(3, (C, 2 * hid)) * 0.1, wd=_rand(4, (3, 3, 2 * hid)),
             w2=_rand(5, (hid, C)) * 0.1)
    got = fused_block_ffn(x, mode="gate", residual=True, interpret=True,
                          x2=x2, po_w=pw, **p)
    want = _ffn_xla(x, dict(p, x2=x2, po_w=pw), "gate", True, "bias_free")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gffw_kernel_at_tiled_protocol_shape():
    """Tile-batched geometry of the reference eval protocol (tile 320,
    tiles ride the batch axis through eval/engine.py): W=320, b=3. Pins the
    per-image row blocking — tiles must not leak dw3x3 halos into each
    other across the batch dimension."""
    hid = 160
    x = _rand(0, (3, H, 320, C))
    p = dict(ln_w=_rand(1, (C,)) * 0.1 + 1.0, ln_b=_rand(2, (C,)) * 0.1,
             w1=_rand(3, (C, 2 * hid)) * 0.1, wd=_rand(4, (3, 3, 2 * hid)),
             w2=_rand(5, (hid, C)) * 0.1)
    got = fused_block_ffn(x, mode="gate", residual=True, interpret=True, **p)
    want = _ffn_xla(x, p, "gate", True, "with_bias")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_gffw_multi_pair_po_inputs():
    """The FFN kernel's MULTI pair-input path (CHM's attention apply fold:
    nf+1 value maps each with its own composed attn@W_po matrix) vs the
    XLA chain, at the dec1 bench width. Covers both the channels-major
    (bias-free e=160) and token-major (ln-bias) kernels."""
    hid = 160
    x = _rand(0, (2, H, W, C))
    # the shipped call shape: one STACKED (B, nf, H, W, C) history buffer
    # (kernel block specs index the frame dim, no slice copies) + the
    # current-frame map, four composed per-batch po matrices
    x2s = [_rand(10, (2, 3, H, W, C)), _rand(11, (2, H, W, C))]
    pos = [_rand(20 + i, (2, C, C)) * 0.2 for i in range(4)]
    p = dict(ln_w=_rand(1, (C,)) * 0.1 + 1.0,
             w1=_rand(3, (C, 2 * hid)) * 0.1, wd=_rand(4, (3, 3, 2 * hid)),
             w2=_rand(5, (hid, C)) * 0.1)
    for extra_ln in (dict(), dict(ln_b=_rand(2, (C,)) * 0.1)):
        q = dict(p, **extra_ln)
        got = fused_block_ffn(x, mode="gate", residual=True, interpret=True,
                              x2=x2s, po_w=pos, **q)
        want = _ffn_xla(x, dict(q, x2=x2s, po_w=pos), "gate", True,
                        "with_bias" if extra_ln else "bias_free")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5,
                                   err_msg=f"ln_b={bool(extra_ln)}")


def test_chm_stats_kernel_at_bench_shape():
    """fused_chm_stats (q/k/kh maps never leave VMEM) vs the XLA chain at
    the dec1 bench width: v/vh maps, gram q^T k, per-frame gh = q^T kh_n
    and the norm rows."""
    from turtlevsr_tpu.kernels.ffn import fused_chm_stats
    from turtlevsr_tpu.kernels.vjp import _chm_stats_xla

    nf = 3
    x = _rand(0, (1, H, W, C))
    x_sp = _rand(1, (1, nf, H, W, C))
    ln_w = _rand(2, (C,)) * 0.1 + 1.0
    qkv = [dict(w1=_rand(10 + i, (C, C)) * 0.1,
                wd=_rand(20 + i, (3, 3, C))) for i in range(3)]
    kv = [dict(w1=_rand(30 + i, (C, C)) * 0.1,
               wd=_rand(40 + i, (3, 3, C))) for i in range(2)]
    got = fused_chm_stats(x, x_sp, qkv, kv, ln_w=ln_w, interpret=True)
    want = _chm_stats_xla(x, x_sp, {"qkv": qkv, "kv": kv, "ln_w": ln_w},
                          "bias_free")
    names = ("v", "vh", "g", "gh", "s")
    for nm, gg, ww in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=1e-4, atol=1e-2, err_msg=nm)
