"""bf16 interpret-mode smoke of every fused kernel at a channels-major
-eligible width (w % 128 == 0).

The CPU backend's DotThunk rejects non-canonical bf16 dot_generals at
RUNTIME (not trace time), so fp32-only kernel tests miss them — this is
the regression net for the _dg_f32 pre-cast (test_app_pipeline was red
for several commits before that was understood). Values are checked
against the fp32 XLA chain loosely; the real assertion is "runs at all".
"""

import numpy as np
import jax
import jax.numpy as jnp

H, W, C = 8, 128, 64
RNG = np.random.RandomState(0)


def _arr(*s):
    return jnp.asarray(RNG.rand(*s) * 0.1, jnp.bfloat16)


def test_gate_cm_bf16():
    from turtlevsr_tpu.kernels.ffn import _chan_major_ok, fused_block_ffn

    e = 160
    assert _chan_major_ok(e, W, False)
    out = fused_block_ffn(
        _arr(1, H, W, C), ln_w=_arr(C), w1=_arr(C, 2 * e),
        wd=_arr(3, 3, 2 * e), w2=_arr(e, C), mode="gate", residual=True,
        interpret=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_linear_cm_bf16():
    from turtlevsr_tpu.kernels.ffn import fused_block_ffn

    out = fused_block_ffn(
        _arr(1, H, W, C), ln_w=_arr(C), w1=_arr(C, C), wd=_arr(3, 3, C),
        mode="linear", residual=False, interpret=True)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_split_proj_cm_bf16():
    from turtlevsr_tpu.kernels.ffn import fused_ln_split_proj

    projs = [dict(w1=_arr(C, C), wd=_arr(3, 3, C)) for _ in range(3)]
    outs = fused_ln_split_proj(_arr(1, H, W, C), projs, ln_w=_arr(C),
                               interpret=True)
    for o in outs:
        assert np.isfinite(np.asarray(o, np.float32)).all()


def test_qkv_stats_cm_bf16():
    from turtlevsr_tpu.kernels.ffn import fused_qkv_stats

    projs = [dict(w1=_arr(C, C), wd=_arr(3, 3, C)) for _ in range(3)]
    v, g, s = fused_qkv_stats(_arr(1, H, W, C), projs, ln_w=_arr(C),
                              interpret=True)
    assert np.isfinite(np.asarray(v, np.float32)).all()
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(np.asarray(s)).all()


def test_chm_stats_cm_bf16():
    from turtlevsr_tpu.kernels.ffn import fused_chm_stats

    qkv = [dict(w1=_arr(C, C), wd=_arr(3, 3, C)) for _ in range(3)]
    kv = [dict(w1=_arr(C, C), wd=_arr(3, 3, C)) for _ in range(2)]
    v, vh, g, gh, s = fused_chm_stats(
        _arr(1, H, W, C), _arr(1, 2, H, W, C), qkv, kv, ln_w=_arr(C),
        interpret=True)
    for t in (v, vh):
        assert np.isfinite(np.asarray(t, np.float32)).all()
    for t in (g, gh, s):
        assert np.isfinite(np.asarray(t)).all()


def test_cm_matches_pixels_major_bf16():
    """The channels-major gate result must equal the pixels-major kernel's
    on the same bf16 inputs (both interpret) — layout must not change
    numerics beyond fp32-accumulation noise."""
    import functools

    from turtlevsr_tpu.kernels import ffn

    e = 160
    kw = dict(ln_w=_arr(C), w1=_arr(C, 2 * e), wd=_arr(3, 3, 2 * e),
              w2=_arr(e, C), mode="gate", residual=True, interpret=True)
    x = _arr(1, H, W, C)
    got_cm = ffn.fused_block_ffn(x, **kw)

    orig = ffn._chan_major_ok
    ffn._chan_major_ok = lambda *a, **k: False
    try:
        got_pm = ffn.fused_block_ffn(x, **kw)
    finally:
        ffn._chan_major_ok = orig
    np.testing.assert_allclose(np.asarray(got_cm, np.float32),
                               np.asarray(got_pm, np.float32),
                               rtol=0, atol=1e-2)


def test_cm_biased_gelu_matches_pixels_major():
    """Channels-major with BIASES (the ReducedAttn conv1/conv2/conv3
    chain: gelu mode, e=160 at c=64) vs the pixels-major kernel's
    inclusion-exclusion bias reconstruction — the direct bias-column +
    halo-re-zero scheme must agree within fp32-accumulation noise."""
    from turtlevsr_tpu.kernels import ffn

    e = 160
    for mode, w1w, w2e in (("gelu", e, e), ("gate", 2 * e, e)):
        kw = dict(ln_w=_arr(C), ln_b=_arr(C),
                  w1=_arr(C, w1w), b1=_arr(w1w),
                  wd=_arr(3, 3, w1w), bd=_arr(w1w),
                  w2=_arr(w2e, C), b2=_arr(C), scale=_arr(C),
                  mode=mode, residual=True, interpret=True)
        x = _arr(1, H, W, C)
        assert ffn._chan_major_ok(e, W, False)
        got_cm = ffn.fused_block_ffn(x, **kw)

        orig = ffn._chan_major_ok
        ffn._chan_major_ok = lambda *a, **k: False
        try:
            got_pm = ffn.fused_block_ffn(x, **kw)
        finally:
            ffn._chan_major_ok = orig
        np.testing.assert_allclose(np.asarray(got_cm, np.float32),
                                   np.asarray(got_pm, np.float32),
                                   rtol=0, atol=1e-2, err_msg=mode)


def test_bf16_grads_cpu():
    """jax.grad through the differentiable wrappers at bf16 on CPU — the
    backward XLA references are fp32-pre-cast per the CLAUDE.md bf16-dot
    convention; this is the only bf16 grad coverage (the parity tests run
    fp32/fp64)."""
    from turtlevsr_tpu.kernels.vjp import (call_fused_ffn, call_qkv_stats,
                                           sab_attn_probs_op)

    x = _arr(1, H, W, C)

    def loss_ffn(x_):
        e = 160
        out = call_fused_ffn(
            x_, mode="gate", residual=True, ln_w=_arr(C), w1=_arr(C, 2 * e),
            wd=_arr(3, 3, 2 * e), w2=_arr(e, C),
            x2=_arr(1, H, W, C), po_w=_arr(1, C, C), po_b=_arr(C),
            interpret=True)
        return jnp.sum(out.astype(jnp.float32))

    g = jax.grad(loss_ffn)(x)
    assert np.isfinite(np.asarray(g, np.float32)).all()

    def loss_stats(x_):
        projs = [dict(w1=_arr(C, C), wd=_arr(3, 3, C)) for _ in range(3)]
        v, gm, s = call_qkv_stats(x_, projs, ln_w=_arr(C), interpret=True)
        return (jnp.sum(v.astype(jnp.float32)) + jnp.sum(gm) + jnp.sum(s))

    g = jax.grad(loss_stats)(x)
    assert np.isfinite(np.asarray(g, np.float32)).all()

    hw = H * W // 8
    wq = 16
    q = _arr(1, hw, 2 * C)
    kt = _arr(1, 1, 2 * C, hw)
    from turtlevsr_tpu.ops.attn_utils import local_window_mask
    lm = local_window_mask(hw // wq, wq, 4, jnp.bfloat16)

    def loss_sab(q_):
        a = sab_attn_probs_op(q_, kt, lm, jnp.asarray(1.0, jnp.float32),
                              jnp.ones((1,), jnp.float32), (True, wq))
        return jnp.sum(a.astype(jnp.float32))

    g = jax.grad(loss_sab)(q)
    assert np.isfinite(np.asarray(g, np.float32)).all()
