"""The Turtle U-Net assembly (t0 / t1 / sr variants).

Mirrors the reference's 3-level encoder + latent + 3-level decoder with skip
concatenation, channel reduction, refinement and a global residual head
(turtle_arch.py:855-1063 / turtlesuper_t1_arch.py:932-1150), rebuilt NHWC and
functional. The 8 KV-cache slots are a tuple pytree suitable as a
``lax.scan`` carry:

  (enc1, enc2, enc3, latent_first, latent_last, dec3, dec2, dec1)

A slot is ``None`` when the level's cached block type produces no cache
(Channel/ReducedAttn/NoAttn return ``None, None`` in the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from turtlevsr_tpu.config.options import LevelSpec, ModelConfig
from turtlevsr_tpu.core.cache import fhr_slot_init, sab_slot_init
from turtlevsr_tpu.models.blocks import (
    BlockSpec,
    _conv,
    attn_block_apply,
    attn_block_init,
)
from turtlevsr_tpu.ops.conv import conv_init
from turtlevsr_tpu.ops.resize import pixel_shuffle, pixel_unshuffle, upsample_bilinear


# ---------------------------------------------------------------------------
# Down / Up resizers (turtle_arch.py:139-157)
# ---------------------------------------------------------------------------


def _conv3(params, x, cfg: ModelConfig):
    """3x3 pad-1 conv: fused Pallas kernel on the fast path (XLA's conv
    lowering is 3-4x off bandwidth at full-res), XLA conv otherwise."""
    if cfg.kernels == "pallas":
        from turtlevsr_tpu.kernels.ffn import conv3x3_pallas_supported
        from turtlevsr_tpu.kernels.vjp import conv3_op
        from turtlevsr_tpu.models.blocks import _pallas_interpret

        h, w = x.shape[1], x.shape[2]
        wt = params["weight"]
        if conv3x3_pallas_supported(h, w, wt.shape[2], wt.shape[3]):
            return conv3_op(x, params, _pallas_interpret())
    return _conv(params, x, padding=1)


def downsample_init(key, n_feat: int, dtype=jnp.float32) -> dict:
    # conv3x3 C -> C/2, bias=False, then PixelUnshuffle(2) => 2C at H/2
    return {"body": {"0": conv_init(key, n_feat, n_feat // 2, 3, bias=False,
                                    dtype=dtype)}}


def downsample_apply(params, x, cfg: ModelConfig):
    return pixel_unshuffle(_conv3(params["body"]["0"], x, cfg), 2)


def upsample_init(key, n_feat: int, dtype=jnp.float32) -> dict:
    # conv3x3 C -> 2C, bias=False, then PixelShuffle(2) => C/2 at 2H
    return {"body": {"0": conv_init(key, n_feat, n_feat * 2, 3, bias=False,
                                    dtype=dtype)}}


def upsample_apply(params, x, cfg: ModelConfig):
    return pixel_shuffle(_conv3(params["body"]["0"], x, cfg), 2)


def _reduce_concat(params, a, b):
    """reduce_chan 1x1 over concat([a, b]) (turtle_arch.py:1008-1010).

    At C >= 256 the concat is folded into two matmuls with the weight split
    row-wise — the (H, W, 2C) concat map never materialises (measured
    184x320: 1.24 -> 0.70 ms). At narrower channels the fused-concat matmul
    is faster (two K=64 matmuls waste the MXU), so the plain path stays."""
    ca, cb = a.shape[-1], b.shape[-1]
    w = params["weight"].reshape(ca + cb, -1)
    if min(ca, cb) >= 256:
        bsz, h, wd_, _ = a.shape
        dt = a.dtype
        y = (jnp.dot(a.reshape(-1, ca), w[:ca].astype(dt),
                     preferred_element_type=dt)
             + jnp.dot(b.reshape(-1, cb), w[ca:].astype(dt),
                       preferred_element_type=dt))
        if "bias" in params:
            y = y + params["bias"].astype(dt)
        return y.reshape(bsz, h, wd_, -1)
    return _conv(params, jnp.concatenate([a, b], axis=-1))


# ---------------------------------------------------------------------------
# Level blocks
# ---------------------------------------------------------------------------


def _block_spec(cfg: ModelConfig, lvl: LevelSpec, attn_type: str) -> BlockSpec:
    return BlockSpec(
        attn_type=attn_type,
        ffw_type=lvl.ffw_type,
        dim=lvl.dim,
        num_heads=lvl.num_heads,
        ffn_expansion_factor=cfg.ffn_expansion_factor,
        bias=cfg.bias,
        layernorm_bias=cfg.layernorm_bias,
        num_frames_tocache=lvl.num_frames_tocache,
        scale_patchsize=lvl.scale_patchsize,
        variant="t0" if cfg.variant == "t0" else "t1",
        kernels=cfg.kernels,
    )


def level_block_init(key, cfg: ModelConfig, lvl: LevelSpec,
                     dtype=jnp.float32) -> dict:
    """LevelBlock (turtle_arch.py:736-788): blocks 0..n-2 use attn_type1
    (cacheless), the last uses attn_type2 with the level's cache slot."""
    keys = jax.random.split(key, lvl.num_blocks)
    blocks = []
    for i in range(lvl.num_blocks):
        t = lvl.attn_type2 if i == lvl.num_blocks - 1 else lvl.attn_type1
        blocks.append(attn_block_init(keys[i], _block_spec(cfg, lvl, t), dtype))
    return {"transformer_blocks": blocks}


def level_block_apply(params, x, cfg: ModelConfig, lvl: LevelSpec,
                      slot: Optional[dict]):
    from turtlevsr_tpu.models.blocks import (
        channel_run_apply,
        channel_run_ok,
        ra_gffw_apply,
        ra_gffw_ok,
        ra_pair_apply,
        ra_pair_ok,
    )

    blocks = params["transformer_blocks"]
    n = len(blocks)
    spec1 = _block_spec(cfg, lvl, lvl.attn_type1)
    if (lvl.attn_type1 == "ReducedAttn" and lvl.attn_type2 == "ReducedAttn"
            and cfg.kernels == "pallas"):
        # conv-only level: chain block PAIRS (FFW) or the RA+GFFW halves
        # of each block (refinement) into single two-stage kernels
        i = 0
        while i < n:
            if (lvl.ffw_type == "FFW" and i + 1 < n
                    and ra_pair_ok(blocks[i], blocks[i + 1], x, spec1)):
                x = ra_pair_apply(blocks[i], blocks[i + 1], x, spec1)
                i += 2
                continue
            if lvl.ffw_type == "GFFW" and ra_gffw_ok(blocks[i], x, spec1):
                x = ra_gffw_apply(blocks[i], x, spec1)
                i += 1
                continue
            x, _ = attn_block_apply(blocks[i], x, spec1, None)
            i += 1
        return x, None
    start = 0
    if lvl.attn_type1 == "Channel":
        # cacheless Channel+GFFW run -> ONE level megakernel call (the
        # map stays in VMEM across blocks); extends through the last
        # block when it is also cacheless Channel (enc3)
        run_end = n if lvl.attn_type2 == "Channel" else n - 1
        if run_end >= 2 and channel_run_ok(blocks[:run_end], x, spec1):
            x = channel_run_apply(blocks[:run_end], x, spec1)
            start = run_end
    for i in range(start, n - 1):
        x, _ = attn_block_apply(blocks[i], x, spec1, None)
    if start == n:
        return x, None  # all-Channel level fully consumed by the run
    x, new_slot = attn_block_apply(blocks[n - 1], x,
                                   _block_spec(cfg, lvl, lvl.attn_type2), slot)
    return x, new_slot


def latent_block_init(key, cfg: ModelConfig, lvl: LevelSpec,
                      dtype=jnp.float32) -> dict:
    """LatentCacheBlock (turtle_arch.py:790-851): first block attn_type1
    (cache slot A), middle attn_type2 (cacheless), last attn_type3 (slot B).
    Needs >= 2 blocks."""
    if lvl.num_blocks < 2:
        raise ValueError("LatentCacheBlock needs at least 2 blocks")
    keys = jax.random.split(key, lvl.num_blocks)
    blocks = [attn_block_init(keys[0], _block_spec(cfg, lvl, lvl.attn_type1),
                              dtype)]
    for i in range(1, lvl.num_blocks - 1):
        blocks.append(attn_block_init(keys[i],
                                      _block_spec(cfg, lvl, lvl.attn_type2),
                                      dtype))
    blocks.append(attn_block_init(keys[-1],
                                  _block_spec(cfg, lvl, lvl.attn_type3),
                                  dtype))
    return {"transformer_blocks": blocks}


def latent_block_apply(params, x, cfg: ModelConfig, lvl: LevelSpec,
                       slot_a: Optional[dict], slot_b: Optional[dict]):
    from turtlevsr_tpu.models.blocks import channel_run_apply, channel_run_ok

    blocks = params["transformer_blocks"]
    x, new_a = attn_block_apply(blocks[0], x,
                                _block_spec(cfg, lvl, lvl.attn_type1), slot_a)
    spec2 = _block_spec(cfg, lvl, lvl.attn_type2)
    mid = blocks[1:-1]
    if (lvl.attn_type2 == "Channel" and len(mid) >= 2
            and channel_run_ok(mid, x, spec2)):
        x = channel_run_apply(mid, x, spec2)
    else:
        for i in range(1, len(blocks) - 1):
            x, _ = attn_block_apply(blocks[i], x, spec2, None)
    x, new_b = attn_block_apply(blocks[-1], x,
                                _block_spec(cfg, lvl, lvl.attn_type3), slot_b)
    return x, new_a, new_b


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------


def init_params(key, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 19)
    inp_ch = cfg.inp_channels * (2 if cfg.use_both_input else 1)
    d1, d2, d3, d4 = cfg.level_dims
    return {
        "input_projection": conv_init(keys[0], inp_ch, d1, 3, bias=cfg.bias,
                                      dtype=dtype),
        "encoder_level1": level_block_init(keys[1], cfg, cfg.enc1, dtype),
        "down1_2": downsample_init(keys[2], d1, dtype),
        "encoder_level2": level_block_init(keys[3], cfg, cfg.enc2, dtype),
        "down2_3": downsample_init(keys[4], d2, dtype),
        "encoder_level3": level_block_init(keys[5], cfg, cfg.enc3, dtype),
        "down3_4": downsample_init(keys[6], d3, dtype),
        "latent": latent_block_init(keys[7], cfg, cfg.latent, dtype),
        "up4_3": upsample_init(keys[8], d4, dtype),
        "reduce_chan_level3": conv_init(keys[9], d4, d3, 1, bias=cfg.bias,
                                        dtype=dtype),
        "decoder_level3": level_block_init(keys[10], cfg, cfg.dec3, dtype),
        "up3_2": upsample_init(keys[11], d3, dtype),
        "reduce_chan_level2": conv_init(keys[12], d3, d2, 1, bias=cfg.bias,
                                        dtype=dtype),
        "decoder_level2": level_block_init(keys[13], cfg, cfg.dec2, dtype),
        "up2_1": upsample_init(keys[14], d2, dtype),
        "reduce_chan_level1": conv_init(keys[15], d2, d1, 1, bias=cfg.bias,
                                        dtype=dtype),
        "decoder_level1": level_block_init(keys[16], cfg, cfg.dec1, dtype),
        "refinement": level_block_init(keys[17], cfg, cfg.refinement, dtype),
        "ending": conv_init(keys[18], d1, cfg.out_channels, 3, bias=True,
                            dtype=dtype),
    }


def padded_hw(cfg: ModelConfig, height: int, width: int) -> Tuple[int, int]:
    """Input H,W after the model's internal pad-to-multiple-of-32
    (turtle_arch.py:1058-1063). For the sr variant this applies AFTER the x4
    bilinear upsample (turtlesuper_t1_arch.py:1063-1070)."""
    if cfg.variant == "sr":
        height, width = height * cfg.sr_scale, width * cfg.sr_scale
    p = cfg.padder_size
    return (height + (p - height % p) % p, width + (p - width % p) % p)


def _slot_for_level(cfg: ModelConfig, lvl: LevelSpec, attn_type: str,
                    batch: int, h: int, w: int, dtype):
    """Cache-slot zeros for one cached block, or None for cacheless types."""
    if attn_type == "FHR":
        ctok = lvl.dim // lvl.num_heads
        return fhr_slot_init(batch, lvl.num_heads, lvl.num_frames_tocache,
                             ctok, h * w, dtype)
    if attn_type == "CHM":
        ws = 2 * lvl.scale_patchsize
        hw = (h // ws) * (w // ws)
        if cfg.variant == "t0":
            # the t0 K cache is never read (quirk Q1 — the attention it
            # would feed is dead code); keep a tiny zero field for pytree
            # stability instead of a (NF, HW, ws²c) buffer nobody touches
            dk, dv = 8, ws * ws * lvl.dim
            hw_q = 8
            return sab_slot_init(batch, lvl.num_frames_tocache, hw_q, dk,
                                 hw, dv, dtype)
        dk, dv = 2 * lvl.dim, ws * ws * lvl.dim
        hw_q = hw
        return sab_slot_init(batch, lvl.num_frames_tocache, hw_q, dk, hw, dv,
                             dtype)
    return None


def init_cache(cfg: ModelConfig, batch: int, height: int, width: int,
               dtype=jnp.float32) -> tuple:
    """Empty (zero, count-0) cache pytree for input frames of (height, width).

    Heights/widths are the RAW frame sizes fed to the model; internal padding
    and the sr-variant upsampling are accounted for. Slot order matches the
    reference's k_cached[0..7] (turtle_arch.py:989-1048). SHAPE DIVERGENCE
    (t0 only, ADVICE r4): the t0 CHM slots' K field is a vestigial
    (B, NF, 8, 8) zero buffer, NOT the reference's (NF, HW, 2c) K cache —
    that cache only feeds dead attention (quirk Q1, out = v at
    turtle_arch.py:523). Caches serialized by a build predating this, or
    code comparing slot shapes against the reference's returned K, will
    mismatch on that field."""
    hp, wp = padded_hw(cfg, height, width)
    h1, w1 = hp, wp
    h2, w2 = hp // 2, wp // 2
    h3, w3 = hp // 4, wp // 4
    h4, w4 = hp // 8, wp // 8
    lv = cfg
    return (
        _slot_for_level(cfg, lv.enc1, lv.enc1.attn_type2, batch, h1, w1, dtype),
        _slot_for_level(cfg, lv.enc2, lv.enc2.attn_type2, batch, h2, w2, dtype),
        _slot_for_level(cfg, lv.enc3, lv.enc3.attn_type2, batch, h3, w3, dtype),
        _slot_for_level(cfg, lv.latent, lv.latent.attn_type1, batch, h4, w4,
                        dtype),
        _slot_for_level(cfg, lv.latent, lv.latent.attn_type3, batch, h4, w4,
                        dtype),
        _slot_for_level(cfg, lv.dec3, lv.dec3.attn_type2, batch, h3, w3, dtype),
        _slot_for_level(cfg, lv.dec2, lv.dec2.attn_type2, batch, h2, w2, dtype),
        _slot_for_level(cfg, lv.dec1, lv.dec1.attn_type2, batch, h1, w1, dtype),
    )


def forward(params: dict, cfg: ModelConfig, x_pair, cache: tuple):
    """One frame step.

    Args:
      params: parameter pytree from init_params / the torch converter.
      cfg: static ModelConfig (pass via functools.partial / closure to jit).
      x_pair: (B, 2, H, W, C) — [previous, current] frames, NHWC, [0, 1].
      cache: tuple of 8 slots from init_cache (or a previous step).

    Returns (out (B, H', W', C), new_cache); H' = H (x4 for the sr variant).
    Mirrors Turtle.forward (turtle_arch.py:968-1056).
    """
    b, two, h0, w0, c0 = x_pair.shape
    assert two == 2, "x_pair must stack [previous, current] on axis 1"

    prev, cur = x_pair[:, 0], x_pair[:, 1]
    if cfg.variant == "sr":
        # bilinear x4 BEFORE padding (turtlesuper_t1_arch.py:1063-1070)
        prev = upsample_bilinear(prev, cfg.sr_scale)
        cur = upsample_bilinear(cur, cfg.sr_scale)

    hp, wp = padded_hw(cfg, h0, w0)
    pad_h, pad_w = hp - prev.shape[1], wp - prev.shape[2]
    if pad_h or pad_w:
        padding = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
        prev = jnp.pad(prev, padding)
        cur = jnp.pad(cur, padding)

    if cfg.use_both_input:
        inp = jnp.concatenate([prev, cur], axis=-1)
    else:
        inp = cur
    current = cur

    x = _conv3(params["input_projection"], inp, cfg)

    out_enc1, s0 = level_block_apply(params["encoder_level1"], x, cfg,
                                     cfg.enc1, cache[0])
    x = downsample_apply(params["down1_2"], out_enc1, cfg)
    out_enc2, s1 = level_block_apply(params["encoder_level2"], x, cfg,
                                     cfg.enc2, cache[1])
    x = downsample_apply(params["down2_3"], out_enc2, cfg)
    out_enc3, s2 = level_block_apply(params["encoder_level3"], x, cfg,
                                     cfg.enc3, cache[2])
    x = downsample_apply(params["down3_4"], out_enc3, cfg)

    latent, s3, s4 = latent_block_apply(params["latent"], x, cfg, cfg.latent,
                                        cache[3], cache[4])

    x = upsample_apply(params["up4_3"], latent, cfg)
    x = _reduce_concat(params["reduce_chan_level3"], x, out_enc3)
    out_dec3, s5 = level_block_apply(params["decoder_level3"], x, cfg,
                                     cfg.dec3, cache[5])

    x = upsample_apply(params["up3_2"], out_dec3, cfg)
    x = jnp.concatenate([x, out_enc2], axis=-1)
    x = _conv(params["reduce_chan_level2"], x)
    out_dec2, s6 = level_block_apply(params["decoder_level2"], x, cfg,
                                     cfg.dec2, cache[6])

    x = upsample_apply(params["up2_1"], out_dec2, cfg)
    x = jnp.concatenate([x, out_enc1], axis=-1)
    x = _conv(params["reduce_chan_level1"], x)
    out_dec1, s7 = level_block_apply(params["decoder_level1"], x, cfg,
                                     cfg.dec1, cache[7])

    out_dec1, _ = level_block_apply(params["refinement"], out_dec1, cfg,
                                    cfg.refinement, None)

    out = _conv3(params["ending"], out_dec1, cfg) + current

    out_h = h0 * cfg.sr_scale if cfg.variant == "sr" else h0
    out_w = w0 * cfg.sr_scale if cfg.variant == "sr" else w0
    out = out[:, :out_h, :out_w, :]

    new_cache = (s0, s1, s2, s3, s4, s5, s6, s7)
    return out, new_cache
