"""Inference-engine parity: our batched tiled engine vs the reference's
sequential per-tile protocol (inference.py:172-246) run on the torch oracle
model, in float64."""

import numpy as np
import torch

import jax.numpy as jnp

from turtlevsr_tpu.config.options import model_config_from_options
from turtlevsr_tpu.eval.engine import InferenceEngine
from turtlevsr_tpu.io.torch_convert import params_from_torch_state_dict

from reference_oracle import build_reference_model, tiny_opt
from test_model_parity import _KeepF64


def _reference_tiled(model, frames, tile, tile_overlap):
    """Faithful re-run of run_inference_patched/run_inference for a t0/t1
    model (inference.py:172-246, :276-311), fp64, as the golden oracle."""
    outs = []
    k_cache = v_cache = None
    prev = None
    with torch.no_grad(), _KeepF64():
        for fr in frames:
            cur = torch.from_numpy(fr).permute(2, 0, 1)[None]  # (1,C,H,W)
            if prev is None:
                prev = cur
            height, width = cur.shape[2], cur.shape[3]
            m = 8
            hp = ((height + m) // m) * m
            wp = ((width + m) // m) * m
            padh = hp - height if height % m else 0
            padw = wp - width if width % m else 0
            cur_p = torch.nn.functional.pad(cur, (0, padw, 0, padh), "reflect")
            prev_p = torch.nn.functional.pad(prev, (0, padw, 0, padh),
                                             "reflect")
            b, c, h, w = cur_p.shape
            t = min(tile, h, w)
            stride = t - tile_overlap
            h_idx = list(range(0, h - t, stride)) + [h - t]
            w_idx = list(range(0, w - t, stride)) + [w - t]
            e = torch.zeros(b, c, h, w, dtype=cur_p.dtype)
            wt = torch.zeros_like(e)
            new_k, new_v = {}, {}
            for hi in h_idx:
                for wi in w_idx:
                    pc = cur_p[..., hi:hi + t, wi:wi + t]
                    pp = prev_p[..., hi:hi + t, wi:wi + t]
                    x = torch.concat([pp.unsqueeze(0), pc.unsqueeze(0)], dim=1)
                    kc = k_cache[f"{hi}-{wi}"] if k_cache else None
                    vc = v_cache[f"{hi}-{wi}"] if v_cache else None
                    out, kn, vn = model(x, kc, vc)
                    new_k[f"{hi}-{wi}"] = kn
                    new_v[f"{hi}-{wi}"] = vn
                    e[..., hi:hi + t, wi:wi + t] += out
                    wt[..., hi:hi + t, wi:wi + t] += 1
            k_cache, v_cache = new_k, new_v
            restored = torch.clamp(e / wt, 0, 1)
            outs.append(restored[0, :, :height, :width].numpy()
                        .transpose(1, 2, 0))
            prev = cur
    return outs


def test_tiled_engine_matches_reference_protocol():
    opt = tiny_opt("Turtle_t1_arch")
    ref = build_reference_model(opt)
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float64)

    rng = np.random.RandomState(3)
    frames = [rng.rand(72, 88, 3) for _ in range(3)]

    want = _reference_tiled(ref, frames, tile=48, tile_overlap=16)

    eng = InferenceEngine(cfg, params, mode="tiled", tile=48, tile_overlap=16,
                          dtype=jnp.float64)
    for t, fr in enumerate(frames):
        got = eng.step(fr.astype(np.float32))
        np.testing.assert_allclose(got, want[t], atol=1e-6,
                                   err_msg=f"frame {t}")


def test_whole_engine_runs_and_is_stateful():
    opt = tiny_opt("Turtle_t1_arch")
    ref = build_reference_model(opt, dtype="float32")
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float32)
    eng = InferenceEngine(cfg, params, mode="whole", dtype=jnp.float32)
    rng = np.random.RandomState(0)
    fr = rng.rand(40, 56, 3).astype(np.float32)
    o1 = eng.step(fr)
    o2 = eng.step(fr)  # same input, but history differs now
    assert o1.shape == fr.shape
    assert np.isfinite(o1).all() and np.isfinite(o2).all()
    assert np.abs(o1 - o2).max() > 0  # the cache changed the output


def test_tiled_engine_matches_reference_protocol_t0():
    opt = tiny_opt("Turtle_arch")
    ref = build_reference_model(opt)
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float64)

    rng = np.random.RandomState(7)
    frames = [rng.rand(72, 88, 3) for _ in range(3)]
    want = _reference_tiled(ref, frames, tile=48, tile_overlap=16)
    eng = InferenceEngine(cfg, params, mode="tiled", tile=48, tile_overlap=16,
                          dtype=jnp.float64)
    for t, fr in enumerate(frames):
        got = eng.step(fr.astype(np.float32))
        np.testing.assert_allclose(got, want[t], atol=1e-6,
                                   err_msg=f"frame {t}")


def test_tiled_engine_prime_tile_count_chunks_with_padding():
    """A prime tile count must not degenerate to chunk=1: the grid is
    zero-padded to a multiple of the chosen chunk and the padded tiles'
    outputs discarded, leaving results identical to the one-batch path."""
    opt = tiny_opt("Turtle_t1_arch")
    ref = build_reference_model(opt, dtype="float32")
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float64)

    rng = np.random.RandomState(11)
    # 48x88 with tile 48 / overlap 38 -> 1x5 = 5 tiles (prime)
    frames = [rng.rand(48, 88, 3).astype(np.float32) for _ in range(2)]

    eng_full = InferenceEngine(cfg, params, mode="tiled", tile=48,
                               tile_overlap=38, dtype=jnp.float64,
                               max_tile_batch=12)
    eng_chunk = InferenceEngine(cfg, params, mode="tiled", tile=48,
                                tile_overlap=38, dtype=jnp.float64,
                                max_tile_batch=2)
    assert eng_chunk._tile_chunk(5) == 2  # pads 5 -> 6, not 5x chunk=1
    for t, fr in enumerate(frames):
        want = eng_full.step(fr)
        got = eng_chunk.step(fr)
        np.testing.assert_allclose(got, want, atol=1e-12,
                                   err_msg=f"frame {t}")


def test_whole_engine_sr_matches_reference_protocol():
    """SR whole-frame protocol (inference.py:296-311): inputs bicubic /4,
    model upsamples x4, output cropped to the HR size."""
    opt = tiny_opt("Turtlesuper_t1_arch")
    ref = build_reference_model(opt)
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float64)

    rng = np.random.RandomState(9)
    frames = [rng.rand(64, 64, 3) for _ in range(2)]

    outs = []
    k_cache = v_cache = None
    prev = None
    with torch.no_grad(), _KeepF64():
        for fr in frames:
            cur = torch.from_numpy(fr).permute(2, 0, 1)[None]
            if prev is None:
                prev = cur
            p4 = torch.nn.functional.interpolate(prev, scale_factor=0.25,
                                                 mode="bicubic")
            c4 = torch.nn.functional.interpolate(cur, scale_factor=0.25,
                                                 mode="bicubic")
            x = torch.concat([p4.unsqueeze(1), c4.unsqueeze(1)], dim=1)
            out, k_cache, v_cache = ref(x, k_cache, v_cache)
            h, w = fr.shape[:2]
            outs.append(out[0, :, :h, :w].numpy().transpose(1, 2, 0))
            prev = cur

    eng = InferenceEngine(cfg, params, mode="whole", dtype=jnp.float64)
    for t, fr in enumerate(frames):
        got = eng.step(fr.astype(np.float32))
        np.testing.assert_allclose(got, outs[t], atol=1e-6,
                                   err_msg=f"frame {t}")


def test_tile_chunk_heuristic():
    """Chunk picker: batches below max/2 are excluded (MXU under-fill +
    dispatch overhead), then least padding waste, then fewest chunks."""
    class _E:
        mesh = None
        max_tile_batch = 12

    tc = InferenceEngine._tile_chunk
    assert tc(_E(), 45) == 9    # reference 720p grid: 5x9 exact
    assert tc(_E(), 47) == 12   # prime: 4x12, never 47x1
    assert tc(_E(), 36) == 12   # two exact divisors: fewer chunks wins
    assert tc(_E(), 10) == 10   # fits in one batch
    _E.max_tile_batch = 15
    assert tc(_E(), 45) == 15   # 3x15 exact
    _E.max_tile_batch = 1
    assert tc(_E(), 5) == 1

def test_step_async_pipeline_matches_step():
    """step_async with 2 dispatches in flight (the infer CLI pipeline)
    produces exactly the sequential step outputs — the cache threading is
    device-side, so overlapping fetches can't change the stream."""
    opt = tiny_opt("Turtle_t1_arch")
    ref = build_reference_model(opt)
    cfg = model_config_from_options(opt)
    params = params_from_torch_state_dict(ref.state_dict(), dtype=jnp.float32)
    rng = np.random.RandomState(7)
    frames = [rng.rand(24, 40, 3).astype(np.float32) for _ in range(4)]

    eng = InferenceEngine(cfg, params, mode="whole", dtype=jnp.float32)
    seq = [eng.step(fr) for fr in frames]

    eng2 = InferenceEngine(cfg, params, mode="whole", dtype=jnp.float32)
    pending, got = [], []
    for fr in frames:
        pending.append(eng2.step_async(fr))
        if len(pending) > 2:
            got.append(np.asarray(pending.pop(0), np.float32))
    got += [np.asarray(p, np.float32) for p in pending]
    for a, b in zip(seq, got):
        np.testing.assert_array_equal(a, b)
