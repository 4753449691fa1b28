"""Convert reference PyTorch checkpoints to turtlevsr_tpu parameter trees.

The published checkpoints are ``{'params': state_dict}`` .pth files
(base_model.py:193-224). Our parameter tree mirrors the torch module names,
so conversion is mechanical:

  * dotted keys map to nested dicts; integer segments index the
    ``transformer_blocks`` lists,
  * 4-D conv weights transpose OIHW -> HWIO,
  * the (1, C, 1, 1) ``gamma``/``beta`` scales flatten to (C,),
  * everything else (LN weight/bias, conv bias, temperature) copies as-is,
  * a leading ``module.`` prefix (DDP) is stripped (base_model.py:272-277).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp


def _to_numpy(t):
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def params_from_torch_state_dict(state_dict: Dict[str, "np.ndarray"],
                                 dtype=jnp.float32) -> dict:
    """Build a nested params dict from a flat torch state_dict."""
    root: dict = {}
    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module."):]
        parts = key.split(".")
        arr = _to_numpy(value).astype(np.float32)
        leaf_name = parts[-1]

        if leaf_name in ("gamma", "beta"):
            arr = arr.reshape(-1)
        elif leaf_name == "weight" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO

        node = root
        for i, p in enumerate(parts[:-1]):
            prev = parts[i - 1] if i > 0 else ""
            if p.isdigit() and prev == "transformer_blocks":
                # list-of-blocks segment
                idx = int(p)
                lst = node
                if not isinstance(lst, list):
                    raise ValueError(f"expected list at {'.'.join(parts[:i])}")
                while len(lst) <= idx:
                    lst.append({})
                node = lst[idx]
            else:
                nxt_is_block_idx = (p == "transformer_blocks")
                if p not in node:
                    node[p] = [] if nxt_is_block_idx else {}
                node = node[p]
        node[leaf_name] = jnp.asarray(arr, dtype)
    return root


def load_torch_checkpoint(path: str, param_key: str = "params",
                          dtype=jnp.float32) -> dict:
    """Load a reference .pth checkpoint (requires torch, CPU-only is fine)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = blob.get(param_key, blob) if isinstance(blob, dict) else blob
    return params_from_torch_state_dict(state_dict, dtype)
