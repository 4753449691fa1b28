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


def torch_state_dict_from_params(params: dict) -> Dict[str, "np.ndarray"]:
    """Inverse of params_from_torch_state_dict: flatten a turtlevsr_tpu
    parameter tree back to the reference's flat torch key space.

    Key names match the reference modules exactly (the tree mirrors them),
    so a .pth produced here loads into the torch reference with
    ``strict=True`` (base_model.py:261-286). Transforms inverted:

      * HWIO 4-D conv weights -> OIHW,
      * (C,) ``gamma``/``beta`` scales -> (1, C, 1, 1),
      * nested dicts -> dotted keys; ``transformer_blocks`` lists -> integer
        segments.
    """
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, list):
            for i, item in enumerate(node):
                walk(item, f"{prefix}.{i}")
            return
        if isinstance(node, dict):
            for name, item in node.items():
                walk(item, f"{prefix}.{name}" if prefix else name)
            return
        arr = np.asarray(node, dtype=np.float32)
        leaf = prefix.rsplit(".", 1)[-1]
        if leaf in ("gamma", "beta"):
            arr = arr.reshape(1, -1, 1, 1)
        elif leaf == "weight" and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        flat[prefix] = arr

    walk(params, "")
    return flat


def save_torch_checkpoint(path: str, params: dict,
                          param_key: str = "params") -> None:
    """Write ``{'params': state_dict}`` .pth exactly like the reference's
    save_network (base_model.py:193-224), so TPU-trained weights can be
    evaluated in / shipped back to the torch ecosystem."""
    import torch

    flat = torch_state_dict_from_params(params)
    state_dict = {k: torch.from_numpy(np.array(v, copy=True))
                  for k, v in flat.items()}
    torch.save({param_key: state_dict}, path)
