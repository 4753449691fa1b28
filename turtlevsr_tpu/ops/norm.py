"""Channel LayerNorm over NHWC tensors.

The reference normalises the channel axis of NCHW maps by rearranging to
(b, hw, c) and back (turtle_arch.py:61-112). In NHWC the channel axis is
already last, so this is a single fused reduction — no data movement.

Semantics match exactly:
  * variance is biased (torch ``x.var(unbiased=False)``),
  * eps = 1e-5 added inside the sqrt,
  * the "BiasFree" variant divides by sqrt(var) but does NOT subtract the
    mean from the numerator (turtle_arch.py:79-81).
Statistics are computed in at least float32 regardless of activation dtype.
"""

from __future__ import annotations

import jax.numpy as jnp

from turtlevsr_tpu.ops.attn_utils import acc_dtype

_EPS = 1e-5


def layer_norm(x, weight, bias=None):
    dtype = x.dtype
    ad = acc_dtype(dtype)
    xf = x.astype(ad)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    inv = 1.0 / jnp.sqrt(var + _EPS)
    if bias is None:
        y = xf * inv * weight.astype(ad)
    else:
        y = (xf - mu) * inv * weight.astype(ad) + bias.astype(ad)
    return y.astype(dtype)


def layer_norm_init(dim: int, with_bias: bool, dtype=jnp.float32) -> dict:
    params = {"weight": jnp.ones((dim,), dtype)}
    if with_bias:
        params["bias"] = jnp.zeros((dim,), dtype)
    return params
