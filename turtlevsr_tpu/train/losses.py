"""Training losses.

The reference hardwires L1 (loss/__init__.py:8-17, used at
video_restoration_model.py:38,94) and also defines a PSNR loss
(loss/__init__.py:20-41). Losses compute in float32 regardless of the
forward dtype.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred.astype(jnp.float32)
                            - target.astype(jnp.float32)))


def psnr_loss(pred, target, toy: bool = False):
    """-PSNR/10 style loss (scale folded like the BasicSR PSNRLoss)."""
    mse = jnp.mean(jnp.square(pred.astype(jnp.float32)
                              - target.astype(jnp.float32)),
                   axis=(-3, -2, -1))
    scale = 10.0 / jnp.log(10.0)
    return jnp.mean(scale * jnp.log(mse + 1e-8))


LOSSES = {"L1Loss": l1_loss, "L1BaseLoss": l1_loss, "PSNRLoss": psnr_loss}
