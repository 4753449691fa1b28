"""Model Forge — build a Turtle variant from an option dict.

Reference registry behaviour: video_restoration_model.py:18-21 imports
``basicsr.models.archs.{opt['model'].lower()}`` and calls its make_model.
Here the variant is resolved by config/options.MODEL_VARIANTS and all three
variants share one implementation parameterised by ``ModelConfig.variant``.
"""

from turtlevsr_tpu.config.options import ModelConfig, model_config_from_options
from turtlevsr_tpu.models.turtle import (  # noqa: F401
    forward,
    init_cache,
    init_params,
    padded_hw,
)


def build_model(opt_or_cfg):
    """Return the (cfg, init_params, init_cache, forward) bundle."""
    if isinstance(opt_or_cfg, ModelConfig):
        cfg = opt_or_cfg
    else:
        cfg = model_config_from_options(opt_or_cfg)
    return cfg, init_params, init_cache, forward
