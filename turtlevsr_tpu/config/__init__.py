from turtlevsr_tpu.config.options import (  # noqa: F401
    ModelConfig,
    LevelSpec,
    load_options,
    model_config_from_options,
    ATTENTION_ALIASES,
)
