from turtlevsr_tpu.io.torch_convert import (  # noqa: F401
    params_from_torch_state_dict,
    load_torch_checkpoint,
)
