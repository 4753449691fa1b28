from turtlevsr_tpu.core.cache import (  # noqa: F401
    fhr_slot_init,
    sab_slot_init,
    fhr_slot_append,
    sab_slot_append,
    frame_valid_mask,
    token_valid_mask,
)
