from turtlevsr_tpu.ops.conv import conv2d, conv_init, conv_apply  # noqa: F401
from turtlevsr_tpu.ops.norm import layer_norm, layer_norm_init  # noqa: F401
from turtlevsr_tpu.ops.resize import (  # noqa: F401
    pixel_shuffle,
    pixel_unshuffle,
    upsample_bilinear,
    resize_bicubic,
)
from turtlevsr_tpu.ops.attn_utils import (  # noqa: F401
    l2_normalize,
    masked_softmax,
    clipped_softmax,
    topk_keep,
    local_window_mask,
    posenc2d,
)
