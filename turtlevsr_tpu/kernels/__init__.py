from turtlevsr_tpu.kernels.ffn import fused_block_ffn  # noqa: F401
