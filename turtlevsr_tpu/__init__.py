"""turtlevsr_tpu — a TPU-native video-restoration framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of TurtleVSR
("Turtle: Learning Truncated Causal History Model for Video Restoration",
NeurIPS 2024; reference implementation is PyTorch/BasicSR).

Design pillars (TPU-first, not a port):
  * The per-frame python loops of the reference (train BPTT, streaming
    inference) become a single `lax.scan` over time with the truncated
    causal-history KV cache carried as a fixed-shape ring-buffer pytree.
  * Compute is NHWC / bfloat16 and shaped for the MXU; softmax/LN run fp32.
  * Tiled inference batches the tile grid as a leading array axis with all
    per-tile caches device-resident (the reference round-trips them through
    CPU per tile as a CUDA-memory workaround).
  * Scaling is a `jax.sharding.Mesh` + NamedSharding data-parallel step with
    compiler-inserted collectives (the reference uses one-process-per-GPU DDP
    over NCCL).
"""

__version__ = "0.1.0"

from turtlevsr_tpu.config import load_options, model_config_from_options  # noqa: F401
