from turtlevsr_tpu.eval.engine import InferenceEngine, VideoFrames  # noqa: F401
