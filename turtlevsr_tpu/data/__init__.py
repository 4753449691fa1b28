from turtlevsr_tpu.data.dataset import (  # noqa: F401
    VideoImageDataset,
    VideoSuperImageDataset,
    create_dataset,
)
from turtlevsr_tpu.data.sampler import EnlargedSampler  # noqa: F401
from turtlevsr_tpu.data.loader import PrefetchLoader  # noqa: F401
