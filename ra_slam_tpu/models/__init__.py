from ra_slam_tpu.models.segmentation import (
    InferenceEngine,
    SegmentationNet,
    make_train_step,
)

__all__ = ["InferenceEngine", "SegmentationNet", "make_train_step"]
