from .normalize import (
    zscore_normalization,
    zeroone_normalization,
    percentile_normalization,
    zscore_batch,
)
from .transforms import TrainingTransforms
from .datasets import SRPatchDataset, SegSRDataset, BatchLoader, PrefetchLoader
from .device_aug import augment_seg_batch
from .device_sr_sim import simulate_lr_batch
