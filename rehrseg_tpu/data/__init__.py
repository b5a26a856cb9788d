from .normalize import (
    zscore_normalization,
    zeroone_normalization,
    percentile_normalization,
    zscore_batch,
)
from .transforms import TrainingTransforms
from .datasets import SRPatchDataset, SegSRDataset, BatchLoader
