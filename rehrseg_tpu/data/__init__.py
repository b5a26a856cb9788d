from .normalize import (
    zscore_normalization,
    zeroone_normalization,
    percentile_normalization,
    zscore_batch,
)
