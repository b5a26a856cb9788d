from . import nifti
from .volume import (
    Volume,
    load_volume,
    parse_image,
    lr_axis_to_z,
    z_axis_to_lr_axis,
    normalize,
    inv_normalize,
    H5Store,
    H5Dataset,
    write_h5,
    read_h5,
)
