from . import nifti
from .volume import (
    parse_image,
    lr_axis_to_z,
    z_axis_to_lr_axis,
    normalize,
    inv_normalize,
    LazyHDF5File,
    write_h5,
    read_h5,
)
