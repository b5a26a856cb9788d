from .blur import (
    fwhm_needed,
    fwhm_units_to_voxel_space,
    blur_fwhm_in_voxels,
    select_kernel,
    parse_kernel,
    calc_extended_patch_size,
    blur_axis,
    blur_axis_np,
)
from .bspline import (
    resize_1d_np,
    resize_nd_np,
    resize_1d_jax,
    resize_nd_jax,
    resize_matrix,
    output_size,
    upsample_axis_linear,
    zoom_axis_np,
)
from .gaussian import compute_gaussian
from .pixel_shuffle import pixel_shuffle_axis
from .fba import fba, fba_jax
from .warp import (
    map_coordinates_cubic_2d,
    map_coordinates_linear_2d,
    rotate_scale_coords,
    warp_data_2d,
    warp_seg_2d,
)
