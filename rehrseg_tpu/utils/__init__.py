from .pad import target_pad, crop, get_pads, format_pads
from .patch import (
    projected_size,
    ideal_size,
    calc_slices_to_crop,
    find_integer_p,
    get_patch,
    get_random_centers,
)
from .timer import timer_context, StepTimer
from .rotate import rotate_vol_2d
