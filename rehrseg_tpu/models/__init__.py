from .wdsr import WDSR
from .flavr import UNet3D
from .segnet import SegModel, arch_from_plans, DEFAULT_ARCH
from .distiller import Distiller
