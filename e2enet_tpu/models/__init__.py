from .unetpp import ShiftUNetPlusPlus, build_network  # noqa: F401
from .unet import ShiftUNet  # noqa: F401
