from . import geometry, interpolate, image, tsdf, quat  # noqa: F401
from . import mesh  # noqa: F401
