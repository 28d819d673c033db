from . import geometry, interpolate, image, tsdf, quat  # noqa: F401
