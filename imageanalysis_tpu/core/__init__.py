from . import rotations, geodesy, camera, transforms  # noqa: F401
