from . import props, project, exif, pose, camera_db, state, logger  # noqa: F401
