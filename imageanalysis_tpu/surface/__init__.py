from . import srtm  # noqa: F401
