from . import detect  # noqa: F401
