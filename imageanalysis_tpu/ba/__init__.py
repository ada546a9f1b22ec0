from . import bundle  # noqa: F401
