from . import build_map  # noqa: F401
