from . import worklist, matcher, cleanup, groups  # noqa: F401
