from . import knn, ransac, triangulate  # noqa: F401
