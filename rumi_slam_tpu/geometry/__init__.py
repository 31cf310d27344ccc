from . import alignment, camera, lie, triangulation  # noqa: F401
