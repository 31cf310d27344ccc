from . import alignment, camera, camera_kb8, lie, triangulation  # noqa: F401
