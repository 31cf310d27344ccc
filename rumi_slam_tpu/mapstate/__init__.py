from . import checkpoint, map_state  # noqa: F401
