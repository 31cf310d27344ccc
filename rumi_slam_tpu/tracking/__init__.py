from . import local_mapping, loop_closing, tracker  # noqa: F401
