from . import ate, harness  # noqa: F401
