from . import datasets, synthetic, trajectory  # noqa: F401
