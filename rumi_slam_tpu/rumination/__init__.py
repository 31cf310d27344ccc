from . import backend, cloud_map, coordinator, merge, sampler  # noqa: F401
