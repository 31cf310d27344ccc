from . import fast, image, matcher, orb, select  # noqa: F401
