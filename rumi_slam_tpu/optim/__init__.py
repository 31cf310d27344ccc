from . import ba, pnp, pose_opt, robust, two_view  # noqa: F401
