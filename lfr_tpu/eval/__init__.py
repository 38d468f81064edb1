from . import compare, eth3d  # noqa: F401
