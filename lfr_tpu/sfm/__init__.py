from . import cameras, geometry, triangulate, verify  # noqa: F401
