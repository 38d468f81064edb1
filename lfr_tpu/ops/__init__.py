from . import image_ops, interpolate, matchers, patches  # noqa: F401
