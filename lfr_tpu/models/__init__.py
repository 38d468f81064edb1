from . import panet, torch_import  # noqa: F401
