from . import layers, lpcnet  # noqa: F401
