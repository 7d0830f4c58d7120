from . import sample_scan  # noqa: F401
