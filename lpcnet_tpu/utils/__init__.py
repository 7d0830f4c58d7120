from . import fec_packets  # noqa: F401
