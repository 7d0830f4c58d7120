from . import codec, packet, vq, vq_train  # noqa: F401
