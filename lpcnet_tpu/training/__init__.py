from . import losses, lpcnet_task  # noqa: F401
