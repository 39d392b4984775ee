from . import wildweb  # noqa: F401
