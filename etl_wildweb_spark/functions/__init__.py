from . import exact, js_compat, vector  # noqa: F401
