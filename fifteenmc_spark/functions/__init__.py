from . import geo, text  # noqa: F401
