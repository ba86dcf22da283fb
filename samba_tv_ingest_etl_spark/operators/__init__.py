from . import sessionize  # noqa: F401
