from . import framing  # noqa: F401
