from . import stream, windows  # noqa: F401
