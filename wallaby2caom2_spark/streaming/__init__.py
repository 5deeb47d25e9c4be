from . import stateful, stream, windows  # noqa: F401
