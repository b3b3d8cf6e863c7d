from . import activations, losses  # noqa: F401
