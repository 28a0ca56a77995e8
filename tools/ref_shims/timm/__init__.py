from . import optim  # noqa: F401
