from . import over_sampling  # noqa: F401
