"""Import-only shim: the reference imports create_engine
(`training_models.py:8`) but never calls it."""


def create_engine(*args, **kwargs):
    raise RuntimeError("sqlalchemy shim: create_engine is not available "
                       "(the reference pipeline never calls it)")
