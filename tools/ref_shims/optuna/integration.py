class BoTorchSampler:
    """Reference menu item (`training_models.py:249`).  With 3 trials it
    never leaves the random startup phase — marker only."""

    def __init__(self, *a, **k):
        pass
