"""In the reference's 3-trial regime every sampler is in its random startup
phase (TPE/BoTorch n_startup_trials=10), so these are markers only — the
suggest_* RNG lives in the Trial (see package __init__)."""


class TPESampler:
    def __init__(self, *a, **k):
        pass


class RandomSampler:
    def __init__(self, *a, **k):
        pass
