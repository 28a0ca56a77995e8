class TrialPruned(Exception):
    pass
