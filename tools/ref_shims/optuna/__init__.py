"""Minimal optuna-compatible shim so the REFERENCE pipeline can run as-is.

optuna is not installed in this image; the reference
(`BIOINF_tesi/models/utils/training_models.py:19-22,361-376`) uses a small
slice of its API.  This shim reproduces exactly that slice with faithful
semantics *in the reference's operating regime*:

  * every reference study runs 3 trials; TPESampler/BoTorchSampler both
    default to n_startup_trials=10 **random** trials, so all three samplers
    reduce to independent random draws from the declared menus — which is
    what this shim implements (seedable via ``seed()``);
  * MedianPruner(n_startup_trials=5) wrapped in PatientPruner(patience=2)
    never fires with <5 completed trials, i.e. it is inert at 3 trials/study
    — the shim implements the median rule anyway;
  * create_study(load_if_exists=True) resumes in-process by study_name
    (storage URL is accepted and ignored — the harness never resumes across
    processes).

Used only by tools/parity_bench.py.  NOT an optuna replacement.
"""

import numpy as np

from . import exceptions, integration, pruners, samplers, structs  # noqa: F401
from .exceptions import TrialPruned  # noqa: F401
from .structs import TrialState  # noqa: F401

_RNG = np.random.default_rng(0)
_STUDIES: dict = {}
_STUDY_ORDER: list = []


def seed(s: int):
    """Seed the suggest_* RNG (harness reproducibility)."""
    global _RNG
    _RNG = np.random.default_rng(s)


class Trial:
    def __init__(self, number: int, study: "Study"):
        self.number = number
        self.params = {}
        self._study = study
        self._reports = {}

    # --- suggest API used by the reference model ctors / objectives ---
    def suggest_categorical(self, name, choices):
        if name not in self.params:
            self.params[name] = choices[int(_RNG.integers(0, len(choices)))]
        return self.params[name]

    def suggest_int(self, name, low, high):
        if name not in self.params:
            self.params[name] = int(_RNG.integers(low, high + 1))
        return self.params[name]

    def suggest_float(self, name, low, high, log=False):
        if name not in self.params:
            if log:
                self.params[name] = float(
                    np.exp(_RNG.uniform(np.log(low), np.log(high))))
            else:
                self.params[name] = float(_RNG.uniform(low, high))
        return self.params[name]

    def suggest_loguniform(self, name, low, high):
        return self.suggest_float(name, low, high, log=True)

    def suggest_uniform(self, name, low, high):
        return self.suggest_float(name, low, high)

    # --- pruning API ---
    def report(self, value, step):
        self._reports[step] = float(value)

    def should_prune(self):
        pruner = self._study.pruner
        if pruner is None:
            return False
        return pruner._should_prune(self._study, self)


class FrozenTrial:
    def __init__(self, number, state, value, params, reports):
        self.number = number
        self.state = state
        self.value = value
        self.params = params
        self.intermediate_values = dict(reports)


class Study:
    def __init__(self, study_name, direction="maximize", pruner=None,
                 sampler=None):
        self.study_name = study_name
        self.direction = direction
        self.pruner = pruner
        self.sampler = sampler
        self.trials: list[FrozenTrial] = []

    def optimize(self, objective, n_trials=1):
        for _ in range(n_trials):
            trial = Trial(len(self.trials), self)
            try:
                value = objective(trial)
                self.trials.append(FrozenTrial(
                    trial.number, TrialState.COMPLETE, float(value),
                    dict(trial.params), trial._reports))
            except TrialPruned:
                self.trials.append(FrozenTrial(
                    trial.number, TrialState.PRUNED, None,
                    dict(trial.params), trial._reports))

    @property
    def best_trial(self) -> FrozenTrial:
        done = [t for t in self.trials if t.state == TrialState.COMPLETE]
        if not done:
            raise ValueError(f"study {self.study_name} has no completed trials")
        return max(done, key=lambda t: t.value) \
            if self.direction == "maximize" \
            else min(done, key=lambda t: t.value)


def create_study(study_name=None, direction="maximize", pruner=None,
                 storage=None, load_if_exists=False, sampler=None):
    if load_if_exists and study_name in _STUDIES:
        return _STUDIES[study_name]
    st = Study(study_name, direction, pruner, sampler)
    _STUDIES[study_name] = st
    _STUDY_ORDER.append(study_name)
    return st


def reset_studies():
    """Harness hook: clear the in-process study registry."""
    _STUDIES.clear()
    _STUDY_ORDER.clear()


def all_trials_in_order():
    """Harness hook: every trial's params, in global draw order (used to
    pair the JAX side's ReplaySampler with the torch side's draws)."""
    out = []
    for name in _STUDY_ORDER:
        for t in _STUDIES[name].trials:
            out.append(dict(t.params))
    return out
