"""MedianPruner(n_startup_trials=5) in PatientPruner(patience=2): inert in
the reference's 3-trial studies; median rule implemented for completeness."""


class MedianPruner:
    def __init__(self, n_startup_trials=5, n_warmup_steps=0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def _should_prune(self, study, trial):
        done = [t for t in study.trials if t.state == "COMPLETE"]
        if len(done) < self.n_startup_trials or not trial._reports:
            return False
        step = max(trial._reports)
        if step <= self.n_warmup_steps:
            return False
        at_step = [t.intermediate_values[step] for t in done
                   if step in t.intermediate_values]
        if not at_step:
            return False
        at_step.sort()
        n = len(at_step)
        median = at_step[n // 2] if n % 2 else \
            0.5 * (at_step[n // 2 - 1] + at_step[n // 2])
        return trial._reports[step] < median


class PatientPruner:
    def __init__(self, wrapped, patience=2, min_delta=0.0):
        self.wrapped = wrapped
        self.patience = patience
        self.min_delta = min_delta

    def _should_prune(self, study, trial):
        hist = [trial._reports[s] for s in sorted(trial._reports)]
        if len(hist) <= self.patience:
            return False
        recent = hist[-(self.patience + 1):]
        if recent[-1] > max(recent[:-1]) + self.min_delta:
            return False
        return self.wrapped._should_prune(study, trial)
