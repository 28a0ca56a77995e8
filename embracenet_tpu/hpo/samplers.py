"""Hyperparameter samplers: random and a lightweight TPE.

Reference uses optuna's ``RandomSampler`` / ``TPESampler`` / ``BoTorchSampler``
(`BIOINF_tesi/models/utils/training_models.py:248-253`).  Notable parity
fact: both TPE and BoTorch default to ``n_startup_trials = 10`` *random*
trials, and every reference study runs only **3 trials**
(`training_models.py:502` via `Kfold_CV.hyper_tuning`) — so the reference's
"TPE"/"BO" sampling never actually leaves random mode.  We implement a real
TPE for populations beyond the startup budget and map ``"BO"`` to TPE (no
GP/BoTorch dependency), which is behaviour-identical in the reference regime.
"""

from __future__ import annotations

import math

import numpy as np

from embracenet_tpu.hpo.space import (
    Categorical,
    FloatUniform,
    IntUniform,
    LogUniform,
    model_space,
)


class RandomSampler:
    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)

    def sample(self, space: dict, history: list) -> dict:
        return {name: dist.sample(self.rng) for name, dist in space.items()}


class TPESampler:
    """Tree-structured Parzen Estimator over the declarative space.

    history: list of (params, value) with value maximised.  Below
    ``n_startup_trials`` observations, falls back to random (optuna parity).
    """

    def __init__(self, seed: int = 0, n_startup_trials: int = 10,
                 gamma: float = 0.25, n_candidates: int = 24):
        self.rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.gamma = gamma
        self.n_candidates = n_candidates

    def sample(self, space: dict, history: list) -> dict:
        history = [(p, v) for p, v in history if v is not None]
        if len(history) < self.n_startup_trials:
            return {n: d.sample(self.rng) for n, d in space.items()}
        order = sorted(history, key=lambda t: -t[1])
        n_good = max(1, int(math.ceil(self.gamma * len(order))))
        good = [p for p, _ in order[:n_good]]
        bad = [p for p, _ in order[n_good:]] or good

        out = {}
        for name, dist in space.items():
            g_vals = [p[name] for p in good if name in p]
            b_vals = [p[name] for p in bad if name in p]
            if not g_vals:
                out[name] = dist.sample(self.rng)
            elif isinstance(dist, (Categorical,)):
                out[name] = self._categorical(dist, g_vals, b_vals)
            elif isinstance(dist, IntUniform):
                choices = list(range(dist.low, dist.high + 1))
                out[name] = self._categorical(Categorical(tuple(choices)),
                                              g_vals, b_vals)
            elif isinstance(dist, (LogUniform, FloatUniform)):
                out[name] = self._continuous(dist, g_vals, b_vals)
            else:
                out[name] = dist.sample(self.rng)
        return out

    def _categorical(self, dist: Categorical, good, bad):
        choices = list(dist.choices)
        prior = 1.0

        def weights(vals):
            w = np.full(len(choices), prior)
            for v in vals:
                w[choices.index(v)] += 1.0
            return w / w.sum()

        lg, lb = weights(good), weights(bad)
        score = lg / np.maximum(lb, 1e-12)
        probs = lg * score
        probs /= probs.sum()
        return choices[int(self.rng.choice(len(choices), p=probs))]

    def _continuous(self, dist, good, bad):
        log = isinstance(dist, LogUniform)
        f = math.log if log else (lambda v: v)
        g = math.exp if log else (lambda v: v)
        lo, hi = f(dist.low), f(dist.high)
        gv = np.asarray([f(v) for v in good])
        bv = np.asarray([f(v) for v in bad])
        bw = max((hi - lo) / max(len(gv), 1) * 1.06, 1e-3 * (hi - lo))

        def logpdf(x, centers):
            d = (x[:, None] - centers[None, :]) / bw
            return np.log(np.mean(np.exp(-0.5 * d * d), axis=1) /
                          (bw * math.sqrt(2 * math.pi)) + 1e-300)

        cands = gv[self.rng.integers(0, len(gv), self.n_candidates)] \
            + self.rng.normal(0, bw, self.n_candidates)
        cands = np.clip(cands, lo, hi)
        ei = logpdf(cands, gv) - logpdf(cands, bv)
        best = g(cands[int(np.argmax(ei))])
        return float(min(max(best, dist.low), dist.high))


class ReplaySampler:
    """Replays a fixed sequence of flat param dicts (stateful cursor).

    Used for paired benchmarking (tools/parity_bench.py replays the exact
    trial params the reference's sampler drew) and for grid/fixed searches.
    Successive ``sample`` calls — across studies/folds — consume the list in
    order; raises when exhausted."""

    def __init__(self, params_list: list[dict]):
        self.params_list = list(params_list)
        self.cursor = 0

    def sample(self, space: dict, history: list) -> dict:
        if self.cursor >= len(self.params_list):
            raise ValueError("ReplaySampler exhausted: "
                             f"{len(self.params_list)} params provided")
        p = dict(self.params_list[self.cursor])
        self.cursor += 1
        # Conditional per-layer params may be absent (the reference samples
        # them only up to the drawn depth); params_to_hp fills defaults for
        # those, so no validation beyond dict-ness is required here.
        return p


def get_sampler(name: str, seed: int = 0):
    """'random' | 'TPE' | 'BO' (reference sampler menu)."""
    if name == "random":
        return RandomSampler(seed)
    if name in ("TPE", "BO"):
        return TPESampler(seed)
    raise ValueError(f"unknown sampler {name!r}: use 'random', 'TPE' or 'BO'")


def sample_n(sampler, model: str, n: int, history: list) -> list[dict]:
    space = model_space(model)
    out = []
    hist = list(history)
    for _ in range(n):
        p = sampler.sample(space, hist)
        out.append(p)
        hist.append((p, None))
    return out
