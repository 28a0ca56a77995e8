"""Hyperparameter search as one vmapped population (Param_Search equivalent).

Reference: ``Param_Search`` / ``Param_Search_Multimodal``
(`BIOINF_tesi/models/utils/training_models.py:192-399`,
`training_models_multimodal.py:232-462`) run trials *sequentially*, each a
full train loop.  Here the study's remaining trials are sampled up front and
trained **simultaneously** as a vmapped population sharded over the mesh's
trial axis — wall-clock for 3 trials ~= wall-clock for 1.

Semantics preserved:
  * objective = per-epoch test AUPRC, early stopping patience 4;
  * resume accounting (only ``n_trials - n_complete`` new trials);
  * per-trial intermediate values persisted; optional pruning via the
    reference's MedianPruner-in-PatientPruner stack (inert at 3 trials/study,
    as in the reference) or same-epoch population median (``prune="population"``);
  * per-trial final weights checkpointed as ``{study_name}{number}`` (the
    reference saves ``{study_name}{trial}.pt``, `training_models.py:350`);
  * ``best_trial`` = argmax final objective over all completed trials.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import numpy as np

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.hpo import space as space_mod
from embracenet_tpu.hpo.samplers import get_sampler, sample_n
from embracenet_tpu.hpo.study import COMPLETE, PRUNED, MedianPruner, PatientPruner, Study
from embracenet_tpu.training import engine
from embracenet_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from embracenet_tpu.training.modelspec import ModelSpec


@dataclasses.dataclass
class SearchResult:
    best_params: dict           # flat reference-named hyperparameters
    best_value: float
    best_model: Any             # (params, bn_state) of the best trial or None
    n_complete: int
    n_pruned: int


def run_search(spec: ModelSpec,
               model: str,
               data_train: dict,
               data_val: dict,
               study_name: str,
               storage: str = "optuna_tuning.db",
               sampler: str = "TPE",
               n_trials: int = 3,
               train_cfg: TrainConfig = TrainConfig(),
               prune: str = "reference",
               checkpoint_dir: str | None = None,
               seed: int = 0,
               verbose: bool = False,
               fit_kwargs: dict | None = None) -> SearchResult:
    """Run (or resume) a study; returns the best trial across all runs."""
    study = Study(study_name, storage)
    completed = study.completed_trials()
    remaining = max(0, n_trials - len(completed))

    if remaining > 0:
        # `sampler` may be a name from the reference menu or a sampler
        # object (e.g. ReplaySampler for paired benchmarks / fixed grids)
        smp = sampler if hasattr(sampler, "sample") \
            else get_sampler(sampler, seed=seed)
        flat_list = sample_n(smp, model, remaining, study.history())
        hp_list = [space_mod.params_to_hp(model, f) for f in flat_list]
        opt_list = [space_mod.optimizer_hp(f) for f in flat_list]
        numbers = [study.next_number() + i for i in range(remaining)]

        pruner = PatientPruner(MedianPruner(), patience=2)
        intermediates: list[dict] = [dict() for _ in range(remaining)]
        pruned_flags = [False] * remaining

        def report_fn(t, epoch, value):
            intermediates[t][epoch] = value
            hist = [intermediates[t][e] for e in sorted(intermediates[t])]
            if prune == "reference":
                do = pruner.should_prune(completed, epoch, value, hist)
            elif prune == "population":
                at_e = [iv.get(epoch) for iv in intermediates]
                at_e = sorted(v for v in at_e if v is not None)
                do = (len(at_e) >= 3 and len(hist) > 2
                      and value < at_e[len(at_e) // 2]
                      and hist[-1] <= max(hist[:-1]))
            else:
                do = False
            if do:
                pruned_flags[t] = True
            return do

        if spec.vmappable:
            # width-bucketed sub-populations: split the population into cost
            # groups so narrow/shallow trials stop paying the widest trial's
            # supernet FLOPs (plan_buckets only splits when the projected
            # saving clears its threshold)
            groups = [list(range(remaining))]
            if train_cfg.width_buckets and remaining > 1:
                from embracenet_tpu.training.bucketing import plan_buckets

                groups = plan_buckets(spec, model, hp_list)
        else:
            # trial shapes differ per architecture (e.g. CNN_LSTM): trials
            # sharing one statics signature still vmap together; only
            # distinct architectures run sequentially across groups
            sig_to_idxs: dict = {}
            for i, hp in enumerate(hp_list):
                sig = tuple(sorted(spec.statics([hp]).items())) \
                    if spec.statics else i
                sig_to_idxs.setdefault(sig, []).append(i)
            groups = list(sig_to_idxs.values())

        per_trial = [None] * remaining
        for gi, idxs in enumerate(groups):
            result = engine.fit(
                spec, [hp_list[i] for i in idxs],
                [opt_list[i] for i in idxs], data_train, data_val,
                train_cfg,
                key=jax.random.PRNGKey(seed if gi == 0
                                       else seed + 7919 * gi),
                verbose=verbose,
                report_fn=(lambda lt, e, v, idxs=idxs:
                           report_fn(idxs[lt], e, v)),
                **(fit_kwargs or {}))
            for lt, i in enumerate(idxs):
                per_trial[i] = (
                    jax.tree.map(lambda a, lt=lt: np.asarray(a)[lt],
                                 (result.params, result.bn_state)),
                    result.auprc_test[lt])

        for t in range(remaining):
            value = per_trial[t][1][-1] if per_trial[t][1] else 0.0
            state = PRUNED if pruned_flags[t] else COMPLETE
            study.tell(numbers[t], flat_list[t],
                       None if pruned_flags[t] else value,
                       state, intermediates[t])
            if checkpoint_dir and not pruned_flags[t]:
                trial_tree = per_trial[t][0]
                save_checkpoint(
                    os.path.join(checkpoint_dir, f"{study_name}{numbers[t]}"),
                    {"params": trial_tree[0], "bn_state": trial_tree[1]},
                    meta={"model": model, "model_params": flat_list[t],
                          "value": value})

    best = study.best_trial
    best_model = None
    if checkpoint_dir:
        path = os.path.join(checkpoint_dir, f"{study_name}{best.number}.npz")
        if os.path.exists(path):
            trees, _ = load_checkpoint(path)
            best_model = (trees["params"], trees.get("bn_state", {}))
    n_pruned = len(study.pruned_trials())
    res = SearchResult(best_params=best.params, best_value=best.value,
                       best_model=best_model,
                       n_complete=len(study.completed_trials()),
                       n_pruned=n_pruned)
    study.close()
    if verbose:
        print(f"study {study_name}: {res.n_complete} complete, "
              f"{n_pruned} pruned, best value {res.best_value:.4f}")
    return res
