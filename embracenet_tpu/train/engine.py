"""Population-first jitted training engine.

Replaces the reference's per-batch Python loops (`BIOINF_tesi/models/utils/
training_models.py:31-186` ``fit`` and the Optuna objective's inner loop)
with one compiled program per epoch:

  * the fold's entire train/test set lives on device; an epoch is a
    ``lax.scan`` over a static padded batch-index matrix (see batching.py);
  * a *population* of T trials (different architectures via supernet masks,
    different optimizers/lr/wd via branchless selection) trains inside a
    single ``jax.vmap`` — the TPU replacement for sequential Optuna trials
    (SURVEY.md §5.8);
  * per-batch INS-weighted cross entropy, per-batch argmax-AUPRC and the
    reference's metric averaging (divide by ``len(loader)``) are preserved;
  * early stopping (patience on test AUPRC, `models/utils/utils.py:23-67`)
    is tracked on host per trial; stopped trials freeze their parameters
    inside the vmapped step via an ``active`` mask.

Sharding: ``fit(..., mesh=...)`` places the population over the mesh's
``trial`` axis and batches over ``data`` (see parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.ops import losses, metrics, optim
from embracenet_tpu.train.batching import BatchPlan, balanced_plan, eval_plan
from embracenet_tpu.train.modelspec import ModelSpec


@dataclasses.dataclass
class FitResult:
    params: Any                 # stacked over trials
    bn_state: Any
    auprc_train: list           # per trial: list of per-epoch floats
    auprc_test: list
    f1_precision_recall: list   # per trial: list of [p, r, f1]
    epochs_run: list            # per trial

    @property
    def final_test_auprc(self):
        return [h[-1] if h else 0.0 for h in self.auprc_test]

    @property
    def final_train_auprc(self):
        return [h[-1] if h else 0.0 for h in self.auprc_train]


class EarlyStopping:
    """Reference-parity early stopping (`models/utils/utils.py:23-67`):
    counter increments when score < best + delta, resets (and updates best)
    otherwise; stop when counter >= patience."""

    def __init__(self, patience: int = 4, delta: float = 0.0):
        self.patience = patience
        self.delta = delta
        self.best = None
        self.counter = 0
        self.stop = False

    def __call__(self, score: float) -> bool:
        if self.best is None:
            self.best = score
        elif score < self.best + self.delta:
            self.counter += 1
            if self.counter >= self.patience:
                self.stop = True
        else:
            self.best = score
            self.counter = 0
        return self.stop


def _gather_inputs(data, idx, spec: ModelSpec):
    out = {}
    if "ffnn" in spec.inputs:
        out["ffnn"] = jnp.take(data["ffnn"], idx, axis=0)
    if "cnn" in spec.inputs:
        out["cnn"] = jnp.take(data["cnn"], idx, axis=0)
    return out


def stack_trials(trees):
    return jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)


def _make_epoch_fns(spec: ModelSpec, cfg: TrainConfig, compute_dtype, statics=None):
    auprc = (metrics.auprc_prob if cfg.auprc_on_probabilities
             else metrics.auprc_argmax)

    def auprc_of(logits, y, mask):
        if cfg.auprc_on_probabilities:
            scores = jax.nn.softmax(logits, axis=-1)[:, 1]
            return metrics.auprc_prob(scores, y, mask)
        return metrics.auprc_argmax(logits, y, mask)

    def train_epoch_one(params, bn_state, opt_state, key, active, hp, opt_hp,
                        data, plan_idx, plan_mask):
        """One trial's epoch: scan over batches."""

        def batch_step(carry, batch):
            params, bn_state, opt_state, key = carry
            idx, mask = batch
            key, k_model = jax.random.split(key)
            inputs = _gather_inputs(data, idx, spec)
            y = jnp.take(data["y"], idx, axis=0)

            def loss_fn(p, bs):
                logits, new_bs = spec.apply(p, bs, hp, inputs, True, k_model,
                                            mask, compute_dtype, statics)
                loss = losses.weighted_cross_entropy(logits, y, mask)
                return loss, (logits, new_bs)

            (loss, (logits, new_bn)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, bn_state)
            new_params, new_opt = optim.apply_update(
                params, grads, opt_state, opt_hp["optimizer"], opt_hp["lr"],
                opt_hp["weight_decay"])

            # freeze stopped trials (early-stop semantics under vmap)
            sel = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(active, a, b), new, old)
            params_out = sel(new_params, params)
            bn_out = sel(new_bn, bn_state)
            opt_out = sel(new_opt, opt_state)

            batch_auprc = auprc_of(logits, y, mask)
            return (params_out, bn_out, opt_out, key), (loss, batch_auprc)

        (params, bn_state, opt_state, key), (loss_seq, auprc_seq) = \
            jax.lax.scan(batch_step, (params, bn_state, opt_state, key),
                         (plan_idx, plan_mask))
        return params, bn_state, opt_state, key, jnp.sum(loss_seq), jnp.sum(auprc_seq)

    def eval_epoch_one(params, bn_state, hp, data, plan_idx, plan_mask):
        def batch_step(_, batch):
            idx, mask = batch
            inputs = _gather_inputs(data, idx, spec)
            y = jnp.take(data["y"], idx, axis=0)
            logits, _ = spec.apply(params, bn_state, hp, inputs, False,
                                   jax.random.PRNGKey(0), mask, compute_dtype,
                                   statics)
            loss = losses.weighted_cross_entropy(logits, y, mask)
            return None, (loss, auprc_of(logits, y, mask),
                          metrics.f1_precision_recall(logits, y, mask))

        _, (loss_seq, auprc_seq, f1_seq) = jax.lax.scan(
            batch_step, None, (plan_idx, plan_mask))
        return jnp.sum(loss_seq), jnp.sum(auprc_seq), jnp.sum(f1_seq, axis=0)

    # vmap over the trial axis; data and plans are shared.
    train_epoch = jax.jit(jax.vmap(
        train_epoch_one,
        in_axes=(0, 0, 0, 0, 0, 0, 0, None, None, None)))
    eval_epoch = jax.jit(jax.vmap(
        eval_epoch_one, in_axes=(0, 0, 0, None, None, None)))
    return train_epoch, eval_epoch


def _device_data(data, spec: ModelSpec):
    out = {"y": jnp.asarray(np.asarray(data["y"], np.int32))}
    if "ffnn" in spec.inputs:
        out["ffnn"] = jnp.asarray(np.asarray(data["ffnn"], np.float32))
    if "cnn" in spec.inputs:
        out["cnn"] = jnp.asarray(np.asarray(data["cnn"], np.uint8))
    return out


def fit(spec: ModelSpec,
        hp_list: list,
        opt_list: list,
        data_train: dict,
        data_test: dict,
        cfg: TrainConfig = TrainConfig(),
        key=None,
        init_params=None,
        init_bn_state=None,
        verbose: bool = False,
        report_fn=None) -> FitResult:
    """Train a population of trials on one (train, test) split.

    ``hp_list``/``opt_list``: per-trial concrete hyperparameter dicts
    (architecture / {optimizer, lr, weight_decay}).  ``report_fn`` (optional)
    is called per epoch with (trial_idx, epoch, test_auprc) -> bool prune.

    Reference call shape: ``fit`` (`training_models.py:31-186`) and the HPO
    objective's epoch loop (`:284-347`) — here a single vmapped program.
    """
    n_trials = len(hp_list)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)

    # per-trial init (host; concrete shapes), then stack for vmap
    if init_params is None:
        keys = jax.random.split(key, n_trials + 1)
        key = keys[0]
        inits = [spec.init(keys[1 + t], hp_list[t]) for t in range(n_trials)]
        params = stack_trials([i[0] for i in inits])
        bn_state = stack_trials([i[1] for i in inits])
    else:
        params, bn_state = init_params, init_bn_state
    opt_state = jax.vmap(optim.init_state)(params)

    hp = stack_trials(hp_list)
    opt_hp = stack_trials([{k: np.asarray(v) for k, v in o.items()}
                           for o in opt_list])

    train_data = _device_data(data_train, spec)
    test_data = _device_data(data_test, spec)
    y_train = np.asarray(data_train["y"])
    plan = balanced_plan(y_train, cfg.batch_size, seed=123)
    tplan = eval_plan(len(np.asarray(data_test["y"])), cfg.batch_size * 2,
                      seed=123)

    statics = spec.statics(hp_list) if spec.statics else {}
    train_epoch, eval_epoch = _make_epoch_fns(spec, cfg, compute_dtype, statics)
    plan_idx, plan_mask = jnp.asarray(plan.idx), jnp.asarray(plan.mask)
    tplan_idx, tplan_mask = jnp.asarray(tplan.idx), jnp.asarray(tplan.mask)

    trial_keys = jax.random.split(key, n_trials)
    stoppers = [EarlyStopping(cfg.patience, cfg.delta) for _ in range(n_trials)]
    pruned = [False] * n_trials
    hist_train = [[] for _ in range(n_trials)]
    hist_test = [[] for _ in range(n_trials)]
    hist_f1 = [[] for _ in range(n_trials)]

    active = np.ones(n_trials, bool)
    for epoch in range(1, cfg.num_epochs + 1):
        params, bn_state, opt_state, trial_keys, loss_sum, auprc_sum = \
            train_epoch(params, bn_state, opt_state, trial_keys,
                        jnp.asarray(active), hp, opt_hp,
                        train_data, plan_idx, plan_mask)
        _, test_auprc_sum, f1_sum = eval_epoch(params, bn_state, hp,
                                               test_data, tplan_idx, tplan_mask)
        auprc_tr = np.asarray(auprc_sum) / plan.metric_divisor
        auprc_te = np.asarray(test_auprc_sum) / tplan.metric_divisor
        f1 = np.asarray(f1_sum) / tplan.metric_divisor

        for t in range(n_trials):
            if not active[t]:
                continue
            hist_train[t].append(float(auprc_tr[t]))
            hist_test[t].append(float(auprc_te[t]))
            hist_f1[t].append(f1[t].tolist())
            if report_fn is not None and report_fn(t, epoch, float(auprc_te[t])):
                pruned[t] = True
                active[t] = False
                continue
            if stoppers[t](float(auprc_te[t])):
                active[t] = False
        if verbose:
            print(f"epoch {epoch}: train AUPRC {auprc_tr.round(4)} "
                  f"test AUPRC {auprc_te.round(4)} active={active.sum()}")
        if not active.any():
            break

    return FitResult(
        params=params,
        bn_state=bn_state,
        auprc_train=hist_train,
        auprc_test=hist_test,
        f1_precision_recall=hist_f1,
        epochs_run=[len(h) for h in hist_test],
    )


def weight_reset(key, spec: ModelSpec, hp_concrete, old_params, old_bn_state):
    """Reference ``weight_reset`` parity (`models/utils/utils.py:155-163`):
    re-initialise Linear/Conv weights but keep BatchNorm affine params and
    running stats from HPO training (the reference resets only
    Conv1d/Linear/LSTM modules — a quirk we preserve)."""
    fresh_params, _ = spec.init(key, hp_concrete)

    def merge(fresh, old):
        if isinstance(fresh, dict):
            return {k: (old[k] if k.startswith("bn") else merge(fresh[k], old[k]))
                    for k in fresh}
        return fresh

    return merge(fresh_params, old_params), old_bn_state
