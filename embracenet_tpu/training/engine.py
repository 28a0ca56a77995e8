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
import os
import sys
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.ops import losses, metrics, optim
from embracenet_tpu.training.batching import balanced_plan, eval_plan
from embracenet_tpu.training.modelspec import ModelSpec


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


_EPOCH_FN_CACHE: dict = {}

_OPT_INIT_CACHE: dict = {}


def _opt_init(state_dtype, master: bool):
    """Jitted population (params -> (live_params, opt_state)) init — one
    device program instead of an eager zeros dispatch per parameter leaf
    (remote-dispatch rigs pay link latency per eager op).  With
    ``master=True`` the returned live params are the bf16 working copy and
    ``opt_state['master']`` keeps the f32 source of truth (ops/optim.py)."""
    k = (str(state_dtype), master)
    if k not in _OPT_INIT_CACHE:
        def go(params):
            opt = jax.vmap(
                lambda p: optim.init_state(p, state_dtype, master))(params)
            if master:
                params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), params)
            return params, opt

        _OPT_INIT_CACHE[k] = jax.jit(go)
    return _OPT_INIT_CACHE[k]

_POP_INIT_CACHE: dict = {}


def _pop_init(spec: ModelSpec):
    """Jitted vmapped population init, cached per spec (the XLA-CPU compile
    is local and fast; on-accelerator it rides the persistent cache)."""
    k = id(spec)
    if k not in _POP_INIT_CACHE:
        _POP_INIT_CACHE[k] = jax.jit(jax.vmap(spec.init_traced))
    return _POP_INIT_CACHE[k]


def _statics_key(statics: dict) -> tuple:
    return tuple(sorted(statics.items()))


def _resolve_statics(spec: ModelSpec, hp_list, cfg: TrainConfig,
                     mesh=None) -> dict:
    """Static compile knobs for this population after config overrides."""
    statics = spec.statics(hp_list) if spec.statics else {}
    width_keys = ("cnn_max_channels", "cnn_max_kernels", "ffnn_max_width",
                  "embrace_max", "post_max")
    if not cfg.width_buckets:
        # full supernet widths -> one program shape across populations
        for k in width_keys:
            statics.pop(k, None)
    if cfg.cnn_full_depth and "cnn_max_depth" in statics:
        from embracenet_tpu.config import CNN_MAX_LAYERS

        statics["cnn_max_depth"] = CNN_MAX_LAYERS
        # full depth is a program-sharing request; width slicing would
        # reintroduce per-population shapes, so drop it too
        for k in width_keys:
            statics.pop(k, None)
    fused = cfg.fused_embrace
    if fused is None:
        # auto (PALLAS_BENCH_r5): the Pallas kernel beats XLA only for
        # unvmapped single-trial programs at small batch (engine 1.054x at
        # the reference's B=100; 0.86x under the vmapped 8-trial
        # population), and only on a real TPU backend — the CV retrain
        # shape, not the HPO population shape.
        fused = (len(hp_list) == 1 and cfg.batch_size <= 256
                 and mesh is None and jax.default_backend() == "tpu")
    if fused and spec.name == "EmbraceNetMultimodal":
        statics["fused_embrace"] = True
    return statics


_POP_SETUP_CACHE: dict = {}


def _pop_setup(spec: ModelSpec, statics: dict, state_dtype=None,
               master: bool = False):
    """init + bucket-shrink + optimizer-state init fused into ONE jitted
    program (cached per spec/statics/optimizer-precision).  Per-leaf eager
    ops each pay link latency on remote-dispatch rigs; one program pays it
    once."""
    k = (id(spec), _statics_key(statics), str(state_dtype), master)
    if k not in _POP_SETUP_CACHE:
        from embracenet_tpu.training import slicing

        shrunk = slicing.has_width_statics(statics)

        def setup(keys, fans):
            params, bn_state = jax.vmap(spec.init_traced)(keys, fans)
            if shrunk:
                params, bn_state = slicing.shrink(spec.name, params,
                                                  bn_state, statics)
            opt = jax.vmap(
                lambda p: optim.init_state(p, state_dtype, master))(params)
            if master:
                params = jax.tree.map(
                    lambda a: a.astype(jnp.bfloat16), params)
            return params, bn_state, opt

        _POP_SETUP_CACHE[k] = jax.jit(setup)
    return _POP_SETUP_CACHE[k]


_GROW_CACHE: dict = {}


def _grow_jit(name: str, statics: dict):
    """Jitted slicing.grow (one dispatch instead of ~a pad per leaf)."""
    k = (name, _statics_key(statics))
    if k not in _GROW_CACHE:
        from embracenet_tpu.training import slicing

        _GROW_CACHE[k] = jax.jit(
            lambda p, b: slicing.grow(name, p, b, statics))
    return _GROW_CACHE[k]


def _epoch_fns_cached(spec: ModelSpec, cfg: TrainConfig, compute_dtype,
                      statics: dict):
    """Reuse jitted epoch fns across fit() calls: jax's jit cache keys on
    function identity, so rebuilding closures per call forces a recompile.
    With shape bucketing (below), repeated folds/cells hit the XLA cache."""
    # patience/delta are CLOSED OVER by the chunk program's early-stopping
    # arithmetic — omitting them from the key silently reused another
    # config's stopping constants (caught by test_chunk_callback_counts_
    # early_stopped_epochs_exactly failing only in-suite)
    key = (id(spec), cfg.auprc_on_probabilities, cfg.eval_reshuffle,
           cfg.patience, cfg.delta,
           str(compute_dtype), tuple(sorted(statics.items())))
    if key not in _EPOCH_FN_CACHE:
        _EPOCH_FN_CACHE[key] = _make_epoch_fns(spec, cfg, compute_dtype,
                                               statics)
    return _EPOCH_FN_CACHE[key]


def _make_epoch_fns(spec: ModelSpec, cfg: TrainConfig, compute_dtype, statics=None):
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

            # freeze stopped trials (early-stop under vmap) and skip
            # fully-masked dummy batches (shape-bucketing padding)
            upd = jnp.logical_and(active, jnp.sum(mask) > 0)
            sel = lambda new, old: jax.tree.map(  # noqa: E731
                lambda a, b: jnp.where(upd, a, b), new, old)
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

    def chunk_one(params, bn_state, opt_state, key, es, hp, opt_hp,
                  data_train, plan_idx, plan_mask,
                  data_test, tplan_idx, tplan_mask, tplan_divisor, n_epochs):
        """``n_epochs`` epochs for one trial in a single device program,
        with the reference's early stopping evaluated *on device*: per-epoch
        host round trips were the throughput bottleneck over the TPU tunnel.

        ``es`` = (best, counter, stopped, epochs_run).  Stopped trials stay
        in the scan but freeze their parameters (the ``active`` mask), which
        costs nothing extra wall-clock in a vmapped population.

        With ``cfg.eval_reshuffle`` the eval plan carries a leading per-epoch
        axis (reference reshuffles the test loader every epoch,
        `training_models.py:477`) and is consumed as scan xs.
        """

        def epoch_body(carry, xs):
            params, bn_state, opt_state, key, es = carry
            t_idx, t_mask = xs if cfg.eval_reshuffle \
                else (tplan_idx, tplan_mask)
            best, counter, stopped, epochs_run = es
            active = jnp.logical_not(stopped)
            params, bn_state, opt_state, key, loss_sum, auprc_sum = \
                train_epoch_one(params, bn_state, opt_state, key, active,
                                hp, opt_hp, data_train, plan_idx, plan_mask)
            tloss, t_auprc_sum, f1_sum = eval_epoch_one(
                params, bn_state, hp, data_test, t_idx, t_mask)

            # EarlyStopping parity (models/utils/utils.py:23-67) on the
            # batch-averaged test AUPRC
            score = t_auprc_sum / tplan_divisor
            first = jnp.isinf(best)
            improved = jnp.logical_or(first, score >= best + cfg.delta)
            new_best = jnp.where(improved, score, best)
            new_counter = jnp.where(improved, 0, counter + 1)
            newly_stopped = jnp.logical_and(jnp.logical_not(stopped),
                                            new_counter >= cfg.patience)
            new_stopped = jnp.logical_or(stopped, newly_stopped)
            new_epochs = jnp.where(stopped, epochs_run, epochs_run + 1)
            es = (jnp.where(stopped, best, new_best),
                  jnp.where(stopped, counter, new_counter),
                  new_stopped, new_epochs)
            out = (loss_sum, auprc_sum, t_auprc_sum, f1_sum, new_stopped)
            return (params, bn_state, opt_state, key, es), out

        xs = (tplan_idx, tplan_mask) if cfg.eval_reshuffle else None
        carry, outs = jax.lax.scan(
            epoch_body, (params, bn_state, opt_state, key, es), xs,
            length=n_epochs)
        return carry, outs

    # vmap over the trial axis; data, plans and chunk length are shared.
    # Donating the carried state (params/bn/opt/keys/es) lets XLA update the
    # population in place instead of copying ~100 MB of optimizer state per
    # device call.
    # Batch plans and metric divisors carry a leading trial axis: normally
    # every trial sees the same plan (broadcast on host), but fold-fused
    # populations (training/cv.py fuse_folds) give each trial its own fold's
    # plan, indexing a shared concatenated dataset.  The per-trial gather of
    # ~100 data rows/batch is noise next to the parameter traffic.
    chunk_fn = jax.jit(
        jax.vmap(chunk_one,
                 in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0, 0, None, 0,
                          0, 0, None)),
        static_argnums=(14,),
        donate_argnums=(0, 1, 2, 3, 4))
    return chunk_fn


class _SectionTimer:
    """Prints per-section wall times when EMBRACENET_FIT_TIMING=1 (perf
    forensics for remote-dispatch rigs); no-op otherwise."""

    def __init__(self):
        self.on = os.environ.get("EMBRACENET_FIT_TIMING") == "1"
        self.t = time.perf_counter() if self.on else 0.0

    def __call__(self, label):
        if self.on:
            now = time.perf_counter()
            print(f"[fit-timing] {label}: {now - self.t:.3f}s",
                  file=sys.stderr)
            self.t = now


def _host_cpu_scope():
    """Context that routes uncommitted eager ops to the host CPU backend
    (EMBRACENET_HOST_INIT=0 disables; on pure-CPU rigs it is a no-op)."""
    import contextlib

    if os.environ.get("EMBRACENET_HOST_INIT", "1") != "1":
        return contextlib.nullcontext()
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return contextlib.nullcontext()
    return jax.default_device(cpu)


def _to_host(x):
    """Move an array to the host CPU backend (no-op if already there)."""
    if os.environ.get("EMBRACENET_HOST_INIT", "1") != "1":
        return x
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return x
    return jax.device_put(x, cpu)


def _bucket(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_rows(a: np.ndarray, n_to: int) -> np.ndarray:
    if a.shape[0] == n_to:
        return a
    pad = [(0, n_to - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


def _device_data(data, spec: ModelSpec, row_bucket: int = 512):
    """Device-resident arrays, row count padded to a bucket so XLA programs
    are reused across folds/cells (padded rows are never gathered: batch
    plans index only real rows).  ``row_bucket`` doubles as a minimum row
    target so callers can align shapes across fits."""
    n = len(np.asarray(data["y"]))
    n_pad = max(_bucket(max(n, 1), 512), _bucket(row_bucket, 512))
    out = {"y": jnp.asarray(_pad_rows(np.asarray(data["y"], np.int32), n_pad))}
    if "ffnn" in spec.inputs:
        out["ffnn"] = jnp.asarray(
            _pad_rows(np.asarray(data["ffnn"], np.float32), n_pad))
    if "cnn" in spec.inputs:
        out["cnn"] = jnp.asarray(
            _pad_rows(np.asarray(data["cnn"], np.uint8), n_pad))
    return out


def _pad_plan(plan, batch_bucket: int = 4, width_bucket: int = 16,
              batch_target: int | None = None,
              width_target: int | None = None):
    """Pad a BatchPlan to bucketed (n_batches, batch_width): dummy batches
    are fully masked (train step skips their update), and metric sums divide
    by the real divisor, so results are bit-identical to the unpadded plan.
    Explicit targets (>= actual) let callers align shapes across fits so
    several fits share one compiled program."""
    nb = _bucket(max(plan.idx.shape[0], batch_target or 0), batch_bucket)
    bw = _bucket(max(plan.idx.shape[1], width_target or 0), width_bucket)
    idx = np.zeros((nb, bw), np.int32)
    mask = np.zeros((nb, bw), np.float32)
    idx[:plan.idx.shape[0], :plan.idx.shape[1]] = plan.idx
    mask[:plan.mask.shape[0], :plan.mask.shape[1]] = plan.mask
    return idx, mask


def key_streams(key, n_trials: int):
    """fit()'s per-trial key derivation, exposed so fold-fused callers can
    reproduce a sequential fit's exact streams: (init_keys [T,..],
    run_keys [T,..]).  Matches the default path bit-for-bit."""
    keys = jax.random.split(key, n_trials + 1)
    return keys[1:], jax.random.split(keys[0], n_trials)


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
        report_fn=None,
        mesh=None,
        shape_targets: dict | None = None,
        train_plans: list | None = None,
        eval_plans: list | None = None,
        init_keys=None,
        run_keys=None,
        chunk_callback=None) -> FitResult:
    """Train a population of trials on one (train, test) split.

    ``hp_list``/``opt_list``: per-trial concrete hyperparameter dicts
    (architecture / {optimizer, lr, weight_decay}).  ``report_fn`` (optional)
    is called per epoch with (trial_idx, epoch, test_auprc) -> bool prune.

    ``train_plans``/``eval_plans`` (optional): one BatchPlan per trial,
    indexing rows of ``data_train``/``data_test`` — this is how fold-fused
    populations train several CV folds in ONE program (each trial's plan
    touches only its fold's rows of the concatenated dataset).  Omitted:
    every trial trains the reference's balanced plan over the whole split.
    ``init_keys``/``run_keys`` (optional [T] key arrays, see key_streams)
    pin per-trial RNG streams so a fused population is bit-identical to the
    sequential fits it replaces.

    ``chunk_callback`` (optional) is called after every completed epoch
    chunk with ``(chunk_idx, n_epochs, wall_s, windows_per_epoch)`` where
    ``wall_s`` covers dispatch + execution + metric fetch of that chunk and
    ``windows_per_epoch`` is the chunk's real (unmasked) trained windows
    divided by ``n_epochs`` — trials that early-stop mid-chunk contribute
    only the epochs they actually trained (per-epoch ``stopped_seq``
    accounting), so ``n_epochs * windows_per_epoch`` is exact work.  Chunk 0 includes the program compile/load, so a
    throughput estimate from chunks >= 1 is steady-state — this is how
    bench.py lands a windows/s number minutes before a full fit returns
    (a fit on this rig can spend 100-400 s just loading the cached chunk
    executable over the accelerator tunnel).

    Reference call shape: ``fit`` (`training_models.py:31-186`) and the HPO
    objective's epoch loop (`:284-347`) — here a single vmapped program.
    """
    n_trials = len(hp_list)
    n_real = n_trials
    if mesh is not None:
        # Pad the population to a multiple of the mesh's trial-device count
        # by replicating the last trial (same hp -> same statics, so the
        # compiled program is unchanged); results are sliced back to the
        # real population before returning.  This lets every caller (HPO
        # populations of 3, fused folds of 9, ...) run on any mesh width.
        from embracenet_tpu.parallel.mesh import trial_device_count
        pad = (-n_trials) % trial_device_count(mesh)
        if pad:
            if jax.process_count() > 1:
                raise ValueError(
                    f"population size {n_trials} not divisible by the mesh "
                    f"trial axes; pad the population explicitly on "
                    f"multi-host meshes")
            hp_list = list(hp_list) + [hp_list[-1]] * pad
            opt_list = list(opt_list) + [opt_list[-1]] * pad
            if train_plans is not None:
                train_plans = list(train_plans) + [train_plans[-1]] * pad
            if eval_plans is not None:
                eval_plans = list(eval_plans) + [eval_plans[-1]] * pad

            def _pad_rows(tree):
                return jax.tree.map(
                    lambda a: np.concatenate(
                        [np.asarray(a),
                         np.repeat(np.asarray(a)[-1:], pad, axis=0)]), tree)

            if init_params is not None:
                init_params = _pad_rows(init_params)
                init_bn_state = _pad_rows(init_bn_state)
            if init_keys is not None:
                init_keys = _pad_rows(init_keys)
            if run_keys is not None:
                run_keys = _pad_rows(run_keys)
            n_trials = len(hp_list)
    if train_plans is not None and cfg.eval_reshuffle:
        raise ValueError("per-trial plans and eval_reshuffle are exclusive "
                         "(use the sequential per-fold path for strict "
                         "reference eval-shuffle parity)")
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None)
    opt_state_dtype = (jnp.bfloat16 if cfg.optim_dtype == "bfloat16" else None)
    use_master = cfg.param_dtype == "bfloat16"
    _tm = _SectionTimer()

    statics = _resolve_statics(spec, hp_list, cfg, mesh=mesh)
    from embracenet_tpu.training import slicing

    shrunk = slicing.has_width_statics(statics)

    # Population init.  With a traceable init (spec.init_traced) the whole
    # population inits, bucket-shrinks and builds optimizer state in ONE
    # jitted program run directly on the accelerator: no host->device bulk
    # transfer of the parameter population, and none of the per-leaf eager
    # dispatches (shrink slices, device_puts, opt zeros) that each pay
    # ~25 ms link latency on a remote-dispatch rig.  The eager fallback
    # (CNN_LSTM-style specs) runs on the host CPU backend and ships the
    # stacked result leaf-wise.  Under a mesh, init stays on host because
    # global_from_host_local consumes host-local arrays.  Bit-identity
    # traced-vs-eager is tested (tests/test_pop_init.py).
    on_device = (init_params is None and spec.init_traced is not None
                 and mesh is None
                 and os.environ.get("EMBRACENET_HOST_INIT") != "1")
    opt_state = None
    if init_params is None:
        if init_keys is None:
            # The split must run on the backend the population will train
            # on: jit places a program on the device of its COMMITTED
            # arguments, so a host-committed key here silently drags
            # _pop_setup — and, through its outputs, the whole training
            # chunk program — onto XLA:CPU (observed: 3 windows/s vs 76k
            # on the chip; this also wedged the round-2 driver bench).
            src = (jax.device_put(key, jax.devices()[0]) if on_device
                   else _to_host(key))
            keys = jax.random.split(src, n_trials + 1)
            key = keys[0]
            init_keys = keys[1:]
        if spec.init_traced is not None:
            fans = [spec.fan_ins(h) for h in hp_list]
            fans = jax.tree.map(lambda *xs: np.stack(xs), *fans)
            if on_device:
                params, bn_state, opt_state = _pop_setup(
                    spec, statics, opt_state_dtype, use_master)(
                    jnp.asarray(init_keys), fans)
            else:
                with _host_cpu_scope():
                    params, bn_state = _pop_init(spec)(init_keys, fans)
        else:
            with _host_cpu_scope():
                inits = [spec.init(init_keys[t], hp_list[t])
                         for t in range(n_trials)]
                params = stack_trials([i[0] for i in inits])
                bn_state = stack_trials([i[1] for i in inits])
    else:
        params, bn_state = init_params, init_bn_state

    hp = stack_trials(hp_list)
    opt_hp = stack_trials([{k: np.asarray(v) for k, v in o.items()}
                           for o in opt_list])
    _tm("init+stack")

    st = shape_targets or {}
    train_data = _device_data(data_train, spec,
                              row_bucket=max(512, st.get("train_rows", 0)))
    test_data = _device_data(data_test, spec,
                             row_bucket=max(512, st.get("eval_rows", 0)))
    y_train = np.asarray(data_train["y"])
    if (train_plans is None) != (eval_plans is None):
        raise ValueError("train_plans and eval_plans go together")
    if train_plans is None:
        plans = [balanced_plan(y_train, cfg.batch_size, seed=123)]
        tplans = [eval_plan(len(np.asarray(data_test["y"])),
                            cfg.batch_size * 2, seed=123)]
    else:
        if len(train_plans) != n_trials or len(eval_plans) != n_trials:
            raise ValueError("per-trial plans must match the population size")
        plans, tplans = list(train_plans), list(eval_plans)

    def _div_vec(ps):
        d = np.asarray([p.metric_divisor for p in ps], np.float32)
        return np.broadcast_to(d, (n_trials,)).copy() if len(ps) == 1 else d

    train_div = _div_vec(plans)   # [T] host, for metric averaging
    eval_div = _div_vec(tplans)   # [T] host+device (early-stopping score)
    _tm("device-data+plans")

    # Shrink params (and therefore grads + optimizer state) to the bucket
    # shapes: the apply fns' static a[:c] slices are no-ops on shrunk leaves,
    # and Adam stops paying full-supernet HBM traffic per batch.  Grown back
    # to the stable full layout before returning.  The on-device init path
    # already did all of this inside its single program.
    if not on_device:
        if shrunk:
            params, bn_state = slicing.shrink(spec.name, params, bn_state,
                                              statics)
        _tm("shrink")
        if mesh is None:
            # One bulk transfer of the (bucket-shaped) population to the
            # chip; everything after this touches full leaves.
            dev = jax.devices()[0]
            params = jax.device_put(params, dev)
            bn_state = jax.device_put(bn_state, dev)
            _tm("population-transfer")
        params, opt_state = _opt_init(opt_state_dtype, use_master)(params)
    _tm("opt-init")
    chunk_fn = _epoch_fns_cached(spec, cfg, compute_dtype, statics)

    def _stack_plans(ps, batch_target=None, width_target=None):
        """[T, nb, bw] stacked plan arrays; a single shared plan broadcasts
        over the trial axis (same bytes once on device)."""
        nb = max(max(p.idx.shape[0] for p in ps), batch_target or 0)
        bw = max(max(p.idx.shape[1] for p in ps), width_target or 0)
        padded = [_pad_plan(p, batch_target=nb, width_target=bw) for p in ps]
        idx = np.stack([p[0] for p in padded])
        mask = np.stack([p[1] for p in padded])
        if idx.shape[0] == 1 and n_trials > 1:
            idx = np.broadcast_to(idx, (n_trials,) + idx.shape[1:])
            mask = np.broadcast_to(mask, (n_trials,) + mask.shape[1:])
        return jnp.asarray(idx), jnp.asarray(mask)

    plan_idx, plan_mask = _stack_plans(
        plans, batch_target=st.get("train_batches"),
        width_target=st.get("train_batch_width"))
    tplan_idx, tplan_mask = _stack_plans(
        tplans, batch_target=st.get("eval_batches"))

    n_test = len(np.asarray(data_test["y"]))

    def _eval_plans_for(epoch_lo: int, n_ep: int):
        """Stacked per-epoch eval plans [T, n_ep, nb, bw] for eval_reshuffle
        (reference test DataLoader shuffle=True, training_models.py:477);
        shared across trials, broadcast over the trial axis."""
        padded = [_pad_plan(eval_plan(n_test, cfg.batch_size * 2,
                                      seed=123 + ep),
                            batch_target=st.get("eval_batches"))
                  for ep in range(epoch_lo, epoch_lo + n_ep)]
        idx = np.stack([p[0] for p in padded])
        mask = np.stack([p[1] for p in padded])
        return (jnp.asarray(np.broadcast_to(idx[None],
                                            (n_trials,) + idx.shape)),
                jnp.asarray(np.broadcast_to(mask[None],
                                            (n_trials,) + mask.shape)))

    trial_keys = (jnp.asarray(run_keys) if run_keys is not None
                  else jax.random.split(key, n_trials))
    if mesh is None:
        # Belt and braces against CPU-committed leaves (eager init path,
        # caller-supplied keys/params): commit every chunk-program input
        # that could carry host placement to the accelerator.  device_put
        # onto the device an array already lives on is a no-op.
        _dev = jax.devices()[0]
        params, bn_state, trial_keys = jax.device_put(
            (params, bn_state, trial_keys), _dev)
        if opt_state is not None:
            opt_state = jax.device_put(opt_state, _dev)
    # NB: construct from concrete numpy so avals are non-weak from the first
    # call — weak-typed scalars here caused a silent retrace (and a second
    # full XLA compile) on the second chunk call.
    es = (jnp.asarray(np.full(n_trials, -np.inf, np.float32)),  # best score
          jnp.asarray(np.zeros(n_trials, np.int32)),            # counter
          jnp.asarray(np.zeros(n_trials, bool)),                # stopped
          jnp.asarray(np.zeros(n_trials, np.int32)))            # epochs run

    multiproc = mesh is not None and jax.process_count() > 1
    if mesh is not None:
        # population over 'trial' (and 'dcn' across hosts — trials never
        # communicate, so nothing rides the DCN), batch-plan width over
        # 'data', data arrays replicated; XLA turns the batch-axis
        # reductions (loss weights, BN stats, metric counts) into ICI
        # all-reduces automatically.
        from jax.sharding import PartitionSpec as P

        from embracenet_tpu.parallel.mesh import (
            global_from_host_local, trial_axes, trial_device_count)

        n_trial_devs = trial_device_count(mesh)
        if n_trials % n_trial_devs != 0:
            raise ValueError(
                f"population size {n_trials} not divisible by mesh trial "
                f"axes {n_trial_devs}")
        taxes = trial_axes(mesh)
        ts_spec = P(taxes if len(taxes) > 1 else taxes[0])
        if multiproc:
            # every process holds the full population; its host-local piece
            # of a trial-sharded tree is its dcn block of rows
            n_dcn = dict(mesh.shape)["dcn"]
            rows = n_trials // n_dcn
            pidx = jax.process_index()

            def _slc(tree):
                return jax.tree.map(
                    lambda a: np.asarray(a)[pidx * rows:(pidx + 1) * rows],
                    tree)
        else:
            def _slc(tree):
                return tree
        params, bn_state, opt_state, hp, opt_hp, trial_keys, es, \
            eval_div_dev = (
                global_from_host_local(_slc(t), mesh, ts_spec) for t in
                (params, bn_state, opt_state, hp, opt_hp, trial_keys, es,
                 jnp.asarray(eval_div)))
        train_data = global_from_host_local(train_data, mesh, P())
        test_data = global_from_host_local(test_data, mesh, P())
        # plans carry a leading trial axis (per-trial under fold fusion)
        pspec = P(taxes if len(taxes) > 1 else taxes[0], None, "data")
        plan_idx, plan_mask, tplan_idx, tplan_mask = (
            global_from_host_local(_slc(t), mesh, pspec) for t in
            (plan_idx, plan_mask, tplan_idx, tplan_mask))
    else:
        eval_div_dev = jnp.asarray(eval_div)
    # history / early-exit bookkeeping covers only the REAL population;
    # mesh-padding replicas train but are never reported or returned
    pruned = [False] * n_real
    hist_train = [[] for _ in range(n_real)]
    hist_test = [[] for _ in range(n_real)]
    hist_f1 = [[] for _ in range(n_real)]

    if chunk_callback is not None:
        # real (unmasked) train windows per trial per epoch; a single
        # shared plan broadcasts over all trials
        _wpt = ([float(p.mask.sum()) for p in plans] if len(plans) > 1
                else [float(plans[0].mask.sum())] * n_real)

    done = [False] * n_real
    epochs_done = 0
    chunk_idx = 0
    pending = None          # pipeline_chunks: last dispatched, unprocessed
    t_state = {"prev_fetch": time.perf_counter()}

    def _process(rec):
        """Fetch one chunk's metrics and run the host bookkeeping (history,
        early-exit, pruning, chunk_callback).  With cfg.pipeline_chunks the
        NEXT chunk is already enqueued on device when this blocks on the
        fetch, so chunk boundaries never drain the device pipeline."""
        c_idx, n_ep, ep_lo, outs, live0, t_disp = rec
        if multiproc:
            from jax.experimental import multihost_utils

            outs = jax.tree.map(
                lambda a: multihost_utils.process_allgather(a, tiled=True),
                outs)
        _, tr_sum, te_sum, f1_sum, stopped_seq = map(np.asarray, outs)
        _tm(f"chunk+fetch@{ep_lo}")
        now = time.perf_counter()
        if chunk_callback is not None:
            # exact per-trial epochs trained this chunk: a trial stopping
            # at in-chunk epoch e trains e+1 epochs (the stopping epoch
            # itself trains, then freezes) — so early converging trials are
            # not credited with the whole chunk's windows.  Liveness at
            # chunk START comes from the previously PROCESSED chunk's final
            # stopped state (exact even under pipeline_chunks, where the
            # dispatch-time ``done`` snapshot lags one chunk).
            ss = stopped_seq[:n_real].astype(bool)
            ep_tr = np.where(ss.any(axis=1), ss.argmax(axis=1) + 1, n_ep)
            prev_stopped = t_state.get("stopped", [False] * n_real)
            real_windows = sum(w * int(e) for w, e, live, st
                               in zip(_wpt, ep_tr, live0, prev_stopped)
                               if live and not st)
            t_state["stopped"] = ss[:, -1].tolist()
            # wall: non-overlapping segment (pipelined chunks overlap their
            # predecessor's fetch; sequential mode reduces to now - t_disp)
            chunk_callback(c_idx, n_ep,
                           now - max(t_disp, t_state["prev_fetch"]),
                           real_windows / n_ep)
        t_state["prev_fetch"] = now
        auprc_tr = tr_sum / train_div[:, None]        # [T, n_ep]
        auprc_te = te_sum / eval_div[:, None]
        f1 = f1_sum / eval_div[:, None, None]         # [T, n_ep, 3]

        for e in range(n_ep):
            epoch = ep_lo + e + 1
            for t in range(n_real):
                if done[t]:
                    continue
                # history includes the stop epoch (the reference records
                # the epoch's scores, then breaks)
                hist_train[t].append(float(auprc_tr[t, e]))
                hist_test[t].append(float(auprc_te[t, e]))
                hist_f1[t].append(f1[t, e].tolist())
                if report_fn is not None and \
                        report_fn(t, epoch, float(auprc_te[t, e])):
                    pruned[t] = True
                    done[t] = True
                elif stopped_seq[t, e]:
                    done[t] = True
        if verbose:
            print(f"epochs {ep_lo + 1}-{ep_lo + n_ep}: "
                  f"test AUPRC {auprc_te[:n_real, -1].round(4)} "
                  f"done={sum(done)}/{n_real}")

    while epochs_done < cfg.num_epochs and not all(done):
        n_ep = min(cfg.epoch_chunk, cfg.num_epochs - epochs_done)
        # snapshot liveness at chunk start; per-trial epochs actually
        # trained come from stopped_seq after the chunk executes
        _live0 = [not d for d in done] if chunk_callback is not None else None
        t_chunk0 = time.perf_counter()
        if cfg.eval_reshuffle:
            tplan_idx, tplan_mask = _eval_plans_for(epochs_done, n_ep)
            if mesh is not None:
                from jax.sharding import PartitionSpec as P

                from embracenet_tpu.parallel.mesh import global_from_host_local

                from embracenet_tpu.parallel.mesh import trial_axes

                rtaxes = trial_axes(mesh)
                rspec = P(rtaxes if len(rtaxes) > 1 else rtaxes[0],
                          None, None, "data")
                tplan_idx = global_from_host_local(
                    _slc(tplan_idx), mesh, rspec)
                tplan_mask = global_from_host_local(
                    _slc(tplan_mask), mesh, rspec)
        _tm(f"pre-chunk@{epochs_done}")
        (params, bn_state, opt_state, trial_keys, es), outs = chunk_fn(
            params, bn_state, opt_state, trial_keys, es, hp, opt_hp,
            train_data, plan_idx, plan_mask,
            test_data, tplan_idx, tplan_mask, eval_div_dev, n_ep)
        # outs: per-trial [n_ep] sequences (vmap axis leads); fetched and
        # bookkept by _process — either now (sequential) or after the NEXT
        # chunk is enqueued (pipeline_chunks), in which case early-exit /
        # pruning lag one chunk (at most one wasted chunk of frozen-trial
        # compute; numerics identical — device-side ES gates training).
        rec = (chunk_idx, n_ep, epochs_done, outs, _live0, t_chunk0)
        chunk_idx += 1
        epochs_done += n_ep
        if cfg.pipeline_chunks:
            if pending is not None:
                _process(pending)
            pending = rec
        else:
            _process(rec)
    if pending is not None:
        _process(pending)

    if use_master:
        # the f32 master in the optimizer state is the source of truth;
        # the bf16 working copy was only ever a compute-stream format
        params = opt_state["master"]
    if shrunk:
        params, bn_state = _grow_jit(spec.name, statics)(params, bn_state)
    if n_real != n_trials:
        params, bn_state = jax.tree.map(lambda a: a[:n_real],
                                        (params, bn_state))
    _tm("grow+return")
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
