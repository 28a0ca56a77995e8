"""Head-to-head parity bench: the REFERENCE torch pipeline vs embracenet_tpu
on identical calibrated synthetic data.

The reference's value claim is `results_dict.pickle` (average_CV_AUPRC per
cell x task x model; BASELINE.md).  Its real data is user-downloaded and not
shipped, so true-data parity cannot run here; this harness instead runs the
reference's OWN code — `BIOINF_tesi.models.utils.Kfold_CV` /
`Kfold_CV_Multimodal` imported from /root/reference, torch CPU, with the
missing third-party deps (optuna/timm/imblearn/...) provided by thin shims in
tools/ref_shims — and this framework's `KfoldCV` on the SAME arrays, then
reports per-combo average_CV_AUPRC deltas.

Pairing: the optuna shim records every trial's sampled params in draw order;
the JAX side replays them via `hpo.samplers.ReplaySampler`, so both sides
evaluate the same 3 architectures/optimizers per fold on the same KFold
(seed 789) splits.  Remaining divergence is engine-level: init RNG, SMOTE
draws, dropout/embracement RNG, f64 (torch) vs f32 (JAX) numerics — i.e.
exactly what "distributional parity" must absorb.  The reference's own
fold-to-fold std is 0.01-0.15 (BASELINE.md), so |delta| <= 0.05 counts as
within-band.

Writes PARITY_r4.json incrementally (resumable; finished combos are skipped).

Usage:
  python tools/parity_bench.py --smoke              # 1 tiny FFNN combo
  python tools/parity_bench.py --suite ffnn         # 7 cells x 2 tasks
  python tools/parity_bench.py --suite cnn          # sequence model subset
  python tools/parity_bench.py --suite embracenet   # multimodal subset
  python tools/parity_bench.py --suite concat
  python tools/parity_bench.py --suite all
"""

from __future__ import annotations

import argparse
import contextlib
import functools
import json
import os
import random
import shutil
import sys
import time

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools", "ref_shims"))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, REPO)

RESULT_PATH = os.path.join(REPO, "PARITY_r5.json")
SCRATCH = os.path.join(REPO, "artifacts", "parity_scratch")

# ---------------------------------------------------------------------------
# Calibration (BASELINE.md): baseline = positive prevalence floored at 0.1.
# Floored rows (exactly 0.100) use prevalence 0.06 — T1/T5-style imbalance
# that actually triggers the rebalancing path, as in the reference datasets.
# ---------------------------------------------------------------------------

TASK_CODES = {"T1": "active_E_vs_inactive_E", "T2": "active_P_vs_inactive_P",
              "T3": "active_E_vs_active_P", "T4": "inactive_E_vs_inactive_P",
              "T5": "active_EP_vs_inactive_rest"}

BASELINES = {  # (cell, Tn) -> baseline AUPRC from BASELINE.md
    ("A549", "T1"): 0.100, ("A549", "T2"): 0.103, ("A549", "T3"): 0.259,
    ("A549", "T4"): 0.400, ("A549", "T5"): 0.100,
    ("GM12878", "T1"): 0.183, ("GM12878", "T2"): 0.141,
    ("GM12878", "T3"): 0.452, ("GM12878", "T4"): 0.376,
    ("GM12878", "T5"): 0.157,
    ("H1", "T1"): 0.100, ("H1", "T2"): 0.133, ("H1", "T3"): 0.186,
    ("H1", "T4"): 0.410, ("H1", "T5"): 0.100,
    ("HEK293", "T1"): 0.105, ("HEK293", "T2"): 0.132, ("HEK293", "T3"): 0.336,
    ("HEK293", "T4"): 0.395, ("HEK293", "T5"): 0.121,
    ("HEPG2", "T1"): 0.113, ("HEPG2", "T2"): 0.141, ("HEPG2", "T3"): 0.337,
    ("HEPG2", "T4"): 0.395, ("HEPG2", "T5"): 0.130,
    ("K562", "T1"): 0.100, ("K562", "T2"): 0.125, ("K562", "T3"): 0.306,
    ("K562", "T4"): 0.398, ("K562", "T5"): 0.111,
    ("MCF7", "T1"): 0.100, ("MCF7", "T2"): 0.127, ("MCF7", "T3"): 0.279,
    ("MCF7", "T4"): 0.401, ("MCF7", "T5"): 0.108,
}

# Post-selection feature-count stand-ins per cell line (reference raw dims
# are 52-566; H1 is 48 post-selection per Data_preprocessing.ipynb cell 27).
FEATURES = {"A549": 52, "GM12878": 96, "H1": 48, "HEK293": 160,
            "HEPG2": 256, "K562": 128, "MCF7": 112}

# Row counts: reference scale / ~32 (T1 63k, T2 100k, T3 14-26k, T4 140k,
# T5 163k), capped for torch-CPU feasibility on this 1-core box.
ROWS_TAB = {"T1": 2000, "T2": 2600, "T3": 1400, "T4": 2600, "T5": 2600}
ROWS_SEQ = 1200  # conv stacks in float64 on 1 CPU core are the bottleneck

MOTIF = "gattacagat"


def prevalence_for(cell: str, tcode: str) -> float:
    b = BASELINES[(cell, tcode)]
    return 0.06 if b <= 0.101 else b


def make_dataset(cell: str, tcode: str, n: int, seed: int):
    """Calibrated two-modality synthetic dataset.

    Tabular: d features (FEATURES[cell]), an informative subspace shifted by
    class with per-row penetrance U(0,1) so positives span easy->impossible
    (mid-range AUPRC, discriminative between models).  MinMax-scaled to [0,1]
    like the reference's post-preprocessing matrices.
    Sequence: 256-bp windows; MOTIF planted in 65% of positives at a random
    position, and in 8% of negatives (background hits).
    """
    rng = np.random.default_rng(seed)
    d = FEATURES[cell]
    prev = prevalence_for(cell, tcode)
    y = (rng.random(n) < prev).astype(np.int64)
    if y.sum() < 12:
        y[rng.choice(n, 12, replace=False)] = 1

    d_inf = max(4, d // 6)
    w = rng.normal(size=d_inf)
    w /= np.linalg.norm(w)
    x = rng.normal(size=(n, d))
    penetrance = rng.random(n)
    x[:, :d_inf] += np.outer((2.0 * y - 1.0) * penetrance, w) * 1.6
    x = (x - x.min(0)) / (x.max(0) - x.min(0) + 1e-9)

    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    motif_codes = np.asarray(["acgt".index(c) for c in MOTIF], np.uint8)
    carriers = np.flatnonzero((y == 1) & (rng.random(n) < 0.65))
    bg = np.flatnonzero((y == 0) & (rng.random(n) < 0.08))
    for i in np.concatenate([carriers, bg]):
        pos = rng.integers(0, 256 - len(MOTIF))
        codes[i, pos:pos + len(MOTIF)] = motif_codes
    seqs = ["".join("acgt"[c] for c in row) for row in codes]

    X_tab = pd.DataFrame(x, columns=[f"f{j}" for j in range(d)])
    fa = pd.Series(seqs)
    return X_tab, fa, codes, pd.Series(y)


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------

class _StubDataClass:
    """Minimal stand-in for Data_Prepare: the only surface Kfold_CV(_Multimodal)
    touches is return_index_data_for_cv (`training_models.py:640-642`,
    `training_models_multimodal.py:718-722`)."""

    def __init__(self, X_tab: pd.DataFrame, fa: pd.Series, y: pd.Series):
        self.X_tab, self.fa, self.y = X_tab, fa, y

    def return_index_data_for_cv(self, cell_line, sequence=False, n_folds=3,
                                 random_state=789):
        from sklearn.model_selection import KFold

        kf = KFold(n_splits=n_folds, shuffle=True, random_state=random_state)
        X = self.fa if sequence else self.X_tab
        return kf, X.copy(), self.y.copy()


class _StubPipeline:
    def __init__(self, data_class):
        self.data_class = data_class


def run_reference(cell, task, model_name, X_tab, fa, y, num_epochs, seed,
                  scratch, log_fh, augmentation=False, type_augm="smote",
                  torch_seed=None):
    """Run the reference's own Kfold_CV / Kfold_CV_Multimodal (torch CPU).

    ``torch_seed`` (default: ``seed``) decouples the torch RNG — model
    init, dropout, the stochastic embracement draws — from the
    numpy/optuna streams that fix the dataset splits, rebalancing draws
    and trial architectures.  Two runs differing only in ``torch_seed``
    measure the reference's OWN init-luck noise floor on identical data
    and identical sampled architectures (tools/noise_yardstick.py)."""
    import torch

    torch.set_num_threads(1)
    if not getattr(torch.load, "_parity_patched", False):
        # the reference pickles whole models (`training_models.py:350,383`);
        # torch >= 2.6 defaults weights_only=True
        torch.load = functools.partial(torch.load, weights_only=False)
        torch.load._parity_patched = True
    if not getattr(torch.tensor, "_parity_patched", False):
        # old torch accepted pd.Series in torch.tensor (`dataprepare.py:406`)
        _orig_tensor = torch.tensor

        def tensor_compat(data, *a, **k):
            if isinstance(data, (pd.Series, pd.DataFrame)):
                data = np.asarray(data)
            return _orig_tensor(data, *a, **k)

        tensor_compat._parity_patched = True
        torch.tensor = tensor_compat
    if not getattr(torch.utils.data.RandomSampler.__iter__,
                   "_parity_patched", False):
        # torch >= 1.9 RandomSampler draws a TRAILING randperm when its
        # iterator is exhausted (the `[:num_samples % n]` tail).  The
        # reference zips two same-seeded shuffled loaders
        # (`training_models_multimodal.py:168-173`) and zip() exhausts only
        # the FIRST loader's iterator — the second never receives its final
        # next() — so whenever len(dataset) % batch_size == 0 the two
        # generators desync after one epoch and the reference's own
        # target-equality assert fires at epoch 2.  The reference ran on an
        # older torch whose __iter__ was a single randperm with no tail
        # draw; restore that semantics so the published behavior is
        # reproducible on modern torch.
        def _single_randperm_iter(self):
            n = len(self.data_source)
            if self.generator is None:
                seed = int(torch.empty((), dtype=torch.int64).random_().item())
                generator = torch.Generator()
                generator.manual_seed(seed)
            else:
                generator = self.generator
            if self.replacement:  # not used by the reference
                yield from torch.randint(
                    high=n, size=(self.num_samples,),
                    generator=generator).tolist()
            else:
                yield from torch.randperm(n, generator=generator).tolist()

        _single_randperm_iter._parity_patched = True
        torch.utils.data.RandomSampler.__iter__ = _single_randperm_iter

    if not hasattr(pd.Series, "ravel"):
        # pandas >= 2 removed Series.ravel; the reference targets old
        # pandas (`data_pipe/utils.py:575` calls y.ravel() before SMOTE
        # in data_rebalancing — the first rebalancing combo, prevalence
        # < 0.1, crashed the r3 suite here)
        pd.Series.ravel = lambda self: np.asarray(self).ravel()
    if not hasattr(pd.DataFrame, "append"):
        # pandas >= 2 also removed DataFrame/Series.append, which the
        # reference's rebalance/augment paths lean on (`data_pipe/
        # utils.py:375-376,419-420,489-520`); restore the old semantics
        def _append_compat(self, other, ignore_index=False, **k):
            return pd.concat([self, other], ignore_index=ignore_index)

        pd.DataFrame.append = _append_compat
        pd.Series.append = _append_compat

    import optuna  # the shim
    import BIOINF_tesi.data_pipe.dataprepare as ref_dp
    import BIOINF_tesi.data_pipe.utils as ref_dputils
    import BIOINF_tesi.models as ref_models
    import BIOINF_tesi.models.utils.training_models as tm
    import BIOINF_tesi.models.utils.training_models_multimodal as tmm

    # sklearn >= 1.4 renamed OneHotEncoder(sparse=) to sparse_output=; the
    # reference targets the old API (`dataprepare.py:390`, `utils.py:270`).
    if not getattr(ref_dp.OneHotEncoder, "_parity_patched", False):
        from sklearn.preprocessing import OneHotEncoder as _OHE

        def _compat_ohe(*a, sparse=None, **k):  # factory, not an estimator
            if sparse is not None:
                k["sparse_output"] = sparse
            return _OHE(*a, **k)

        _compat_ohe._parity_patched = True
        ref_dp.OneHotEncoder = _compat_ohe
        ref_dputils.OneHotEncoder = _compat_ohe

    # The realized code passes checkpoint_path='' so every unimodal fold
    # saves/loads the SAME file '.pt' (`training_models.py:524,71-76`) —
    # folds 2-3 would silently reload fold 1 (and published fold scores
    # clearly differ, so the published runs did not hit this).  Clear it
    # between fits so each fold trains fresh.
    if not getattr(tm.fit, "_parity_patched", False):
        orig_fit = tm.fit
        counter = [0]

        def fit_fresh(*a, **k):
            # modern torch.save also refuses the literal filename '.pt';
            # substitute a unique fresh name (never pre-existing, so no
            # short-circuit; still saved, as the original intended)
            if k.get("checkpoint_path") == ".pt":
                counter[0] += 1
                k["checkpoint_path"] = f"_retrain_ck_{counter[0]}.pt"
            if os.path.exists(k.get("checkpoint_path", "")):
                os.remove(k["checkpoint_path"])
            return orig_fit(*a, **k)

        fit_fresh._parity_patched = True
        tm.fit = fit_fresh

    optuna.reset_studies()
    optuna.seed(seed)
    np.random.seed(seed)
    random.seed(seed)
    torch.manual_seed(seed if torch_seed is None else torch_seed)

    stub = _StubPipeline(_StubDataClass(X_tab, fa, y))
    cwd = os.getcwd()
    os.makedirs(os.path.join(scratch, "models"), exist_ok=True)
    # the multimodal fold-best save goes to 'models_/' (sic):
    # `training_models_multimodal.py:642` f'models_/{test_model_path}.pt'
    os.makedirs(os.path.join(scratch, "models_"), exist_ok=True)
    os.chdir(scratch)
    t0 = time.time()
    try:
        with contextlib.redirect_stdout(log_fh), \
                contextlib.redirect_stderr(log_fh):
            if model_name in ("FFNN", "CNN"):
                cv = tm.Kfold_CV()
                cv(stub, cell, "cpu", task=task,
                   sequence=(model_name == "CNN"),
                   model=getattr(ref_models, model_name),
                   type_augm_genfeatures=type_augm,
                   n_folds=3, num_epochs=num_epochs, batch_size=100,
                   study_name=f"{cell}_{task}_{model_name}", sampler="TPE",
                   test_model_path="best")
            else:
                cv = tmm.Kfold_CV_Multimodal()
                cv(stub, cell_line=cell, device="cpu", task=task,
                   model=getattr(ref_models, model_name),
                   augmentation=augmentation,
                   n_folds=3, num_epochs=num_epochs, batch_size=100,
                   study_name=f"{cell}_{task}_{model_name}", sampler="TPE",
                   test_model_path="best")
    finally:
        os.chdir(cwd)
    wall = time.time() - t0
    scores = {
        "average_CV_AUPRC": float(cv.scores_dict["average_CV_AUPRC"]),
        "final_test_AUPRC_scores":
            [float(v) for v in cv.scores_dict["final_test_AUPRC_scores"]],
        "curves": _epoch_curves(cv.scores_dict),
    }
    return scores, optuna.all_trials_in_order(), wall


def _epoch_curves(scores_dict):
    """Per-fold per-epoch retrain AUPRC curves (both sides record
    `iteration_n_{fold}` with `AUPRC_train`/`AUPRC_test` lists — reference
    `training_models.py:660-687`, ours `training/cv.py:272-276`).  These are
    the diagnostic payload for out-of-band combos: they show whether a
    divergence is a failure-to-learn (flat test curve) or trial-selection
    noise."""
    out = {}
    for k, v in scores_dict.items():
        if k.startswith("iteration_n") and isinstance(v, dict):
            out[k] = {m: [round(float(x), 4) for x in v[m]]
                      for m in ("AUPRC_train", "AUPRC_test") if m in v}
    return out


# ---------------------------------------------------------------------------
# jax side
# ---------------------------------------------------------------------------

def run_jax(cell, task, model_name, x_tab, codes, y, num_epochs,
            trial_params, scratch, augmentation=False, type_augm="smote"):
    from embracenet_tpu.config import CVConfig, TrainConfig
    from embracenet_tpu.hpo.samplers import ReplaySampler
    from embracenet_tpu.training.cv import KfoldCV

    data = {"y": np.asarray(y, np.int64)}
    if model_name != "CNN":
        data["ffnn"] = np.asarray(x_tab, np.float32)
    if model_name != "FFNN":
        data["cnn"] = np.asarray(codes, np.uint8)

    t0 = time.time()
    cv = KfoldCV()
    scores = cv(
        data, model_name, task=task, cell_line=cell,
        cv_cfg=CVConfig(n_folds=3, n_trials=3, augmentation=augmentation,
                        type_augm_genfeatures=type_augm,
                        sampler=ReplaySampler(trial_params)),
        train_cfg=TrainConfig(num_epochs=num_epochs, batch_size=100,
                              eval_reshuffle=True),
        storage=os.path.join(scratch, "jax.db"),
        checkpoint_dir=os.path.join(scratch, "jax_models"),
        random_state=789, resume=False, verbose=False)
    wall = time.time() - t0
    return {
        "average_CV_AUPRC": float(scores["average_CV_AUPRC"]),
        "final_test_AUPRC_scores":
            [float(v) for v in scores["final_test_AUPRC_scores"]],
        "curves": _epoch_curves(scores),
    }, wall


def run_select_check(res, num_epochs=12, cell="MCF7", tcode="T5"):
    """End-to-end ``select_augmented_models`` parity (VERDICT r2 #4).

    Trains the reference's FFNN twice on an imbalanced profile (prevalence
    0.06 < rebalance threshold 0.1) — once per rebalancer (smote / double,
    `training_models.py:427-441`) — and ours on the same paired trials;
    then runs each side's OWN ``select_augmented_models`` (reference: the
    realized second definition, `models/utils/utils.py:302-353`; ours:
    `visual/report.py`) on its own CV outputs and compares the DECISION:
    rank-sum p-value regime, winner, and the recorded (bug-compat 'double')
    ``best_augmentation`` label.  The reference's checkpoint-copy loop gets
    placeholder 1-based fold files (its own unimodal ``Kfold_CV`` writes a
    different protocol — documented divergence, COMPONENT_MAP.md)."""
    key = f"{cell}/{tcode}/FFNN+select"
    if key in res["combos"] and "agree" in res["combos"][key]:
        print(f"skip {key} (done)")
        return
    import zlib

    task = TASK_CODES[tcode]
    n = ROWS_TAB[tcode]
    seed = zlib.crc32(key.encode()) % (2 ** 31)
    X_tab, fa, codes, y = make_dataset(cell, tcode, n, seed)
    scratch = os.path.join(SCRATCH, key.replace("/", "_"))
    shutil.rmtree(scratch, ignore_errors=True)
    print(f"=== {key}: n={n}, d={X_tab.shape[1]}, "
          f"prev={float((y == 1).mean()):.3f}, epochs={num_epochs}")

    import embracenet_tpu.api as et_api
    from embracenet_tpu.config import CVConfig, TrainConfig
    from embracenet_tpu.hpo.samplers import ReplaySampler

    ref_rd = {cell: {task: {}}}
    jax_rd = {cell: {task: {}}}
    jax_ckdir = os.path.join(scratch, "jax_models")
    entry = {"cell": cell, "task": task, "model": "FFNN+select"}
    for augm in ("smote", "double"):
        sc = os.path.join(scratch, augm)
        os.makedirs(sc, exist_ok=True)
        with open(os.path.join(sc, "ref.log"), "w") as fh:
            ref_scores, trial_params, ref_wall = run_reference(
                cell, task, "FFNN", X_tab, fa, y, num_epochs, seed,
                sc, fh, type_augm=augm)
        print(f"  torch[{augm}]: avg={ref_scores['average_CV_AUPRC']:.4f} "
              f"({ref_wall:.0f}s)")
        t0 = time.time()
        jax_scores = et_api.train(
            "FFNN", cell, task,
            data={"ffnn": np.asarray(X_tab, np.float32),
                  "y": np.asarray(y, np.int64)},
            cv_cfg=CVConfig(n_folds=3, n_trials=3,
                            type_augm_genfeatures=augm,
                            sampler=ReplaySampler(trial_params)),
            train_cfg=TrainConfig(num_epochs=num_epochs, batch_size=100,
                                  eval_reshuffle=True),
            storage=os.path.join(sc, "jax.db"),
            checkpoint_dir=jax_ckdir, verbose=False,
            model_label=f"FFNN_{augm}")
        print(f"  jax[{augm}]:   avg={jax_scores['average_CV_AUPRC']:.4f} "
              f"({time.time() - t0:.0f}s)")
        strip = lambda s: {k: v for k, v in s.items() if k != "curves"}  # noqa: E731
        ref_rd[cell][task][f"FFNN_{augm}"] = strip(ref_scores)
        jax_rd[cell][task][f"FFNN_{augm}"] = {
            "average_CV_AUPRC": float(jax_scores["average_CV_AUPRC"]),
            "final_test_AUPRC_scores":
                [float(v) for v in jax_scores["final_test_AUPRC_scores"]]}
        entry[f"delta_{augm}"] = round(
            float(jax_scores["average_CV_AUPRC"])
            - float(ref_scores["average_CV_AUPRC"]), 5)

    # reference's own selection, in a cwd holding its expected fold files
    from BIOINF_tesi.models.utils import (
        select_augmented_models as ref_select)

    sel_cwd = os.path.join(scratch, "ref_select")
    os.makedirs(sel_cwd, exist_ok=True)
    for augm in ("smote", "double"):
        for i in range(1, 4):
            with open(os.path.join(
                    sel_cwd, f"{cell}_FFNN_{task}_{i}_test_{augm}.pt"),
                    "wb") as fh:
                fh.write(b"placeholder")
    cwd = os.getcwd()
    os.chdir(sel_cwd)
    try:
        ref_select(ref_rd, verbose=False)
    finally:
        os.chdir(cwd)
    ref_node = ref_rd[cell][task]
    ref_winner = ("double" if ref_node["FFNN"]["final_test_AUPRC_scores"]
                  == ref_node["FFNN_double"]["final_test_AUPRC_scores"]
                  else "smote")

    from embracenet_tpu.visual.report import (
        select_augmented_models as jax_select)

    jax_winner = jax_select(jax_rd, cell, task, checkpoint_dir=jax_ckdir)
    jax_node = jax_rd[cell][task]

    from scipy.stats import ranksums

    entry.update({
        "ref_pval": round(float(ranksums(
            ref_node["FFNN_smote"]["final_test_AUPRC_scores"],
            ref_node["FFNN_double"]["final_test_AUPRC_scores"])[1]), 4),
        "jax_pval": round(float(ranksums(
            jax_node["FFNN_smote"]["final_test_AUPRC_scores"],
            jax_node["FFNN_double"]["final_test_AUPRC_scores"])[1]), 4),
        "ref_winner": ref_winner, "jax_winner": jax_winner,
        "ref_label": ref_node["best_augmentation"],
        "jax_label": jax_node["best_augmentation"],
        "ref": {a: ref_node[f"FFNN_{a}"] for a in ("smote", "double")},
        "jax": {a: jax_node[f"FFNN_{a}"] for a in ("smote", "double")},
        "agree": bool(ref_winner == jax_winner
                      and ref_node["best_augmentation"]
                      == jax_node["best_augmentation"]),
        "canonical_folds_copied": all(
            os.path.exists(os.path.join(
                jax_ckdir, f"{cell}_{task}_FFNN_fold{i}_result.npz"))
            for i in range(1, 4)),
    })
    res["combos"][key] = entry
    save_results(res)
    print(f"  select: ref winner={ref_winner} (p={entry['ref_pval']}), "
          f"jax winner={jax_winner} (p={entry['jax_pval']}), "
          f"agree={entry['agree']}")
    shutil.rmtree(scratch, ignore_errors=True)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

SUITES = {
    # FFNN is cheap on torch-CPU: cover every cell on two task profiles,
    # plus >= 2 combos for each remaining task (VERDICT r2 #4)
    "ffnn": [("FFNN", cell, t) for cell in FEATURES for t in ("T2", "T3")]
            + [("FFNN", "K562", "T1"), ("FFNN", "GM12878", "T1"),
               ("FFNN", "K562", "T4"), ("FFNN", "H1", "T4"),
               ("FFNN", "A549", "T5"), ("FFNN", "MCF7", "T5")],
    # conv stacks in f64 on one core are ~30x dearer: representative subset
    "cnn": [("CNN", cell, "T3") for cell in ("K562", "H1", "A549")]
           + [("CNN", "GM12878", "T1"), ("CNN", "HEPG2", "T5")],
    "embracenet": [("EmbraceNetMultimodal", cell, "T2")
                   for cell in ("K562", "GM12878", "MCF7", "H1", "A549")]
                  + [("EmbraceNetMultimodal", "K562", "T4"),
                     ("EmbraceNetMultimodal", "GM12878", "T5"),
                     ("EmbraceNetMultimodal", "H1", "T1")],
    "concat": [("ConcatNetMultimodal", cell, "T2")
               for cell in ("K562", "HEPG2")]
              + [("ConcatNetMultimodal", "A549", "T4"),
                 ("ConcatNetMultimodal", "MCF7", "T3")],
    # the reference's multimodal augmentation path
    # (training_models_multimodal.py:528-534): T1/T5-profile prevalence 0.06
    # exercises SMOTE-augment + reverse_strand_augment rebalancing
    "augm": [("EmbraceNetMultimodal+augm", "K562", "T2"),
             ("EmbraceNetMultimodal+augm", "MCF7", "T5"),
             ("EmbraceNetMultimodal+augm", "GM12878", "T1"),
             # sentinel: end-to-end select_augmented_models decision parity
             ("SELECT", "MCF7", "T5")],
}
# Round-5 broadening (VERDICT r4 #4): CNN to >= 10 rows over all 5 tasks /
# >= 5 cells, EmbraceNet+augm to >= 9 rows, plus extra EmbraceNet/FFNN rows
# so the cumulative matrix passes 60 combos.  augm first (dearest evidence).
SUITES["r5"] = [
    ("EmbraceNetMultimodal+augm", "H1", "T3"),
    ("EmbraceNetMultimodal+augm", "A549", "T2"),
    ("EmbraceNetMultimodal+augm", "HEPG2", "T4"),
    ("EmbraceNetMultimodal+augm", "K562", "T5"),
    ("EmbraceNetMultimodal+augm", "GM12878", "T2"),
    ("CNN", "K562", "T2"), ("CNN", "MCF7", "T2"),
    ("CNN", "H1", "T4"), ("CNN", "HEPG2", "T4"),
    ("CNN", "K562", "T1"),
    ("EmbraceNetMultimodal", "HEPG2", "T3"),
    ("EmbraceNetMultimodal", "A549", "T5"),
    ("FFNN", "HEPG2", "T1"), ("FFNN", "HEK293", "T4"),
    # top-up past 60 cumulative delta rows (VERDICT r4 #4): cheap FFNN
    # profiles + a 5th-task ConcatNet row
    ("FFNN", "A549", "T1"), ("FFNN", "MCF7", "T4"),
    ("ConcatNetMultimodal", "GM12878", "T5"),
]
# multimodal first: the round's critical evidence lands even if the suite
# is cut short by the round boundary
SUITES["all"] = SUITES["embracenet"] + SUITES["concat"] + SUITES["augm"] \
    + SUITES["ffnn"] + SUITES["cnn"] + SUITES["r5"]


def load_results():
    if os.path.exists(RESULT_PATH):
        with open(RESULT_PATH) as fh:
            return json.load(fh)
    return {"meta": {"band": 0.05, "paired_trials": True,
                     "torch": "reference code from /root/reference "
                              "(deps shimmed, see tools/ref_shims)"},
            "combos": {}}


def save_results(res):
    done = [c for c in res["combos"].values() if "delta" in c]
    if done:
        from scipy.stats import wilcoxon

        deltas = [c["delta"] for c in done]
        within = sum(1 for c in done if abs(c["delta"]) <= 0.05)
        res["meta"]["n_done"] = len(done)
        res["meta"]["n_within_band"] = within
        res["meta"]["frac_within_band"] = round(within / len(done), 4)
        res["meta"]["mean_abs_delta"] = round(float(np.mean(
            [abs(d) for d in deltas])), 4)
        # systematic-bias check: signed mean + Wilcoxon signed-rank of the
        # per-combo deltas against 0 (p > 0.05 = no detectable bias)
        res["meta"]["mean_delta"] = round(float(np.mean(deltas)), 4)
        if len(deltas) >= 6 and any(deltas):
            res["meta"]["bias_wilcoxon_p"] = round(
                float(wilcoxon(deltas)[1]), 4)
        by_model = {}
        for c in done:
            m = c["model"] + ("+augm" if c.get("augmentation") else "")
            by_model.setdefault(m, []).append(c["delta"])
        res["meta"]["by_model"] = {
            m: {"n": len(ds),
                "n_within_band": sum(1 for d in ds if abs(d) <= 0.05),
                "mean_abs_delta": round(float(np.mean(
                    [abs(d) for d in ds])), 4)}
            for m, ds in sorted(by_model.items())}
        by_task = {}
        for c in done:
            tcode = {v: k for k, v in TASK_CODES.items()}[c["task"]]
            by_task.setdefault(tcode, []).append(c["delta"])
        res["meta"]["by_task"] = {
            t: {"n": len(ds),
                "n_within_band": sum(1 for d in ds if abs(d) <= 0.05)}
            for t, ds in sorted(by_task.items())}

        # ---- HEADLINE criterion (VERDICT r4 weak #5): per-family
        # distribution-level verdicts with yardstick-calibrated bands.
        # The raw per-combo +-0.05 band is uninformative for high-variance
        # families: the REFERENCE AGAINST ITSELF (same data/splits/archs,
        # only torch.manual_seed varied) spans |delta| up to 0.068 on FFNN
        # profiles (NOISE_YARDSTICK_r4/r5.json).  A family PASSES when
        # (a) the signed deltas show no systematic bias (Wilcoxon
        # signed-rank p >= 0.05, i.e. the jax engine is not consistently
        # above or below the reference) and (b) every |delta| lies within
        # the family's reference-self-noise band.
        yard_max = _yardstick_band_by_family()
        verdicts = {}
        for fam, ds in sorted(by_model.items()):
            band = yard_max.get(fam, (0.05, "default +-0.05"))
            bval, bsrc = band
            if len(ds) >= 5 and any(ds):
                p = float(wilcoxon(ds)[1])
            else:
                p = None
            n_in = sum(1 for d in ds if abs(d) <= bval)
            bias_ok = (p is None) or p >= 0.05
            verdicts[fam] = {
                "n": len(ds),
                "mean_delta": round(float(np.mean(ds)), 4),
                "max_abs_delta": round(float(np.max(np.abs(ds))), 4),
                "signed_wilcoxon_p": None if p is None else round(p, 4),
                "band": bval, "band_source": bsrc,
                "n_within_band": n_in,
                # tail cap 0.09 ~ mean+3sigma of the measured FFNN
                # reference-self-noise |deltas| (0.034 + 3*0.021): the
                # 6-pair yardstick max understates the tail, so a bias-free
                # family with isolated rows inside ~3 sigma of the
                # reference's own noise is still a pass, explicitly labeled
                "verdict": "PASS" if bias_ok and n_in == len(ds) else
                           ("PASS(bias-ok, tail rows within reference "
                            "self-noise span)" if bias_ok and
                            max(abs(d) for d in ds) <= 0.09 else "FAIL"),
            }
        res["meta"]["family_verdicts"] = verdicts
    with open(RESULT_PATH, "w") as fh:
        json.dump(res, fh, indent=1)


def _yardstick_band_by_family():
    """Per-family parity band = the reference's own seed-to-seed
    average_CV_AUPRC span, measured by tools/noise_yardstick.py (reference
    vs reference, only torch.manual_seed varied).  Families without enough
    yardstick rows keep the conservative default 0.05."""
    bands = {}
    for path in ("NOISE_YARDSTICK_r5.json", "NOISE_YARDSTICK_r4.json"):
        full = os.path.join(REPO, path)
        if not os.path.exists(full):
            continue
        try:
            with open(full) as fh:
                rows = json.load(fh)["rows"]
        except Exception:
            continue
        per_fam = {}
        for r in rows:
            fam = r["combo"].split("/")[-1]
            per_fam.setdefault(fam, []).append(abs(r["ref_vs_ref_delta"]))
        for fam, vals in per_fam.items():
            if fam in bands or len(vals) < 3:
                continue  # >= 3 measured pairs before trusting a band
            bands[fam] = (round(max(max(vals), 0.05), 4),
                          f"reference-vs-itself max |delta| over "
                          f"{len(vals)} pairs ({path})")
    return bands


def run_combo(model_name, cell, tcode, num_epochs, res, n_override=None):
    augmentation = model_name.endswith("+augm")
    model_name = model_name.removesuffix("+augm")
    key = f"{cell}/{tcode}/{model_name}" + ("+augm" if augmentation else "")
    if key in res["combos"] and "delta" in res["combos"][key]:
        print(f"skip {key} (done)")
        return
    task = TASK_CODES[tcode]
    n = n_override or (ROWS_TAB[tcode] if model_name == "FFNN" else ROWS_SEQ)
    # deterministic across processes (hash() is salted per interpreter)
    import zlib

    seed = zlib.crc32(key.encode()) % (2 ** 31)
    X_tab, fa, codes, y = make_dataset(cell, tcode, n, seed)

    scratch = os.path.join(SCRATCH, key.replace("/", "_"))
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    print(f"=== {key}: n={n}, d={X_tab.shape[1]}, "
          f"prev={float((y == 1).mean()):.3f}, epochs={num_epochs}")

    try:
        with open(os.path.join(scratch, "ref.log"), "w") as log_fh:
            ref_scores, trial_params, ref_wall = run_reference(
                cell, task, model_name, X_tab, fa, y, num_epochs, seed,
                scratch, log_fh, augmentation=augmentation)
    except AssertionError as e:
        # the reference's own runtime asserts (e.g. the multimodal
        # loader-alignment check, training_models_multimodal.py:173) can
        # fire; record the failure and keep the suite going
        import traceback

        res["combos"][key] = {"model": model_name, "cell": cell,
                              "task": task, "n_rows": n,
                              "ref_error": traceback.format_exc()[-1500:]}
        save_results(res)
        print(f"  torch: reference assert failed ({e!r}); recorded, skipping")
        return
    print(f"  torch: avg={ref_scores['average_CV_AUPRC']:.4f} "
          f"folds={np.round(ref_scores['final_test_AUPRC_scores'], 3)} "
          f"({ref_wall:.0f}s, {len(trial_params)} trials drawn)")

    jax_scores, jax_wall = run_jax(cell, task, model_name, X_tab, codes, y,
                                   num_epochs, trial_params, scratch,
                                   augmentation=augmentation)
    delta = jax_scores["average_CV_AUPRC"] - ref_scores["average_CV_AUPRC"]
    print(f"  jax:   avg={jax_scores['average_CV_AUPRC']:.4f} "
          f"folds={np.round(jax_scores['final_test_AUPRC_scores'], 3)} "
          f"({jax_wall:.0f}s)  delta={delta:+.4f}")

    res["combos"][key] = {
        "model": model_name, "cell": cell, "task": task, "n_rows": n,
        "augmentation": augmentation,
        "n_features": int(X_tab.shape[1]),
        "prevalence": float((np.asarray(y) == 1).mean()),
        "num_epochs": num_epochs,
        "ref": ref_scores, "jax": jax_scores,
        "delta": round(delta, 5),
        "within_band": bool(abs(delta) <= 0.05),
        "ref_wall_s": round(ref_wall, 1), "jax_wall_s": round(jax_wall, 1),
    }
    save_results(res)
    shutil.rmtree(scratch, ignore_errors=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="ffnn", choices=list(SUITES))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--jax-platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--budget", type=float, default=0.0,
                    help="wall-clock budget in seconds; the suite stops "
                         "cleanly after the current combo once exceeded "
                         "(results are incremental, so nothing is lost)")
    ap.add_argument("--combo", default=None, metavar="MODEL:CELL:Tn",
                    help="re-run ONE combo (force, even if already done), "
                         "e.g. FFNN:MCF7:T2 — the diagnostic path for "
                         "out-of-band results; records per-epoch curves")
    args = ap.parse_args()

    # Serialize suites: one parity process at a time (chained/queued runs
    # share one host core, one chip, and one incrementally-rewritten JSON —
    # concurrent writers could drop each other's combos).  O_EXCL lockfile;
    # a dead holder's lock is reclaimed.  Also blocks while a pre-lock-era
    # instance is registered in /tmp/parity.pid.
    import atexit

    _HOLDER_MARKERS = (b"bench", b"parity", b"sweep", b"discrim", b"realism")

    def _holder(path):
        """(pid, live) of the lock/pidfile holder.  Liveness requires the
        pid's cmdline to still name one of this repo's chip tools —
        guarding against pid recycling, same as bench.py's
        _is_registered_tool (a recycled pid would otherwise hold a stale
        lock alive forever)."""
        try:
            with open(path) as fh:
                pid = int(fh.read().strip())
        except (OSError, ValueError):
            return None, False
        if pid == os.getpid() or not os.path.exists(f"/proc/{pid}"):
            return pid, False
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as fh:
                cmd = fh.read()
        except OSError:
            return pid, False
        return pid, any(m in cmd for m in _HOLDER_MARKERS)

    def _live(path):
        return _holder(path)[1]

    def _unlink_if_holds(path, pid):
        """TOCTOU-safe stale-lock reclaim: only unlink while the lock still
        names the pid just judged dead, so two waiters can never both
        reclaim (the second re-read sees the winner's fresh pid)."""
        try:
            with open(path) as fh:
                if int(fh.read().strip()) == pid:
                    os.unlink(path)
        except (OSError, ValueError):
            pass

    def _release():
        _unlink_if_holds("/tmp/parity.lock", os.getpid())

    while True:
        # Yield to a live scoreboard bench (bench.py holds /tmp/bench.lock
        # while measuring — starting a suite under it corrupts the driver's
        # number) and to any already-running suite, incl. pre-lock-era
        # instances that only register /tmp/parity.pid.
        if _live("/tmp/bench.lock") or _live("/tmp/parity.pid"):
            time.sleep(20)
            continue
        try:
            fd = os.open("/tmp/parity.lock",
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, str(os.getpid()).encode())
            os.close(fd)
        except FileExistsError:
            pid, live = _holder("/tmp/parity.lock")
            if not live and pid is not None:
                _unlink_if_holds("/tmp/parity.lock", pid)  # stale holder
                continue
            time.sleep(20)
            continue
        if _live("/tmp/bench.lock"):        # bench raced in: back off
            _release()
            time.sleep(20)
            continue
        atexit.register(_release)
        break

    # Register for eviction: bench.py owns the machine when the driver runs
    # it and SIGTERMs any pid found here (one host core + one chip — a
    # concurrent suite starves the scoreboard bench into garbage).  The
    # registration is removed on clean exit so a recycled pid can never be
    # targeted (bench.py additionally confirms identity via cmdline).
    with open("/tmp/parity.pid", "w") as fh:
        fh.write(str(os.getpid()))
    atexit.register(lambda: _unlink_if_holds("/tmp/parity.pid", os.getpid()))
    t_start = time.time()

    if args.jax_platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    # amortize remote TPU compiles across combos
    try:
        import jax

        from embracenet_tpu.utils import jaxcache

        jaxcache.enable(os.path.join(REPO, ".jax_cache"))
    except Exception:
        pass

    res = load_results()
    if args.smoke:
        run_combo("FFNN", "H1", "T3", 4, res, n_override=400)
        return
    if args.combo:
        model_name, cell, tcode = args.combo.split(":")
        if model_name == "SELECT":
            key = f"{cell}/{tcode}/FFNN+select"
            res["combos"].pop(key, None)
            run_select_check(res, args.epochs, cell, tcode)
        else:
            key = f"{cell}/{tcode}/{model_name}"
            res["combos"].pop(key, None)  # force a fresh paired run
            run_combo(model_name, cell, tcode, args.epochs, res)
        save_results(res)
        print(json.dumps(res["combos"].get(key, {}), indent=1))
        return
    for model_name, cell, tcode in SUITES[args.suite]:
        if args.budget and time.time() - t_start > args.budget:
            print(f"[budget] {args.budget:.0f}s exceeded; stopping cleanly "
                  f"(incremental results kept)")
            break
        if model_name == "SELECT":
            run_select_check(res, args.epochs, cell, tcode)
            continue
        run_combo(model_name, cell, tcode, args.epochs, res)
    save_results(res)
    print(json.dumps(res["meta"], indent=1))


if __name__ == "__main__":
    main()
