import numpy as np
import pytest

from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu import sweep


def test_load_baseline_md_parses_reference_table():
    ref = sweep.load_baseline_md("BASELINE.md")
    # anchors from SURVEY.md §6
    assert ref[("K562", "active_P_vs_inactive_P", "FFNN")] == 0.3419
    assert ref[("K562", "active_E_vs_active_P", "CNN")] == 0.6497
    assert ref[("K562", "active_E_vs_active_P", "EmbraceNet_augm")] == 0.7849
    assert ref[("HEPG2", "inactive_E_vs_inactive_P", "EmbraceNet")] == 0.5738
    # 35 rows x 6 columns
    assert len(ref) == 35 * 6




def _pandas_usable():
    import subprocess
    import sys

    return subprocess.run(
        [sys.executable, "-c", "import pandas; pandas.DataFrame({'a': [1]})"],
        capture_output=True, timeout=120).returncode == 0


requires_pandas = pytest.mark.skipif(not _pandas_usable(),
                                     reason="pandas unavailable")

@requires_pandas
def test_run_sweep_and_parity_report(tmp_path, rng):
    def data_fn(cell, task):
        n, d = 220, 8
        r = np.random.default_rng(hash((cell, task)) % 2**31)
        y = (r.random(n) < 0.3).astype(np.int64)
        w = r.normal(size=d)
        x = (r.normal(size=(n, d)) + np.outer(y * 2 - 1, w)).astype(np.float32)
        return {"ffnn": x, "y": y}

    results = sweep.run_sweep(
        data_fn=data_fn, cells=["K562"], tasks=["active_P_vs_inactive_P"],
        models=("FFNN",),
        cv_cfg=CVConfig(n_folds=2, n_trials=1, sampler="random"),
        train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=60),
        results_path=str(tmp_path / "res.json"),
        storage=str(tmp_path / "s.db"),
        checkpoint_dir=str(tmp_path), verbose=False)
    entry = results.get("K562", "active_P_vs_inactive_P", "FFNN")
    assert "average_CV_AUPRC" in entry
    report = sweep.parity_report(results, "BASELINE.md")
    row = report[(report.cell == "K562") &
                 (report.task == "active_P_vs_inactive_P") &
                 (report.model == "FFNN")].iloc[0]
    assert row["ours"] == entry["average_CV_AUPRC"]
    assert row["reference"] == 0.3419


def test_run_sweep_ffnn_rebalancer_variants(tmp_path):
    """Imbalanced cell -> the sweep trains FFNN twice (smote + double
    rebalancing, `training_models.py:427-441`) under DISTINCT study/
    checkpoint labels, then `select_augmented_models` records the winner.

    Regression (round 3): both variants used to run under the same
    study_name, so the second variant resumed the first's fold checkpoints
    and the smote-vs-double comparison was vacuous (identical fold lists);
    and the winner's fold checkpoints were never copied to canonical names
    (protocol mismatch with the reference's utils.py:344-353 copy loop)."""
    import os

    from embracenet_tpu.config import CVConfig, TrainConfig

    cell, task = "K562", "active_P_vs_inactive_P"

    def data_fn(c, t):
        n, d = 240, 8
        r = np.random.default_rng(7)
        y = np.zeros(n, np.int64)
        y[: n // 12] = 1                       # prevalence ~0.083 < 0.1
        w = r.normal(size=d)
        x = (r.normal(size=(n, d))
             + np.outer(y * 2 - 1, w)).astype(np.float32)
        return {"ffnn": x, "y": y}

    results = sweep.run_sweep(
        data_fn=data_fn, cells=[cell], tasks=[task], models=("FFNN",),
        cv_cfg=CVConfig(n_folds=2, n_trials=1, sampler="random"),
        train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=60),
        results_path=str(tmp_path / "res.json"),
        storage=str(tmp_path / "s.db"),
        checkpoint_dir=str(tmp_path), verbose=False)

    node = results.data[cell][task]
    assert {"FFNN_smote", "FFNN_double", "FFNN"} <= set(node)
    assert node["best_augmentation"] == "double"  # bug-compat label
    # distinct per-variant fold checkpoints (no resume collision) ...
    for variant in ("FFNN_smote", "FFNN_double"):
        for fold in (1, 2):
            assert os.path.exists(
                tmp_path / f"{cell}_{task}_{variant}_fold{fold}_result.npz")
    # ... training distinct rebalanced datasets, so the fold scores differ
    assert (node["FFNN_smote"]["final_test_AUPRC_scores"]
            != node["FFNN_double"]["final_test_AUPRC_scores"])
    # the winner's folds were copied to the canonical names
    for fold in (1, 2):
        assert os.path.exists(
            tmp_path / f"{cell}_{task}_FFNN_fold{fold}_result.npz")
    # and the recorded FFNN entry is the winner's entry
    winner = ("FFNN_double"
              if node["FFNN"] == node["FFNN_double"] else "FFNN_smote")
    assert node["FFNN"] == node[winner]
