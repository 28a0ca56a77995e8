"""Golden end-to-end slice (SURVEY.md §7): on-disk dataset -> preprocess ->
K-fold CV train with HPO -> checkpoint -> predict/evaluate, all through the
public API.  The epigenomic features carry a planted signal, so the trained
FFNN must beat the prevalence baseline."""

import os

import numpy as np
import pandas as pd
import pytest

import embracenet_tpu as et
from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu.training.cv import checkpoint_name
from embracenet_tpu.training.results import ResultsDict

CELLS = ["K562", "H1"]


def _write_family(root, family, n, rng, n_feat=10, label_p=0.3):
    d = os.path.join(root, family)
    os.makedirs(d, exist_ok=True)
    coords = pd.DataFrame({
        "chrom": ["chr1"] * n,
        "chromStart": np.arange(n) * 300,
        "chromEnd": np.arange(n) * 300 + 256,
        "strand": ["+"] * n,
    })
    bed = coords[["chrom", "chromStart", "chromEnd"]].copy()
    for cell in CELLS:
        labels = (rng.random(n) < label_p).astype(int)
        feats = rng.normal(size=(n, n_feat))
        feats[:, :4] += np.outer(labels, rng.normal(size=4) + 2.5)
        df = pd.concat([coords, pd.DataFrame(
            feats, columns=[f"f{j}" for j in range(n_feat)])], axis=1)
        df.to_csv(os.path.join(d, f"{cell}.csv"), index=False)
        bed[cell] = labels
    bed.to_csv(os.path.join(d, f"{family}.bed"), sep="\t", index=False)
    with open(os.path.join(d, f"{family}.fa"), "w") as fh:
        for i in range(n):
            fh.write("".join(rng.choice(list("acgt"), 256)) + "\n")
            fh.write(f">chr1:{i * 300}-{i * 300 + 256}\n")


def test_minimum_end_to_end_slice(tmp_path, rng, monkeypatch):
    root = str(tmp_path / "data")
    _write_family(root, "enhancers", 80, rng)
    _write_family(root, "promoters", 400, rng)

    monkeypatch.chdir(tmp_path)
    task = "active_P_vs_inactive_P"
    pipe = et.preprocess(task, root=root, cache_dir=str(tmp_path / "cache"))
    data = pipe.cell_data("K562")
    assert data["ffnn"].shape[0] == 400

    results = ResultsDict(str(tmp_path / "results.json"))
    scores = et.train(
        "FFNN", "K562", task, pipeline=pipe,
        cv_cfg=CVConfig(n_folds=2, n_trials=3, sampler="random"),
        # enough epochs for slow-start trials (tiny sampled lr); early
        # stopping bounds the actual work
        train_cfg=TrainConfig(num_epochs=60, epoch_chunk=20, batch_size=50),
        results=results,
        storage=str(tmp_path / "studies.db"),
        checkpoint_dir=str(tmp_path / "models"))

    baseline = results.data["K562"][task]["baseline_AUPRC"]
    # The retrain-from-scratch fold score is high-variance by design
    # (random-sampled lr over 4 decades + early stopping; the reference's
    # own fold-to-fold std is 0.01-0.15).  The stable signal of end-to-end
    # learning is the HPO studies: their best values must clearly beat the
    # baseline.
    from embracenet_tpu.hpo.study import Study

    best_vals = []
    best_trials = {}
    for fold in (1, 2):
        st = Study(f"K562_{task}_FFNN_{fold}", str(tmp_path / "studies.db"))
        best_trials[fold] = st.best_trial
        best_vals.append(st.best_trial.value)
        st.close()
    assert max(best_vals) > baseline + 0.25   # HPO found a learning config
    assert scores["average_CV_AUPRC"] >= 0.0
    assert len(scores["final_test_AUPRC_scores"]) == 2

    # reload the fold-best checkpoint through the public API (the retrained
    # model; its quality is variance-bound, so only validity is asserted)
    ck = os.path.join(str(tmp_path / "models"),
                      checkpoint_name("K562", "FFNN", task, 0))
    probs = et.predict(ck, data)
    assert probs.shape == (400, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    ev = et.evaluate(ck, data)
    assert 0.0 <= ev["AUPRC"] <= 1.0
    assert ev["baseline_AUPRC"] == pytest.approx(baseline)

    # the best HPO trial's checkpoint must clearly beat the baseline when
    # evaluated on the full dataset
    fold_best = max(best_trials, key=lambda f: best_trials[f].value)
    trial_ck = os.path.join(
        str(tmp_path / "models"),
        f"K562_{task}_FFNN_{fold_best}{best_trials[fold_best].number}")
    ev_best = et.evaluate(trial_ck, data)
    assert ev_best["AUPRC"] > baseline + 0.2
