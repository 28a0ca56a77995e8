import numpy as np
import pandas as pd
import pytest

from embracenet_tpu.visual import report


@pytest.fixture
def results():
    def entry(avg, scores):
        return {
            "average_CV_AUPRC": avg,
            "final_test_AUPRC_scores": scores,
            "iteration_n_1": {"AUPRC_train": [0.2, 0.3],
                              "AUPRC_test": [0.25, 0.31],
                              "F1_precision_recall": [[0.5, 0.5, 0.5]] * 2},
        }

    return {
        "K562": {
            "active_P_vs_inactive_P": {
                "FFNN": entry(0.34, [0.3, 0.35, 0.37]),
                "CNN": entry(0.24, [0.2, 0.25, 0.27]),
                "EmbraceNetMultimodal": entry(0.27, [0.25, 0.27, 0.29]),
                "ConcatNetMultimodal": entry(0.33, [0.3, 0.33, 0.36]),
                "baseline_AUPRC": 0.125,
            },
        },
    }


def test_imbalance_and_baseline_tables(rng):
    labels = {"t1": {"K562": np.array([1] * 10 + [0] * 90),
                     "H1": np.array([1] * 30 + [0] * 70)}}
    imb = report.get_imbalance_ratio_df(labels)
    assert imb.loc["K562", "t1"] == 9.0
    base = report.get_baseline_df(labels)
    assert base.loc["K562", "t1"] == 0.1   # floored
    assert base.loc["H1", "t1"] == 0.3


def test_average_and_std_tables(results):
    avg = report.get_average_auprc_df(results, "K562",
                                      tasks=["active_P_vs_inactive_P"])
    assert avg.loc["FFNN", "active_P_vs_inactive_P"] == 0.34
    assert np.isnan(avg.loc["EmbraceNetMultimodal_augmentation",
                            "active_P_vs_inactive_P"])
    std = report.get_standard_dev_df(results, "K562",
                                     tasks=["active_P_vs_inactive_P"])
    assert std.loc["CNN", "active_P_vs_inactive_P"] == pytest.approx(
        np.std([0.2, 0.25, 0.27]))


def test_overall_performance(results):
    df = report.compare_model_overall_performance(
        results, tasks=["active_P_vs_inactive_P"], cells=["K562"])
    assert set(df.index) == {"FFNN", "CNN", "ConcatNetMultimodal"}
    assert (df["two_sided_p"] <= 1).all()


def test_plots_render(results, tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    fig = report.plot_scores(results, "K562", "active_P_vs_inactive_P",
                             "FFNN", save_path=str(tmp_path / "s.png"))
    assert (tmp_path / "s.png").exists()
    labels = {"K562": np.array([1, 0, 0, 1]), "H1": np.array([0, 0, 1, 1])}
    report.plot_label_ratio(labels, "t", save_path=str(tmp_path / "p.png"))
    assert (tmp_path / "p.png").exists()
    # the reference's catplot-of-fold-scores form (visual.py:100-166):
    # task-row x cell-col facet grid of train/test bars + baseline vline
    fig = report.plot_fold_scores(results, "K562",
                                  models=("FFNN", "CNN"),
                                  save_path=str(tmp_path / "cat.png"))
    assert (tmp_path / "cat.png").exists()
    n_tasks = len(results["K562"])
    assert len(fig.axes) == n_tasks  # one facet per (task, cell)


def test_select_augmented_models(tmp_path, results):
    """Realized reference semantics (`models/utils/utils.py:302-353`, the
    operative second definition): double wins iff ranksums p < 0.3 AND
    average_CV_AUPRC[double] >= average_CV_AUPRC[smote]; else smote wins.
    best_augmentation is ALWAYS 'double' (the reference's else-branch bug,
    utils.py:342) unless fix_label_bug=True."""
    from scipy.stats import ranksums

    from embracenet_tpu.training.checkpoint import save_checkpoint
    from embracenet_tpu.training.cv import checkpoint_name

    def entry(scores):
        return {"final_test_AUPRC_scores": list(scores),
                "average_CV_AUPRC": float(np.mean(scores))}

    # Case 1: clearly separated folds -> p < 0.3 and double's mean higher.
    smote, double = [0.2, 0.22, 0.21], [0.4, 0.42, 0.41]
    assert ranksums(smote, double)[1] < 0.3  # hand-checked gate
    res = {"K562": {"t": {"FFNN_smote": entry(smote),
                          "FFNN_double": entry(double)}}}
    # folds are 1-based like the reference's copy loop (utils.py:344-353,
    # `i+=1`); both filename protocols are copied — checkpoint_name-style
    # and the `{study_name}_fold{k}_result` files our KfoldCV writes
    for fold in range(1, 4):
        save_checkpoint(
            str(tmp_path / checkpoint_name("K562", "FFNN_double", "t", fold)),
            {"params": {"w": np.zeros(2)}}, meta={"model": "FFNN"})
        save_checkpoint(
            str(tmp_path / f"K562_t_FFNN_double_fold{fold}_result"),
            {"params": {"w": np.zeros(2)}}, meta={"model": "FFNN"})
    # fold 0 = the winner variant's best TEST model written by
    # api.train(model_label=...) (api.py:106-107); select must promote it
    # to the canonical name that api.predict/CompareModelsResult read
    save_checkpoint(
        str(tmp_path / checkpoint_name("K562", "FFNN_double", "t", 0)),
        {"params": {"w": np.zeros(2)}}, meta={"model": "FFNN"})
    winner = report.select_augmented_models(res, "K562", "t",
                                            checkpoint_dir=str(tmp_path))
    assert winner == "double"
    assert res["K562"]["t"]["best_augmentation"] == "double"
    assert res["K562"]["t"]["FFNN"] == res["K562"]["t"]["FFNN_double"]
    for fold in range(1, 4):
        assert (tmp_path / (checkpoint_name("K562", "FFNN", "t", fold)
                            + ".npz")).exists()
        assert (tmp_path / f"K562_t_FFNN_fold{fold}_result.npz").exists()
    assert (tmp_path / (checkpoint_name("K562", "FFNN", "t", 0)
                        + ".npz")).exists()

    # Case 2: interleaved folds -> ranksums p >= 0.3, so smote wins even
    # though double's average_CV_AUPRC is (slightly) higher.
    smote, double = [0.30, 0.34, 0.32], [0.31, 0.33, 0.35]
    assert ranksums(smote, double)[1] >= 0.3
    assert np.mean(double) > np.mean(smote)
    res = {"K562": {"t": {"FFNN_smote": entry(smote),
                          "FFNN_double": entry(double)}}}
    winner = report.select_augmented_models(res, "K562", "t",
                                            checkpoint_dir=str(tmp_path))
    assert winner == "smote"
    # Bug-compat: label says 'double' even though smote's entry was kept.
    assert res["K562"]["t"]["best_augmentation"] == "double"
    assert res["K562"]["t"]["FFNN"] == res["K562"]["t"]["FFNN_smote"]

    # Case 3: p < 0.3 but double's average_CV_AUPRC is LOWER -> smote wins
    # (the gate compares average_CV_AUPRC, not fold-score means).
    smote, double = [0.4, 0.42, 0.41], [0.2, 0.22, 0.21]
    assert ranksums(smote, double)[1] < 0.3
    res = {"K562": {"t": {"FFNN_smote": entry(smote),
                          "FFNN_double": entry(double)}}}
    winner = report.select_augmented_models(res, "K562", "t",
                                            checkpoint_dir=str(tmp_path),
                                            fix_label_bug=True)
    assert winner == "smote"
    assert res["K562"]["t"]["best_augmentation"] == "smote"  # fixed label


def test_compare_models_result(tmp_path, rng):
    """Pairwise Wilcoxon comparison over reloaded fold checkpoints."""
    import jax

    from embracenet_tpu.hpo import space as sp
    from embracenet_tpu.training.checkpoint import save_checkpoint
    from embracenet_tpu.training.cv import checkpoint_name
    from embracenet_tpu.training.modelspec import get_spec
    from embracenet_tpu.visual.report import CompareModelsResult

    d = 6
    data = {"ffnn": rng.normal(size=(40, d)).astype(np.float32),
            "y": (rng.random(40) < 0.4).astype(np.int64)}
    spec = get_spec("FFNN", in_features_ffnn=d)
    # two "models" (both FFNN family) saved under different model names
    for mname, seed in (("FFNN", 0), ("CNN", 99)):
        flat = sp.sample_params("FFNN", np.random.default_rng(seed))
        hp = sp.params_to_hp("FFNN", flat)
        params, bn = spec.init(jax.random.PRNGKey(seed), hp)
        for fold in range(2):
            save_checkpoint(
                str(tmp_path / checkpoint_name("K562", mname, "t", fold)),
                {"params": params},
                meta={"model": "FFNN", "model_params": flat})
    cmp = CompareModelsResult(checkpoint_dir=str(tmp_path), n_folds=2)
    res = cmp({"K562": data}, "t", models=("FFNN", "CNN"))
    pair = res["K562"][("FFNN", "CNN")]
    assert len(pair["pvalues"]) == 2
    assert isinstance(pair["different"], (bool, np.bool_))
    cmp.save(res, str(tmp_path / "pvals.pickle"))
    assert (tmp_path / "pvals.pickle").exists()

    # reference-named per-task artifact round-trip (visual.py:396-397):
    # pval_results_dict_{task}.pickle with the reference's nesting
    # {task: {cell: {str(fold_1based): {base: {comp: pval}}}}}
    import pickle

    path = cmp.save_pval_dict(res, "t", out_dir=str(tmp_path))
    assert path.endswith("pval_results_dict_t.pickle")
    with open(path, "rb") as fh:
        loaded = pickle.load(fh)
    assert set(loaded) == {"t"}
    assert set(loaded["t"]) == {"K562"}
    assert set(loaded["t"]["K562"]) == {"1", "2"}
    for f in ("1", "2"):
        fold = loaded["t"]["K562"][f]
        # both directions carry the same symmetric Wilcoxon p
        assert fold["FFNN"]["CNN"] == fold["CNN"]["FFNN"]
        assert fold["FFNN"]["CNN"] == pair["pvalues"][int(f) - 1]
