import os

import numpy as np
import pytest

from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu.hpo import space
from embracenet_tpu.hpo.samplers import get_sampler, sample_n
from embracenet_tpu.hpo.search import run_search
from embracenet_tpu.hpo.study import COMPLETE, Study
from embracenet_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from embracenet_tpu.training.cv import KfoldCV, checkpoint_name
from embracenet_tpu.training.modelspec import get_spec


def _tabular(rng, n=240, d=10):
    y = (rng.random(n) < 0.3).astype(np.int64)
    w = rng.normal(size=d)
    x = (rng.normal(size=(n, d)) + np.outer(y * 2 - 1, w) * 0.9).astype(np.float32)
    return {"ffnn": x, "y": y}


def test_study_roundtrip_and_resume(tmp_path):
    db = str(tmp_path / "t.db")
    s = Study("demo", db)
    assert s.next_number() == 0
    s.tell(0, {"lr": 0.01}, 0.5, COMPLETE, {1: 0.3, 2: 0.5})
    s.tell(1, {"lr": 0.1}, 0.7, COMPLETE, {1: 0.6})
    s.close()
    s2 = Study("demo", db)
    assert len(s2.completed_trials()) == 2
    assert s2.best_trial.number == 1
    assert s2.best_trial.params == {"lr": 0.1}
    assert s2.trials[0].intermediate == {1: 0.3, 2: 0.5}
    assert s2.next_number() == 2
    s2.close()


@pytest.mark.parametrize("name", ["random", "TPE", "BO"])
def test_samplers_respect_menus(name):
    smp = get_sampler(name, seed=1)
    sp = space.model_space("FFNN")
    history = [(space.sample_params("FFNN", np.random.default_rng(i)),
                float(i) / 20) for i in range(15)]
    for params in sample_n(smp, "FFNN", 4, history):
        for pname, dist in sp.items():
            assert pname in params
            if hasattr(dist, "choices"):
                assert params[pname] in dist.choices
        assert 1e-5 <= params["lr"] <= 1e-1


def test_sampler_unknown_raises():
    with pytest.raises(ValueError):
        get_sampler("CMA")


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {"a": {"b": rng.normal(size=(3, 4)).astype(np.float32),
                  "c": np.int32(5)},
            "d": rng.normal(size=(2,))}
    path = str(tmp_path / "ck")
    save_checkpoint(path, {"params": tree}, meta={"model": "FFNN", "x": 1.5})
    trees, meta = load_checkpoint(path)
    assert meta == {"model": "FFNN", "x": 1.5}
    np.testing.assert_array_equal(trees["params"]["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(trees["params"]["d"], tree["d"])


def test_run_search_and_resume(tmp_path, rng):
    data = _tabular(rng)
    train = {k: v[:180] for k, v in data.items()}
    val = {k: v[180:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=10)
    db = str(tmp_path / "s.db")
    cfg = TrainConfig(num_epochs=3, batch_size=60)

    res = run_search(spec, "FFNN", train, val, "st_1", storage=db,
                     sampler="random", n_trials=2, train_cfg=cfg,
                     checkpoint_dir=str(tmp_path), seed=0)
    assert res.n_complete == 2
    assert np.isfinite(res.best_value)
    assert res.best_model is not None

    # resume: no new trials, same best
    res2 = run_search(spec, "FFNN", train, val, "st_1", storage=db,
                      sampler="random", n_trials=2, train_cfg=cfg,
                      checkpoint_dir=str(tmp_path), seed=99)
    assert res2.n_complete == 2
    assert res2.best_value == res.best_value
    assert res2.best_params == res.best_params


def test_kfold_cv_ffnn_end_to_end(tmp_path, rng):
    data = _tabular(rng, n=300)
    cv = KfoldCV()
    name = checkpoint_name("K562", "FFNN", "active_P_vs_inactive_P", 0)
    scores = cv(data, "FFNN", task="active_P_vs_inactive_P", cell_line="K562",
                cv_cfg=CVConfig(n_folds=2, n_trials=2, sampler="random"),
                train_cfg=TrainConfig(num_epochs=3, batch_size=60),
                storage=str(tmp_path / "cv.db"),
                checkpoint_dir=str(tmp_path),
                test_model_path=name)
    assert len(scores["final_test_AUPRC_scores"]) == 2
    assert "iteration_n_1" in scores and "iteration_n_2" in scores
    assert scores["average_CV_AUPRC"] == pytest.approx(
        round(sum(scores["final_test_AUPRC_scores"]) / 2, 5))
    assert os.path.exists(os.path.join(str(tmp_path), name + ".npz"))

    # reload the saved fold-best model and score it (predict/evaluate API)
    from embracenet_tpu import api

    probs = api.predict(os.path.join(str(tmp_path), name), data)
    assert probs.shape == (300, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    ev = api.evaluate(os.path.join(str(tmp_path), name), data)
    assert 0.0 <= ev["AUPRC"] <= 1.0
    assert ev["baseline_AUPRC"] >= 0.1


def test_results_dict(tmp_path):
    from embracenet_tpu.training.results import ResultsDict, baseline_auprc

    path = str(tmp_path / "res.json")
    r = ResultsDict(path)
    r.update("K562", "t", "FFNN", {"average_CV_AUPRC": 0.42,
                                   "final_test_AUPRC_scores": [0.4, 0.44]})
    r.set_baseline("K562", "t", 0.125)
    r.set_best_augmentation("K562", "t", "double")
    r.save()
    r2 = ResultsDict(path)
    assert r2.get("K562", "t", "FFNN")["average_CV_AUPRC"] == 0.42
    assert r2.data["K562"]["t"]["baseline_AUPRC"] == 0.125
    assert r2.data["K562"]["t"]["best_augmentation"] == "double"
    y = np.array([1] * 2 + [0] * 98)
    assert baseline_auprc(y) == 0.1  # floored


def test_kfold_cv_resume(tmp_path, rng):
    """A finished fold is reloaded instead of retrained (reference's fit
    checkpoint short-circuit, training_models.py:71-76)."""
    data = _tabular(rng, n=200)
    kwargs = dict(
        task="t", cell_line="K562",
        cv_cfg=CVConfig(n_folds=2, n_trials=1, sampler="random"),
        train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=60),
        storage=str(tmp_path / "cv.db"), checkpoint_dir=str(tmp_path))
    cv1 = KfoldCV()
    s1 = cv1(data, "FFNN", **kwargs)
    cv2 = KfoldCV()
    s2 = cv2(data, "FFNN", **kwargs)
    assert s2["final_test_AUPRC_scores"] == s1["final_test_AUPRC_scores"]
    assert s2["average_CV_AUPRC"] == s1["average_CV_AUPRC"]
    assert s2["iteration_n_1"]["AUPRC_test"] == s1["iteration_n_1"]["AUPRC_test"]


def test_rebalance_views_multimodal_alignment(rng):
    """SMOTE (tabular) and reverse-strand (sequence) rebalancing must yield
    identical counts and label layout so one batch plan serves both views."""
    from embracenet_tpu.training.cv import rebalance_views

    n = 400
    y = np.zeros(n, np.int64)
    y[:20] = 1
    data = {
        "ffnn": rng.normal(size=(n, 6)).astype(np.float32),
        "cnn": rng.integers(0, 4, size=(n, 32)).astype(np.uint8),
        "y": y,
    }
    out = rebalance_views(data, ("ffnn", "cnn"), "smote", 0.1)
    assert len(out["ffnn"]) == len(out["cnn"]) == len(out["y"])
    assert (out["y"] == 1).sum() > 20           # rebalanced
    # originals preserved as prefix in both views
    np.testing.assert_array_equal(out["ffnn"][:n], data["ffnn"])
    np.testing.assert_array_equal(out["cnn"][:n], data["cnn"])


def test_rebalance_views_augmentation_alignment(rng):
    from embracenet_tpu.training.cv import rebalance_views

    n = 300
    y = (rng.random(n) < 0.3).astype(np.int64)
    data = {
        "ffnn": rng.normal(size=(n, 6)).astype(np.float32),
        "cnn": rng.integers(0, 4, size=(n, 32)).astype(np.uint8),
        "y": y,
    }
    out = rebalance_views(data, ("ffnn", "cnn"), "smote", 0.1,
                          augmentation=True)
    assert len(out["ffnn"]) == len(out["cnn"]) == len(out["y"]) == 2 * n


def test_kfold_cv_multimodal_end_to_end(tmp_path, rng):
    """EmbraceNet CV through KfoldCV: aligned views, HPO, retrain, scores."""
    n, d = 160, 8
    y = (rng.random(n) < 0.35).astype(np.int64)
    w = rng.normal(size=d)
    x = (rng.normal(size=(n, d)) + np.outer(y * 2 - 1, w)).astype(np.float32)
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    data = {"ffnn": x, "cnn": codes, "y": y}

    # fixed small draws: random-sampler HPO is covered by the (cheap) FFNN
    # end-to-end test; natural multimodal draws can sample 4-conv supernets
    # whose XLA:CPU compiles made this the slowest test in the tier (380 s)
    from embracenet_tpu.hpo.samplers import ReplaySampler

    draw = {"FFNN_n_layers": 1, "FFNN_n_units_l0": 32, "FFNN_dropout_l0": 0.0,
            "CNN_n_layers": 1, "CNN_out_channels_l0": 16,
            "CNN_kernel_size_l0": 5, "CNN_dropout_l0": 0.0,
            "EMBRACENET_embracement_size": 512, "n_post_layers": 0,
            "selection_probabilities_FFNN": 0.5,
            "optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-4}
    cv = KfoldCV()
    scores = cv(data, "EmbraceNetMultimodal", task="t", cell_line="K562",
                cv_cfg=CVConfig(n_folds=2, n_trials=1,
                                sampler=ReplaySampler(
                                    [draw, dict(draw, lr=2e-3)])),
                train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2,
                                      batch_size=40,
                                      # compile the draw's own small bucket,
                                      # not the full multimodal supernet
                                      # (exactness covered by
                                      # test_width_buckets)
                                      width_buckets=True),
                storage=str(tmp_path / "mm.db"),
                checkpoint_dir=str(tmp_path),
                test_model_path=checkpoint_name(
                    "K562", "EmbraceNetMultimodal", "t", 0))
    assert len(scores["final_test_AUPRC_scores"]) == 2
    assert all(np.isfinite(scores["final_test_AUPRC_scores"]))

    from embracenet_tpu import api

    ck = str(tmp_path / checkpoint_name("K562", "EmbraceNetMultimodal", "t", 0))
    probs = api.predict(ck, data)
    assert probs.shape == (n, 2)


def _orbax_usable():
    import os
    import subprocess
    import sys

    if os.environ.get("EMBRACENET_NO_ORBAX"):
        return False
    return subprocess.run(
        [sys.executable, "-c", "import orbax.checkpoint"],
        capture_output=True, timeout=120).returncode == 0


@pytest.mark.skipif(not _orbax_usable(), reason="orbax/tensorstore unavailable")
def test_orbax_checkpoint_roundtrip(tmp_path, rng):
    from embracenet_tpu.training.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    tree = {"params": {"w": rng.normal(size=(4, 3)).astype(np.float32),
                       "nested": {"b": np.arange(5, dtype=np.int32)}}}
    path = str(tmp_path / "ock")
    save_checkpoint_orbax(path, tree, meta={"model": "FFNN", "lr": 0.01})
    trees, meta = load_checkpoint_orbax(path)
    assert meta == {"model": "FFNN", "lr": 0.01}
    np.testing.assert_array_equal(trees["params"]["w"], tree["params"]["w"])
    np.testing.assert_array_equal(trees["params"]["nested"]["b"],
                                  tree["params"]["nested"]["b"])


def test_results_from_reference_pickle(tmp_path):
    import pickle

    from embracenet_tpu.training.results import ResultsDict

    ref = {"K562": {"t": {"FFNN": {"average_CV_AUPRC": 0.34,
                                   "final_test_AUPRC_scores": [0.3, 0.38]},
                          "baseline_AUPRC": 0.125}}}
    p = tmp_path / "results_dict.pickle"
    with open(p, "wb") as fh:
        pickle.dump(ref, fh)
    r = ResultsDict.from_reference_pickle(str(p), str(tmp_path / "out.json"))
    assert r.get("K562", "t", "FFNN")["average_CV_AUPRC"] == 0.34
    r.save()
    assert (tmp_path / "out.json").exists()


def test_reload_batched_inference(tmp_path, rng):
    """predict() must chunk datasets larger than the inference micro-batch."""
    import jax

    from embracenet_tpu import api
    from embracenet_tpu.hpo import space as sp
    from embracenet_tpu.models.reload import ReloadedModel
    from embracenet_tpu.training.checkpoint import save_checkpoint
    from embracenet_tpu.training.modelspec import get_spec

    d = 6
    flat = sp.sample_params("FFNN", rng)
    hp = sp.params_to_hp("FFNN", flat)
    spec = get_spec("FFNN", in_features_ffnn=d)
    params, _ = spec.init(jax.random.PRNGKey(0), hp)
    path = str(tmp_path / "big")
    save_checkpoint(path, {"params": params},
                    meta={"model": "FFNN", "model_params": flat})

    n = ReloadedModel.BATCH + 123
    data = {"ffnn": rng.normal(size=(n, d)).astype(np.float32),
            "y": np.zeros(n, np.int64)}
    probs = api.predict(path, data)
    assert probs.shape == (n, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    # chunk boundaries must not change results: compare against small-batch
    model = ReloadedModel("FFNN", params, {}, flat, in_features_ffnn=d)
    model.BATCH = 1000
    probs2 = model(data)
    np.testing.assert_allclose(probs, probs2, atol=1e-5)


def test_tpe_concentrates_on_good_region():
    """Past the random-startup budget, TPE must exploit: a history where low
    lr is clearly better should pull sampled lr down."""
    from embracenet_tpu.hpo.samplers import TPESampler
    from embracenet_tpu.hpo.space import model_space

    sp = model_space("FFNN")
    r = np.random.default_rng(0)
    history = []
    for _ in range(40):
        params = {n: d.sample(r) for n, d in sp.items()}
        # value peaks when lr is near 1e-4
        value = float(np.exp(-(np.log10(params["lr"]) + 4.0) ** 2))
        history.append((params, value))
    tpe = TPESampler(seed=1)
    draws = [tpe.sample(sp, history)["lr"] for _ in range(30)]
    rand_draws = [sp["lr"].sample(np.random.default_rng(i)) for i in range(30)]
    # TPE's draws should sit much closer to the optimum than random's
    dist = np.median(np.abs(np.log10(draws) + 4))
    rand_dist = np.median(np.abs(np.log10(rand_draws) + 4))
    assert dist < rand_dist * 0.5


def test_eval_metric_batch_averaging_parity(rng):
    """The engine's eval AUPRC must equal the mean of per-batch argmax-AP
    over the eval plan (reference aggregation, training_models.py:154-155)."""
    import jax

    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space as sp
    from embracenet_tpu.ops import metrics
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.batching import eval_plan
    from embracenet_tpu.training.modelspec import get_spec

    d = 6
    n_test = 130
    data = _tabular(rng, n=260, d=d)
    train = {k: v[:130] for k, v in data.items()}
    test = {k: v[130:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=d)
    flat = sp.sample_params("FFNN", rng)
    hp = sp.params_to_hp("FFNN", flat)
    opt = sp.optimizer_hp(flat)
    cfg = TrainConfig(num_epochs=1, epoch_chunk=1, batch_size=30)
    res = engine.fit(spec, [hp], [opt], train, test, cfg,
                     key=jax.random.PRNGKey(3))

    # recompute by hand from the trained params over the same eval plan
    params = jax.tree.map(lambda a: np.asarray(a)[0], res.params)
    logits = np.asarray(spec.apply(params, {}, hp, {"ffnn": test["ffnn"]},
                                   False, jax.random.PRNGKey(0), None,
                                   None, None)[0])
    plan = eval_plan(n_test, cfg.batch_size * 2, seed=123)
    per_batch = []
    for i in range(plan.idx.shape[0]):
        sel = plan.idx[i][plan.mask[i] > 0]
        per_batch.append(float(metrics.auprc_argmax(
            logits[sel], test["y"][sel])))
    want = float(np.mean(per_batch))
    assert res.auprc_test[0][-1] == pytest.approx(want, abs=1e-5)


def test_run_search_sequential_fallback_cnn_lstm(tmp_path, rng):
    """Non-vmappable families (CNN_LSTM) run HPO trials sequentially."""
    # Shapes/archs/config deliberately IDENTICAL to
    # test_cnn_lstm_grouped_population below: the per-arch XLA:CPU compiles
    # dominate both tests' wall, and matching (rows, batch, epoch_chunk,
    # arch dims) lets whichever test runs second ride the suite's
    # persistent compile cache even on a cold machine.
    n = 120
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    y = (rng.random(n) < 0.4).astype(np.int64)
    data = {"cnn": codes, "y": y}
    train = {k: v[:90] for k, v in data.items()}
    val = {k: v[90:] for k, v in data.items()}
    spec = get_spec("CNN_LSTM")
    assert not spec.vmappable
    # small fixed distinct archs (ReplaySampler): natural random draws can
    # sample 2-conv/128-wide-LSTM programs whose XLA:CPU compile dominated
    # the slow tier (184 s); the sequential-fallback semantics under test
    # are sampler-independent (non-vmappable spec => sequential either way)
    from embracenet_tpu.hpo.samplers import ReplaySampler

    small = {"n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 5,
             "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32,
             "LSTM_n_layers": 1, "optimizer": "Adam", "lr": 1e-3,
             "weight_decay": 1e-4}
    res = run_search(spec, "CNN_LSTM", train, val, "lstm_1",
                     storage=str(tmp_path / "l.db"),
                     sampler=ReplaySampler([small,
                                            dict(small, out_channels_l0=32)]),
                     n_trials=2,
                     train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2,
                                           batch_size=45),
                     checkpoint_dir=str(tmp_path), seed=0)
    assert res.n_complete == 2
    assert np.isfinite(res.best_value)
    assert res.best_model is not None
    assert "LSTM_hidden_layer_size" in res.best_params


def test_reload_cnn_lstm_checkpoint(tmp_path, rng):
    """CNN_LSTM checkpoints reload and predict (statics derived from hp)."""
    import jax

    from embracenet_tpu import api
    from embracenet_tpu.hpo import space as sp
    from embracenet_tpu.training.checkpoint import save_checkpoint

    flat = {"n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 5,
            "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32,
            "LSTM_n_layers": 1}
    hp = sp.params_to_hp("CNN_LSTM", flat)
    spec = get_spec("CNN_LSTM")
    params, bn = spec.init(jax.random.PRNGKey(0), hp)
    path = str(tmp_path / "lstm_ck")
    save_checkpoint(path, {"params": params, "bn_state": bn},
                    meta={"model": "CNN_LSTM", "model_params": flat})
    data = {"cnn": rng.integers(0, 4, size=(20, 256)).astype(np.uint8),
            "y": np.zeros(20, np.int64)}
    probs = api.predict(path, data)
    assert probs.shape == (20, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)


def test_study_concurrent_writers(tmp_path):
    """Two processes telling trials into the same SQLite study concurrently
    must not lose writes or raise "database is locked" (WAL + busy timeout,
    reference's load_if_exists semantics `training_models.py:361-374`)."""
    import subprocess
    import sys

    from embracenet_tpu.hpo.study import Study

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    db = str(tmp_path / "conc.db")
    n_child = 30
    child = (
        "import sys; sys.path.insert(0, %r)\n"
        "from embracenet_tpu.hpo.study import Study\n"
        "s = Study('conc', storage=%r)\n"
        "for i in range(%d):\n"
        "    s.tell(1000 + i, {'lr': i}, float(i))\n"
        "s.close()\n" % (str(ROOT), db, n_child))
    proc = subprocess.Popen([sys.executable, "-c", child],
                            stderr=subprocess.PIPE)
    s = Study("conc", storage=db)
    for i in range(n_child):
        s.tell(i, {"lr": -i}, float(i))
    _, err = proc.communicate(timeout=120)
    assert proc.returncode == 0, err.decode()
    assert len(s.completed_trials()) == 2 * n_child
    assert s.next_number() == 1000 + n_child
    s.close()


def test_missing_best_checkpoint_warns(tmp_path, rng, monkeypatch):
    """If the best HPO trial's checkpoint file is missing, the retrain falls
    back to a fresh init — losing the reference's keep-trained-BN
    weight_reset quirk — and must WARN rather than diverge silently."""
    import embracenet_tpu.training.cv as cv_mod
    from embracenet_tpu.hpo.search import SearchResult

    data = _tabular(rng, n=200)
    flat = space.sample_params("FFNN", np.random.default_rng(0))

    def fake_search(*args, **kwargs):
        return SearchResult(best_params=flat, best_value=0.5,
                            best_model=None, n_complete=1, n_pruned=0)

    monkeypatch.setattr(cv_mod, "run_search", fake_search)
    cv = KfoldCV()
    with pytest.warns(RuntimeWarning, match="checkpoint missing"):
        cv(data, "FFNN", task="t", cell_line="K562",
           cv_cfg=CVConfig(n_folds=2, n_trials=1, sampler="random"),
           train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=60),
           storage=str(tmp_path / "cv.db"), checkpoint_dir=str(tmp_path))


def test_cnn_lstm_grouped_population(tmp_path, rng):
    """CNN_LSTM trials sharing an architecture vmap together; distinct
    architectures run as separate groups (VERDICT r1 item 5)."""
    from embracenet_tpu.hpo.samplers import ReplaySampler

    arch_a = {"n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 5,
              "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32,
              "LSTM_n_layers": 1, "optimizer": "Adam", "lr": 1e-3,
              "weight_decay": 1e-4}
    arch_b = dict(arch_a, out_channels_l0=32, lr=3e-3)
    # two trials share arch A (one group), one is arch B (second group)
    replay = ReplaySampler([arch_a, dict(arch_a, lr=2e-3), arch_b])

    data = rng.integers(0, 4, size=(120, 256)).astype(np.uint8)
    y = (rng.random(120) < 0.3).astype(np.int64)
    train = {"cnn": data[:90], "y": y[:90]}
    val = {"cnn": data[90:], "y": y[90:]}
    spec = get_spec("CNN_LSTM")
    res = run_search(spec, "CNN_LSTM", train, val, "lstm_grp",
                     storage=str(tmp_path / "s.db"), sampler=replay,
                     n_trials=3,
                     train_cfg=TrainConfig(num_epochs=2, epoch_chunk=2,
                                           batch_size=45),
                     checkpoint_dir=str(tmp_path), seed=0)
    assert res.n_complete == 3
    assert np.isfinite(res.best_value)
    # all three trial checkpoints exist (group order must not lose trials)
    for n in range(3):
        assert os.path.exists(str(tmp_path / f"lstm_grp{n}.npz"))


def test_gp_ei_beats_random_on_30_trial_benchmark():
    """The 'BO' sampler (GP-EI) must significantly beat RandomSampler on a
    30-trial synthetic HPO benchmark over the real FFNN space (VERDICT r1
    item 7; the reference's BoTorch menu entry, training_models.py:248)."""
    import numpy as np

    from embracenet_tpu.hpo.samplers import get_sampler

    sp = space.model_space("FFNN")

    def objective(p, rng):
        lr_term = -0.15 * (np.log10(p["lr"]) + 3.0) ** 2
        depth_term = -0.10 * abs(p["n_layers"] - 2)
        width_term = -0.05 * abs(np.log2(p["n_units_l0"]) - 7)
        wd_term = -0.05 * (np.log10(p["weight_decay"]) + 3.0) ** 2
        return (1.0 + lr_term + depth_term + width_term + wd_term
                + 0.01 * rng.standard_normal())

    def run(sampler_name, seed):
        smp = get_sampler(sampler_name, seed=seed)
        rng = np.random.default_rng(1000 + seed)
        hist = []
        for _ in range(30):
            p = smp.sample(sp, hist)
            hist.append((p, objective(p, rng)))
        return max(v for _, v in hist)

    seeds = range(6)
    bo = [run("BO", s) for s in seeds]
    rnd = [run("random", s) for s in seeds]
    # GP-EI must win on average and do no worse on (almost) every seed
    assert np.mean(bo) > np.mean(rnd) + 0.02, (bo, rnd)
    assert sum(b >= r - 1e-9 for b, r in zip(bo, rnd)) >= 5, (bo, rnd)


def test_gp_ei_respects_menus_and_liar():
    """Batch draws via sample_n (pending values None) stay inside the menus
    and do not collapse onto one candidate."""
    from embracenet_tpu.hpo.samplers import get_sampler, sample_n

    sp = space.model_space("FFNN")
    rng = np.random.default_rng(0)
    history = [(space.sample_params("FFNN", rng), float(i) / 12)
               for i in range(12)]
    smp = get_sampler("BO", seed=3)
    batch = sample_n(smp, "FFNN", 4, history)
    for params in batch:
        for name, dist in sp.items():
            assert name in params
            if hasattr(dist, "choices"):
                assert params[name] in dist.choices
        assert 1e-5 <= params["lr"] <= 1e-1
    assert len({tuple(sorted((k, str(v)) for k, v in p.items()))
                for p in batch}) > 1


def test_tpe_beats_random_on_categorical_heavy_space():
    """TPE validation beyond the reference regime (VERDICT r1 weak #8): on
    a categorical-heavy objective over the real CNN space (menus dominate:
    channels/kernels/dropout per layer), TPE with a 10-trial random startup
    must beat pure random over a 40-trial budget on average."""
    import numpy as np

    from embracenet_tpu.hpo.samplers import get_sampler

    sp = space.model_space("CNN")

    def objective(p, rng):
        # good region: deep nets, wide l0, kernel 11, Adam, lr near 1e-3
        score = 0.0
        score += 0.15 * (p["n_layers"] - 1)
        score += 0.10 * (p["out_channels_l0"] == 64)
        score += 0.10 * (p["kernel_size_l0"] == 11)
        score += 0.10 * (p["optimizer"] == "Adam")
        score -= 0.08 * (np.log10(p["lr"]) + 3.0) ** 2
        score -= 0.05 * p["dropout_l0"]
        return score + 0.02 * rng.standard_normal()

    def run(name, seed):
        smp = get_sampler(name, seed=seed)
        rng = np.random.default_rng(500 + seed)
        hist = []
        for _ in range(40):
            p = smp.sample(sp, hist)
            hist.append((p, objective(p, rng)))
        return max(v for _, v in hist)

    seeds = range(8)
    tpe = [run("TPE", s) for s in seeds]
    rnd = [run("random", s) for s in seeds]
    assert np.mean(tpe) > np.mean(rnd), (tpe, rnd)
    # and it should find the deep region almost always
    assert np.mean(tpe) > 0.45, tpe


def test_kfold_cv_width_buckets_end_to_end(tmp_path, rng):
    """Full CV with width_buckets on: HPO groups + exact-size retrain +
    grow-back checkpoints reload cleanly."""
    data = _tabular(rng, n=240)
    cv = KfoldCV()
    name = checkpoint_name("K562", "FFNN", "t", 0)
    scores = cv(data, "FFNN", task="t", cell_line="K562",
                cv_cfg=CVConfig(n_folds=2, n_trials=2, sampler="random"),
                train_cfg=TrainConfig(num_epochs=3, batch_size=60,
                                      width_buckets=True),
                storage=str(tmp_path / "cv.db"), checkpoint_dir=str(tmp_path),
                test_model_path=name)
    assert len(scores["final_test_AUPRC_scores"]) == 2
    assert all(np.isfinite(scores["final_test_AUPRC_scores"]))

    from embracenet_tpu import api

    probs = api.predict(os.path.join(str(tmp_path), name), data)
    assert probs.shape == (240, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
