"""Fold-fused populations: several CV folds' trials training as ONE vmapped
program over fold-concatenated data (engine per-trial batch plans).

The fused path must reproduce the sequential per-fold path exactly: per-trial
RNG streams are pinned via ``engine.key_streams``, each trial's plan indexes
only its own fold's rows, and per-trial metric divisors preserve the
reference's batch-mean averaging (`training_models.py:154-155`).
"""

import numpy as np
import pytest

from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu.hpo import space
from embracenet_tpu.training import engine
from embracenet_tpu.training.batching import balanced_plan, eval_plan, shift_plan
from embracenet_tpu.training.modelspec import get_spec


def _tabular(rng, n, d=12, imbalance=0.3):
    y = (rng.random(n) < imbalance).astype(np.int64)
    w = rng.normal(size=d)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x += np.outer(y * 2.0 - 1.0, w).astype(np.float32) * 0.6
    return {"ffnn": x, "y": y}


def _hp_opt(flat):
    return space.params_to_hp("FFNN", flat), space.optimizer_hp(flat)


_FLAT_A = {"n_layers": 2, "n_units_l0": 64, "n_units_l1": 32,
           "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.2,
           "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0,
           "optimizer": "Adam", "lr": 1e-3, "weight_decay": 1e-4}
_FLAT_B = {"n_layers": 1, "n_units_l0": 32, "n_units_l1": 16,
           "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
           "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0,
           "optimizer": "RMSprop", "lr": 3e-4, "weight_decay": 1e-3}


def test_shift_plan_offsets_only_indices():
    y = np.array([0, 1] * 30)
    p = balanced_plan(y, 16)
    s = shift_plan(p, 100)
    np.testing.assert_array_equal(s.idx, p.idx + 100)
    np.testing.assert_array_equal(s.mask, p.mask)
    assert s.metric_divisor == p.metric_divisor


def test_fused_fit_matches_two_sequential_fits(rng):
    """Two folds, one trial each: a fused 2-trial population over the
    concatenated data must reproduce each sequential fit's whole metric
    history and final parameters."""
    import jax

    d_a = _tabular(rng, 260)
    d_b = _tabular(rng, 300)
    tr_a = {k: v[:200] for k, v in d_a.items()}
    va_a = {k: v[200:] for k, v in d_a.items()}
    tr_b = {k: v[:220] for k, v in d_b.items()}
    va_b = {k: v[220:] for k, v in d_b.items()}
    spec = get_spec("FFNN", in_features_ffnn=12)
    hp_a, opt_a = _hp_opt(_FLAT_A)
    hp_b, opt_b = _hp_opt(_FLAT_B)
    cfg = TrainConfig(num_epochs=4, batch_size=50, epoch_chunk=4)

    res_a = engine.fit(spec, [hp_a], [opt_a], tr_a, va_a, cfg,
                       key=jax.random.PRNGKey(11))
    res_b = engine.fit(spec, [hp_b], [opt_b], tr_b, va_b, cfg,
                       key=jax.random.PRNGKey(22))

    # fused: concatenate rows, shift fold B's plans past fold A's rows
    cat_tr = {k: np.concatenate([np.asarray(tr_a[k]), np.asarray(tr_b[k])])
              for k in tr_a}
    cat_va = {k: np.concatenate([np.asarray(va_a[k]), np.asarray(va_b[k])])
              for k in va_a}
    tp_a = balanced_plan(tr_a["y"], cfg.batch_size, seed=123)
    tp_b = shift_plan(balanced_plan(tr_b["y"], cfg.batch_size, seed=123),
                      len(tr_a["y"]))
    ep_a = eval_plan(len(va_a["y"]), cfg.batch_size * 2, seed=123)
    ep_b = shift_plan(eval_plan(len(va_b["y"]), cfg.batch_size * 2, seed=123),
                      len(va_a["y"]))
    ik_a, rk_a = engine.key_streams(jax.random.PRNGKey(11), 1)
    ik_b, rk_b = engine.key_streams(jax.random.PRNGKey(22), 1)
    fused = engine.fit(
        spec, [hp_a, hp_b], [opt_a, opt_b], cat_tr, cat_va, cfg,
        train_plans=[tp_a, tp_b], eval_plans=[ep_a, ep_b],
        init_keys=np.concatenate([np.asarray(ik_a), np.asarray(ik_b)]),
        run_keys=np.concatenate([np.asarray(rk_a), np.asarray(rk_b)]))

    for t, ref in ((0, res_a), (1, res_b)):
        np.testing.assert_allclose(fused.auprc_test[t], ref.auprc_test[0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(fused.auprc_train[t], ref.auprc_train[0],
                                   rtol=1e-5, atol=1e-6)
        assert fused.epochs_run[t] == ref.epochs_run[0]
    ref_leaves = jax.tree.leaves((res_a.params, res_b.params))
    fused_leaves = jax.tree.leaves(fused.params)
    # fused params leaf t-th slice == each sequential fit's trial-0 slice
    for fl, (al, bl) in zip(
            fused_leaves,
            zip(jax.tree.leaves(res_a.params), jax.tree.leaves(res_b.params))):
        np.testing.assert_allclose(np.asarray(fl)[0], np.asarray(al)[0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(fl)[1], np.asarray(bl)[0],
                                   rtol=1e-5, atol=1e-6)
    assert ref_leaves  # sanity: trees non-empty


def test_fused_rejects_mismatched_plans(rng):
    d = _tabular(rng, 120)
    tr = {k: v[:90] for k, v in d.items()}
    va = {k: v[90:] for k, v in d.items()}
    spec = get_spec("FFNN", in_features_ffnn=12)
    hp, opt = _hp_opt(_FLAT_A)
    tp = balanced_plan(tr["y"], 50, seed=123)
    ep = eval_plan(len(va["y"]), 100, seed=123)
    with pytest.raises(ValueError):
        engine.fit(spec, [hp, hp], [opt, opt], tr, va, TrainConfig(
            num_epochs=1), train_plans=[tp], eval_plans=[ep, ep])
    with pytest.raises(ValueError):
        engine.fit(spec, [hp], [opt], tr, va, TrainConfig(num_epochs=1),
                   train_plans=[tp], eval_plans=None)
    with pytest.raises(ValueError):
        engine.fit(spec, [hp], [opt], tr, va,
                   TrainConfig(num_epochs=1, eval_reshuffle=True),
                   train_plans=[tp], eval_plans=[ep])


def test_kfoldcv_fused_matches_sequential(rng, tmp_path):
    """KfoldCV(fuse_folds=True) reproduces the sequential driver: same
    sampled trials, same per-fold histories, same average_CV_AUPRC, same
    checkpoint protocol."""
    from embracenet_tpu.training.cv import KfoldCV

    data = _tabular(rng, 260, d=10)
    cv_cfg = dict(n_folds=2, n_trials=2, sampler="random")
    t_cfg = TrainConfig(num_epochs=3, batch_size=40, epoch_chunk=3,
                        patience=2)

    seq_dir = tmp_path / "seq"
    fus_dir = tmp_path / "fused"
    seq_dir.mkdir(), fus_dir.mkdir()
    seq = KfoldCV()(data, "FFNN", cv_cfg=CVConfig(**cv_cfg),
                    train_cfg=t_cfg, study_name="s",
                    storage=str(seq_dir / "study.db"),
                    checkpoint_dir=str(seq_dir),
                    test_model_path="best_model")
    fus = KfoldCV()(data, "FFNN",
                    cv_cfg=CVConfig(fuse_folds=True, **cv_cfg),
                    train_cfg=t_cfg, study_name="s",
                    storage=str(fus_dir / "study.db"),
                    checkpoint_dir=str(fus_dir),
                    test_model_path="best_model")

    np.testing.assert_allclose(fus["final_test_AUPRC_scores"],
                               seq["final_test_AUPRC_scores"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(fus["final_train_AUPRC_scores"],
                               seq["final_train_AUPRC_scores"],
                               rtol=1e-5, atol=1e-6)
    assert abs(fus["average_CV_AUPRC"] - seq["average_CV_AUPRC"]) < 1e-4
    for fold in (1, 2):
        s = seq[f"iteration_n_{fold}"]
        f = fus[f"iteration_n_{fold}"]
        np.testing.assert_allclose(f["AUPRC_test"], s["AUPRC_test"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(f["AUPRC_train"], s["AUPRC_train"],
                                   rtol=1e-5, atol=1e-6)
        assert (fus_dir / f"s_fold{fold}_result.npz").exists()
    assert (fus_dir / "best_model.npz").exists()


def test_kfoldcv_fused_resume_mixed(rng, tmp_path):
    """A fused CV with one fold already checkpointed resumes it and fuses
    only the remaining folds; scores keep fold order."""
    from embracenet_tpu.training.cv import KfoldCV

    data = _tabular(rng, 200, d=8)
    cv_cfg = CVConfig(n_folds=2, n_trials=1, sampler="random",
                      fuse_folds=True)
    t_cfg = TrainConfig(num_epochs=2, batch_size=40, epoch_chunk=2)
    d = tmp_path / "cv"
    d.mkdir()
    full = KfoldCV()(data, "FFNN", cv_cfg=cv_cfg, train_cfg=t_cfg,
                     study_name="s", storage=str(d / "study.db"),
                     checkpoint_dir=str(d))
    # drop fold 2's checkpoint; fold 1 must resume, fold 2 recompute
    (d / "s_fold2_result.npz").unlink()
    again = KfoldCV()(data, "FFNN", cv_cfg=cv_cfg, train_cfg=t_cfg,
                      study_name="s", storage=str(d / "study.db"),
                      checkpoint_dir=str(d))
    np.testing.assert_allclose(again["final_test_AUPRC_scores"],
                               full["final_test_AUPRC_scores"],
                               rtol=1e-5, atol=1e-6)
    assert again["average_CV_AUPRC"] == pytest.approx(
        full["average_CV_AUPRC"], abs=1e-4)


def test_fused_embracenet_same_arch_exact(rng):
    """Fold-fused EmbraceNetMultimodal (per-trial plans over concatenated
    folds, pinned key streams) is BIT-equal to its sequential per-fold fits
    when the population shares one architecture (same bucket shapes => same
    RNG draw shapes).  The on-chip companion (tools/fused_footprint.py)
    asserts only a noise band: different TPU program shapes tile/round
    differently, which this CPU test deliberately excludes."""
    import jax

    from embracenet_tpu.hpo import space
    from embracenet_tpu.hpo.search import concat_fold_views

    n, d = 360, 10
    y = (rng.random(n) < 0.35).astype(np.int64)
    data = {"ffnn": rng.normal(size=(n, d)).astype(np.float32),
            "cnn": rng.integers(0, 4, size=(n, 256)).astype(np.uint8),
            "y": y}
    idx = np.arange(n)
    third = n // 3
    folds = []
    for j in range(2):
        te = idx[j * third:(j + 1) * third]
        folds.append((np.setdiff1d(idx, te), te))
    view = lambda i: {k: np.asarray(v)[i] for k, v in data.items()}  # noqa
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=d)
    flat0 = space.sample_params("EmbraceNetMultimodal",
                                np.random.default_rng(0))
    flat0["CNN_n_layers"] = 1
    flats = [flat0, dict(flat0, lr=flat0["lr"] * 0.5)]
    hps = [space.params_to_hp("EmbraceNetMultimodal", f) for f in flats]
    opts = [space.optimizer_hp(f) for f in flats]
    cfg = TrainConfig(num_epochs=2, epoch_chunk=1, batch_size=40,
                      patience=10_000, width_buckets=True)
    fold_data = [(view(tr), view(te)) for tr, te in folds]
    keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]
    seq = []
    for j in range(2):
        tr_d, te_d = fold_data[j]
        res = engine.fit(spec, [hps[j]], [opts[j]], tr_d, te_d, cfg,
                         key=keys[j])
        seq.append((res.auprc_test[0], res.auprc_train[0]))
    cat_tr, off_tr = concat_fold_views([f[0] for f in fold_data],
                                       ("ffnn", "cnn", "y"))
    cat_te, off_te = concat_fold_views([f[1] for f in fold_data],
                                       ("ffnn", "cnn", "y"))
    tps, eps, iks, rks = [], [], [], []
    for j in range(2):
        tr_d, te_d = fold_data[j]
        tps.append(shift_plan(balanced_plan(tr_d["y"], cfg.batch_size,
                                            seed=123), off_tr[j]))
        eps.append(shift_plan(eval_plan(len(te_d["y"]), cfg.batch_size * 2,
                                        seed=123), off_te[j]))
        ik, rk = engine.key_streams(keys[j], 1)
        iks.append(np.asarray(ik))
        rks.append(np.asarray(rk))
    fused = engine.fit(spec, hps, opts, cat_tr, cat_te, cfg,
                       train_plans=tps, eval_plans=eps,
                       init_keys=np.concatenate(iks),
                       run_keys=np.concatenate(rks))
    for j in range(2):
        np.testing.assert_allclose(fused.auprc_test[j], seq[j][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(fused.auprc_train[j], seq[j][1],
                                   rtol=1e-5, atol=1e-6)
