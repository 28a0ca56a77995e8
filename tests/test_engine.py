"""End-to-end training engine tests on synthetic data (golden strategy from
SURVEY.md §4: fixed-seed mini-datasets through train->eval)."""

import numpy as np
import pytest

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.hpo import space
from embracenet_tpu.training import engine
from embracenet_tpu.training.batching import balanced_plan
from embracenet_tpu.training.modelspec import get_spec


def _synthetic_tabular(rng, n=600, d=16, imbalance=0.25):
    """Linearly separable-ish two-class tabular data."""
    y = (rng.random(n) < imbalance).astype(np.int64)
    w = rng.normal(size=d)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x += np.outer(y * 2.0 - 1.0, w).astype(np.float32) * 0.8
    return {"ffnn": x, "y": y}


def _synthetic_seq(rng, n=220, imbalance=0.3):
    """Sequences where class 1 has a planted motif."""
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    y = (rng.random(n) < imbalance).astype(np.int64)
    motif = np.array([0, 1, 2, 3, 0, 1, 2, 3], np.uint8)
    for i in np.flatnonzero(y):
        pos = rng.integers(0, 256 - 8)
        codes[i, pos:pos + 8] = motif
    return {"cnn": codes, "y": y}


def test_balanced_plan_covers_all_and_batches_have_positives(rng):
    y = (rng.random(503) < 0.1).astype(np.int64)
    y[:5] = 1
    plan = balanced_plan(y, batch_size=100)
    seen = plan.idx[plan.mask > 0]
    assert sorted(seen.tolist()) == list(range(503))
    # reference metric divisor = ceil(n / batch) (len of sampler)
    assert plan.metric_divisor == 6


def test_balanced_plan_deterministic():
    y = np.array([0, 1] * 50)
    a = balanced_plan(y, 10)
    b = balanced_plan(y, 10)
    np.testing.assert_array_equal(a.idx, b.idx)


def test_fit_ffnn_learns(rng):
    data = _synthetic_tabular(rng)
    train = {k: v[:450] for k, v in data.items()}
    test = {k: v[450:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 2, "n_units_l0": 64, "n_units_l1": 32,
        "dropout_l0": 0.0, "dropout_l1": 0.0,
        "dropout_l2": 0.0, "dropout_l3": 0.0,
        "n_units_l2": 4, "n_units_l3": 4,
    })
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    cfg = TrainConfig(num_epochs=30, batch_size=64)
    res = engine.fit(spec, [hp], [opt], train, test, cfg)
    prevalence = test["y"].mean()
    assert res.final_test_auprc[0] > prevalence + 0.15
    assert res.epochs_run[0] >= 5


def test_fit_chunk_callback_reports_every_chunk(rng):
    """chunk_callback fires once per epoch chunk with the real (unmasked)
    window count — bench.py's per-chunk throughput stashing rides this."""
    data = _synthetic_tabular(rng, n=300)
    train = {k: v[:200] for k, v in data.items()}
    test = {k: v[200:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    flat = space.sample_params("FFNN", rng)
    hp = space.params_to_hp("FFNN", flat)
    opt = space.optimizer_hp(flat)
    cfg = TrainConfig(num_epochs=6, epoch_chunk=2, batch_size=64,
                      patience=10_000)
    calls = []
    engine.fit(spec, [hp, hp], [opt, opt], train, test, cfg,
               chunk_callback=lambda *a: calls.append(a))
    assert [(c[0], c[1]) for c in calls] == [(0, 2), (1, 2), (2, 2)]
    assert all(c[2] > 0 for c in calls)          # wall time
    assert all(c[3] == 2 * 200 for c in calls)   # 2 live trials x 200 rows


def test_fit_population_trials_differ(rng):
    data = _synthetic_tabular(rng, n=400)
    train = {k: v[:300] for k, v in data.items()}
    test = {k: v[300:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hps, opts = [], []
    for t in range(3):
        flat = space.sample_params("FFNN", rng)
        hps.append(space.params_to_hp("FFNN", flat))
        opts.append(space.optimizer_hp(flat))
    cfg = TrainConfig(num_epochs=5, batch_size=64)
    res = engine.fit(spec, hps, opts, train, test, cfg)
    assert len(res.final_test_auprc) == 3
    assert all(np.isfinite(res.final_test_auprc))
    # different architectures / optimizers should not produce identical curves
    assert len({tuple(np.round(h, 6)) for h in res.auprc_test}) > 1


def test_fit_cnn_learns_motif(rng):
    data = _synthetic_seq(rng)
    train = {k: v[:160] for k, v in data.items()}
    test = {k: v[160:] for k, v in data.items()}
    spec = get_spec("CNN")
    hp = space.params_to_hp("CNN", {
        "n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 11,
        "dropout_l0": 0.0,
    })
    opt = {"optimizer": np.int32(0), "lr": np.float32(3e-3),
           "weight_decay": np.float32(1e-4)}
    # width_buckets: slice the supernet to this trial's 16-channel bucket —
    # exact same math (prefix-aligned masking; equivalence covered by
    # test_width_buckets) but the XLA:CPU compile is of a 16-ch conv
    # program instead of the 512-ch full supernet that dominated this
    # test's wall (59 s measured round 5)
    cfg = TrainConfig(num_epochs=25, batch_size=40, width_buckets=True)
    res = engine.fit(spec, [hp], [opt], train, test, cfg)
    prevalence = test["y"].mean()
    # peak shows the motif was learned; final (reference = last-epoch value,
    # after early stop) just needs to beat prevalence
    assert max(res.auprc_test[0]) > prevalence + 0.1
    assert res.final_test_auprc[0] > prevalence + 0.03


def test_early_stopping_reference_semantics():
    es = engine.EarlyStopping(patience=2)
    assert not es(0.5)
    assert not es(0.4)   # counter 1
    assert es(0.45)      # counter 2 -> stop (0.45 < 0.5)
    es2 = engine.EarlyStopping(patience=2)
    es2(0.5)
    es2(0.4)
    assert not es2(0.6)  # improvement resets
    assert es2.counter == 0


def test_multimodal_fit_smoke(rng):
    tab = _synthetic_tabular(rng, n=160, d=12)
    seq = _synthetic_seq(rng, n=160)
    data = {"ffnn": tab["ffnn"], "cnn": seq["cnn"], "y": tab["y"]}
    train = {k: v[:120] for k, v in data.items()}
    test = {k: v[120:] for k, v in data.items()}
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=12)
    flat = space.sample_params("EmbraceNetMultimodal", rng)
    flat["lr"] = 1e-3
    flat["CNN_n_layers"] = 1  # depth bucket keeps the CPU test fast
    hp = space.params_to_hp("EmbraceNetMultimodal", flat)
    opt = space.optimizer_hp(flat)
    cfg = TrainConfig(num_epochs=2, batch_size=50)
    res = engine.fit(spec, [hp], [opt], train, test, cfg)
    assert np.isfinite(res.final_test_auprc[0])
    assert res.epochs_run[0] == 2


def test_weight_reset_keeps_bn(rng):
    import jax
    spec = get_spec("CNN")
    flat = space.sample_params("CNN", rng)
    hp = space.params_to_hp("CNN", flat)
    params, bn_state = spec.init(jax.random.PRNGKey(0), hp)
    # pretend bn was trained
    params["bn0"]["scale"] = params["bn0"]["scale"] * 3.0
    new_params, new_bn = engine.weight_reset(
        jax.random.PRNGKey(1), spec, hp, params, bn_state)
    np.testing.assert_array_equal(np.asarray(new_params["bn0"]["scale"]),
                                  np.asarray(params["bn0"]["scale"]))
    assert not np.array_equal(np.asarray(new_params["conv_w0"]),
                              np.asarray(params["conv_w0"]))


def test_cnn_lstm_fit_smoke(rng):
    """CNN_LSTM family (sequential-trial path) trains end-to-end."""
    data = _synthetic_seq(rng, n=120)
    train = {k: v[:90] for k, v in data.items()}
    test = {k: v[90:] for k, v in data.items()}
    spec = get_spec("CNN_LSTM")
    hp = space.params_to_hp("CNN_LSTM", {
        "n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 5,
        "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32, "LSTM_n_layers": 1,
    })
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    cfg = TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=45)
    res = engine.fit(spec, [hp], [opt], train, test, cfg)
    assert np.isfinite(res.final_test_auprc[0])


def test_cnn_lstm_mixed_population_rejected(rng):
    spec = get_spec("CNN_LSTM")
    hp1 = space.params_to_hp("CNN_LSTM", {
        "n_layers": 1, "out_channels_l0": 16, "kernel_size_l0": 5,
        "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32, "LSTM_n_layers": 1})
    hp2 = space.params_to_hp("CNN_LSTM", {
        "n_layers": 1, "out_channels_l0": 32, "kernel_size_l0": 5,
        "dropout_l0": 0.0, "LSTM_hidden_layer_size": 32, "LSTM_n_layers": 1})
    with pytest.raises(ValueError):
        spec.statics([hp1, hp2])


def test_eval_reshuffle_single_batch_parity(rng):
    """With the whole test set in ONE eval batch, per-epoch reshuffle cannot
    change the batch-mean metrics (AUPRC is order-invariant within a batch),
    so eval_reshuffle=True must reproduce the static plan bit-for-bit."""
    from embracenet_tpu.hpo import space

    data = _synthetic_tabular(rng, n=260)
    train = {k: v[:200] for k, v in data.items()}
    test = {k: v[200:] for k, v in data.items()}  # 60 rows < 2*batch_size
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 1, "n_units_l0": 32, "n_units_l1": 16,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    base = TrainConfig(num_epochs=6, batch_size=64, epoch_chunk=4)
    res_static = engine.fit(spec, [hp], [opt], train, test, base)
    res_shuf = engine.fit(spec, [hp], [opt], train, test,
                          TrainConfig(num_epochs=6, batch_size=64,
                                      epoch_chunk=4, eval_reshuffle=True))
    np.testing.assert_allclose(res_shuf.auprc_test[0],
                               res_static.auprc_test[0], rtol=1e-6)
    np.testing.assert_allclose(res_shuf.auprc_train[0],
                               res_static.auprc_train[0], rtol=1e-6)


def test_eval_reshuffle_multibatch_runs_and_permutes(rng):
    """Multi-batch eval with reshuffle: per-epoch plans are distinct
    permutations covering all rows, and training stays finite."""
    from embracenet_tpu.training.batching import eval_plan

    n = 300
    p1, p2 = eval_plan(n, 128, seed=123), eval_plan(n, 128, seed=124)
    for p in (p1, p2):
        seen = p.idx[p.mask > 0]
        assert sorted(seen.tolist()) == list(range(n))
    assert not np.array_equal(p1.idx, p2.idx)

    from embracenet_tpu.hpo import space

    data = _synthetic_tabular(rng, n=500)
    train = {k: v[:200] for k, v in data.items()}
    test = {k: v[200:] for k, v in data.items()}  # 300 rows -> 3 eval batches
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 1, "n_units_l0": 32, "n_units_l1": 16,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    res = engine.fit(spec, [hp], [opt], train, test,
                     TrainConfig(num_epochs=5, batch_size=64, epoch_chunk=3,
                                 eval_reshuffle=True))
    assert len(res.auprc_test[0]) == 5
    assert all(np.isfinite(res.auprc_test[0]))


def test_fit_low_precision_state_tracks_f32(rng):
    """bf16 optimizer moments + bf16 live params with f32 master
    (cfg.optim_dtype / cfg.param_dtype) must train to the same quality as
    the f32 path on the same data/keys — the HBM-roofline lever must not
    change what the engine learns (VERDICT r4 #1)."""
    data = _synthetic_tabular(rng)
    train = {k: v[:450] for k, v in data.items()}
    test = {k: v[450:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 2, "n_units_l0": 64, "n_units_l1": 32,
        "dropout_l0": 0.0, "dropout_l1": 0.0,
        "dropout_l2": 0.0, "dropout_l3": 0.0,
        "n_units_l2": 4, "n_units_l3": 4,
    })
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    base = TrainConfig(num_epochs=15, batch_size=64, patience=10_000)
    lowp = TrainConfig(num_epochs=15, batch_size=64, patience=10_000,
                       optim_dtype="bfloat16", param_dtype="bfloat16")
    res32 = engine.fit(spec, [hp], [opt], train, test, base)
    reslp = engine.fit(spec, [hp], [opt], train, test, lowp)
    # identical keys/plans; only state storage precision differs
    assert abs(res32.final_test_auprc[0] - reslp.final_test_auprc[0]) < 0.05
    # the returned params are the f32 master, not the bf16 working copy
    leaves = [x for x in __import__("jax").tree.leaves(reslp.params)]
    assert all(leaf.dtype == np.float32 for leaf in leaves)
    prevalence = test["y"].mean()
    assert reslp.final_test_auprc[0] > prevalence + 0.15


def test_fit_bf16_moments_only(rng):
    """optim_dtype=bfloat16 alone (f32 params) also trains fine."""
    data = _synthetic_tabular(rng, n=400)
    train = {k: v[:300] for k, v in data.items()}
    test = {k: v[300:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 1, "n_units_l0": 64, "n_units_l1": 16,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(2), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    res = engine.fit(spec, [hp], [opt], train, test,
                     TrainConfig(num_epochs=10, batch_size=64,
                                 optim_dtype="bfloat16"))
    assert np.isfinite(res.final_test_auprc[0])
    assert res.final_test_auprc[0] > test["y"].mean()


def test_chunk_callback_counts_early_stopped_epochs_exactly(rng):
    """A trial that early-stops mid-chunk contributes only the epochs it
    actually trained to the callback's window count (ADVICE r4: the old
    chunk-start accounting credited the full chunk)."""
    data = _synthetic_tabular(rng, n=300)
    train = {k: v[:200] for k, v in data.items()}
    test = {k: v[200:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 1, "n_units_l0": 32, "n_units_l1": 16,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    # delta so large no epoch ever improves on the first: the trial stops
    # at epoch patience+1 = 2, inside the single 6-epoch chunk
    cfg = TrainConfig(num_epochs=6, epoch_chunk=6, batch_size=64,
                      patience=1, delta=10.0)
    calls = []
    res = engine.fit(spec, [hp], [opt], train, test, cfg,
                     chunk_callback=lambda *a: calls.append(a))
    assert res.epochs_run[0] == 2
    (ci, n_ep, wall, wpe), = calls
    assert (ci, n_ep) == (0, 6)
    # 2 trained epochs x 200 windows spread over the 6-epoch chunk
    assert wpe == pytest.approx(2 * 200 / 6)


def test_pipeline_chunks_identical_results(rng):
    """cfg.pipeline_chunks overlaps the host fetch with the next chunk's
    device execution; histories, early-stop epochs and params must be
    IDENTICAL to the sequential path (same programs, same order)."""
    data = _synthetic_tabular(rng, n=400)
    train = {k: v[:300] for k, v in data.items()}
    test = {k: v[300:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=16)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 2, "n_units_l0": 64, "n_units_l1": 32,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.2,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    seq_cfg = TrainConfig(num_epochs=9, epoch_chunk=3, batch_size=64,
                          patience=2)
    pip_cfg = TrainConfig(num_epochs=9, epoch_chunk=3, batch_size=64,
                          patience=2, pipeline_chunks=True)
    a = engine.fit(spec, [hp, hp], [opt, opt], train, test, seq_cfg)
    calls = []
    b = engine.fit(spec, [hp, hp], [opt, opt], train, test, pip_cfg,
                   chunk_callback=lambda *c: calls.append(c))
    assert a.auprc_test == b.auprc_test
    assert a.auprc_train == b.auprc_train
    assert a.epochs_run == b.epochs_run
    import jax
    for la, lb in zip(jax.tree.leaves(a.params), jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    # every dispatched chunk was processed exactly once, in order
    assert [c[0] for c in calls] == list(range(len(calls)))


def test_fused_embrace_auto_resolution():
    """fused_embrace=None resolves per PALLAS_BENCH_r5's measured regime:
    on only for single-trial EmbraceNet programs at batch<=256 on a real
    TPU backend (meshless); explicit True/False always wins."""
    import jax

    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=12)
    flat = space.sample_params("EmbraceNetMultimodal",
                               np.random.default_rng(0))
    hp = space.params_to_hp("EmbraceNetMultimodal", flat)
    on_tpu = jax.default_backend() == "tpu"

    auto = engine._resolve_statics(spec, [hp], TrainConfig(batch_size=100))
    assert auto.get("fused_embrace", False) == on_tpu  # off on CPU runners

    # multi-trial populations and big batches never auto-fuse
    multi = engine._resolve_statics(spec, [hp, hp], TrainConfig(batch_size=100))
    assert "fused_embrace" not in multi
    big = engine._resolve_statics(spec, [hp], TrainConfig(batch_size=1024))
    assert "fused_embrace" not in big
    meshed = engine._resolve_statics(spec, [hp], TrainConfig(batch_size=100),
                                     mesh=object())
    assert "fused_embrace" not in meshed

    # explicit override beats auto in both directions
    forced = engine._resolve_statics(spec, [hp, hp],
                                     TrainConfig(fused_embrace=True))
    assert forced.get("fused_embrace") is True
    off = engine._resolve_statics(spec, [hp],
                                  TrainConfig(batch_size=100,
                                              fused_embrace=False))
    assert "fused_embrace" not in off
