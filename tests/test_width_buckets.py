"""Width-bucketed (statically sliced) supernets must equal the full supernet.

Slicing weights to the population's per-layer width maxima is exact because
masked features beyond any trial's width are zero and valid features are a
prefix of every layout (models/cnn.py docstring).  Dropout rates are 0 here:
rate-0 dropout is an exact pass-through, while nonzero rates draw RNG masks
whose shape differs between bucketed and full programs (distributionally
identical, bitwise different).  The embracement draw is made shape-stable by
drawing at full width and slicing (models/embracenet.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.hpo import space
from embracenet_tpu.training import engine
from embracenet_tpu.training.modelspec import get_spec


def _no_dropout(flat):
    return {k: (0.0 if k.endswith(tuple(f"dropout_l{i}" for i in range(4)))
                or "dropout" in k else v) for k, v in flat.items()}


def _hp_pop(model, rng, n=2):
    hps = []
    for _ in range(n):
        flat = _no_dropout(space.sample_params(model, rng))
        hps.append(space.params_to_hp(model, flat))
    return hps


def _inputs(spec, rng, b=12, d=10):
    out = {}
    if "ffnn" in spec.inputs:
        out["ffnn"] = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    if "cnn" in spec.inputs:
        out["cnn"] = jnp.asarray(
            rng.integers(0, 4, size=(b, 256)).astype(np.uint8))
    return out


@pytest.mark.parametrize("model", ["FFNN", "CNN", "EmbraceNetMultimodal",
                                   "ConcatNetMultimodal"])
@pytest.mark.parametrize("train", [False, True])
def test_sliced_equals_full(model, train, rng):
    spec = get_spec(model, in_features_ffnn=10)
    hps = _hp_pop(model, rng)
    statics = spec.statics(hps)
    # make sure this population actually gets sliced (not already maximal)
    inputs = _inputs(spec, rng)
    mask = jnp.ones(12, np.float32)
    for t, hp in enumerate(hps):
        params, bn = spec.init(jax.random.PRNGKey(7 + t), hp)
        key = jax.random.PRNGKey(42)
        full, bn_full = spec.apply(params, bn, hp, inputs, train, key, mask,
                                   None, {k: v for k, v in statics.items()
                                          if k == "cnn_max_depth"})
        sliced, bn_sliced = spec.apply(params, bn, hp, inputs, train, key,
                                       mask, None, statics)
        np.testing.assert_allclose(np.asarray(sliced), np.asarray(full),
                                   rtol=2e-4, atol=2e-5)
        if train and bn_full:
            # BN running stats must match on the layers this trial USES and
            # on the bucket's channels — the only state any trial can read
            # back (reload/retrain keep a trial's own bn_state, and layers
            # beyond its depth do not exist in the reference architecture).
            # Dead state diverges by design: the full program momentum-decays
            # garbage for unused layers/channels, the sliced one truncates.
            mc = statics["cnn_max_channels"]
            cnn_hp = hp["cnn"] if "ffnn" in spec.inputs else hp
            depth = int(cnn_hp["n_layers"])
            for li, layer in enumerate(sorted(bn_full)):
                if li >= depth:
                    continue
                c = mc[li] if li < len(mc) else None
                for leaf in bn_full[layer]:
                    np.testing.assert_allclose(
                        np.asarray(bn_sliced[layer][leaf])[:c],
                        np.asarray(bn_full[layer][leaf])[:c],
                        rtol=2e-4, atol=2e-5)


def test_statics_values(rng):
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=10)
    mk = {
        "FFNN_n_layers": 2, "FFNN_n_units_l0": 64, "FFNN_n_units_l1": 32,
        "FFNN_n_units_l2": 64, "FFNN_n_units_l3": 32,  # beyond depth: ignored
        "CNN_n_layers": 2, "CNN_out_channels_l0": 32, "CNN_out_channels_l1": 64,
        "CNN_out_channels_l2": 256, "CNN_out_channels_l3": 512,  # ignored
        "CNN_kernel_size_l0": 5, "CNN_kernel_size_l1": 11,
        "EMBRACENET_embracement_size": 768, "n_post_layers": 1,
        "EMBRACENET_n_units_l0": 128, "EMBRACENET_n_units_l1": 256,  # l1 ignored
        "selection_probabilities_FFNN": 0.4,
    }
    hp = space.params_to_hp("EmbraceNetMultimodal", mk)
    st = spec.statics([hp])
    assert st["cnn_max_depth"] == 2
    assert st["cnn_max_channels"][:2] == (32, 64)
    assert st["cnn_max_kernels"][:2] == (5, 11)
    assert st["ffnn_max_width"] == 64
    assert st["embrace_max"] == 768
    assert st["post_max"] == 128


def test_fit_width_buckets_identical(rng):
    """engine.fit with width_buckets=True reproduces the full-supernet run
    bit-for-bit on a dropout-free FFNN population."""
    y = (rng.random(260) < 0.3).astype(np.int64)
    w = rng.normal(size=12)
    x = (rng.normal(size=(260, 12)) + np.outer(y * 2 - 1, w) * 0.7).astype(
        np.float32)
    data = {"ffnn": x, "y": y}
    train = {k: v[:200] for k, v in data.items()}
    test = {k: v[200:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=12)
    flat = {"n_layers": 2, "n_units_l0": 64, "n_units_l1": 16,
            "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
            "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0}
    hp = space.params_to_hp("FFNN", flat)
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    r_full = engine.fit(spec, [hp], [opt], train, test,
                        TrainConfig(num_epochs=5, batch_size=64))
    r_bkt = engine.fit(spec, [hp], [opt], train, test,
                       TrainConfig(num_epochs=5, batch_size=64,
                                   width_buckets=True))
    np.testing.assert_allclose(r_bkt.auprc_test[0], r_full.auprc_test[0],
                               rtol=1e-5)
    np.testing.assert_allclose(r_bkt.auprc_train[0], r_full.auprc_train[0],
                               rtol=1e-5)


def test_plan_buckets_splits_wide_from_narrow():
    from embracenet_tpu.training.bucketing import flops_of_statics, plan_buckets

    spec = get_spec("CNN")

    def hp(depth, chans):
        flat = {"n_layers": depth, "dropout_l0": 0.0}
        for i, c in enumerate(chans):
            flat[f"out_channels_l{i}"] = c
            flat[f"kernel_size_l{i}"] = 5
            flat[f"dropout_l{i}"] = 0.0
        return space.params_to_hp("CNN", flat)

    narrow = [hp(1, [16]), hp(1, [32]), hp(2, [16, 32])]
    wide = [hp(4, [64, 96, 256, 512])]
    groups = plan_buckets(spec, "CNN", narrow + wide, max_groups=3)
    assert len(groups) >= 2
    assert sorted(sum(groups, [])) == [0, 1, 2, 3]
    # the wide trial (index 3) must not share a group with a depth-1 trial
    wide_group = next(g for g in groups if 3 in g)
    assert 0 not in wide_group and 1 not in wide_group
    # and the planned cost beats one monolithic group
    mono = 4 * flops_of_statics("CNN", spec.statics(narrow + wide))
    split = sum(len(g) * flops_of_statics(
        "CNN", spec.statics([(narrow + wide)[i] for i in g])) for g in groups)
    assert split < 0.7 * mono


def test_plan_buckets_identical_trials_stay_together():
    from embracenet_tpu.training.bucketing import plan_buckets

    spec = get_spec("CNN")
    flat = {"n_layers": 2, "out_channels_l0": 32, "out_channels_l1": 64,
            "kernel_size_l0": 5, "kernel_size_l1": 5, "dropout_l0": 0.0,
            "dropout_l1": 0.0}
    hp = space.params_to_hp("CNN", flat)
    groups = plan_buckets(spec, "CNN", [hp] * 4)
    assert len(groups) == 1  # no gain -> no split


def test_run_search_width_buckets(tmp_path, rng):
    """Grouped sub-population search completes with correct trial accounting
    and per-trial checkpoints."""
    from embracenet_tpu.hpo.search import run_search

    y = (rng.random(240) < 0.3).astype(np.int64)
    x = rng.normal(size=(240, 10)).astype(np.float32)
    x[y == 1, :3] += 1.0
    data = {"ffnn": x, "y": y}
    train = {k: v[:180] for k, v in data.items()}
    val = {k: v[180:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=10)
    res = run_search(spec, "FFNN", train, val, "wb_1",
                     storage=str(tmp_path / "s.db"), sampler="random",
                     n_trials=4,
                     train_cfg=TrainConfig(num_epochs=3, batch_size=60,
                                           width_buckets=True),
                     checkpoint_dir=str(tmp_path), seed=3)
    assert res.n_complete == 4
    assert np.isfinite(res.best_value)
    assert res.best_model is not None


@pytest.mark.parametrize("model", ["FFNN", "CNN", "EmbraceNetMultimodal",
                                   "ConcatNetMultimodal"])
def test_shrink_grow_roundtrip(model, rng):
    """grow(shrink(x)) restores full shapes and preserves every value inside
    the bucket region; shrunk apply == full apply (logits)."""
    from embracenet_tpu.training import slicing

    spec = get_spec(model, in_features_ffnn=10)
    hps = _hp_pop(model, rng)
    statics = spec.statics(hps)
    params, bn = spec.init(jax.random.PRNGKey(3), hps[0])
    sp, sb = slicing.shrink(model, params, bn, statics)
    gp, gb = slicing.grow(model, sp, sb, statics)
    # full shapes restored
    for full, grown in zip(jax.tree.leaves(params), jax.tree.leaves(gp)):
        assert full.shape == grown.shape
    # bucket region round-trips exactly
    sp2, sb2 = slicing.shrink(model, gp, gb, statics)
    for a, b in zip(jax.tree.leaves(sp), jax.tree.leaves(sp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(sb), jax.tree.leaves(sb2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shrunk params through the sliced apply == full params, full apply
    inputs = _inputs(spec, rng)
    mask = jnp.ones(12, np.float32)
    key = jax.random.PRNGKey(11)
    full_logits, _ = spec.apply(params, bn, hps[0], inputs, False, key, mask,
                                None, {k: v for k, v in statics.items()
                                       if k == "cnn_max_depth"})
    shrunk_logits, _ = spec.apply(sp, sb, hps[0], inputs, False, key, mask,
                                  None, statics)
    np.testing.assert_allclose(np.asarray(shrunk_logits),
                               np.asarray(full_logits), rtol=2e-4, atol=2e-5)


def test_fit_multimodal_width_buckets_smoke(rng):
    """EmbraceNet population trains with shrink/grow active; checkpoint
    layout (full shapes) is preserved in the result."""
    tab = rng.normal(size=(120, 12)).astype(np.float32)
    seq = rng.integers(0, 4, size=(120, 256)).astype(np.uint8)
    y = (rng.random(120) < 0.3).astype(np.int64)
    data = {"ffnn": tab, "cnn": seq, "y": y}
    train = {k: v[:90] for k, v in data.items()}
    test = {k: v[90:] for k, v in data.items()}
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=12)
    flats = [_no_dropout(space.sample_params("EmbraceNetMultimodal", rng))
             for _ in range(2)]
    for f in flats:
        f["CNN_n_layers"] = 1
    hps = [space.params_to_hp("EmbraceNetMultimodal", f) for f in flats]
    opts = [space.optimizer_hp(f) for f in flats]
    res = engine.fit(spec, hps, opts, train, test,
                     TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=45,
                                 width_buckets=True))
    assert all(np.isfinite(res.final_test_auprc))
    ref_params, _ = spec.init(jax.random.PRNGKey(0), hps[0])
    for full, got in zip(jax.tree.leaves(ref_params),
                         jax.tree.leaves(jax.tree.map(
                             lambda a: np.asarray(a)[0], res.params))):
        assert full.shape == got.shape


def test_width_buckets_with_master_params(rng):
    """param_dtype=bfloat16's f32 master lives in the optimizer state at
    BUCKET shapes; the end-of-fit grow must restore the full supernet
    layout from the master, and scores must track the f32 bucketed run."""
    import jax

    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    n, d = 300, 10
    y = (rng.random(n) < 0.35).astype(np.int64)
    w = rng.normal(size=d)
    x = (rng.normal(size=(n, d)) + np.outer(y * 2 - 1, w)).astype(np.float32)
    train = {"ffnn": x[:220], "y": y[:220]}
    test = {"ffnn": x[220:], "y": y[220:]}
    spec = get_spec("FFNN", in_features_ffnn=d)
    hp = space.params_to_hp("FFNN", {
        "n_layers": 1, "n_units_l0": 32, "n_units_l1": 16,
        "n_units_l2": 4, "n_units_l3": 4, "dropout_l0": 0.0,
        "dropout_l1": 0.0, "dropout_l2": 0.0, "dropout_l3": 0.0})
    opt = {"optimizer": np.int32(0), "lr": np.float32(1e-3),
           "weight_decay": np.float32(1e-4)}
    kw = dict(num_epochs=8, batch_size=64, patience=10_000,
              width_buckets=True)
    r32 = engine.fit(spec, [hp], [opt], train, test, TrainConfig(**kw))
    rlp = engine.fit(spec, [hp], [opt], train, test,
                     TrainConfig(**kw, optim_dtype="bfloat16",
                                 param_dtype="bfloat16"))
    leaves = jax.tree.leaves(rlp.params)
    assert all(leaf.dtype == np.float32 for leaf in leaves)
    # grown master has the full supernet layout (same shapes as f32 run)
    for a, b in zip(jax.tree.leaves(r32.params), leaves):
        assert a.shape == b.shape
    assert abs(r32.final_test_auprc[0] - rlp.final_test_auprc[0]) < 0.06
