import jax
import numpy as np
import pytest

from embracenet_tpu.parallel import mesh as M


def test_make_mesh_shapes():
    m = M.make_mesh(n_trial=4, n_data=2)
    assert dict(m.shape) == {"trial": 4, "data": 2}
    m2 = M.make_mesh()  # all devices on trial
    assert m2.shape["trial"] == len(jax.devices())
    with pytest.raises(ValueError):
        M.make_mesh(n_trial=3, n_data=3)


def test_shard_population_places_leading_axis():
    m = M.make_mesh(n_trial=8, n_data=1)
    tree = {"w": np.zeros((8, 16), np.float32),
            "b": np.zeros((8,), np.float32)}
    (sharded,) = M.shard_population(m, tree)
    sh = sharded["w"].sharding
    assert sh.spec[0] == "trial"
    # each device holds one trial's slice
    assert sharded["w"].addressable_shards[0].data.shape == (1, 16)


def test_batch_sharding_splits_width():
    m = M.make_mesh(n_trial=2, n_data=4)
    plan = np.zeros((6, 32), np.int32)
    arr = jax.device_put(plan, M.batch_sharding(m))
    assert arr.addressable_shards[0].data.shape == (6, 8)


def test_fit_mesh_pads_nondivisible_population(rng):
    """A 3-trial population on an 8-wide trial axis is padded with replicas
    of the last trial inside ``engine.fit``; results cover only the real
    population and match the unsharded run."""
    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    m = M.make_mesh(n_trial=8, n_data=1)
    data = {"ffnn": rng.normal(size=(40, 4)).astype(np.float32),
            "y": (rng.random(40) < 0.4).astype(np.int64)}
    spec = get_spec("FFNN", in_features_ffnn=4)
    hps, opts = [], []
    for t in range(3):
        flat = space.sample_params("FFNN", np.random.default_rng(t))
        flat["dropout_l0"] = 0.0
        hps.append(space.params_to_hp("FFNN", flat))
        opts.append(space.optimizer_hp(flat))
    cfg = TrainConfig(num_epochs=1, epoch_chunk=1, batch_size=20)
    r_mesh = engine.fit(spec, hps, opts, data, data, cfg,
                        key=jax.random.PRNGKey(3), mesh=m)
    r_plain = engine.fit(spec, hps, opts, data, data, cfg,
                         key=jax.random.PRNGKey(3))
    assert len(r_mesh.final_test_auprc) == 3
    np.testing.assert_allclose(r_mesh.final_test_auprc,
                               r_plain.final_test_auprc, atol=1e-4)


def test_mesh_fit_matches_unsharded(rng):
    """Sharding over ('trial','data') must not change training results:
    same seeds => same per-epoch metrics as the unsharded run."""
    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    d = 12
    data = {"ffnn": rng.normal(size=(200, d)).astype(np.float32),
            "y": (rng.random(200) < 0.4).astype(np.int64)}
    train = {k: v[:150] for k, v in data.items()}
    test = {k: v[150:] for k, v in data.items()}
    spec = get_spec("FFNN", in_features_ffnn=d)
    hps, opts = [], []
    for t in range(2):
        flat = space.sample_params("FFNN", np.random.default_rng(t))
        flat["dropout_l0"] = 0.0  # deterministic layer 0 for tight tolerance
        hps.append(space.params_to_hp("FFNN", flat))
        opts.append(space.optimizer_hp(flat))
    cfg = TrainConfig(num_epochs=3, epoch_chunk=3, batch_size=50)

    r_plain = engine.fit(spec, hps, opts, train, test, cfg,
                         key=jax.random.PRNGKey(5))
    mesh = M.make_mesh(n_trial=2, n_data=4)
    r_mesh = engine.fit(spec, hps, opts, train, test, cfg,
                        key=jax.random.PRNGKey(5), mesh=mesh)
    for t in range(2):
        np.testing.assert_allclose(r_mesh.auprc_test[t],
                                   r_plain.auprc_test[t], atol=1e-4)
        np.testing.assert_allclose(r_mesh.auprc_train[t],
                                   r_plain.auprc_train[t], atol=1e-4)


def test_kfold_cv_mesh_matches_meshless(rng, tmp_path):
    """Production path: KfoldCV(mesh=...) — fused folds, width buckets,
    population padding (6 HPO trials / 3 retrains on a 4-wide trial axis) —
    must reproduce the meshless fused run's scores."""
    from embracenet_tpu.config import CVConfig, TrainConfig
    from embracenet_tpu.training.cv import KfoldCV

    n, d = 90, 8
    y = (rng.random(n) < 0.3).astype(np.int64)
    w = rng.normal(size=d)
    data = {"ffnn": (rng.normal(size=(n, d))
                     + np.outer(y * 2.0 - 1.0, w) * 0.8).astype(np.float32),
            "y": y}
    cv_cfg = CVConfig(n_folds=3, n_trials=2, sampler="random",
                      fuse_folds=True)
    t_cfg = TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=20,
                        width_buckets=True)

    def run(mesh, sub):
        cv = KfoldCV()
        return cv(data, "FFNN", task="active_P_vs_inactive_P",
                  cell_line="K562", cv_cfg=cv_cfg, train_cfg=t_cfg,
                  storage=str(tmp_path / f"{sub}.db"),
                  checkpoint_dir=str(tmp_path / sub),
                  resume=False, verbose=False, mesh=mesh)

    plain = run(None, "plain")
    meshed = run(M.make_mesh(n_trial=4, n_data=2), "mesh")
    np.testing.assert_allclose(meshed["final_test_AUPRC_scores"],
                               plain["final_test_AUPRC_scores"], atol=5e-3)


def test_api_resolve_mesh():
    from embracenet_tpu.api import resolve_mesh
    from embracenet_tpu.config import MeshConfig

    assert resolve_mesh(None) is None
    assert resolve_mesh(MeshConfig()) is None          # 1x1 -> single device
    m = resolve_mesh(MeshConfig(trial_axis=4, data_axis=2))
    assert dict(m.shape) == {"trial": 4, "data": 2}
    assert resolve_mesh(m) is m                        # Mesh passes through
    auto = resolve_mesh("auto")
    assert auto.shape["trial"] == len(jax.devices())


def test_make_mesh_dcn_axes():
    import jax

    from embracenet_tpu.parallel.mesh import (
        make_mesh, trial_device_count, trial_sharding)

    devs = jax.devices()[:8]
    mesh = make_mesh(n_trial=2, n_data=2, n_dcn=2, devices=devs)
    assert mesh.axis_names == ("dcn", "trial", "data")
    assert dict(mesh.shape) == {"dcn": 2, "trial": 2, "data": 2}
    assert trial_device_count(mesh) == 4
    # population sharding spreads over dcn x trial
    spec = trial_sharding(mesh).spec
    assert spec == jax.sharding.PartitionSpec(("dcn", "trial"))


def test_dcn_mesh_fit_matches_flat_mesh(rng):
    """('dcn','trial','data') sharding (single process, 8 CPU devices) gives
    the same per-trial results as the flat ('trial','data') mesh."""
    import __graft_entry__ as ge

    from embracenet_tpu.parallel.mesh import make_mesh

    flat = ge._mh_fit(make_mesh(n_trial=4, n_data=2))
    dcn = ge._mh_fit(make_mesh(n_trial=2, n_data=2, n_dcn=2))
    assert dcn == flat


def test_dryrun_multihost_two_processes():
    """Full 2-process jax.distributed dry run (spawns subprocesses)."""
    import __graft_entry__ as ge

    ge.dryrun_multihost(n_processes=2, n_local_devices=4)


def test_fit_mesh_low_precision_state(rng):
    """bf16 moments + bf16 live params/f32 master compose with the mesh
    path (host init -> global_from_host_local shards the master alongside
    params); scores stay finite and the returned params are the f32
    master."""
    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    m = M.make_mesh(n_trial=4, n_data=2)
    data = {"ffnn": rng.normal(size=(48, 6)).astype(np.float32),
            "y": (rng.random(48) < 0.4).astype(np.int64)}
    spec = get_spec("FFNN", in_features_ffnn=6)
    hps, opts = [], []
    for t in range(4):
        flat = space.sample_params("FFNN", np.random.default_rng(t))
        flat["dropout_l0"] = 0.0
        hps.append(space.params_to_hp("FFNN", flat))
        opts.append(space.optimizer_hp(flat))
    cfg = TrainConfig(num_epochs=2, epoch_chunk=2, batch_size=16,
                      optim_dtype="bfloat16", param_dtype="bfloat16")
    res = engine.fit(spec, hps, opts, data, data, cfg,
                     key=jax.random.PRNGKey(5), mesh=m)
    assert all(np.isfinite(res.final_test_auprc))
    assert all(leaf.dtype == np.float32
               for leaf in jax.tree.leaves(res.params))
