"""Jitted population init (engine._pop_init) must be bit-identical to the
per-trial eager init it replaces.

The eager path builds each trial's params with concrete fan-ins; the traced
path stacks fan-ins as data and initialises the whole population in one
jitted vmap (engine.py `_pop_init`).  JAX's threefry PRNG is functional per
key and the fan-ins enter only as multiplicative scale factors, so the two
must agree exactly — any drift here silently breaks torch-init parity
(reference ctors: `BIOINF_tesi/models/FF_net.py:18-46`, `CNN_net.py:26-57`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embracenet_tpu.config import TrainConfig
from embracenet_tpu.hpo import space
from embracenet_tpu.training import engine
from embracenet_tpu.training.modelspec import get_spec

D_FFNN = 24


def _population(model, n_trials, seed=0):
    rng = np.random.default_rng(seed)
    flats = [space.sample_params(model, rng) for _ in range(n_trials)]
    hps = [space.params_to_hp(model, f) for f in flats]
    opts = [space.optimizer_hp(f) for f in flats]
    return hps, opts


@pytest.mark.parametrize("model", [
    "FFNN", "CNN", "EmbraceNetMultimodal", "ConcatNetMultimodal"])
def test_traced_init_bitwise_equals_eager(model):
    spec = get_spec(model, in_features_ffnn=D_FFNN)
    assert spec.init_traced is not None and spec.fan_ins is not None
    hps, _ = _population(model, n_trials=4, seed=1)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)

    eager = [spec.init(keys[t], hps[t]) for t in range(4)]
    eager_p = engine.stack_trials([e[0] for e in eager])
    eager_b = engine.stack_trials([e[1] for e in eager])

    fans = [spec.fan_ins(h) for h in hps]
    fans = jax.tree.map(lambda *xs: np.stack(xs), *fans)
    traced_p, traced_b = engine._pop_init(spec)(keys, fans)

    for path_eager, path_traced in zip(
            jax.tree_util.tree_leaves_with_path(eager_p),
            jax.tree_util.tree_leaves_with_path(traced_p)):
        assert path_eager[0] == path_traced[0]
        np.testing.assert_array_equal(
            np.asarray(path_eager[1]), np.asarray(path_traced[1]),
            err_msg=f"{model} param {jax.tree_util.keystr(path_eager[0])}")
    for le, lt in zip(jax.tree_util.tree_leaves(eager_b),
                      jax.tree_util.tree_leaves(traced_b)):
        np.testing.assert_array_equal(np.asarray(le), np.asarray(lt))


def test_fit_identical_with_and_without_traced_init():
    """engine.fit must produce the same training trajectory whether the
    population initialises through the jitted vmap or trial-by-trial."""
    rng = np.random.default_rng(3)
    n, d = 400, D_FFNN
    y = (rng.random(n) < 0.3).astype(np.int64)
    x = (rng.normal(size=(n, d)) +
         np.outer(y * 2.0 - 1.0, rng.normal(size=d)) * 0.7).astype(np.float32)
    train = {"ffnn": x[:300], "y": y[:300]}
    test = {"ffnn": x[300:], "y": y[300:]}

    spec = get_spec("FFNN", in_features_ffnn=d)
    hps, opts = _population("FFNN", n_trials=3, seed=5)
    cfg = TrainConfig(num_epochs=3, epoch_chunk=3, batch_size=64,
                      patience=10)

    res_traced = engine.fit(spec, hps, opts, train, test, cfg)

    import dataclasses
    spec_eager = dataclasses.replace(spec, init_traced=None)
    res_eager = engine.fit(spec_eager, hps, opts, train, test, cfg)

    np.testing.assert_allclose(np.asarray(res_traced.auprc_test),
                               np.asarray(res_eager.auprc_test),
                               rtol=0, atol=0)
    for lt, le in zip(jax.tree_util.tree_leaves(res_traced.params),
                      jax.tree_util.tree_leaves(res_eager.params)):
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(le))
