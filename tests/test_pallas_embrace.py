"""Fused embracement kernel vs the unfused path (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embracenet_tpu.ops.pallas.embrace import fused_embrace

# The TPU interpreter stubs prng_random_bits to zeros, so stochastic
# behaviour is only observable on real hardware (validated manually on the
# TPU chip; see kernel docstring).
tpu_only = pytest.mark.skipif(jax.devices()[0].platform == "cpu",
                              reason="TPU PRNG not emulated in interpreter")


@pytest.fixture
def inputs(rng):
    b, d0, d1, e = 24, 32, 128, 256
    x0 = rng.normal(size=(b, d0)).astype(np.float32)
    x1 = rng.normal(size=(b, d1)).astype(np.float32)
    w0 = rng.normal(size=(d0, e)).astype(np.float32) * 0.1
    b0 = rng.normal(size=(e,)).astype(np.float32) * 0.1
    w1 = rng.normal(size=(d1, e)).astype(np.float32) * 0.1
    b1 = rng.normal(size=(e,)).astype(np.float32) * 0.1
    e_mask = (np.arange(e) < 192).astype(np.float32)
    return x0, x1, w0, b0, w1, b1, e_mask


def _dock(x, w, b):
    return np.maximum(x @ w + b, 0.0)


def test_extremes_match_unfused(inputs):
    x0, x1, w0, b0, w1, b1, e_mask = inputs
    d0 = _dock(x0, w0, b0) * e_mask
    d1 = _dock(x1, w1, b1) * e_mask
    all0 = fused_embrace(x0, x1, w0, b0, w1, b1,
                         np.ones(len(x0), np.float32), e_mask, 3,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(all0), d0, rtol=1e-5, atol=1e-5)
    all1 = fused_embrace(x0, x1, w0, b0, w1, b1,
                         np.zeros(len(x0), np.float32), e_mask, 3,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(all1), d1, rtol=1e-5, atol=1e-5)


@tpu_only
def test_mid_probability_selects_elementwise(inputs):
    x0, x1, w0, b0, w1, b1, e_mask = inputs
    d0 = _dock(x0, w0, b0) * e_mask
    d1 = _dock(x1, w1, b1) * e_mask
    p0 = np.full(len(x0), 0.3, np.float32)
    out = np.asarray(fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, 7,
                                   interpret=True))
    # every active element equals one of the two docked values
    close0 = np.isclose(out, d0, atol=1e-5)
    close1 = np.isclose(out, d1, atol=1e-5)
    active = e_mask > 0
    assert np.all((close0 | close1)[:, active])
    # masked columns are zero
    assert np.all(out[:, ~active] == 0)
    # selection frequency ~ p0 (count only where the values differ)
    differs = ~np.isclose(d0, d1, atol=1e-5) & active[None, :]
    frac0 = (close0 & differs).sum() / differs.sum()
    assert frac0 == pytest.approx(0.3, abs=0.05)


@tpu_only
def test_same_seed_deterministic(inputs):
    x0, x1, w0, b0, w1, b1, e_mask = inputs
    p0 = np.full(len(x0), 0.5, np.float32)
    a = fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, 11, interpret=True)
    b = fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, 11, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, 12, interpret=True)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_gradients_match_manual(inputs):
    x0, x1, w0, b0, w1, b1, e_mask = inputs
    p0 = np.full(len(x0), 0.6, np.float32)

    def loss(w0_, w1_, x0_, x1_):
        out = fused_embrace(x0_, x1_, w0_, b0, w1_, b1, p0, e_mask, 5,
                            interpret=True)
        return jnp.sum(out ** 2)

    g_w0, g_w1, g_x0, g_x1 = jax.grad(loss, argnums=(0, 1, 2, 3))(
        w0, w1, x0, x1)

    # manual: recover the choose mask from the forward values
    out = np.asarray(fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, 5,
                                   interpret=True))
    d0 = _dock(x0, w0, b0) * e_mask
    d1 = _dock(x1, w1, b1) * e_mask
    choose0 = np.isclose(out, d0, atol=1e-6)
    g = 2 * out * e_mask[None, :]
    live = (out > 0)
    g0 = g * (choose0 & live)
    g1 = g * (~choose0 & live)
    np.testing.assert_allclose(np.asarray(g_w0), x0.T @ g0, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_w1), x1.T @ g1, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_x0), g0 @ w0.T, rtol=2e-4,
                               atol=2e-4)


@tpu_only
def test_fused_engine_training_parity(rng):
    """TrainConfig(fused_embrace=True): the Pallas kernel trains inside
    engine.fit and reaches the same quality as the XLA path (same data,
    different RNG stream -> distributional parity on final AUPRC)."""
    import numpy as np

    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    n, d = 400, 16
    y = (rng.random(n) < 0.3).astype(np.int64)
    w = rng.normal(size=d)
    x = (rng.normal(size=(n, d)) + np.outer(y * 2 - 1, w) * 0.9).astype(
        np.float32)
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    data = {"ffnn": x, "cnn": codes, "y": y}
    train = {k: v[:300] for k, v in data.items()}
    test = {k: v[300:] for k, v in data.items()}
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=d)
    flat = space.sample_params("EmbraceNetMultimodal",
                               np.random.default_rng(5))
    flat.update(CNN_n_layers=1, lr=1e-3, optimizer="Adam")
    hp = space.params_to_hp("EmbraceNetMultimodal", flat)
    opt = space.optimizer_hp(flat)
    kw = dict(num_epochs=8, epoch_chunk=8, batch_size=100)
    r_xla = engine.fit(spec, [hp], [opt], train, test, TrainConfig(**kw))
    r_fused = engine.fit(spec, [hp], [opt], train, test,
                         TrainConfig(fused_embrace=True, **kw))
    a_xla, a_fused = max(r_xla.auprc_test[0]), max(r_fused.auprc_test[0])
    assert np.isfinite(a_fused)
    # same signal, same budget: fused must land in the same quality band
    assert abs(a_fused - a_xla) < 0.2, (a_fused, a_xla)


def test_fulle_extremes_match_unfused(inputs):
    """Round-5 full-E blocking (streams x1 exactly once) must compute the
    same docking+select as the original kernel and the unfused path."""
    from embracenet_tpu.ops.pallas.embrace import _fused_fwd_fulle

    x0, x1, w0, b0, w1, b1, e_mask = inputs
    d0 = _dock(x0, w0, b0) * e_mask
    d1 = _dock(x1, w1, b1) * e_mask
    all0, ch = _fused_fwd_fulle(x0, x1, w0, b0, w1, b1,
                                np.ones(len(x0), np.float32), e_mask, 3,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(all0), d0, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(ch) == 1.0)
    all1, ch = _fused_fwd_fulle(x0, x1, w0, b0, w1, b1,
                                np.zeros(len(x0), np.float32), e_mask, 3,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(all1), d1, rtol=1e-5, atol=1e-5)
    assert np.all(np.asarray(ch) == 0.0)
