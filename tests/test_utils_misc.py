import numpy as np
import pytest

from embracenet_tpu.data import splits
from embracenet_tpu.models import utils as mutils
from embracenet_tpu.utils.profiling import StepTimer


def test_split_indices_reference_semantics():
    tr, te = splits.split_indices(100, random_state=123)
    assert len(te) == 25 and len(tr) == 75
    # identical to sklearn with same seed, and index-aligned across views
    tr2, te2 = splits.split_indices(100, random_state=123)
    np.testing.assert_array_equal(tr, tr2)
    trh, val = splits.split_indices(100, hyper_tuning=True, random_state=123)
    assert len(val) == np.ceil(75 * 0.15)
    assert set(val) <= set(tr)


def test_split_data_views_aligned(rng):
    data = {"ffnn": rng.normal(size=(60, 4)).astype(np.float32),
            "cnn": rng.integers(0, 4, size=(60, 16)).astype(np.uint8),
            "y": (rng.random(60) < 0.4).astype(np.int64)}
    tr, te = splits.split_data(data, random_state=1)
    assert len(tr["y"]) == 45 and len(te["y"]) == 15
    assert tr["ffnn"].shape[0] == tr["cnn"].shape[0] == 45


def test_cv_indices():
    folds = splits.cv_indices(30, n_folds=3, random_state=7)
    assert len(folds) == 3
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test.tolist()) == list(range(30))


def test_selection_probabilities():
    res = {"K562": {"t": {"FFNN": {"average_CV_AUPRC": 0.3},
                          "CNN": {"average_CV_AUPRC": 0.2}}}}
    p = mutils.selection_probabilities(res, "K562", "t", batch_size=4)
    assert p.shape == (4, 2)
    np.testing.assert_allclose(p[0], [0.3, 0.2])


def test_drop_last_layers():
    params = {"w0": 1, "b0": 2, "w_head": 3, "b_head": 4, "w_fc1": 5}
    stripped = mutils.drop_last_layers(params, "FFNN")
    assert set(stripped) == {"w0", "b0"}
    with pytest.raises(ValueError):
        mutils.drop_last_layers(params, "LSTM")


def test_parse_printed_params():
    text = """Best trial:
  Value:  0.42
  Params:
    n_layers: 2
    n_units_l0: 64
    lr: 0.0013
    optimizer: Adam
"""
    got = mutils.parse_printed_params(text)
    assert got == {"n_layers": 2, "n_units_l0": 64, "lr": 0.0013,
                   "optimizer": "Adam"}


def test_step_timer():
    t = StepTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2


def test_device_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp

    from embracenet_tpu.utils.profiling import annotate, device_trace

    with device_trace(str(tmp_path)):
        with annotate("matmul"):
            x = jnp.ones((64, 64))
            jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found += files
    assert found, "profiler trace produced no files"
