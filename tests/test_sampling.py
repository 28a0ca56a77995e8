import numpy as np
import pytest

from embracenet_tpu.data import sampling
from embracenet_tpu.data.codec import complement_codes


def _imbalanced(rng, n=500, ratio=0.05, d=6):
    y = np.zeros(n, np.int64)
    y[:int(n * ratio / (1 + ratio))] = 1
    x = rng.normal(size=(n, d))
    x[y == 1] += 2.0
    return x, y


def test_imbalance_math():
    y = np.array([1] * 10 + [0] * 100)
    assert sampling.get_imbalance(y) == 0.1
    assert sampling.get_ir(y) == 10.0
    # from ratio 0.05 to 0.1 with 100 neg: need 10 - 5 = 5 new positives
    assert sampling.compute_rebalancing_obs(0.1, n_pos=5, n_neg=100) == 5
    # overbalanced: negatives needed
    assert sampling.compute_rebalancing_obs(0.1, n_pos=50, n_neg=100) == 400


def test_smote_reaches_target_ratio(rng):
    x, y = _imbalanced(rng)
    x2, y2 = sampling.data_rebalancing(x, y, sequence=False,
                                       type_augm_genfeatures="smote")
    assert sampling.get_imbalance(y2, n_decim=2) == pytest.approx(0.1, abs=0.01)
    # originals preserved as prefix
    np.testing.assert_array_equal(x2[:len(x)], x)
    # synthetic rows lie within the positive-class region (interpolations)
    synth = x2[len(x):]
    assert synth[:, 0].mean() > 1.0
    assert synth[:, 0].min() >= x[y == 1, 0].min() - 1e-9
    assert synth[:, 0].max() <= x[y == 1, 0].max() + 1e-9


def test_double_rebalance(rng):
    x, y = _imbalanced(rng)
    x2, y2 = sampling.data_rebalancing(x, y, sequence=False,
                                       type_augm_genfeatures="double")
    assert sampling.get_imbalance(y2, n_decim=2) == pytest.approx(0.1, abs=0.01)
    # added rows are copies of positives
    extra = x2[len(x):]
    pos_set = {tuple(r) for r in x[y == 1]}
    assert all(tuple(r) in pos_set for r in extra[:20])


def test_reverse_strand_rebalance(rng):
    codes = rng.integers(0, 4, size=(400, 16)).astype(np.uint8)
    y = np.zeros(400, np.int64)
    y[:20] = 1
    c2, y2 = sampling.data_rebalancing(codes, y, sequence=True)
    assert sampling.get_imbalance(y2, n_decim=2) == 0.1
    extra = c2[len(codes):]
    comp_set = {tuple(r) for r in complement_codes(codes[:20])}
    assert all(tuple(r) in comp_set for r in extra[:10])


def test_rebalancing_noop_when_balanced(rng):
    x = rng.normal(size=(100, 3))
    y = np.array([1] * 30 + [0] * 70)
    x2, y2 = sampling.data_rebalancing(x, y)
    assert x2 is x and y2 is y


def test_reverse_strand_augment_balanced_doubles(rng):
    codes = rng.integers(0, 4, size=(100, 8)).astype(np.uint8)
    y = np.array([1] * 30 + [0] * 70)
    c2, y2 = sampling.data_augmentation(codes, y, sequence=True)
    assert len(c2) == 200
    assert (y2 == 1).sum() == 60


def test_reverse_strand_augment_imbalanced_caps_negatives(rng):
    codes = rng.integers(0, 4, size=(1050, 8)).astype(np.uint8)
    y = np.zeros(1050, np.int64)
    y[:50] = 1
    c2, y2 = sampling.data_augmentation(codes, y, sequence=True)
    assert sampling.get_imbalance(y2, n_decim=2) == 0.1
    assert (y2 == 1).sum() == 100


def test_smote_augmentation_doubles(rng):
    x, y = _imbalanced(rng, ratio=0.3)
    x2, y2 = sampling.data_augmentation(x, y, sequence=False)
    assert len(x2) == 2 * len(x)


def test_smote_augmentation_imbalanced_hits_ratio(rng):
    x, y = _imbalanced(rng, ratio=0.05)
    x2, y2 = sampling.data_augmentation(x, y, sequence=False)
    assert sampling.get_imbalance(y2, n_decim=2) == 0.1
    assert (y2 == 1).sum() == 2 * (y == 1).sum()
