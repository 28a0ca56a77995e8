"""Metric equivalence against sklearn oracles (argmax-AUPRC quirk included:
reference computes average_precision_score on hard argmax predictions,
models/utils/utils.py:82-88).

Oracle calls go through ``goldens.oracle``: live sklearn when importable,
committed ``tests/goldens/*.npz`` fixtures when the install is broken."""

import numpy as np
import pytest
from goldens import oracle

from embracenet_tpu.ops import metrics


def _logits_from_pred(pred):
    """Logits whose argmax equals pred."""
    b = len(pred)
    logits = np.zeros((b, 2), np.float32)
    logits[np.arange(b), pred] = 1.0
    return logits


@pytest.mark.parametrize("seed", range(8))
def test_auprc_argmax_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    target = (rng.random(64) < 0.3).astype(np.int64)
    pred = (rng.random(64) < 0.4).astype(np.int64)
    if target.sum() == 0:
        target[0] = 1

    def compute():
        from sklearn.metrics import average_precision_score

        return {"want": average_precision_score(target, pred)}

    want = float(oracle(f"metrics_auprc_argmax_seed{seed}", "sklearn",
                        compute)["want"])
    got = float(metrics.auprc_from_binary_pred(np.asarray(pred),
                                               np.asarray(target)))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("pred_value", [0, 1])
def test_auprc_argmax_degenerate_preds(pred_value):
    rng = np.random.default_rng(1)
    target = (rng.random(50) < 0.2).astype(np.int64)
    target[0] = 1
    pred = np.full(50, pred_value)

    def compute():
        from sklearn.metrics import average_precision_score

        return {"want": average_precision_score(target, pred)}

    want = float(oracle(f"metrics_auprc_degen_{pred_value}", "sklearn",
                        compute)["want"])
    got = float(metrics.auprc_from_binary_pred(pred, target))
    assert got == pytest.approx(want, abs=1e-6)


def test_auprc_no_positives_is_zero():
    # sklearn yields NaN; reference maps NaN -> 0 (models/utils/utils.py:86)
    target = np.zeros(10, np.int64)
    pred = np.ones(10, np.int64)
    assert float(metrics.auprc_from_binary_pred(pred, target)) == 0.0


def test_auprc_mask_equals_trimmed():
    rng = np.random.default_rng(3)
    target = (rng.random(40) < 0.3).astype(np.int64)
    target[:3] = 1
    pred = (rng.random(40) < 0.5).astype(np.int64)
    mask = np.concatenate([np.ones(25), np.zeros(15)])
    got = float(metrics.auprc_from_binary_pred(pred, target, mask))
    want = float(metrics.auprc_from_binary_pred(pred[:25], target[:25]))
    assert got == pytest.approx(want, abs=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_auprc_prob_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    target = (rng.random(64) < 0.3).astype(np.int64)
    target[0] = 1
    scores = rng.random(64).astype(np.float32)
    if seed % 2:  # exercise ties
        scores = np.round(scores, 1)

    def compute():
        from sklearn.metrics import average_precision_score

        return {"want": average_precision_score(target, scores)}

    want = float(oracle(f"metrics_auprc_prob_seed{seed}", "sklearn",
                        compute)["want"])
    got = float(metrics.auprc_prob(scores, target))
    assert got == pytest.approx(want, abs=1e-5)


@pytest.mark.parametrize("seed", range(5))
def test_f1_precision_recall_macro(seed):
    rng = np.random.default_rng(seed)
    target = (rng.random(64) < 0.4).astype(np.int64)
    pred = (rng.random(64) < 0.5).astype(np.int64)
    logits = _logits_from_pred(pred)

    def compute():
        from sklearn.metrics import precision_recall_fscore_support

        return {"want": np.asarray(precision_recall_fscore_support(
            target, pred, average="macro", zero_division=0)[:3])}

    want = oracle(f"metrics_prf_seed{seed}", "sklearn", compute)["want"]
    got = np.asarray(metrics.f1_precision_recall(logits, target))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_accuracy():
    target = np.array([0, 1, 1, 0])
    logits = _logits_from_pred(np.array([0, 1, 0, 0]))
    assert float(metrics.accuracy(logits, target)) == pytest.approx(0.75)


@pytest.mark.parametrize("seed", range(5))
def test_auroc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    target = (rng.random(64) < 0.3).astype(np.int64)
    target[0], target[1] = 1, 0
    scores = rng.random(64).astype(np.float32)
    if seed % 2:
        scores = np.round(scores, 1)  # ties

    def compute():
        from sklearn.metrics import roc_auc_score

        return {"want": roc_auc_score(target, scores)}

    want = float(oracle(f"metrics_auroc_seed{seed}", "sklearn",
                        compute)["want"])
    got = float(metrics.auroc(scores, target))
    assert got == pytest.approx(want, abs=1e-5)


def test_auroc_mask_equals_trimmed():
    rng = np.random.default_rng(3)
    target = (rng.random(40) < 0.4).astype(np.int64)
    target[:2] = [1, 0]
    scores = rng.random(40).astype(np.float32)
    mask = np.concatenate([np.ones(25), np.zeros(15)])
    got = float(metrics.auroc(scores, target, mask))
    want = float(metrics.auroc(scores[:25], target[:25]))
    assert got == pytest.approx(want, abs=1e-5)
