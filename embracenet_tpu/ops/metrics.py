"""Classification metrics as pure, vmappable JAX ops.

The reference computes AUPRC with
``sklearn.average_precision_score(target, argmax(output))``
(`BIOINF_tesi/models/utils/utils.py:80-86`) — i.e. average precision of the
*hard* argmax prediction, not of probabilities.  With binary scores the PR
curve has exactly two threshold points, so AP collapses to the closed form

    AP = P1 * R1 + prevalence * (1 - R1)

with ``P1 = TP / (TP+FP)`` (0 when no predicted positives), ``R1 = TP / P``
and ``prevalence = P / N``.  When there are no positives sklearn yields NaN
and the reference maps it to 0 (`utils.py:86`).  We reproduce those exact
semantics in :func:`auprc_argmax` (verified against sklearn in
``tests/test_metrics.py``) and additionally provide a probability-based
:func:`auprc_prob` — the statistically sound variant — selectable via config.

All metrics take an optional ``mask`` so padded static-shape batches report
identical values to the reference's ragged batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def _counts(pred, target, mask):
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    tp = jnp.sum(pred * target * mask)
    fp = jnp.sum(pred * (1.0 - target) * mask)
    fn = jnp.sum((1.0 - pred) * target * mask)
    tn = jnp.sum((1.0 - pred) * (1.0 - target) * mask)
    return tp, fp, fn, tn


def auprc_argmax(logits, target, mask=None):
    """Reference-parity AUPRC on argmax predictions (see module docstring)."""
    pred = jnp.argmax(logits, axis=-1)
    return auprc_from_binary_pred(pred, target, mask)


def auprc_from_binary_pred(pred, target, mask=None):
    tp, fp, fn, tn = _counts(pred, target, mask)
    n_pos = tp + fn
    n_tot = tp + fp + fn + tn
    prevalence = jnp.where(n_tot > 0, n_pos / jnp.maximum(n_tot, 1.0), 0.0)
    pp = tp + fp
    p1 = jnp.where(pp > 0, tp / jnp.maximum(pp, 1.0), 0.0)
    r1 = jnp.where(n_pos > 0, tp / jnp.maximum(n_pos, 1.0), 0.0)
    ap = p1 * r1 + prevalence * (1.0 - r1)
    # sklearn -> NaN when no positives; reference maps NaN to 0 (utils.py:86)
    return jnp.where(n_pos > 0, ap, 0.0)


def auprc_prob(scores, target, mask=None):
    """Average precision from continuous scores (sklearn step-interpolation).

    ``scores``: P(class==1), shape [B]. O(B log B) sort-based; vmappable.
    """
    scores = scores.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    # Push masked entries to score -inf so they rank last and contribute 0.
    neg_inf = jnp.finfo(jnp.float32).min
    s = jnp.where(mask > 0, scores, neg_inf)
    order = jnp.argsort(-s)
    t_sorted = jnp.take(target * mask, order)
    m_sorted = jnp.take(mask, order)
    tp_cum = jnp.cumsum(t_sorted)
    pp_cum = jnp.cumsum(m_sorted)
    n_pos = jnp.sum(target * mask)
    precision = tp_cum / jnp.maximum(pp_cum, 1.0)
    recall = tp_cum / jnp.maximum(n_pos, 1.0)
    recall_prev = jnp.concatenate([jnp.zeros(1), recall[:-1]])
    # Only count rows at distinct-threshold boundaries: sklearn evaluates the
    # curve at each unique score; summing (R_i - R_{i-1}) * P_i over *rows* is
    # equivalent because ties share the same cumulative P at the last tied row
    # and intermediate tied rows are weighted by their recall increments with
    # the (incorrect) intermediate precision.  To match sklearn exactly we
    # only emit a point where the next score differs.
    s_sorted = jnp.take(s, order)
    next_s = jnp.concatenate([s_sorted[1:], jnp.full(1, neg_inf)])
    is_boundary = (s_sorted != next_s) & (m_sorted > 0)
    # Recall increment since the previous boundary:
    bound_recall = jnp.where(is_boundary, recall, 0.0)
    # Build stepwise sum: for boundary i, contribution P_i * (R_i - R_{prev bound}).
    # Compute R_{prev bound} via a scan-free trick: the previous boundary's
    # recall equals the cumulative max of boundary recalls *before* i.
    import jax.lax
    r_at_bounds = jnp.where(is_boundary, recall, 0.0)
    r_prev_bound = jnp.concatenate([jnp.full(1, 0.0),
                                    jax.lax.cummax(r_at_bounds)[:-1]])
    contrib = jnp.where(is_boundary, precision * (recall - r_prev_bound), 0.0)
    ap = jnp.sum(contrib)
    return jnp.where(n_pos > 0, ap, 0.0)


def auroc(scores, target, mask=None):
    """Area under the ROC curve from continuous scores (rank statistic:
    P(score_pos > score_neg) with 0.5 credit for ties) — equivalent to
    sklearn.roc_auc_score; O(B log B), vmappable."""
    scores = scores.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    import jax.lax

    neg_inf = jnp.finfo(jnp.float32).min
    s = jnp.where(mask > 0, scores, neg_inf)
    n = s.shape[0]
    # tie-averaged ranks in O(n log n): sort, find runs of equal values,
    # rank of every member of a run = midpoint of the run's positions
    # (an O(n^2) pairwise version would need ~26 GB at dataset scale)
    order = jnp.argsort(s)
    s_sorted = jnp.take(s, order)
    pos = jnp.arange(n, dtype=jnp.float32)
    prev = jnp.concatenate([jnp.full(1, jnp.nan), s_sorted[:-1]])
    is_run_start = s_sorted != prev
    run_first = jax.lax.cummax(jnp.where(is_run_start, pos, -1.0))
    nxt = jnp.concatenate([s_sorted[1:], jnp.full(1, jnp.nan)])
    is_run_end = s_sorted != nxt
    run_last = -jax.lax.cummax(jnp.where(is_run_end, -pos, -jnp.inf)[::-1])[::-1]
    avg_rank_sorted = (run_first + run_last) / 2.0 + 1.0
    ranks = jnp.zeros_like(s).at[order].set(avg_rank_sorted)
    n_pos = jnp.sum(target * mask)
    n_neg = jnp.sum((1.0 - target) * mask)
    # masked entries rank lowest; subtract their contribution to pos ranks
    pos_rank_sum = jnp.sum(ranks * target * mask)
    auc = (pos_rank_sum - n_pos * (n_pos + 1) / 2) / jnp.maximum(
        n_pos * n_neg, 1.0)
    # masked rows occupy the lowest ranks, shifting every real rank up by
    # n_masked; correct the positive rank sum accordingly
    n_masked = jnp.sum(1.0 - mask)
    auc = auc - n_masked * n_pos / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.0)


def f1_precision_recall(logits, target, mask=None):
    """Macro precision/recall/F1 with ``zero_division=0``.

    Parity with `models/utils/utils.py:89-94`
    (``precision_recall_fscore_support(..., average='macro',
    zero_division=0)[:3]``).  Returns array ``[precision, recall, f1]``.
    """
    pred = jnp.argmax(logits, axis=-1)
    tp, fp, fn, tn = _counts(pred, target, mask)

    def _prf(tp_, fp_, fn_):
        prec = jnp.where(tp_ + fp_ > 0, tp_ / jnp.maximum(tp_ + fp_, 1.0), 0.0)
        rec = jnp.where(tp_ + fn_ > 0, tp_ / jnp.maximum(tp_ + fn_, 1.0), 0.0)
        f1 = jnp.where(prec + rec > 0, 2 * prec * rec / jnp.maximum(prec + rec, 1e-30), 0.0)
        return prec, rec, f1

    # class 1 ("positive") and class 0 (swap roles)
    p1, r1, f1_1 = _prf(tp, fp, fn)
    p0, r0, f1_0 = _prf(tn, fn, fp)
    return jnp.stack([(p0 + p1) / 2, (r0 + r1) / 2, (f1_0 + f1_1) / 2])


def accuracy(logits, target, mask=None):
    """Parity with `models/utils/utils.py:71-77`."""
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == target).astype(jnp.float32)
    if mask is None:
        return jnp.mean(correct)
    mask = mask.astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)
