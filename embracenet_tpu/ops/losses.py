"""Loss functions with reference (torch) parity semantics.

The reference rebuilds a class-weighted ``nn.CrossEntropyLoss`` **per batch**
with Inverse-Number-of-Samples weights normalised over the two classes
(`BIOINF_tesi/models/utils/utils.py:121-140` and
`models/utils/training_models.py:107-108`).  Torch's weighted CE divides by
the *sum of the weights of the realised targets*, not the batch size — we
reproduce that exactly, extended with a padding mask so static-shape TPU
batches give bit-identical values to ragged host batches.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import log_softmax


def ins_weights(target, mask=None):
    """Normalised inverse-number-of-samples weights ``(w_pos, w_neg)``.

    Parity: `models/utils/utils.py:121-140` (``get_loss_weights_from_labels``).
    """
    target = target.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(target)
    mask = mask.astype(jnp.float32)
    pos = jnp.sum(target * mask)
    neg = jnp.sum((1.0 - target) * mask)
    pos_inv = jnp.where(pos > 0, 1.0 / jnp.maximum(pos, 1.0), 0.0)
    neg_inv = jnp.where(neg > 0, 1.0 / jnp.maximum(neg, 1.0), 0.0)
    denom = jnp.maximum(pos_inv + neg_inv, 1e-30)
    return pos_inv / denom, neg_inv / denom


def weighted_cross_entropy(logits, target, mask=None, class_weights=None):
    """Torch-parity class-weighted cross entropy.

    ``loss = sum_i w[y_i] * nll_i / sum_i w[y_i]`` over unmasked rows
    (torch ``CrossEntropyLoss(weight=...)`` with default ``reduction='mean'``).
    If ``class_weights`` is None, per-batch INS weights are used
    (`training_models.py:107-108`).
    """
    target = target.astype(jnp.int32)
    if mask is None:
        mask = jnp.ones(target.shape, dtype=jnp.float32)
    mask = mask.astype(jnp.float32)
    if class_weights is None:
        w_pos, w_neg = ins_weights(target, mask)
    else:
        w_neg, w_pos = class_weights  # torch order: weight=[w_neg, w_pos]
    logp = log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    w = jnp.where(target == 1, w_pos, w_neg) * mask
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-30)
