"""FFNN supernet (epigenomic-feature branch).

Encodes the reference's tunable MLP family — 1-4 Linear+ReLU+Dropout blocks
with per-layer width menus and a ``Linear(., 2)`` head
(`BIOINF_tesi/models/FF_net.py:8-50`; headless variant `FFNN_pre.py:8-49`,
which exposes ``output_size``) — as a single fixed-shape masked supernet:

  * all hidden layers live in a common ``H = 256`` feature space,
  * width menus become column masks, depth becomes pass-through selection,
  * ReLU(0) = 0 keeps masked channels exactly dead through the stack.

Each trial's effective function equals the corresponding reference
architecture (see tests/test_models.py::test_ffnn_matches_explicit_mlp).

Hyperparameters (per trial, traced): ``n_layers`` i32, ``widths`` i32[4],
``dropout`` f32[4].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from embracenet_tpu.config import FFNN_MAX_LAYERS, FFNN_MAX_WIDTH
from embracenet_tpu.models.layers import (
    dropout as _dropout,
    linear,
    torch_uniform_init,
    width_mask,
)

H = FFNN_MAX_WIDTH  # 256


def fan_ins(hp, in_features: int, head: bool = True):
    """Per-layer init fan-ins (the only concrete-hp input to ``init``):
    ``[FFNN_MAX_LAYERS (+1 with head)]`` f32.  Splitting this out lets the
    tensor creation be traced, so a whole population initialises as ONE
    jitted vmap instead of hundreds of eager ops (engine._pop_init)."""
    import numpy as np

    n_layers = int(hp["n_layers"])
    widths = [int(w) for w in hp["widths"]]
    fans = []
    fan_in = in_features
    for i in range(FFNN_MAX_LAYERS):
        fans.append(fan_in)
        if i < n_layers:
            fan_in = widths[i]
    if head:
        fans.append(fan_in)
    return np.asarray(fans, np.float32)


def init_from_fans(key, fans, in_features: int, n_classes: int = 2,
                   head: bool = True):
    """Traceable init: ``fans`` may be a traced f32 vector (see fan_ins)."""
    keys = jax.random.split(key, 2 * (FFNN_MAX_LAYERS + 1))
    params = {}
    for i in range(FFNN_MAX_LAYERS):
        d_in = in_features if i == 0 else H
        params[f"w{i}"] = torch_uniform_init(keys[2 * i], (d_in, H), fans[i])
        params[f"b{i}"] = torch_uniform_init(keys[2 * i + 1], (H,), fans[i])
    if head:
        params["w_head"] = torch_uniform_init(keys[-2], (H, n_classes), fans[-1])
        params["b_head"] = torch_uniform_init(keys[-1], (n_classes,), fans[-1])
    return params


def init(key, hp, in_features: int, n_classes: int = 2, head: bool = True):
    """Per-trial parameter init with the trial's *actual* fan-ins."""
    return init_from_fans(key, fan_ins(hp, in_features, head), in_features,
                          n_classes, head)


def features(params, hp, x, *, train: bool = False, key=None,
             compute_dtype=None, max_width: int | None = None):
    """Headless forward -> ([B, W] masked features, [W] output mask).

    Reference parity: ``FFNN_pre`` (`models/FFNN_pre.py:47-49`); its
    ``output_size`` corresponds to ``sum(out_mask)``.

    ``max_width`` (static, <= H) is the population's width bucket: weights
    are statically sliced so the hidden space costs W instead of H.  Exact
    because masked features beyond any trial's width are zero and live
    features are a prefix.  Params keep the full [.., H] shapes.
    """
    n_layers = hp["n_layers"]
    widths = hp["widths"]
    rates = hp["dropout"]
    W = max_width or H
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, FFNN_MAX_LAYERS)

    h = None
    out_mask = None
    for i in range(FFNN_MAX_LAYERS):
        inp = x if i == 0 else h
        w = params[f"w{i}"][:, :W] if i == 0 else params[f"w{i}"][:W, :W]
        mask = width_mask(W, widths[i])
        z = linear(inp, w, params[f"b{i}"][:W], compute_dtype)
        z = jax.nn.relu(z) * mask
        z = _dropout(z, rates[i], keys[i], train) * mask
        if i == 0:
            h, out_mask = z, mask
        else:
            active = (i < n_layers)
            h = jnp.where(active, z, h)
            out_mask = jnp.where(active, mask, out_mask)
    return h, out_mask


def apply(params, hp, x, *, train: bool = False, key=None, compute_dtype=None,
          max_width: int | None = None):
    """Headful forward -> logits [B, n_classes] (reference ``FFNN``)."""
    h, _ = features(params, hp, x, train=train, key=key,
                    compute_dtype=compute_dtype, max_width=max_width)
    return linear(h, params["w_head"][:h.shape[1], :], params["b_head"],
                  compute_dtype)
