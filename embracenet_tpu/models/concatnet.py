"""ConcatNet multimodal baseline (supernet form).

Reference: `BIOINF_tesi/models/ConcatNetMultimodal.py:12-83` — FFNN_pre +
CNN_pre branches, feature concatenation (`:76`), 1-3 post
Linear+ReLU+Dropout layers (width menus (512,768,1024) / (32..512) /
(16..256)) and a ``Linear(., 2)`` head.

Hyperparameters (traced): ``ffnn`` sub-dict, ``cnn`` sub-dict,
``n_post`` i32 (1..3), ``post_widths`` i32[3], ``post_dropout`` f32[3].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from embracenet_tpu.config import CONCAT_MAX_POST_LAYERS, FFNN_MAX_WIDTH
from embracenet_tpu.models import cnn as cnn_mod
from embracenet_tpu.models import ffnn as ffnn_mod
from embracenet_tpu.models.cnn import FLAT_MAX
from embracenet_tpu.models.layers import (
    dropout as _dropout,
    linear,
    torch_uniform_init,
    width_mask,
)
from embracenet_tpu.ops.convmath import CNN_LENGTHS

CONCAT_DIM = FFNN_MAX_WIDTH + FLAT_MAX   # 256 + 7936
P = 1024                                 # post space (max width menu)


def fan_ins(hp, in_features_ffnn: int):
    """Concrete init fan-ins (see ffnn.fan_ins): post chain + final fan."""
    import numpy as np

    n_post = int(hp["n_post"])
    post_widths = [int(w) for w in hp["post_widths"]]
    ffnn_out = int(hp["ffnn"]["widths"][int(hp["ffnn"]["n_layers"]) - 1])
    cnn_depth = int(hp["cnn"]["n_layers"])
    cnn_out = int(hp["cnn"]["channels"][cnn_depth - 1]) * CNN_LENGTHS[cnn_depth - 1]

    post = []
    fan_in = ffnn_out + cnn_out
    for i in range(CONCAT_MAX_POST_LAYERS):
        post.append(fan_in)
        if i < n_post:
            fan_in = post_widths[i]
    return {"ffnn": ffnn_mod.fan_ins(hp["ffnn"], in_features_ffnn, head=False),
            "cnn": cnn_mod.fan_ins(hp["cnn"], head=False),
            "post": np.asarray(post, np.float32),
            "head": np.asarray(fan_in, np.float32)}


def init_from_fans(key, fans, in_features_ffnn: int, n_classes: int = 2):
    """Traceable init (``fans`` from fan_ins; may be traced)."""
    k_ffnn, k_cnn, k_post, k_head, k_headb = jax.random.split(key, 5)
    ffnn_params = ffnn_mod.init_from_fans(k_ffnn, fans["ffnn"],
                                          in_features_ffnn, head=False)
    cnn_params, bn_state = cnn_mod.init_from_fans(k_cnn, fans["cnn"],
                                                  head=False)
    params = {"ffnn": ffnn_params, "cnn": cnn_params}
    pk = jax.random.split(k_post, 2 * CONCAT_MAX_POST_LAYERS)
    for i in range(CONCAT_MAX_POST_LAYERS):
        d_in = CONCAT_DIM if i == 0 else P
        params[f"post_w{i}"] = torch_uniform_init(pk[2 * i], (d_in, P),
                                                  fans["post"][i])
        params[f"post_b{i}"] = torch_uniform_init(pk[2 * i + 1], (P,),
                                                  fans["post"][i])
    params["head_w"] = torch_uniform_init(k_head, (P, n_classes), fans["head"])
    params["head_b"] = torch_uniform_init(k_headb, (n_classes,), fans["head"])
    return params, bn_state


def init(key, hp, in_features_ffnn: int, n_classes: int = 2):
    return init_from_fans(key, fan_ins(hp, in_features_ffnn),
                          in_features_ffnn, n_classes)


def apply(params, bn_state, hp, x_ffnn, x_cnn, *, train: bool = False,
          key=None, row_mask=None, compute_dtype=None,
          cnn_max_depth: int | None = None,
          cnn_max_channels: tuple | None = None,
          cnn_max_kernels: tuple | None = None,
          ffnn_max_width: int | None = None,
          post_max: int | None = None):
    """Forward -> (logits [B, 2], new_bn_state).

    ``*_max`` statics are width buckets (population maxima); weights are
    statically sliced to bucket dims — exact, see models/cnn.py docstring.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_ffnn, k_cnn, k_post = jax.random.split(key, 3)
    PB = post_max or P

    f_ffnn, _ = ffnn_mod.features(params["ffnn"], hp["ffnn"], x_ffnn,
                                  train=train, key=k_ffnn,
                                  compute_dtype=compute_dtype,
                                  max_width=ffnn_max_width)
    f_cnn, _, new_bn_state = cnn_mod.features(
        params["cnn"], bn_state, hp["cnn"], x_cnn, train=train, key=k_cnn,
        row_mask=row_mask, compute_dtype=compute_dtype,
        max_depth=cnn_max_depth, max_channels=cnn_max_channels,
        max_kernels=cnn_max_kernels)

    h = jnp.concatenate([f_ffnn, f_cnn], axis=-1)  # [B, FW + FB]
    n_post = hp["n_post"]
    pw = hp["post_widths"]
    pr = hp["post_dropout"]
    pk = jax.random.split(k_post, CONCAT_MAX_POST_LAYERS)
    # post_w0 rows follow the [FFNN_MAX_WIDTH | FLAT_MAX] concat layout;
    # pick the bucketed rows of each block to match h = [FW | FB].  A
    # pre-shrunk leaf (training/slicing.py) already has the bucket layout —
    # detected statically by row count.
    if params["post_w0"].shape[0] == h.shape[1]:
        w0 = params["post_w0"][:, :PB]
    else:
        w0 = jnp.concatenate(
            [params["post_w0"][:f_ffnn.shape[1]],
             params["post_w0"][FFNN_MAX_WIDTH:
                               FFNN_MAX_WIDTH + f_cnn.shape[1]]],
            axis=0)[:, :PB]
    out = None
    for i in range(CONCAT_MAX_POST_LAYERS):
        inp = h if i == 0 else out
        w = w0 if i == 0 else params[f"post_w{i}"][:PB, :PB]
        mask = width_mask(PB, pw[i])
        z = jax.nn.relu(linear(inp, w, params[f"post_b{i}"][:PB],
                               compute_dtype)) * mask
        z = _dropout(z, pr[i], pk[i], train) * mask
        out = z if i == 0 else jnp.where(i < n_post, z, out)

    logits = linear(out, params["head_w"][:PB, :], params["head_b"],
                    compute_dtype)
    return logits, new_bn_state
