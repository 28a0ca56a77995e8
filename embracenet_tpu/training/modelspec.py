"""Uniform init/apply adapters over the model families.

Gives the train engine one calling convention across unimodal and multimodal
models (the reference instead has two parallel engines,
`training_models.py` vs `training_models_multimodal.py`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax.numpy as jnp

import numpy as np

from embracenet_tpu.data import codec
from embracenet_tpu.models import cnn, cnn_lstm, concatnet, embracenet, ffnn

MODEL_FAMILIES = ("FFNN", "CNN", "CNN_LSTM", "EmbraceNetMultimodal",
                  "ConcatNetMultimodal")


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    inputs: tuple          # subset of ("ffnn", "cnn")
    init: Callable         # (key, hp_concrete) -> (params, bn_state)
    apply: Callable        # (params, bn_state, hp, inputs, train, key,
    #                         row_mask, compute_dtype, statics) -> (logits, bn)
    statics: Callable = None   # hp_list -> dict of static compile knobs
    vmappable: bool = True     # False: shapes vary per trial; HPO runs
    #                            trials sequentially (e.g. CNN_LSTM)
    fan_ins: Callable = None   # hp_concrete -> fan-in pytree (concrete)
    init_traced: Callable = None  # (key, fans) -> (params, bn_state);
    #                               fans may be traced -> population init is
    #                               one jitted vmap (engine._pop_init)


def _cnn_statics(hp_list, key="cnn"):
    """Depth + width bucket for the CNN branch.

    ``cnn_max_depth`` compiles only up to the population's deepest trial;
    ``cnn_max_channels[i]`` is the max channel width any trial that *uses*
    layer i selects (unused layers get the smallest menu entry so the key is
    draw-stable).  The engine drops width keys unless
    TrainConfig.width_buckets is on.
    """
    from embracenet_tpu.config import (CNN_CHANNEL_MENUS, CNN_KERNEL_MENU,
                                       CNN_MAX_LAYERS)

    subs = [hp[key] if key else hp for hp in hp_list]
    depth = max(int(s["n_layers"]) for s in subs)
    mc, mk = [], []
    for i in range(CNN_MAX_LAYERS):
        used = [int(s["channels"][i]) for s in subs
                if int(s["n_layers"]) > i]
        mc.append(max(used) if used else min(CNN_CHANNEL_MENUS[i]))
        used_k = [int(s["kernels"][i]) for s in subs
                  if int(s["n_layers"]) > i]
        mk.append(max(used_k) if used_k else min(CNN_KERNEL_MENU))
    return {"cnn_max_depth": depth, "cnn_max_channels": tuple(mc),
            "cnn_max_kernels": tuple(mk)}


def _ffnn_width(hp_list, key="ffnn"):
    """Max live width over trials (layers beyond a trial's depth ignored)."""
    w = 0
    for hp in hp_list:
        sub = hp[key] if key else hp
        n = int(sub["n_layers"])
        w = max(w, max(int(x) for x in np.asarray(sub["widths"])[:n]))
    return w


def _post_width(hp_list, key, min_width=16):
    w = min_width
    for hp in hp_list:
        n = int(hp["n_post"])
        if n > 0:
            w = max(w, max(int(x) for x in np.asarray(hp[key])[:n]))
    return w


def _seq_input(inputs, compute_dtype):
    """codes uint8 [B, 256] -> one-hot [B, 4, 256] inside the jitted graph."""
    dt = compute_dtype or jnp.float32
    return codec.one_hot(inputs["cnn"], dtype=dt)


@functools.lru_cache(maxsize=None)
def get_spec(model: str, in_features_ffnn: int | None = None) -> ModelSpec:
    """Memoized so repeated calls return the identical ModelSpec object —
    a prerequisite for reusing jitted epoch functions across fit() calls."""
    return _build_spec(model, in_features_ffnn)


def _build_spec(model: str, in_features_ffnn: int | None = None) -> ModelSpec:
    if model == "FFNN":
        def init(key, hp):
            return ffnn.init(key, hp, in_features_ffnn), {}

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            logits = ffnn.apply(params, hp, inputs["ffnn"], train=train,
                                key=key, compute_dtype=compute_dtype,
                                max_width=(statics or {}).get("ffnn_max_width"))
            return logits, bn_state

        return ModelSpec(model, ("ffnn",), init, apply,
                         lambda hps: {"ffnn_max_width":
                                      _ffnn_width(hps, key=None)},
                         fan_ins=lambda hp: ffnn.fan_ins(hp, in_features_ffnn),
                         init_traced=lambda key, fans: (
                             ffnn.init_from_fans(key, fans, in_features_ffnn),
                             {}))

    if model == "CNN":
        def init(key, hp):
            return cnn.init(key, hp)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            st = statics or {}
            return cnn.apply(params, bn_state, hp, x, train=train, key=key,
                             row_mask=row_mask, compute_dtype=compute_dtype,
                             max_depth=st.get("cnn_max_depth"),
                             max_channels=st.get("cnn_max_channels"),
                             max_kernels=st.get("cnn_max_kernels"))

        return ModelSpec(model, ("cnn",), init, apply,
                         lambda hps: _cnn_statics(hps, key=None),
                         fan_ins=lambda hp: cnn.fan_ins(hp),
                         init_traced=cnn.init_from_fans)

    if model == "EmbraceNetMultimodal":
        def init(key, hp):
            return embracenet.init(key, hp, in_features_ffnn)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            st = statics or {}
            return embracenet.apply(params, bn_state, hp, inputs["ffnn"], x,
                                    train=train, key=key, row_mask=row_mask,
                                    compute_dtype=compute_dtype,
                                    cnn_max_depth=st.get("cnn_max_depth"),
                                    cnn_max_channels=st.get("cnn_max_channels"),
                                    cnn_max_kernels=st.get("cnn_max_kernels"),
                                    ffnn_max_width=st.get("ffnn_max_width"),
                                    embrace_max=st.get("embrace_max"),
                                    post_max=st.get("post_max"),
                                    fused=st.get("fused_embrace", False))

        def statics(hps):
            out = _cnn_statics(hps)
            out["ffnn_max_width"] = _ffnn_width(hps)
            out["embrace_max"] = max(int(hp["embrace_size"]) for hp in hps)
            out["post_max"] = _post_width(hps, "post_widths")
            return out

        return ModelSpec(model, ("ffnn", "cnn"), init, apply, statics,
                         fan_ins=lambda hp: embracenet.fan_ins(
                             hp, in_features_ffnn),
                         init_traced=lambda key, fans: embracenet.init_from_fans(
                             key, fans, in_features_ffnn))

    if model == "ConcatNetMultimodal":
        def init(key, hp):
            return concatnet.init(key, hp, in_features_ffnn)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            st = statics or {}
            return concatnet.apply(params, bn_state, hp, inputs["ffnn"], x,
                                   train=train, key=key, row_mask=row_mask,
                                   compute_dtype=compute_dtype,
                                   cnn_max_depth=st.get("cnn_max_depth"),
                                   cnn_max_channels=st.get("cnn_max_channels"),
                                   cnn_max_kernels=st.get("cnn_max_kernels"),
                                   ffnn_max_width=st.get("ffnn_max_width"),
                                   post_max=st.get("post_max"))

        def statics(hps):
            out = _cnn_statics(hps)
            out["ffnn_max_width"] = _ffnn_width(hps)
            out["post_max"] = _post_width(hps, "post_widths")
            return out

        return ModelSpec(model, ("ffnn", "cnn"), init, apply, statics,
                         fan_ins=lambda hp: concatnet.fan_ins(
                             hp, in_features_ffnn),
                         init_traced=lambda key, fans: concatnet.init_from_fans(
                             key, fans, in_features_ffnn))

    if model == "CNN_LSTM":
        def _arch(hp):
            return (int(hp["n_layers"]), tuple(int(c) for c in hp["channels"]),
                    tuple(int(k) for k in hp["kernels"]),
                    tuple(float(d) for d in hp["dropout"]),
                    int(hp["lstm_hidden"]), int(hp["lstm_layers"]))

        def statics(hp_list):
            archs = {_arch(hp) for hp in hp_list}
            if len(archs) != 1:
                raise ValueError("CNN_LSTM populations must share one "
                                 "architecture (shapes are trial-specific); "
                                 "run trials sequentially")
            a = archs.pop()
            return {"cnn_lstm_arch": a}

        def _hp_from_arch(a):
            return {"n_layers": a[0],
                    "channels": np.asarray(a[1], np.int32),
                    "kernels": np.asarray(a[2], np.int32),
                    "dropout": np.asarray(a[3], np.float32),
                    "lstm_hidden": a[4], "lstm_layers": a[5]}

        def init(key, hp):
            return cnn_lstm.init(key, hp)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            hp_concrete = _hp_from_arch(statics["cnn_lstm_arch"])
            return cnn_lstm.apply(params, bn_state, hp_concrete, x,
                                  train=train, key=key, row_mask=row_mask,
                                  compute_dtype=compute_dtype)

        return ModelSpec(model, ("cnn",), init, apply, statics,
                         vmappable=False)

    raise ValueError(f"unknown model family: {model} (use one of {MODEL_FAMILIES})")
