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


def _cnn_statics(hp_list, key="cnn"):
    """Depth bucket: compile only up to the population's deepest CNN."""
    depths = [int(hp[key]["n_layers"] if key else hp["n_layers"])
              for hp in hp_list]
    return {"cnn_max_depth": max(depths)}


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
                                key=key, compute_dtype=compute_dtype)
            return logits, bn_state

        return ModelSpec(model, ("ffnn",), init, apply, lambda hps: {})

    if model == "CNN":
        def init(key, hp):
            return cnn.init(key, hp)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            md = (statics or {}).get("cnn_max_depth")
            return cnn.apply(params, bn_state, hp, x, train=train, key=key,
                             row_mask=row_mask, compute_dtype=compute_dtype,
                             max_depth=md)

        return ModelSpec(model, ("cnn",), init, apply,
                         lambda hps: _cnn_statics(hps, key=None))

    if model == "EmbraceNetMultimodal":
        def init(key, hp):
            return embracenet.init(key, hp, in_features_ffnn)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            md = (statics or {}).get("cnn_max_depth")
            return embracenet.apply(params, bn_state, hp, inputs["ffnn"], x,
                                    train=train, key=key, row_mask=row_mask,
                                    compute_dtype=compute_dtype,
                                    cnn_max_depth=md)

        return ModelSpec(model, ("ffnn", "cnn"), init, apply, _cnn_statics)

    if model == "ConcatNetMultimodal":
        def init(key, hp):
            return concatnet.init(key, hp, in_features_ffnn)

        def apply(params, bn_state, hp, inputs, train, key, row_mask,
                  compute_dtype, statics=None):
            x = _seq_input(inputs, compute_dtype)
            md = (statics or {}).get("cnn_max_depth")
            return concatnet.apply(params, bn_state, hp, inputs["ffnn"], x,
                                   train=train, key=key, row_mask=row_mask,
                                   compute_dtype=compute_dtype,
                                   cnn_max_depth=md)

        return ModelSpec(model, ("ffnn", "cnn"), init, apply, _cnn_statics)

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
