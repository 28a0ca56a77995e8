"""Rebuild trained models from checkpoints (``*_NoTrain`` equivalents).

The reference's six ``*_NoTrain`` classes (`BIOINF_tesi/models/FFNN_NoTrain.py`,
`CNN_NoTrain.py`, `FFNN_pre_NoTrain.py`, `CNN_pre_NoTrain.py`,
`EmbraceNetMultimodal_NoTrain.py`, `ConcatNetMultimodal_NoTrain.py`) re-derive
architectures from checkpoint files' ``model_params`` dicts and append a
Softmax so the forward returns class probabilities.  Here one loader covers
all families: the checkpoint's ``meta["model_params"]`` carries the flat
hyperparameters, and :class:`ReloadedModel` applies the matching supernet in
eval mode with softmax output.

(Reference quirk not reproduced: ``ConcatNetMultimodal_NoTrain`` assigns its
softmax to a misspelled attribute and actually returns pre-softmax logits
(`ConcatNetMultimodal_NoTrain.py:87`); we return probabilities for every
family, and expose ``logits=True`` for anyone needing the raw values.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from embracenet_tpu.hpo import space as space_mod
from embracenet_tpu.training.checkpoint import load_checkpoint
from embracenet_tpu.training.modelspec import get_spec


def _pad_rows(a: np.ndarray, n_to: int) -> np.ndarray:
    if a.shape[0] >= n_to:
        return a
    pad = [(0, n_to - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
    return np.pad(a, pad)


class ReloadedModel:
    #: inference micro-batch: bounds activation memory (a full 163k-window
    #: dataset would need ~10 GB of conv activations in one call) and keeps
    #: one compiled program for any dataset size
    BATCH = 4096

    def __init__(self, model: str, params, bn_state, flat_params: dict,
                 in_features_ffnn: int | None = None, compute_dtype=None):
        self.model = model
        self.spec = get_spec(model, in_features_ffnn=in_features_ffnn)
        self.params = params
        self.bn_state = bn_state
        self.flat_params = flat_params
        self.hp = space_mod.params_to_hp(model, flat_params)
        self.statics = self.spec.statics([self.hp]) if self.spec.statics else {}
        self.compute_dtype = compute_dtype  # e.g. jnp.bfloat16 for serving
        self._fwd = jax.jit(self._forward)

    def _forward(self, data, lo):
        # on-device slicing: the dataset is transferred once and each
        # micro-batch is a dynamic slice, so serving is not bound by
        # repeated host->device copies
        inputs = {k: jax.lax.dynamic_slice_in_dim(v, lo, self.BATCH, axis=0)
                  for k, v in data.items()}
        logits, _ = self.spec.apply(self.params, self.bn_state, self.hp,
                                    inputs, False, jax.random.PRNGKey(0),
                                    None, self.compute_dtype, self.statics)
        return logits

    def _device_data(self, data: dict, n_pad: int) -> dict:
        out = {}
        if "ffnn" in self.spec.inputs:
            out["ffnn"] = jnp.asarray(_pad_rows(
                np.asarray(data["ffnn"], np.float32), n_pad))
        if "cnn" in self.spec.inputs:
            out["cnn"] = jnp.asarray(_pad_rows(
                np.asarray(data["cnn"], np.uint8), n_pad))
        return out

    def __call__(self, data: dict, logits: bool = False):
        """-> class probabilities [N, 2] (or raw logits); batched."""
        key = "ffnn" if "ffnn" in self.spec.inputs else "cnn"
        n = len(np.asarray(data[key]))
        n_pad = -(-max(n, 1) // self.BATCH) * self.BATCH
        dev = self._device_data(data, n_pad)
        chunks = [self._fwd(dev, lo) for lo in range(0, n_pad, self.BATCH)]
        raw = np.concatenate([np.asarray(c) for c in chunks])[:n]             if chunks else np.zeros((0, 2))
        if logits:
            return raw
        return np.asarray(jax.nn.softmax(jnp.asarray(raw), axis=-1))

    def predict_proba_positive(self, data: dict) -> np.ndarray:
        return self(data)[:, 1]


def load_model(checkpoint_path: str,
               in_features_ffnn: int | None = None) -> ReloadedModel:
    """Load any family's checkpoint saved by the CV driver / search."""
    trees, meta = load_checkpoint(checkpoint_path)
    model = meta.get("model")
    flat = meta.get("model_params")
    if model is None:
        raise ValueError(f"checkpoint {checkpoint_path} lacks 'model' meta")
    if in_features_ffnn is None and "ffnn" in trees["params"]:
        in_features_ffnn = int(np.asarray(trees["params"]["ffnn"]["w0"]).shape[0])
    elif in_features_ffnn is None and model == "FFNN":
        in_features_ffnn = int(np.asarray(trees["params"]["w0"]).shape[0])
    return ReloadedModel(model, trees["params"], trees.get("bn_state", {}),
                         flat, in_features_ffnn=in_features_ffnn)
