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
                 in_features_ffnn: int | None = None):
        self.model = model
        self.spec = get_spec(model, in_features_ffnn=in_features_ffnn)
        self.params = params
        self.bn_state = bn_state
        self.flat_params = flat_params
        self.hp = space_mod.params_to_hp(model, flat_params)
        self._fwd = jax.jit(self._forward)

    def _forward(self, inputs):
        logits, _ = self.spec.apply(self.params, self.bn_state, self.hp,
                                    inputs, False, jax.random.PRNGKey(0),
                                    None, None, None)
        return logits

    def _batch_inputs(self, data: dict, lo: int) -> dict:
        out = {}
        if "ffnn" in self.spec.inputs:
            x = np.asarray(data["ffnn"], np.float32)[lo:lo + self.BATCH]
            out["ffnn"] = jnp.asarray(_pad_rows(x, self.BATCH))
        if "cnn" in self.spec.inputs:
            c = np.asarray(data["cnn"], np.uint8)[lo:lo + self.BATCH]
            out["cnn"] = jnp.asarray(_pad_rows(c, self.BATCH))
        return out

    def __call__(self, data: dict, logits: bool = False):
        """-> class probabilities [N, 2] (or raw logits); batched."""
        key = "ffnn" if "ffnn" in self.spec.inputs else "cnn"
        n = len(np.asarray(data[key]))
        chunks = []
        for lo in range(0, n, self.BATCH):
            raw = self._fwd(self._batch_inputs(data, lo))
            take = min(self.BATCH, n - lo)
            chunks.append(np.asarray(raw)[:take])
        raw = np.concatenate(chunks) if chunks else np.zeros((0, 2))
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
