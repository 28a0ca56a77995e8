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


class ReloadedModel:
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

    def _inputs(self, data: dict) -> dict:
        out = {}
        if "ffnn" in self.spec.inputs:
            out["ffnn"] = jnp.asarray(np.asarray(data["ffnn"], np.float32))
        if "cnn" in self.spec.inputs:
            out["cnn"] = jnp.asarray(np.asarray(data["cnn"], np.uint8))
        return out

    def __call__(self, data: dict, logits: bool = False):
        """-> class probabilities [N, 2] (or raw logits)."""
        raw = self._fwd(self._inputs(data))
        return np.asarray(raw if logits else jax.nn.softmax(raw, axis=-1))

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
