"""embracenet_tpu — TPU-native framework for active/inactive regulatory-region
classification with EmbraceNet multimodal fusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`nikiiny/Prediction-of-Active-and-Inactive-Regulatory-Regions-with-Embracenet-
Multimodal-Neural-Network-` (reference mounted at /root/reference).

Design stance (not a port):
  * Arrays, not DataFrames: preprocessing emits fixed-shape arrays; DNA stays
    uint8 codes ``[N, 256]``, one-hot materialised on device.
  * Static shapes everywhere: the reference's Optuna-sampled variable
    architectures (layer counts / widths / kernels) become *masked supernets*
    so a whole hyperparameter population trains as one ``jax.vmap`` over a
    ``('trial', 'data')`` device mesh.
  * RNG discipline: ``jax.random`` key threading replaces torch RNG.
  * The EmbraceNet stochastic embracement is a fused Pallas kernel on TPU.

Task/cell registries mirror the reference
(`BIOINF_tesi/data_pipe/__init__.py:4-8`).
"""

__version__ = "0.1.0"

TASKS = [
    "active_E_vs_inactive_E",
    "active_P_vs_inactive_P",
    "active_E_vs_active_P",
    "inactive_E_vs_inactive_P",
    "active_EP_vs_inactive_rest",
]

CELL_LINES = ["A549", "GM12878", "H1", "HEK293", "HEPG2", "K562", "MCF7"]

SEQ_LEN = 256        # bp per regulatory window
N_BASES = 4          # a, c, g, t (alphabetical channel order, reference parity)
N_CLASSES = 2

def __getattr__(name):
    # Lazy: the api module pulls in the full stack (data, train, hpo).
    if name in ("preprocess", "train", "predict", "evaluate"):
        from embracenet_tpu import api

        return getattr(api, name)
    raise AttributeError(name)

__all__ = [
    "TASKS",
    "CELL_LINES",
    "SEQ_LEN",
    "N_BASES",
    "N_CLASSES",
    "preprocess",
    "train",
    "predict",
    "evaluate",
]
