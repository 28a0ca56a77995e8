"""Checkpointing: pytrees to ``.npz`` with a JSON hyperparameter sidecar.

Replaces the reference's torch ``.pt`` files whose *filenames* are a protocol
(`{cell}_{model}[_augmentation]_{task}_{fold}_test_.pt`,
`training_models_multimodal.py:792`) that the ``*_NoTrain`` model classes
parse to rebuild architectures (`FFNN_NoTrain.py:26-27`).  Here the sampled
flat hyperparameters ride *inside* the checkpoint (``meta["model_params"]``),
so reloading never depends on filename conventions — but the same naming is
still produced by the CV driver for drop-in familiarity.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

_SEP = "|"


_LIST_MARK = "#"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{_LIST_MARK}{i}{_SEP}"))
    else:
        out[prefix.rstrip(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def restore_lists(node):
        if not isinstance(node, dict):
            return node
        node = {k: restore_lists(v) for k, v in node.items()}
        if node and all(k.startswith(_LIST_MARK) for k in node):
            return [node[f"{_LIST_MARK}{i}"] for i in range(len(node))]
        return node

    return restore_lists(tree)


def save_checkpoint(path: str, trees: dict, meta: dict | None = None):
    """``trees``: name -> pytree (e.g. {"params": ..., "bn_state": ...})."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = {}
    for name, tree in trees.items():
        for k, v in _flatten(jax.tree.map(np.asarray, tree)).items():
            flat[f"{name}{_SEP}{k}" if k else name] = v
    np.savez(path if path.endswith(".npz") else path + ".npz",
             __meta__=np.frombuffer(
                 json.dumps(meta or {}, default=float).encode(), np.uint8),
             **flat)


def _check_orbax():
    """EMBRACENET_NO_ORBAX=1 refuses the orbax backend up front: importing a
    partially broken tensorstore wheel dies with SIGBUS at .so load, which no
    try/except can catch (the npz backend keeps working regardless)."""
    if os.environ.get("EMBRACENET_NO_ORBAX"):
        raise ImportError("orbax backend disabled via EMBRACENET_NO_ORBAX")


def save_checkpoint_orbax(path: str, trees: dict, meta: dict | None = None):
    """Orbax-backed variant (async-capable, multi-host-safe storage layout).

    Same logical content as :func:`save_checkpoint`; use for large models or
    multi-host runs.  Requires orbax-checkpoint (baked into this image).
    """
    _check_orbax()
    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip("/"))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path + ".orbax",
                   {"trees": jax.tree.map(np.asarray, trees),
                    "meta_json": np.frombuffer(
                        json.dumps(meta or {}, default=float).encode(),
                        np.uint8).copy()},
                   force=True)


def load_checkpoint_orbax(path: str):
    _check_orbax()
    import orbax.checkpoint as ocp

    path = os.path.abspath(path.rstrip("/"))
    with ocp.StandardCheckpointer() as ckptr:
        out = ckptr.restore(path + ".orbax")
    meta = json.loads(bytes(out["meta_json"]).decode()) if len(
        out.get("meta_json", [])) else {}
    return out["trees"], meta


def load_checkpoint(path: str):
    """-> (trees dict, meta dict)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}
        flat = {k: z[k] for k in z.files if k != "__meta__"}
    grouped: dict = {}
    for k, v in flat.items():
        name, _, rest = k.partition(_SEP)
        grouped.setdefault(name, {})[rest] = v
    trees = {name: (_unflatten(sub) if list(sub) != [""] else sub[""])
             for name, sub in grouped.items()}
    return trees, meta
