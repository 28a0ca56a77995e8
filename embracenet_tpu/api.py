"""Public entry points mirroring the reference notebook workflow
(BASELINE.json north star: ``preprocess(cell_line)``, ``train(model,
cell_line)``, ``predict()``, ``evaluate()``).

The reference's entry points are 16 notebooks (SURVEY.md §2.5); here each is
one function call:

  >>> import embracenet_tpu as et
  >>> pipe = et.preprocess(task="active_P_vs_inactive_P", root="data")
  >>> scores = et.train("EmbraceNetMultimodal", "K562",
  ...                   task="active_P_vs_inactive_P", pipeline=pipe)
  >>> probs = et.predict("models/K562_EmbraceNetMultimodal_..._test_",
  ...                    pipe.cell_data("K562"))
  >>> metrics = et.evaluate("models/...", pipe.cell_data("K562"))
"""

from __future__ import annotations

import numpy as np

from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu.data.pipeline import Pipeline
from embracenet_tpu.models.reload import load_model
from embracenet_tpu.training.cv import KfoldCV, checkpoint_name
from embracenet_tpu.training.results import ResultsDict, baseline_auprc


def resolve_mesh(mesh):
    """Normalise a mesh argument: Mesh | MeshConfig | "auto" | None.

    "auto" puts every local device on the 'trial' axis; a MeshConfig of
    1x1 (the default) resolves to None (single-device path)."""
    if mesh is None or hasattr(mesh, "devices"):  # None or jax Mesh
        return mesh
    from embracenet_tpu.parallel.mesh import make_mesh

    if mesh == "auto":
        import jax

        n = len(jax.devices())
        return make_mesh(n_trial=n, n_data=1) if n > 1 else None
    trial, data_ax = mesh.trial_axis, mesh.data_axis  # MeshConfig
    if trial * data_ax <= 1:
        return None
    return make_mesh(n_trial=trial, n_data=data_ax)


def preprocess(task: str, root: str = "data", dataset: dict | None = None,
               cache_dir: str | None = ".embracenet_cache",
               verbose: bool = False, **kwargs) -> Pipeline:
    """Load raw data, build the task, scale/impute/select features; cached."""
    return Pipeline(task=task, root=root, dataset=dataset,
                    cache_dir=cache_dir, verbose=verbose, **kwargs)


def train(model: str, cell_line: str, task: str,
          pipeline: Pipeline | None = None, data: dict | None = None,
          cv_cfg: CVConfig = CVConfig(), train_cfg: TrainConfig = TrainConfig(),
          augmentation: bool | None = None,
          results: ResultsDict | None = None,
          storage: str = "optuna_tuning.db",
          checkpoint_dir: str = "models",
          random_state: int = 789, verbose: bool = False,
          mesh=None, model_label: str | None = None) -> dict:
    """K-fold CV with per-fold HPO for one (model, cell, task); returns the
    reference-shaped scores dict and records it into ``results`` if given.

    ``mesh``: a ``jax.sharding.Mesh``, a ``config.MeshConfig``, or the
    string ``"auto"`` (all local devices on the 'trial' axis).  Populations
    shard over 'trial' and batches over 'data' (parallel/mesh.py).

    ``model_label``: study/checkpoint name to record this run under when it
    differs from the architecture — e.g. the reference's smote-vs-double
    FFNN comparison trains the SAME family twice with different rebalancers
    and keeps both runs' artifacts apart for ``select_augmented_models``
    (`models/utils/utils.py:302-353`).  Without a distinct label the second
    variant would resume the first's fold checkpoints and the comparison
    would be vacuous."""
    mesh = resolve_mesh(mesh)
    if data is None:
        # registry validation applies to the lookup path only: with
        # caller-supplied `data`, cell_line/task are just labels (synthetic
        # benchmarks use e.g. "SYNTH"/"gated_multimodal")
        from embracenet_tpu import CELL_LINES, TASKS

        if cell_line not in CELL_LINES:
            raise ValueError(f"unknown cell line {cell_line!r}; "
                             f"expected one of {CELL_LINES}")
        if task not in TASKS:
            raise ValueError(f"unknown task {task!r}; "
                             f"expected one of {TASKS}")
        if pipeline is None:
            pipeline = preprocess(task)
        data = pipeline.cell_data(cell_line)
    if augmentation is not None:
        import dataclasses

        cv_cfg = dataclasses.replace(cv_cfg, augmentation=augmentation)
    label = model_label or model
    cv = KfoldCV()
    scores = cv(data, model, task=task, cell_line=cell_line,
                cv_cfg=cv_cfg, train_cfg=train_cfg,
                study_name=f"{cell_line}_{task}_{label}"
                           f"{'augmentation' if cv_cfg.augmentation else ''}",
                storage=storage, checkpoint_dir=checkpoint_dir,
                test_model_path=checkpoint_name(
                    cell_line, label, task, 0, cv_cfg.augmentation),
                random_state=random_state, verbose=verbose, mesh=mesh)
    if results is not None:
        # record under the label: a variant run (model_label="FFNN_smote")
        # must not overwrite the canonical family entry — the canonical one
        # is written by select_augmented_models after the variant contest
        name = label + ("_augmentation" if cv_cfg.augmentation else "")
        results.update(cell_line, task, name, scores)
        results.set_baseline(cell_line, task, baseline_auprc(data["y"]))
        results.save()
    return scores


def predict(checkpoint_path: str, data: dict,
            in_features_ffnn: int | None = None) -> np.ndarray:
    """Class probabilities [N, 2] from a saved checkpoint
    (the ``*_NoTrain`` reload flow, softmax output)."""
    return load_model(checkpoint_path, in_features_ffnn)(data)


def evaluate(checkpoint_path: str, data: dict,
             in_features_ffnn: int | None = None,
             auprc_on_probabilities: bool = False) -> dict:
    """AUPRC / F1 / precision / recall / accuracy of a checkpoint on data."""
    from embracenet_tpu.ops import metrics as M

    model = load_model(checkpoint_path, in_features_ffnn)
    probs = model(data)
    y = np.asarray(data["y"])
    logits = np.log(np.maximum(probs, 1e-30))
    if auprc_on_probabilities:
        auprc = float(M.auprc_prob(probs[:, 1], y))
    else:
        auprc = float(M.auprc_argmax(logits, y))
    prf = np.asarray(M.f1_precision_recall(logits, y))
    return {
        "AUPRC": auprc,
        "AUROC": float(M.auroc(probs[:, 1], y)),
        "precision": float(prf[0]),
        "recall": float(prf[1]),
        "F1": float(prf[2]),
        "accuracy": float(M.accuracy(logits, y)),
        "baseline_AUPRC": baseline_auprc(y),
    }
