#!/usr/bin/env python
"""Model-ordering benchmark on cross-modal-gated synthetic data (VERDICT r1
weak #5: planted-signal sweeps saturate every family and say nothing about
the EmbraceNet-vs-Concat-vs-single-modality ordering the reference measures).

Uses :mod:`embracenet_tpu.data.synth`: positives carry evidence in the
tabular view *or* the sequence view depending on a latent gate, so every
single-modality model is bounded by a closed-form Bayes ceiling well below
the fused ceiling.  Runs the full CV (HPO + retrain, reference protocol) for
FFNN / CNN / ConcatNetMultimodal / EmbraceNetMultimodal and writes
``DISCRIM_SWEEP_r2.json`` with model scores placed against the oracle
ceilings.

Done-criterion: fused families beat the best single-modality family by a
margin that exceeds fold noise, and every family lands below its view's
oracle ceiling (sanity that the task isn't leaking).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embracenet_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(os.path.join(REPO, ".jax_cache"))

from embracenet_tpu import api  # noqa: E402
from embracenet_tpu.config import CVConfig, TrainConfig  # noqa: E402
from embracenet_tpu.data.synth import gated_multimodal_task, oracle_scores  # noqa: E402
from embracenet_tpu.ops.metrics import auprc_prob  # noqa: E402
from embracenet_tpu.training.results import ResultsDict, baseline_auprc  # noqa: E402

GEN = dict(prevalence=0.15, gate_p=0.5, tab_shift=1.2, n_tab_features=6,
           motif_pos_rate=0.95, motif_bg_rate=0.03, gate_vis=0.3)
MODELS = ("FFNN", "CNN", "ConcatNetMultimodal", "EmbraceNetMultimodal")
VIEW_OF = {"FFNN": "tab", "CNN": "seq",
           "ConcatNetMultimodal": "both", "EmbraceNetMultimodal": "both"}


def main():
    n = 12000
    d = 64
    train_cfg = TrainConfig(num_epochs=60, epoch_chunk=15, batch_size=100,
                            compute_dtype="bfloat16", cnn_full_depth=True,
                            pad_ffnn_features=d)
    cv_cfg = CVConfig(n_folds=3, n_trials=3, sampler="TPE")
    results = ResultsDict("discrim_results.json")
    out = {"generator": GEN, "n": n}

    data = gated_multimodal_task(n, d, seed=11, **GEN)
    oracle = oracle_scores(data, **GEN)
    y = jnp.asarray(data["y"])
    out["baseline"] = baseline_auprc(data["y"])
    out["oracle_ceilings"] = {
        v: round(float(auprc_prob(jnp.asarray(s), y)), 4)
        for v, s in oracle.items()}
    print("ceilings:", out["oracle_ceilings"], flush=True)

    model_in = {k: v for k, v in data.items() if not k.startswith("_")
                and k != "g"}
    rows = {}
    t0 = time.time()
    for model in MODELS:
        scores = api.train(model, "SYNTH", "gated_multimodal",
                           data=model_in, cv_cfg=cv_cfg, train_cfg=train_cfg,
                           results=results, storage="discrim.db",
                           checkpoint_dir="discrim_models")
        rows[model] = {
            "average_CV_AUPRC": scores["average_CV_AUPRC"],
            "fold_scores": scores.get("final_test_AUPRC_scores"),
            "oracle_ceiling": out["oracle_ceilings"][VIEW_OF[model]],
        }
        print(f"{model}: {scores['average_CV_AUPRC']} "
              f"(ceiling {rows[model]['oracle_ceiling']})", flush=True)
    out["models"] = rows
    out["wall_clock_s"] = round(time.time() - t0, 1)

    singles = max(rows["FFNN"]["average_CV_AUPRC"],
                  rows["CNN"]["average_CV_AUPRC"])
    fused = max(rows["ConcatNetMultimodal"]["average_CV_AUPRC"],
                rows["EmbraceNetMultimodal"]["average_CV_AUPRC"])
    out["fusion_margin"] = round(fused - singles, 4)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DISCRIM_SWEEP_r2.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
