#!/usr/bin/env python
"""Realism suite: the 5 tasks at reference-like imbalance and weak signal.

The reference's published AUPRCs sit in 0.1-0.84 over baselines 0.1-0.45
(BASELINE.md) — heavily imbalanced tasks with hard signal, where the
rebalancing path (SMOTE / reverse-strand) and the argmax-AUPRC quirk are
actually load-bearing.  This bench builds one K562-like cell with the five
tasks' prevalences and deliberately weak tabular + motif signal, then runs
the full CV (FFNN and EmbraceNet) and reports where the scores land
relative to the prevalence baselines.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax  # noqa: E402

from embracenet_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable(os.path.join(REPO, ".jax_cache"))

from embracenet_tpu import api  # noqa: E402
from embracenet_tpu.config import CVConfig, TrainConfig  # noqa: E402
from embracenet_tpu.training.results import ResultsDict, baseline_auprc  # noqa: E402

# prevalences from BASELINE.md K562 baselines (floored values unfloored
# where the floor applied)
TASK_PREVALENCE = {
    "active_E_vs_inactive_E": 0.08,
    "active_P_vs_inactive_P": 0.125,
    "active_E_vs_active_P": 0.306,
    "inactive_E_vs_inactive_P": 0.398,
    "active_EP_vs_inactive_rest": 0.111,
}


def weak_task(task: str, n: int, d: int, rng):
    p = TASK_PREVALENCE[task]
    y = (rng.random(n) < p).astype(np.int64)
    x = rng.normal(size=(n, d)).astype(np.float32)
    # weak tabular signal: 0.5-sigma shift on 6 of d features
    x[:, :6] += np.outer(y, rng.normal(size=6) * 0.5).astype(np.float32)
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    motif = np.array([0, 1, 2, 3, 0, 2], np.uint8)
    # weak sequence signal: motif enriched in positives (45% vs 15%)
    for i in range(n):
        r = rng.random()
        if (y[i] and r < 0.45) or (not y[i] and r < 0.15):
            lo = rng.integers(0, 250)
            codes[i, lo:lo + 6] = motif
    return {"ffnn": x, "cnn": codes, "y": y}


def main():
    n = 12000
    d = 64
    rng = np.random.default_rng(7)
    train_cfg = TrainConfig(num_epochs=60, epoch_chunk=15, batch_size=100,
                            compute_dtype="bfloat16", cnn_full_depth=True,
                            pad_ffnn_features=d)
    cv_cfg = CVConfig(n_folds=3, n_trials=3, sampler="TPE")
    results = ResultsDict("realism_results.json")
    out = {}
    t0 = time.time()
    for task, prev in TASK_PREVALENCE.items():
        data = weak_task(task, n, d, rng)
        row = {"prevalence": float(np.mean(data["y"])),
               "baseline": baseline_auprc(data["y"])}
        for model in ("FFNN", "EmbraceNetMultimodal"):
            scores = api.train(model, "K562", task, data=data,
                               cv_cfg=cv_cfg, train_cfg=train_cfg,
                               results=results, storage="realism.db",
                               checkpoint_dir="realism_models")
            row[model] = scores["average_CV_AUPRC"]
            print(f"{task} / {model}: {row[model]} "
                  f"(baseline {row['baseline']:.3f})", flush=True)
        out[task] = row
    report = {"wall_clock_s": round(time.time() - t0, 1),
              "windows_per_task": n, "tasks": out}
    with open("realism_bench.json", "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
