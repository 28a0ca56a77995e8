#!/usr/bin/env python
"""Quickstart: the reference's notebook workflow in one script.

Generates a small dataset in the reference's on-disk layout (or point
``--root`` at real data/enhancers + data/promoters), then runs:
preprocess -> K-fold CV with HPO for FFNN and EmbraceNet -> reports.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import embracenet_tpu as et
from embracenet_tpu.config import CVConfig, TrainConfig
from embracenet_tpu.training.results import ResultsDict
from embracenet_tpu.visual import report


def make_demo_data(root: str, rng):
    import pandas as pd

    for family, n in (("enhancers", 300), ("promoters", 600)):
        d = os.path.join(root, family)
        os.makedirs(d, exist_ok=True)
        coords = pd.DataFrame({"chrom": ["chr1"] * n,
                               "chromStart": np.arange(n) * 300,
                               "chromEnd": np.arange(n) * 300 + 256,
                               "strand": ["+"] * n})
        bed = coords[["chrom", "chromStart", "chromEnd"]].copy()
        for cell in et.CELL_LINES:
            labels = (rng.random(n) < 0.2).astype(int)
            feats = rng.normal(size=(n, 16))
            feats[:, :5] += np.outer(labels, rng.normal(size=5) + 1.5)
            df = pd.concat([coords, pd.DataFrame(
                feats, columns=[f"f{j}" for j in range(16)])], axis=1)
            df.to_csv(os.path.join(d, f"{cell}.csv"), index=False)
            bed[cell] = labels
        bed.to_csv(os.path.join(d, f"{family}.bed"), sep="\t", index=False)
        with open(os.path.join(d, f"{family}.fa"), "w") as fh:
            motif = "acgtacgtta"
            for i in range(n):
                seq = "".join(rng.choice(list("acgt"), 256))
                fh.write(seq + "\n" + f">chr1:{i*300}-{i*300+256}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="demo_data")
    ap.add_argument("--cell", default="K562")
    ap.add_argument("--task", default="active_P_vs_inactive_P")
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    if not os.path.exists(args.root):
        print(f"generating demo data under {args.root}/")
        make_demo_data(args.root, np.random.default_rng(0))

    pipe = et.preprocess(args.task, root=args.root)
    results = ResultsDict("results_dict.json")
    for model in ("FFNN", "EmbraceNetMultimodal"):
        print(f"== training {model} on {args.cell} / {args.task}")
        scores = et.train(
            model, args.cell, args.task, pipeline=pipe,
            cv_cfg=CVConfig(n_folds=3, n_trials=3, sampler="TPE"),
            train_cfg=TrainConfig(num_epochs=args.epochs),
            results=results, verbose=True)
        print(f"   average_CV_AUPRC = {scores['average_CV_AUPRC']}")

    print(report.get_average_auprc_df(results.data, args.cell,
                                      models=("FFNN", "EmbraceNetMultimodal"),
                                      tasks=[args.task]))


if __name__ == "__main__":
    main()
