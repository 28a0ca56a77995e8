"""Reference-vs-reference noise yardstick for the parity band.

Question this answers: when a parity combo's |delta| exceeds the ±0.05
band, is that an engine divergence or the workload's intrinsic noise?

Method: run the reference's OWN ``Kfold_CV`` twice on the SAME dataset,
SAME splits, SAME rebalancing draws and SAME sampled trial architectures
(numpy/optuna streams fixed), varying ONLY ``torch.manual_seed`` — i.e.
model init, dropout masks, and any other torch randomness.  The |delta|
between the two reference runs is the reference's intrinsic
average_CV_AUPRC run-to-run noise at this profile; a jax-vs-ref delta
inside that spread carries no evidence of divergence.

This is the quantitative companion to the per-combo seed sweeps
(tools/mcf7_rootcause.py, tools/gm12878_rootcause.py): those vary the
dataset, this isolates pure init luck — the mechanism the curve evidence
identified (a retrain fold that opens cold is frozen by the reference's
patience-4 EarlyStopping, `models/utils/utils.py:23-67`).

Writes NOISE_YARDSTICK_r5.json (cumulative over r4).  Runs on CPU (torch side only; no jax).
"""

import json
import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import parity_bench as pb  # noqa: E402

OUT = os.path.join(REPO, "NOISE_YARDSTICK_r5.json")
_R4 = os.path.join(REPO, "NOISE_YARDSTICK_r4.json")

# The round-4 FFNN parity rows (the high-variance family: 3-fold averages
# of a small MLP under reference ES): every out-of-band row plus in-band
# controls, reproduced from PARITY_r4.json combo profiles.
COMBOS = [
    # (cell, tcode[, model_name])        r4 jax-vs-ref delta
    ("GM12878", "T2"),                 # -0.059  OUT
    ("H1", "T2"),                      # +0.072  OUT
    ("H1", "T3"),                      # +0.051  OUT
    ("HEK293", "T3"),                  # -0.077  OUT
    ("MCF7", "T2"),                    # +0.007  in
    ("A549", "T3"),                    # -0.034  in
    # the one out-of-band multimodal row: EmbraceNet's stochastic
    # embracement draws ride the torch RNG too, so the same pair design
    # isolates the reference's own noise on the augmentation path
    ("GM12878", "T1", "EmbraceNetMultimodal+augm"),  # +0.089  OUT
    # round 5: two more augmentation pairs so the augm family has >= 3
    # measured reference-self-noise rows and its parity band becomes
    # yardstick-calibrated instead of the default 0.05
    # (tools/parity_bench._yardstick_band_by_family)
    ("A549", "T2", "EmbraceNetMultimodal+augm"),
    ("MCF7", "T5", "EmbraceNetMultimodal+augm"),
]

TORCH_SEED_OFFSET = 7919  # a prime, for no reason beyond being memorable


def run_pair(cell, tcode, model_name="FFNN", num_epochs=12):
    augmentation = model_name.endswith("+augm")
    base_model = model_name.removesuffix("+augm")
    task = pb.TASK_CODES[tcode]
    key = f"{cell}/{tcode}/{model_name}"
    # multimodal combos use the (smaller) multimodal row count, exactly as
    # the parity suite sizes them
    n = pb.ROWS_TAB[tcode] if base_model in ("FFNN", "CNN") else 1200
    seed = zlib.crc32(key.encode()) % (2 ** 31)  # == the parity combo seed
    X_tab, fa, codes, y = pb.make_dataset(cell, tcode, n, seed)
    runs = []
    for ts in (seed, seed + TORCH_SEED_OFFSET):
        # separate scratch per torch seed: the reference reloads its
        # fold-best checkpoint by filename (models_/<study>.pt,
        # training_models_multimodal.py:614,97) and a different torch seed
        # can crown a different-architecture best trial — run B must not
        # see run A's files
        scratch = f"/tmp/noise_yardstick/{cell}_{tcode}_{base_model}_{ts}"
        os.makedirs(scratch, exist_ok=True)
        with open(os.path.join(scratch, f"ref_{ts}.log"), "w") as fh:
            scores, _, wall = pb.run_reference(
                cell, task, base_model, X_tab, fa, y, num_epochs, seed,
                scratch, fh, augmentation=augmentation, torch_seed=ts)
        runs.append(scores)
    a, b = runs
    return {
        "combo": key,
        "avg_a": round(a["average_CV_AUPRC"], 4),
        "avg_b": round(b["average_CV_AUPRC"], 4),
        "ref_vs_ref_delta": round(
            b["average_CV_AUPRC"] - a["average_CV_AUPRC"], 5),
        "fold_deltas": [round(y_ - x_, 4) for x_, y_ in
                        zip(a["final_test_AUPRC_scores"],
                            b["final_test_AUPRC_scores"])],
    }


def main():
    res = {"method": __doc__.strip().split("\n\n")[1],
           "band": 0.05, "epochs": 12, "rows": []}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    elif os.path.exists(_R4):   # cumulative: seed round 5 with round 4's rows
        with open(_R4) as fh:
            res = json.load(fh)
    done = {r["combo"] for r in res["rows"]}
    for combo in COMBOS:
        cell, tcode = combo[:2]
        model_name = combo[2] if len(combo) > 2 else "FFNN"
        if f"{cell}/{tcode}/{model_name}" in done:
            continue
        t0 = time.time()
        row = run_pair(cell, tcode, model_name)
        row["wall_s"] = round(time.time() - t0, 1)
        res["rows"].append(row)
        print(json.dumps(row))
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)
    ds = [abs(r["ref_vs_ref_delta"]) for r in res["rows"]]
    fd = [abs(d) for r in res["rows"] for d in r["fold_deltas"]]
    res["summary"] = {
        "n_pairs": len(ds),
        "max_abs_ref_vs_ref_delta": max(ds, default=None),
        "mean_abs_ref_vs_ref_delta": round(sum(ds) / len(ds), 5) if ds
        else None,
        "n_outside_band": sum(1 for d in ds if d > 0.05),
        "max_abs_fold_delta": max(fd, default=None),
        "note": ("ref-vs-ref |delta| at or above the jax-vs-ref deltas "
                 "means the out-of-band parity rows are inside the "
                 "reference's own init-luck noise floor"),
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res["summary"]))


if __name__ == "__main__":
    main()
