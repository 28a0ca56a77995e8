"""Root-cause artifact for the round-3 GM12878/T2/FFNN parity outlier
(VERDICT r3 "What's weak" #2 / "Next round" #3), following the protocol
that closed the round-2 MCF7 outlier (tools/mcf7_rootcause.py).

Unlike the MCF7 case, the round-3 entry IS reproducible: the harness seeds
datasets with crc32 digests, so replaying the combo replays the exact
dataset and the reference's own trial draws.

Curve evidence already in PARITY_r4.json (GM12878/T2/FFNN `curves`,
measured round 3):

  * fold 1: both sides hover at the prevalence baseline (~0.15) — delta
    -0.011, noise.
  * fold 3: both sides learn in lockstep to ~0.24-0.26 — delta -0.027.
  * fold 2 carries the WHOLE outlier: the reference's retrain opens at
    test AUPRC 0.2471 on epoch 1 and finishes at 0.2779, while the jax
    retrain opens at 0.1495, never improves, and EarlyStopping
    (patience=4, `models/utils/utils.py:23-67`) stops it at epoch 5
    (0.1381).  An epoch-1 score is pure init luck — no optimizer step has
    differentiated the sides yet — and the reference's own ES semantics
    convert a cold start into a permanently stopped fold.  This is the
    ES-amplified init-RNG mechanism, not a failure-to-learn: the same
    engine learns fold 3 of the same dataset and every fold of the other
    six cells' T2 combos (PARITY_r4.json FFNN rows).

This script adds the seed-robustness leg: N fresh dataset seeds, full
paired reference-vs-jax CV each (reference ``Kfold_CV``,
`training_models.py:573-698`, torch CPU, deps shimmed).  Done-criterion
from VERDICT r3 #3: within band on >= 3 fresh seeds, with per-fold deltas
recorded so isolated cold-start folds remain visible.

Writes GM12878_ROOTCAUSE_r4.json.  The jax side runs on CPU so the sweep
can share the machine with suites holding the chip (a flatline bug would
be platform-independent).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tools import parity_bench as pb  # noqa: E402

OUT = os.path.join(REPO, "GM12878_ROOTCAUSE_r4.json")

CURVE_FINDINGS = {
    "fold_deltas_r3": [-0.0105, -0.1398, -0.0267],
    "outlier_fold": 2,
    "mechanism": (
        "jax fold-2 retrain opens at 0.1495 (epoch 1) vs ref 0.2471 and is "
        "early-stopped at epoch 5 under the reference's patience-4 rule; "
        "folds 1/3 track within noise.  Epoch-1 spread is init-RNG luck "
        "that ES freezes into the final score."),
}


def main(seeds=(411, 522, 633)):
    res = {"combo": "GM12878/T2/FFNN", "band": 0.05,
           "r3_entry": {"delta": -0.05906,
                        "ref_folds": [0.1574, 0.2779, 0.2632],
                        "jax_folds": [0.1469, 0.1381, 0.2365]},
           "curve_findings": CURVE_FINDINGS,
           "seed_sweep": []}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    done = {s["seed"] for s in res["seed_sweep"]}
    scratch_root = "/tmp/gm12878_rootcause"
    for seed in seeds:
        if seed in done:
            continue
        X_tab, fa, codes, y = pb.make_dataset("GM12878", "T2", 2600, seed)
        scratch = os.path.join(scratch_root, str(seed))
        os.makedirs(scratch, exist_ok=True)
        t0 = time.time()
        with open(os.path.join(scratch, "ref.log"), "w") as fh:
            ref_scores, trial_params, ref_wall = pb.run_reference(
                "GM12878", "active_P_vs_inactive_P", "FFNN", X_tab, fa, y,
                12, seed, scratch, fh)
        jax_scores, jax_wall = pb.run_jax(
            "GM12878", "active_P_vs_inactive_P", "FFNN", X_tab, codes, y,
            12, trial_params, scratch)
        delta = (jax_scores["average_CV_AUPRC"]
                 - ref_scores["average_CV_AUPRC"])
        rf = ref_scores["final_test_AUPRC_scores"]
        jf = jax_scores["final_test_AUPRC_scores"]
        row = {"seed": seed,
               "ref_avg": ref_scores["average_CV_AUPRC"],
               "ref_folds": [round(v, 4) for v in rf],
               "jax_avg": jax_scores["average_CV_AUPRC"],
               "jax_folds": [round(v, 4) for v in jf],
               "fold_deltas": [round(j - r, 4) for j, r in zip(jf, rf)],
               "delta": round(delta, 5),
               "within_band": bool(abs(delta) <= 0.05),
               "ref_wall_s": round(ref_wall, 1),
               "jax_wall_s": round(jax_wall, 1)}
        res["seed_sweep"].append(row)
        print(json.dumps(row))
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)
        print(f"[{time.time() - t0:.0f}s] seed {seed} done")
    n = len(res["seed_sweep"])
    nw = sum(1 for s in res["seed_sweep"] if s["within_band"])
    res["summary"] = {"n_seeds": n, "n_within_band": nw,
                      "max_abs_delta": max((abs(s["delta"])
                                            for s in res["seed_sweep"]),
                                           default=None)}
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res["summary"]))


if __name__ == "__main__":
    main()
