"""Seed-robustness sweep for the round-4 GM12878/T1 EmbraceNet+augm
parity row (delta +0.089, jax above the reference).

What is already known (PARITY_r4.json curves, NOISE_YARDSTICK_r4.json):
  * the reference is STABLE on this combo under torch-init variation
    (ref-vs-ref |delta| 0.0005), so this is not reference init luck;
  * the whole delta is fold 1, where the jax retrain's test AUPRC climbs
    0.21 -> 0.45 over epochs 6-12 while the reference's plateaus at ~0.19
    and is early-stopped; folds 2/3 track within 0.005;
  * test sets are never augmented, so the higher test score is genuine
    generalization, not leakage.

Open question this script answers: is "jax learns fold 1, ref doesn't" a
one-dataset accident or systematic on this profile?  Three fresh dataset
seeds, full paired reference-vs-jax CV each (same protocol as
tools/gm12878_rootcause.py).  If deltas are mixed-sign/within band, the
r4 row is dataset luck; if jax lands above the reference on every seed,
the divergence is systematic in OUR FAVOR on this profile and is
documented as such (a favorable-quality deviation, not an engine bug).

torch runs on CPU; the jax side uses the default platform (the chip when
healthy).  Writes AUGM_OUTLIER_SWEEP_r4.json.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import parity_bench as pb  # noqa: E402

OUT = os.path.join(REPO, "AUGM_OUTLIER_SWEEP_r4.json")
CELL, TCODE, N = "GM12878", "T1", 1200


def main(seeds=(1411, 1522, 1633), num_epochs=12):
    task = pb.TASK_CODES[TCODE]
    res = {"combo": f"{CELL}/{TCODE}/EmbraceNetMultimodal+augm",
           "band": 0.05,
           "r4_entry": {"delta": 0.08851,
                        "ref_folds": [0.185, 0.2287, 0.1821],
                        "jax_folds": [0.4472, 0.227, 0.1871]},
           "seed_sweep": []}
    if os.path.exists(OUT):
        with open(OUT) as fh:
            res = json.load(fh)
    done = {s["seed"] for s in res["seed_sweep"]}
    for seed in seeds:
        if seed in done:
            continue
        t0 = time.time()
        X_tab, fa, codes, y = pb.make_dataset(CELL, TCODE, N, seed)
        scratch = f"/tmp/augm_outlier/{seed}"
        os.makedirs(scratch, exist_ok=True)
        with open(os.path.join(scratch, "ref.log"), "w") as fh:
            ref_scores, trial_params, ref_wall = pb.run_reference(
                CELL, task, "EmbraceNetMultimodal", X_tab, fa, y,
                num_epochs, seed, scratch, fh, augmentation=True)
        jax_scores, jax_wall = pb.run_jax(
            CELL, task, "EmbraceNetMultimodal", X_tab, codes, y,
            num_epochs, trial_params, scratch, augmentation=True)
        delta = (jax_scores["average_CV_AUPRC"]
                 - ref_scores["average_CV_AUPRC"])
        rf = ref_scores["final_test_AUPRC_scores"]
        jf = jax_scores["final_test_AUPRC_scores"]
        row = {"seed": seed,
               "ref_avg": round(ref_scores["average_CV_AUPRC"], 4),
               "ref_folds": [round(v, 4) for v in rf],
               "jax_avg": round(jax_scores["average_CV_AUPRC"], 4),
               "jax_folds": [round(v, 4) for v in jf],
               "fold_deltas": [round(j - r, 4) for j, r in zip(jf, rf)],
               "delta": round(delta, 5),
               "within_band": bool(abs(delta) <= 0.05),
               "ref_wall_s": round(ref_wall, 1),
               "jax_wall_s": round(jax_wall, 1)}
        res["seed_sweep"].append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as fh:
            json.dump(res, fh, indent=1)
        print(f"[{time.time() - t0:.0f}s] seed {seed} done", flush=True)
    rows = res["seed_sweep"]
    res["summary"] = {
        "n_seeds": len(rows),
        "n_within_band": sum(1 for s in rows if s["within_band"]),
        "n_jax_above": sum(1 for s in rows if s["delta"] > 0),
        "max_abs_delta": max((abs(s["delta"]) for s in rows), default=None),
    }
    with open(OUT, "w") as fh:
        json.dump(res, fh, indent=1)
    print(json.dumps(res["summary"]))


if __name__ == "__main__":
    main()
