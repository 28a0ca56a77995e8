#!/usr/bin/env python
"""North-star demonstration: reference-scale multi-model training sweep.

BASELINE.json target: "full 7-cell-line EmbraceNet train+eval sweep on a
v5e-8 in under 10 minutes with AUPRC parity".  Two policies:

  --policy embrace   (round-4 behavior) one EmbraceNetMultimodal CV per
                     cell — the EmbraceNet-only north-star workload;
  --policy full      the reference's ACTUAL per-cell notebook workload
                     (`06_*K562.ipynb` cells 16-28, `13_*K562_Embracenet
                     .ipynb` cells 17/28; VERDICT r4 #2): FFNN with the
                     smote/double contest + Wilcoxon winner select on
                     imbalanced cells, CNN, ConcatNet, EmbraceNet, and
                     EmbraceNet augmentation=True — per-model walls and a
                     results_dict carrying every reference key including
                     ``best_augmentation``.

Runs at reference scale (~100k windows/cell, T2-like task) on however many
chips are attached, resumable per (cell, model column); reports wall-clock
plus the per-chip scaling math for a v5e-8.

Synthetic data carries a planted signal so learning is observable; swap in
``sweep.preprocess_all`` pipelines for real data.
"""

import argparse
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

from embracenet_tpu import CELL_LINES  # noqa: E402
from embracenet_tpu.config import CVConfig, TrainConfig  # noqa: E402
from embracenet_tpu import sweep  # noqa: E402

#: --policy full: cells with the reference's T1/T5-style imbalance (pos/neg
#: < 0.1) exercise the rebalancing path and the FFNN smote-vs-double
#: contest; the rest are T2-like.  The reference's per-cell workload mixes
#: both profiles across its 5 tasks (BASELINE.md prevalences 0.06-0.45).
IMBALANCED_CELLS = ("GM12878", "HEK293", "MCF7")

FULL_COLUMNS = ("FFNN", "CNN", "ConcatNetMultimodal", "EmbraceNetMultimodal",
                "EmbraceNetMultimodal_augmentation")


def synthetic_cell(cell: str, n: int, d: int, imbalance: float = 0.125):
    # deterministic digest seed (hash() is salted per interpreter)
    import zlib

    r = np.random.default_rng(zlib.crc32(cell.encode()) % 2**31)
    y = (r.random(n) < imbalance).astype(np.int64)
    w = r.normal(size=d)
    x = (r.normal(size=(n, d)) + np.outer(y * 2 - 1, w) * 0.4).astype(np.float32)
    codes = r.integers(0, 4, size=(n, 256)).astype(np.uint8)
    motif = np.array([0, 1, 2, 3, 3, 2, 1, 0, 0, 1], np.uint8)
    for i in np.flatnonzero(y):
        p = r.integers(0, 246)
        codes[i, p:p + 10] = motif
    return {"ffnn": x, "cnn": codes, "y": y}


def _entry_windows(entry, n_windows, n_folds, n_trials, mult=1.0):
    """Approximate trained windows of one CV entry: per fold, each trained
    epoch passes ~2/3 of the cell's windows through (trials+1) fits (HPO
    population + retrain).  ``mult=2`` for augmentation=True (the reference
    doubles the train set, `data_pipe/utils.py:588-648`)."""
    total = 0
    for fold in range(1, n_folds + 1):
        it = entry.get(f"iteration_n_{fold}", {})
        epochs = len(it.get("AUPRC_test", []))
        total += epochs * int(n_windows * 2 / 3) * (n_trials + 1) * mult
    return int(total)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=100_000,
                    help="windows per cell line (T2 scale ~= 99,881)")
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--cells", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--policy", default="embrace", choices=("embrace", "full"))
    ap.add_argument("--out", default="sweep_bench.json")
    ap.add_argument("--budget", type=float, default=0.0,
                    help="wall-clock budget in seconds; stop cleanly after "
                         "the current (cell, model) once exceeded (results "
                         "are incremental, nothing is lost)")
    ap.add_argument("--width-buckets", action="store_true",
                    help="per-population width-sliced programs (min FLOPs; "
                         "more program variants — best with a warm compile "
                         "cache) instead of one shared full-size program")
    ap.add_argument("--fuse-folds", action="store_true", default=None,
                    help="all folds' HPO (and retrains) as single fused "
                         "vmapped programs — fewer dispatches, wider trial "
                         "axis")
    args = ap.parse_args()

    cells = CELL_LINES[:args.cells]
    task = "active_P_vs_inactive_P"
    full = args.policy == "full"
    columns = FULL_COLUMNS if full else ("EmbraceNetMultimodal",)

    def cell_data(c):
        imb = 0.08 if (full and c in IMBALANCED_CELLS) else 0.125
        return synthetic_cell(c, args.windows, args.features, imbalance=imb)

    data_cache = {}

    train_cfg = TrainConfig(
        num_epochs=args.epochs, epoch_chunk=10, batch_size=100,
        compute_dtype="bfloat16",
        cnn_full_depth=not args.width_buckets,
        width_buckets=args.width_buckets,
        pad_ffnn_features=args.features,
        # round-5 scoreboard fix: dispatch chunk k+1 before fetching chunk
        # k's metrics so chunk boundaries never drain the device pipeline —
        # bit-identical numerics (tests/test_engine.py), ~30% faster steady
        pipeline_chunks=True)
    cv_cfg = CVConfig(n_folds=args.folds, n_trials=args.trials,
                      sampler="TPE", fuse_folds=args.fuse_folds)

    t0 = time.time()
    cell_walls = {}
    measured_pairs = set()
    import embracenet_tpu.training.results as _res

    prior = _res.ResultsDict("sweep_bench_results.json")

    # Per-(cell, column) walls persist across invocations so a sweep that
    # rides out accelerator-service brownouts via crash+resume still
    # reports the WHOLE grid's walls and throughput, not just the last
    # invocation's slice.  A column whose first attempt died mid-way gets
    # only its completing attempt's wall (its resumed HPO trials
    # short-circuit via study resume, so little work is double-counted;
    # flagged below via resume_attempts).
    WALLS_PATH = "sweep_bench_walls.json"
    if os.path.exists(WALLS_PATH):
        with open(WALLS_PATH) as fh:
            wall_state = json.load(fh)
        wall_state["attempts"] = wall_state.get("attempts", 0) + 1
    else:
        wall_state = {"pairs": {}, "attempts": 1}
    model_walls = {}
    for k, v in wall_state["pairs"].items():
        c, m = k.split("/", 1)
        model_walls.setdefault(c, {})[m] = v
        measured_pairs.add((c, m))

    def _record_wall(cell, col, secs):
        model_walls.setdefault(cell, {})[col] = secs
        wall_state["pairs"][f"{cell}/{col}"] = secs
        with open(WALLS_PATH, "w") as fh:
            json.dump(wall_state, fh)

    def done_key(col):
        # FFNN's contest writes FFNN_smote/FFNN_double then copies the
        # Wilcoxon winner to the canonical "FFNN" key — its presence means
        # the whole contest (incl. select) completed
        return ("EmbraceNetMultimodal_augmentation"
                if col == "EmbraceNetMultimodal_augmentation" else
                col.replace("_augmentation", ""))

    stopped = False
    for cell in cells:                      # per-cell (per-stage) timing
        tc = time.time()
        ran_any = False
        for col in columns:
            if prior.get(cell, task, done_key(col)):
                # resumable across chip-service wedges: completed columns
                # are skipped (CV state also short-circuits via study
                # resume)
                print(f"[sweep] {cell}/{col}: already complete, skipping",
                      flush=True)
                continue
            if args.budget and time.time() - t0 > args.budget:
                print(f"[sweep] budget exceeded; stopping before "
                      f"{cell}/{col}", flush=True)
                stopped = True
                break
            if cell not in data_cache:
                data_cache[cell] = cell_data(cell)
            tm = time.time()
            sweep.run_sweep(
                data_fn=lambda c, _task: data_cache[c],
                cells=[cell], tasks=[task], models=(col,),
                cv_cfg=cv_cfg, train_cfg=train_cfg,
                results_path="sweep_bench_results.json",
                storage="sweep_bench.db", checkpoint_dir="sweep_bench_models",
                verbose=True)
            prior = _res.ResultsDict("sweep_bench_results.json")
            _record_wall(cell, col, round(time.time() - tm, 1))
            measured_pairs.add((cell, col))
            ran_any = True
            print(f"[sweep] {cell}/{col}: {model_walls[cell][col]}s "
                  f"({time.time() - t0:.0f}s total)", flush=True)
        cell_walls[cell] = round(time.time() - tc, 1) if ran_any else None
        if stopped:
            break
    # Throughput denominator: the union of recorded per-pair walls (all
    # invocations of this sweep), matching the windows numerator below,
    # which counts the same pairs — honest across both budget-resumes
    # (ADVICE r4) and crash-resumes after service brownouts.
    wall = sum(wall_state["pairs"].values())
    cell_walls = {c: round(sum(ws.values()), 1)
                  for c, ws in model_walls.items()}
    results = _res.ResultsDict("sweep_bench_results.json")

    per_cell = {}
    windows_trained = 0
    family_windows = {}
    for cell in cells:
        cell_report = {}
        for col in columns:
            key = done_key(col)
            entry = results.get(cell, task, key)
            if not entry:
                continue
            label = ("EmbraceNet_augm"
                     if col == "EmbraceNetMultimodal_augmentation" else key)
            cell_report[label] = entry["average_CV_AUPRC"]
            if (cell, col) not in measured_pairs:
                continue
            mult = 2.0 if col.endswith("_augmentation") else 1.0
            if col == "FFNN" and results.get(cell, task, "FFNN_smote"):
                # contest: two full CVs ran; the "FFNN" key is a copy of
                # the winner, so count the two real entries instead
                w = sum(_entry_windows(results.get(cell, task, k),
                                       args.windows, args.folds, args.trials)
                        for k in ("FFNN_smote", "FFNN_double"))
            else:
                w = _entry_windows(entry, args.windows, args.folds,
                                   args.trials, mult)
            windows_trained += w
            fam = "CNN" if key == "CNN" else (
                "FFNN" if key == "FFNN" else "multimodal")
            family_windows[fam] = family_windows.get(fam, 0) + w
        if results.data.get(cell, {}).get(task):
            cell_report["baseline"] = results.data[cell][task].get(
                "baseline_AUPRC")
            cell_report["best_augmentation"] = results.data[cell][task].get(
                "best_augmentation")
        per_cell[cell] = cell_report

    # Useful-MFU estimate: per-family mean forward FLOPs of the search-space
    # trial distribution (200-draw Monte Carlo), weighted by each family's
    # trained windows, 3x fwd per trained window (fwd+bwd).  Labeled an
    # estimate, not a measurement.
    import bench as _bench
    from embracenet_tpu.hpo import space as _space

    def mean_fwd_flops(family):
        draws = [_space.sample_params(family, np.random.default_rng(1000 + i))
                 for i in range(200)]
        hps = [_space.params_to_hp(family, f) for f in draws]
        if family == "FFNN":
            return float(np.mean([_bench._ffnn_fwd_flops(
                h, args.features)[0] for h in hps]))
        if family == "CNN":
            def headful(h):
                conv, flat = _bench._cnn_fwd_flops(h)
                # fixed FC head 1000 -> 64 -> 2 (models/CNN_net.py:72-74)
                return conv + 2 * (flat * 1000 + 1000 * 64 + 64 * 2)
            return float(np.mean([headful(h) for h in hps]))
        return float(np.mean([_bench.embrace_fwd_flops(h, args.features)
                              for h in hps]))

    fam_flops = {"FFNN": mean_fwd_flops("FFNN"),
                 "CNN": mean_fwd_flops("CNN"),
                 "multimodal": mean_fwd_flops("EmbraceNetMultimodal")}
    useful_flops = 3.0 * sum(fam_flops[f] * w
                             for f, w in family_windows.items())
    mfu_est = useful_flops / wall / len(jax.devices()) / _bench.V5E_PEAK_BF16 \
        if wall > 0 else 0.0

    report = {
        "policy": args.policy,
        "columns": list(columns),
        "cells": len(cells),
        "pairs_measured": sorted(f"{c}/{m}" for c, m in measured_pairs),
        "partial_resume": len(measured_pairs) < len(cells) * len(columns),
        "resume_attempts": wall_state["attempts"],
        "windows_per_cell": args.windows,
        "wall_clock_s": round(wall, 1),
        "per_cell_wall_s": cell_walls,
        "per_model_wall_s": model_walls,
        "chips": len(jax.devices()),
        "per_cell": per_cell,
        "approx_windows_trained": windows_trained,
        "windows_per_sec_per_chip": round(
            windows_trained / wall / len(jax.devices()), 1)
        if measured_pairs else None,
        "useful_mfu_estimate": round(mfu_est, 4),
        "useful_mfu_note": ("3x per-family mean-trial fwd FLOPs per trained "
                            "window, weighted by each family's windows; "
                            "family means over 200 search-space draws at "
                            f"d={args.features} (the sweep's own draws are "
                            "internal to run_sweep)"),
        "v5e8_extrapolation": (
            "fold-fused CV trains all folds' HPO populations and retrains "
            "as single vmapped programs whose trial axis (n_folds x "
            "n_trials = {}x{} = {} for HPO, {} for retrain) shards over a "
            "('trial','data') mesh with no cross-trial communication "
            "(engine.fit(mesh=), dryrun_multichip certifies score "
            "equality); 8 chips therefore cut the dominant per-cell train "
            "wall ~8x: projected sweep ~{}s on a v5e-8 vs the "
            "{}s measured on one chip here".format(
                args.folds, args.trials, args.folds * args.trials,
                args.folds, round(wall / 8), round(wall))),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
