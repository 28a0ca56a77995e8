#!/usr/bin/env python
"""North-star demonstration: 7-cell-line EmbraceNet train+eval sweep.

BASELINE.json target: "full 7-cell-line EmbraceNet train+eval sweep on a
v5e-8 in under 10 minutes with AUPRC parity".  This script runs the sweep at
reference scale (~100k windows/cell, task T2-like) on however many chips are
attached, with one compiled program shared across all cells (uniform feature
padding + full-depth conv stack + shape bucketing), and reports wall-clock
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=100_000,
                    help="windows per cell line (T2 scale ~= 99,881)")
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--cells", type=int, default=7)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--folds", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default="sweep_bench.json")
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
    data_cache = {c: synthetic_cell(c, args.windows, args.features)
                  for c in cells}

    train_cfg = TrainConfig(
        num_epochs=args.epochs, epoch_chunk=10, batch_size=100,
        compute_dtype="bfloat16",
        cnn_full_depth=not args.width_buckets,
        width_buckets=args.width_buckets,
        pad_ffnn_features=args.features)
    cv_cfg = CVConfig(n_folds=args.folds, n_trials=args.trials,
                      sampler="TPE", fuse_folds=args.fuse_folds)

    t0 = time.time()
    cell_walls = {}
    results = None
    import embracenet_tpu.training.results as _res

    prior = _res.ResultsDict("sweep_bench_results.json")
    for cell in cells:                      # per-cell (per-stage) timing
        if prior.get(cell, task, "EmbraceNetMultimodal"):
            # resumable across chip-service wedges: completed cells are
            # skipped (their CV state also short-circuits via study resume)
            print(f"[sweep] {cell}: already complete, skipping", flush=True)
            cell_walls.setdefault(cell, None)
            continue
        tc = time.time()
        results = sweep.run_sweep(
            data_fn=lambda c, _task: data_cache[c],
            cells=[cell], tasks=[task], models=("EmbraceNetMultimodal",),
            cv_cfg=cv_cfg, train_cfg=train_cfg,
            results_path="sweep_bench_results.json",
            storage="sweep_bench.db", checkpoint_dir="sweep_bench_models",
            verbose=True)
        cell_walls[cell] = round(time.time() - tc, 1)
        print(f"[sweep] {cell}: {cell_walls[cell]}s "
              f"({time.time() - t0:.0f}s total)", flush=True)
    wall = time.time() - t0
    # reload so skipped (already-complete) cells are present in the report;
    # if any cell was skipped, wall covers only the cells run this time
    results = _res.ResultsDict("sweep_bench_results.json")

    per_cell = {}
    windows_trained = 0
    measured_cells = [c for c in cells if cell_walls.get(c) is not None]
    for cell in cells:
        entry = results.get(cell, task, "EmbraceNetMultimodal")
        per_cell[cell] = {
            "average_CV_AUPRC": entry["average_CV_AUPRC"],
            "baseline": results.data[cell][task]["baseline_AUPRC"],
        }
        if cell not in measured_cells:
            # resumed run: this cell's training happened in a PREVIOUS
            # invocation, so its windows must not count against this run's
            # wall (they inflated windows/s by ~total/run cells otherwise)
            continue
        for fold in range(1, args.folds + 1):
            it = entry.get(f"iteration_n_{fold}", {})
            epochs = len(it.get("AUPRC_test", []))
            windows_trained += epochs * int(args.windows * 2 / 3) \
                * (args.trials + 1)

    # Useful-MFU estimate: mean forward FLOPs of the search-space trial
    # distribution (the drawn archs live inside run_sweep; a 200-draw Monte
    # Carlo mean of the same space is an unbiased stand-in), 3x fwd per
    # trained window (fwd+bwd).  Labeled an estimate, not a measurement.
    import bench as _bench
    from embracenet_tpu.hpo import space as _space

    draws = [_space.params_to_hp("EmbraceNetMultimodal",
                                 _space.sample_params(
                                     "EmbraceNetMultimodal",
                                     np.random.default_rng(1000 + i)))
             for i in range(200)]
    mean_fwd = float(np.mean([_bench.embrace_fwd_flops(h, args.features)
                              for h in draws]))
    useful_flops = 3.0 * mean_fwd * windows_trained
    mfu_est = useful_flops / wall / len(jax.devices()) / _bench.V5E_PEAK_BF16

    report = {
        "cells": len(cells),
        "cells_measured_this_run": len(measured_cells),
        "partial_resume": len(measured_cells) < len(cells),
        "windows_per_cell": args.windows,
        "wall_clock_s": round(wall, 1),
        "per_cell_wall_s": cell_walls,
        "chips": len(jax.devices()),
        "per_cell": per_cell,
        "approx_windows_trained": windows_trained,
        "windows_per_sec_per_chip": round(
            windows_trained / wall / len(jax.devices()), 1)
        if measured_cells else None,
        "useful_mfu_estimate": round(mfu_est, 4),
        "useful_mfu_note": ("3x mean-trial fwd FLOPs per trained window; "
                            "mean over 200 search-space draws at "
                            f"d={args.features} (the sweep's own draws are "
                            "internal to run_sweep)"),
        "v5e8_extrapolation": (
            "fold-fused CV trains all folds' HPO populations and retrains "
            "as single vmapped programs whose trial axis (n_folds x "
            "n_trials = {}x{} = {} for HPO, {} for retrain) shards over a "
            "('trial','data') mesh with no cross-trial communication "
            "(engine.fit(mesh=), dryrun_multichip certifies score "
            "equality); 8 chips therefore cut the dominant per-cell train "
            "wall ~8x: projected 7-cell sweep ~{}s on a v5e-8 vs the "
            "{}s measured on one chip here".format(
                args.folds, args.trials, args.folds * args.trials,
                args.folds, round(wall / 8), round(wall))),
    }
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
