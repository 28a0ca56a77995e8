#!/usr/bin/env python
"""Fold-fused CV at v5e-8 PER-CHIP footprint on the single real chip
(VERDICT r4 #3).

The v5e-8 projection in SWEEP_BENCH_FULL assumes the fold-fused trial axis
(3 folds x 3 HPO trials = 9, retrain 3) shards over a ('trial','data') mesh:
each chip then executes 1-2 trials' programs against the fold-concatenated
dataset.  The 9-trial x 100k-window SINGLE-chip fused program crashed this
rig's TPU service twice (docs/STATUS.md r4), so the projection's fused leg
was unvalidated.  This tool runs EXACTLY one chip's shard — a fused
population of 2 EmbraceNetMultimodal trials, per-trial balanced plans over
two folds' concatenated ~100k-window data, pinned per-trial RNG streams —
and

  1. asserts score-equality (rtol 1e-5) with the two sequential per-fold
     fits it replaces (same keys, same plans), and
  2. reports the fused program's steady windows/s on the real chip.

Reference anchor: the CV retrain hot path `BIOINF_tesi/models/utils/
training_models.py:646-692`; fused construction mirrors training/cv.py
``_call_fused``.

Writes FUSED_FOOTPRINT_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=100_000)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=6)
    args = ap.parse_args()

    from embracenet_tpu.utils import jaxcache

    jaxcache.enable(os.path.join(REPO, ".jax_cache"))

    import jax

    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.hpo.search import concat_fold_views
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.batching import (balanced_plan, eval_plan,
                                                  shift_plan)
    from embracenet_tpu.training.modelspec import get_spec
    from tools.sweep_bench import synthetic_cell

    n, d = args.windows, args.features
    data = synthetic_cell("K562", n, d)
    # two CV folds' (trainval, test) splits at reference geometry
    # (Kfold_CV: test = n/3 of the fold, train = rest)
    idx = np.arange(n)
    folds = []
    third = n // 3
    for j in range(2):
        test_idx = idx[j * third:(j + 1) * third]
        train_idx = np.setdiff1d(idx, test_idx)
        folds.append((train_idx, test_idx))

    def view(i):
        return {k: np.asarray(v)[i] for k, v in data.items()}

    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=d)
    flats = [space.sample_params("EmbraceNetMultimodal",
                                 np.random.default_rng(s)) for s in (0, 1)]
    hps = [space.params_to_hp("EmbraceNetMultimodal", f) for f in flats]
    opts = [space.optimizer_hp(f) for f in flats]
    cfg = TrainConfig(num_epochs=args.epochs, epoch_chunk=max(
        args.epochs // 3, 1), batch_size=100, compute_dtype="bfloat16",
        patience=10_000, width_buckets=True)

    fold_data = [(view(tr), view(te)) for tr, te in folds]
    keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]

    # ---- sequential per-fold fits (the meshless reference) ----
    seq_scores, seq_walls = [], []
    for j in range(2):
        tr_d, te_d = fold_data[j]
        t0 = time.time()
        res = engine.fit(spec, [hps[j]], [opts[j]], tr_d, te_d, cfg,
                         key=keys[j])
        seq_walls.append(time.time() - t0)
        seq_scores.append([res.auprc_test[0], res.auprc_train[0]])
        print(f"[seq fold {j}] test {res.auprc_test[0][-1]:.4f} "
              f"({seq_walls[-1]:.1f}s)", file=sys.stderr)

    # ---- fused: ONE program, 2 trials, per-trial plans over concat data --
    cat_tr, off_tr = concat_fold_views([fd[0] for fd in fold_data],
                                       ("ffnn", "cnn", "y"))
    cat_te, off_te = concat_fold_views([fd[1] for fd in fold_data],
                                       ("ffnn", "cnn", "y"))
    tps, eps, iks, rks = [], [], [], []
    for j in range(2):
        tr_d, te_d = fold_data[j]
        tps.append(shift_plan(balanced_plan(tr_d["y"], cfg.batch_size,
                                            seed=123), off_tr[j]))
        eps.append(shift_plan(eval_plan(len(te_d["y"]), cfg.batch_size * 2,
                                        seed=123), off_te[j]))
        ik, rk = engine.key_streams(keys[j], 1)
        iks.append(np.asarray(ik))
        rks.append(np.asarray(rk))

    meter = {"windows": 0.0, "secs": 0.0}

    def cb(chunk_idx, n_ep, wall_s, wpe):
        if chunk_idx >= 1:
            meter["windows"] += n_ep * wpe
            meter["secs"] += wall_s

    t0 = time.time()
    fused = engine.fit(spec, hps, opts, cat_tr, cat_te, cfg,
                       train_plans=tps, eval_plans=eps,
                       init_keys=np.concatenate(iks),
                       run_keys=np.concatenate(rks),
                       chunk_callback=cb)
    fused_wall = time.time() - t0

    deltas = []
    for j in range(2):
        np.testing.assert_allclose(fused.auprc_test[j], seq_scores[j][0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(fused.auprc_train[j], seq_scores[j][1],
                                   rtol=1e-5, atol=1e-6)
        deltas.append(float(np.max(np.abs(
            np.asarray(fused.auprc_test[j]) - np.asarray(seq_scores[j][0])))))
    steady_wps = meter["windows"] / meter["secs"] if meter["secs"] else None
    n_tr_windows = sum(float(p.mask.sum()) for p in tps)
    report = {
        "windows": n, "features": d, "epochs": args.epochs,
        "trials_fused": 2,
        "per_chip_shard": "2 trials x fold-concatenated ~133k train windows "
                          "(what one v5e-8 chip holds of the 9-trial fused "
                          "HPO population / 3-trial retrain)",
        "score_equality": {"max_abs_delta_vs_sequential": max(deltas),
                           "asserted_rtol": 1e-5},
        "fused_wall_s": round(fused_wall, 1),
        "sequential_walls_s": [round(w, 1) for w in seq_walls],
        "steady_windows_per_sec_per_chip":
            round(steady_wps, 1) if steady_wps else None,
        "train_windows_per_epoch": int(n_tr_windows),
        "note": "fused program ran to completion on the real chip — the "
                "round-4 crash was the 9-trial x 100k single-chip footprint, "
                "not the fused path itself; at v5e-8 per-chip footprint it "
                "is stable and score-identical to the sequential fits",
    }
    with open(os.path.join(REPO, "FUSED_FOOTPRINT_r5.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
