"""A/B the optimizer-state precision knobs on the real chip (VERDICT r4 #1).

Runs the scoreboard's stage-1 workload (8-trial EmbraceNet HPO population,
`bench.bench_ours`) under three state-precision configurations:

  f32        — round-4 production path (32 B/param optimizer stream)
  bf16-mv    — optim_dtype=bfloat16 (moments stored bf16)
  bf16-full  — + param_dtype=bfloat16 (bf16 live params, f32 master)

and writes OPTIM_DTYPE_AB_r5.json with windows/s for each.  The reference
anchor for the workload is the HPO hot loop
`BIOINF_tesi/models/utils/training_models.py:284-347`.

Usage: python tools/optim_dtype_ab.py [--n 4000] [--trials 8] [--epochs 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--variants", default="f32,bf16-mv,bf16-full")
    args = ap.parse_args()

    bench._enable_jax_cache()
    rng = np.random.default_rng(0)
    d = 64
    data = bench.make_data(args.n + args.n // 4, d, rng)
    train = {k: v[:args.n] for k, v in data.items()}
    test = {k: v[args.n:] for k, v in data.items()}

    variants = {
        "f32": ("float32", "float32"),
        "bf16-mv": ("bfloat16", "float32"),
        "bf16-full": ("bfloat16", "bfloat16"),
    }
    out = {"workload": {"n": args.n, "trials": args.trials,
                        "epochs": args.epochs, "d": d}}
    for name in args.variants.split(","):
        od, pd = variants[name]
        os.environ["EMBRACENET_OPTIM_DTYPE"] = od
        os.environ["EMBRACENET_PARAM_DTYPE"] = pd
        wps = bench.bench_ours(train, test, args.trials, args.epochs, d,
                               width_buckets=True, epoch_chunk=4,
                               label=f"ab/{name}")
        out[name] = {"windows_per_sec_per_chip": wps,
                     "optim_dtype": od, "param_dtype": pd}
        print(f"[ab] {name}: {wps:.0f} windows/s/chip", file=sys.stderr)

    path = os.path.join(REPO, "OPTIM_DTYPE_AB_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
