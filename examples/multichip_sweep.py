#!/usr/bin/env python
"""Multi-chip sweep: the production path over a device mesh.

The reference trains its cells x tasks x models grid sequentially on one
GPU (16 notebooks); here the same sweep shards every K-fold CV's HPO
population and retrain over a ``('trial', 'data')`` mesh — on a real
v5e-8 pod slice just run with no flags (all 8 chips land on the 'trial'
axis); this demo runs anywhere by carving 8 virtual CPU devices.

  python examples/multichip_sweep.py            # 8 virtual CPU devices
  python examples/multichip_sweep.py --real     # whatever jax.devices() has

With a mesh, ``KfoldCV`` prefers the fold-FUSED path (all folds'
populations concatenated on one 3x-wider trial axis) so every chip stays
busy — see parallel/mesh.py and training/cv.py:_call_fused.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true",
                    help="use the real devices instead of 8 virtual CPUs")
    ap.add_argument("--cells", nargs="*", default=["K562", "GM12878"])
    args = ap.parse_args()

    import jax

    if not args.real:
        # must run before any other JAX use (backend is initialised once)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    import numpy as np

    from embracenet_tpu import sweep
    from embracenet_tpu.config import CVConfig, TrainConfig

    def data_fn(cell, task):
        # synthetic stand-in for pipelines from sweep.preprocess_all(root).
        # Deterministic digest seed (NOT hash(), which is salted per
        # interpreter and makes the demo irreproducible run-to-run)
        import zlib

        r = np.random.default_rng(zlib.crc32(f"{cell}/{task}".encode())
                                  % 2 ** 31)
        n, d = 400, 16
        y = (r.random(n) < 0.3).astype(np.int64)
        w = r.normal(size=d)
        x = (r.normal(size=(n, d))
             + np.outer(y * 2.0 - 1.0, w) * 0.7).astype(np.float32)
        return {"ffnn": x, "y": y}

    t0 = time.time()
    with tempfile.TemporaryDirectory() as td:
        results = sweep.run_sweep(
            data_fn=data_fn, cells=args.cells,
            tasks=["active_P_vs_inactive_P"], models=("FFNN",),
            cv_cfg=CVConfig(n_folds=3, n_trials=4, sampler="random",
                            fuse_folds=None),      # mesh => fused
            train_cfg=TrainConfig(num_epochs=3, epoch_chunk=3,
                                  batch_size=100, width_buckets=True),
            results_path=os.path.join(td, "results_dict.json"),
            storage=os.path.join(td, "study.db"),
            checkpoint_dir=td, verbose=True,
            mesh="auto")                           # all devices on 'trial'
        for cell in args.cells:
            entry = results.get(cell, "active_P_vs_inactive_P", "FFNN")
            print(f"{cell}: average_CV_AUPRC="
                  f"{entry['average_CV_AUPRC']:.4f}")
    print(f"done in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
