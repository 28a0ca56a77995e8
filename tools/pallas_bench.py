"""Fused-embracement kernel vs unfused XLA at production sizes (VERDICT r1
item 3; r4 #5 earn-or-retire).  Measures forward and forward+backward wall
time per call for the docking+embrace block in isolation — the original
(i, j, k) blocking AND the round-5 full-E blocking that streams x1 exactly
once (ops/pallas/embrace.py::_kernel_fulle) — plus engine-level training
throughput with TrainConfig(fused_embrace=True/False).

Run on the real chip; writes PALLAS_BENCH_r5.json.
"""

from __future__ import annotations

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

from embracenet_tpu.models.embracenet import embrace  # noqa: E402
from embracenet_tpu.models.layers import linear, width_mask  # noqa: E402
from embracenet_tpu.ops.pallas.embrace import (  # noqa: E402
    _fused_fwd_fulle, fused_embrace)


def block_bench(B, D0, D1, E, seed=0, iters=20):
    """Per-call dispatch over the axon tunnel is ~25 ms — far above the
    kernel's own runtime — so each variant runs ``iters`` data-dependent
    repetitions inside ONE jitted program (lax.scan with an input feedback
    so nothing is DCE'd or hoisted) and reports per-iteration time."""
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(B, D0)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(B, D1)).astype(np.float32))
    w0 = jnp.asarray(rng.normal(size=(D0, E)).astype(np.float32)) * 0.02
    b0 = jnp.zeros((E,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(D1, E)).astype(np.float32)) * 0.02
    b1 = jnp.zeros((E,), jnp.float32)
    p0 = jnp.full((B,), 0.5, jnp.float32)
    em = width_mask(E, E)
    key = jax.random.PRNGKey(0)

    def unfused_once(x0, x1, w0, b0, w1, b1, p0):
        d0 = jax.nn.relu(linear(x0.astype(jnp.bfloat16),
                                w0.astype(jnp.bfloat16), b0)) * em
        d1 = jax.nn.relu(linear(x1.astype(jnp.bfloat16),
                                w1.astype(jnp.bfloat16), b1)) * em
        p = jnp.stack([p0, 1 - p0], -1)
        return embrace([d0, d1], key, selection_probabilities=p, e_mask=em)

    def fused_once(x0, x1, w0, b0, w1, b1, p0):
        return fused_embrace(x0, x1, w0, b0, w1, b1, p0, em, 7)

    def fulle_once(x0, x1, w0, b0, w1, b1, p0):
        out, _ = _fused_fwd_fulle(x0, x1, w0, b0, w1, b1, p0, em, 7)
        return out

    def fwd_loop(once):
        @jax.jit
        def run(x0, x1, w0, b0, w1, b1, p0):
            def body(c, _):
                out = once(c, x1, w0, b0, w1, b1, p0)
                # feed a cheap function of the output back into x0 so every
                # iteration depends on the previous one
                return c + 1e-6 * out[:, :D0], ()
            c, _ = jax.lax.scan(body, x0, None, length=iters)
            return c
        return run

    def bwd_loop(once):
        def loss(x0, x1, w0, b0, w1, b1, p0):
            def body(carry, _):
                c, acc = carry
                out = once(c, x1, w0, b0, w1, b1, p0)
                return (c + 1e-6 * out[:, :D0], acc + (out ** 2).sum()), ()
            (_, acc), _ = jax.lax.scan(body, (x0, 0.0), None, length=iters)
            return acc
        return jax.jit(jax.grad(loss, argnums=(2, 4)))

    args = (x0, x1, w0, b0, w1, b1, p0)
    print(f"block B={B} D1={D1} E={E} iters={iters}", file=sys.stderr,
          flush=True)

    def timed_loop(fn, label):
        print(f"  compiling {label}...", file=sys.stderr, flush=True)
        t0 = time.time()
        out = fn(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        print(f"  {label}: warm in {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = fn(*args)
            jax.tree.leaves(out)[0].block_until_ready()
        return (time.time() - t0) / (reps * iters) * 1e3  # ms / iteration

    row = {"B": B, "D0": D0, "D1": D1, "E": E, "iters_per_call": iters,
           "fwd_unfused_ms": round(timed_loop(fwd_loop(unfused_once),
                                              "fwd_unfused"), 3),
           "fwd_fused_ms": round(timed_loop(fwd_loop(fused_once),
                                            "fwd_fused"), 3),
           "fwd_fulle_ms": round(timed_loop(fwd_loop(fulle_once),
                                            "fwd_fullE"), 3),
           "bwd_unfused_ms": round(timed_loop(bwd_loop(unfused_once),
                                              "bwd_unfused"), 3),
           "bwd_fused_ms": round(timed_loop(bwd_loop(fused_once),
                                            "bwd_fused"), 3)}
    row["fwd_speedup"] = round(row["fwd_unfused_ms"] / row["fwd_fused_ms"], 3)
    row["fwd_fulle_speedup"] = round(
        row["fwd_unfused_ms"] / row["fwd_fulle_ms"], 3)
    row["bwd_speedup"] = round(row["bwd_unfused_ms"] / row["bwd_fused_ms"], 3)

    # Roofline: is "XLA fusion is already HBM-optimal" a number or a story?
    # fwd FLOPs = two [B,Dm]x[Dm,E] matmuls; min HBM traffic = activations
    # in (f32) + both weight panels (bf16 on the MXU path) + output (f32).
    peak_bf16 = 197e12
    hbm_bw = 819e9
    flops = 2 * B * (D0 + D1) * E
    bytes_min = 4 * B * (D0 + D1) + 2 * (D0 + D1) * E + 4 * B * E
    t_compute = flops / peak_bf16
    t_memory = bytes_min / hbm_bw
    ideal_ms = max(t_compute, t_memory) * 1e3
    row["roofline"] = {
        "flops": flops, "bytes_min": bytes_min,
        "arith_intensity": round(flops / bytes_min, 2),
        "bound": "compute" if t_compute > t_memory else "memory",
        "ideal_ms": round(ideal_ms, 4),
        "fwd_unfused_x_ideal": round(row["fwd_unfused_ms"] / ideal_ms, 1),
        "fwd_fused_x_ideal": round(row["fwd_fused_ms"] / ideal_ms, 1),
        "fwd_fulle_x_ideal": round(row["fwd_fulle_ms"] / ideal_ms, 1),
    }
    print(f"  roofline: {row['roofline']['bound']}-bound, ideal "
          f"{ideal_ms:.3f} ms; unfused {row['fwd_unfused_ms']:.3f} ms = "
          f"{row['roofline']['fwd_unfused_x_ideal']}x ideal, fused "
          f"{row['fwd_fused_ms']:.3f} ms = "
          f"{row['roofline']['fwd_fused_x_ideal']}x ideal", file=sys.stderr,
          flush=True)
    print(row, flush=True)
    return row


def engine_bench(fused: bool, n=4000, epochs=10, batch=1024):
    from embracenet_tpu.config import TrainConfig
    from embracenet_tpu.hpo import space
    from embracenet_tpu.training import engine
    from embracenet_tpu.training.modelspec import get_spec

    rng = np.random.default_rng(0)
    d = 64
    y = (rng.random(n + 500) < 0.2).astype(np.int64)
    data = {"ffnn": rng.normal(size=(n + 500, d)).astype(np.float32),
            "cnn": rng.integers(0, 4, size=(n + 500, 256)).astype(np.uint8),
            "y": y}
    train = {k: v[:n] for k, v in data.items()}
    test = {k: v[n:] for k, v in data.items()}
    flat = space.sample_params("EmbraceNetMultimodal",
                               np.random.default_rng(3))
    flat.update(CNN_n_layers=1, EMBRACENET_embracement_size=1024)
    hp = space.params_to_hp("EmbraceNetMultimodal", flat)
    opt = space.optimizer_hp(flat)
    spec = get_spec("EmbraceNetMultimodal", in_features_ffnn=d)
    cfg = TrainConfig(num_epochs=epochs, epoch_chunk=epochs,
                      batch_size=batch, compute_dtype="bfloat16",
                      patience=10_000, fused_embrace=fused)
    engine.fit(spec, [hp], [opt], train, test, cfg)
    t0 = time.time()
    res = engine.fit(spec, [hp], [opt], train, test, cfg)
    dt = time.time() - t0
    ep = len(res.auprc_test[0])
    wps = n * ep / dt
    print(f"engine fused={fused}: {dt:.2f}s -> {wps:.0f} w/s", flush=True)
    return wps


def main():
    # B=100: the reference's parity-pinned batch (training_models.py:284);
    # B=1280: the compute-bound regime (docs/STATUS.md roofline note);
    # B=4096: where the r2 (i,j,k) blocking lost 0.43x to its x1 re-streams
    out = {"blocks": [], "engine": {}}
    for B in (100, 256, 1280, 4096):
        out["blocks"].append(block_bench(B, 256, 7936, 1024))
    out["engine"]["unfused_wps"] = round(engine_bench(False), 1)
    out["engine"]["fused_wps"] = round(engine_bench(True), 1)
    out["engine"]["speedup"] = round(
        out["engine"]["fused_wps"] / out["engine"]["unfused_wps"], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PALLAS_BENCH_r5.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["engine"], indent=1))


if __name__ == "__main__":
    main()
