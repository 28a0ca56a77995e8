"""Fused EmbraceNet embracement as a Pallas TPU kernel.

Reference semantics (`BIOINF_tesi/models/EmbraceNetMultimodal.py:34-88`):
dock each modality with Linear+ReLU, draw an iid modality index per output
feature from the per-row selection probabilities, and keep that modality's
docked value.  The torch implementation materialises a ``[B, c, m]`` one-hot
stack in HBM; here *both* docking matmuls, the ReLU, the per-feature
Bernoulli draw (on-chip PRNG) and the select run in one VMEM-resident kernel,
so the only HBM traffic is inputs, weights and the ``[B, E]`` result (plus
the choose mask saved for the backward pass).

Two modalities (this pipeline's case): the categorical collapses to a
per-feature Bernoulli with probability ``p0[row]`` for modality 0.

Backward is ordinary XLA (the select makes it three masked matmuls); the
kernel carries a custom VJP so ``jax.grad`` works through it.  Tests compare
against the unfused path at the probability extremes (exact) and mid-range
(distributional) in interpreter mode on CPU; stochastic behaviour was
validated on-chip (p0=0.3 draw measured 0.29; deterministic per seed).

Measured on one v5e chip (B=256, E=1024, D1=7936, device-resident inputs):
fused 0.76 ms/call vs 0.47 ms for the unfused XLA path — XLA's automatic
fusion is already strong at this model scale and both are dominated by
dispatch latency, so the engine keeps the XLA path as default; the kernel is
the building block for larger embracement widths / batch sizes where the
HBM round trip of the docking activations matters.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, x0_ref, x1k_ref, w0_ref, b0_ref, w1k_ref, b1_ref,
            p0_ref, emask_ref, out_ref, choose_ref, acc_ref):
    """Grid (B-blocks, E-blocks, K-splits); k is innermost, so the big
    ``[D1, E]`` docking weight streams through VMEM one ``[block_k,
    block_e]`` tile at a time (Pallas double-buffers the next tile's DMA
    against this step's MXU work).  The modality-1 partial products
    accumulate in a VMEM scratch; the small modality-0 dock, the on-chip
    PRNG draw and the select run once at the final k."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)
    n_j = pl.num_programs(1)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x1k_ref[:], w1k_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _finish():
        pltpu.prng_seed(seed_ref[0] + i * n_j + j)
        d0 = jnp.maximum(
            jnp.dot(x0_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
            + b0_ref[0, :], 0.0)
        d1 = jnp.maximum(acc_ref[:] + b1_ref[0, :], 0.0)
        # prng_random_bits yields *signed* int32 and Mosaic cannot cast
        # uint32->f32; clear the sign bit to get 31 uniform bits (caught
        # on-chip: the naive arithmetic shift of negatives skewed a p0=0.3
        # draw to select modality 0 at 0.77)
        bits = pltpu.prng_random_bits(d0.shape) & jnp.int32(0x7FFFFFFF)
        u = bits.astype(jnp.float32) * (1.0 / (1 << 31))  # uniform [0, 1)
        choose0 = u < p0_ref[:, 0:1]
        out_ref[:] = jnp.where(choose0, d0, d1) * emask_ref[0, :]
        choose_ref[:] = choose0.astype(jnp.float32)


def _kernel_fulle(seed_ref, x0_ref, x1k_ref, w0_ref, b0_ref, w1k_ref, b1_ref,
                  p0_ref, emask_ref, out_ref, choose_ref, acc_ref):
    """Full-E blocking: grid (B-blocks, K-splits) with the WHOLE embracement
    width resident in the f32 VMEM accumulator.  The original (i, j, k)
    blocking re-streamed the ``[B, D1]`` docking input once per E-block
    (8x at E=1024) — measured 0.43x vs XLA at B=4096 (PALLAS_BENCH_r2).
    Here x1 streams exactly once; the ``[D1, E]`` weight streams once per
    B-block (weight tiles double-buffered against MXU work).  VMEM at
    block_b=256, block_k=512, E=1024: acc 1 MB f32 + w1 tile 1 MB bf16 +
    outputs 2x1 MB — comfortably inside 16 MB."""
    i = pl.program_id(0)
    k = pl.program_id(1)
    n_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x1k_ref[:], w1k_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _finish():
        pltpu.prng_seed(seed_ref[0] + i)
        d0 = jnp.maximum(
            jnp.dot(x0_ref[:], w0_ref[:], preferred_element_type=jnp.float32)
            + b0_ref[0, :], 0.0)
        d1 = jnp.maximum(acc_ref[:] + b1_ref[0, :], 0.0)
        bits = pltpu.prng_random_bits(d0.shape) & jnp.int32(0x7FFFFFFF)
        u = bits.astype(jnp.float32) * (1.0 / (1 << 31))  # uniform [0, 1)
        choose0 = u < p0_ref[:, 0:1]
        out_ref[:] = jnp.where(choose0, d0, d1) * emask_ref[0, :]
        choose_ref[:] = choose0.astype(jnp.float32)


def _fused_fwd_fulle(x0, x1, w0, b0, w1, b1, p0, e_mask, seed,
                     block_b: int = 256, block_k: int = 512,
                     interpret: bool = False, operand_dtype=jnp.bfloat16):
    """Full-E variant of :func:`_fused_fwd_raw` (see _kernel_fulle)."""
    if interpret is True:
        interpret = pltpu.InterpretParams()
        operand_dtype = jnp.float32
    b, d0_in = x0.shape
    e = w0.shape[1]
    x0p = _pad_to(x0.astype(operand_dtype), 0, block_b)
    x1p = _pad_to(_pad_to(x1.astype(operand_dtype), 0, block_b), 1, block_k)
    w1p = _pad_to(w1.astype(operand_dtype), 0, block_k)
    p0p = _pad_to(p0.reshape(-1, 1).astype(jnp.float32), 0, block_b)
    bp = x0p.shape[0]
    kp = x1p.shape[1]
    grid = (bp // block_b, kp // block_k)

    out, choose = pl.pallas_call(
        _kernel_fulle,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, d0_in), lambda i, k, s: (i, 0)),
                pl.BlockSpec((block_b, block_k), lambda i, k, s: (i, k)),
                pl.BlockSpec((d0_in, e), lambda i, k, s: (0, 0)),
                pl.BlockSpec((1, e), lambda i, k, s: (0, 0)),
                pl.BlockSpec((block_k, e), lambda i, k, s: (k, 0)),
                pl.BlockSpec((1, e), lambda i, k, s: (0, 0)),
                pl.BlockSpec((block_b, 1), lambda i, k, s: (i, 0)),
                pl.BlockSpec((1, e), lambda i, k, s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((block_b, e), lambda i, k, s: (i, 0)),
                pl.BlockSpec((block_b, e), lambda i, k, s: (i, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_b, e), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bp, e), jnp.float32),
            jax.ShapeDtypeStruct((bp, e), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      x0p, x1p,
      w0.astype(operand_dtype), b0.reshape(1, -1).astype(jnp.float32),
      w1p, b1.reshape(1, -1).astype(jnp.float32),
      p0p, e_mask.reshape(1, -1).astype(jnp.float32))
    return out[:b], choose[:b]


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fused_fwd_raw(x0, x1, w0, b0, w1, b1, p0, e_mask, seed,
                   block_b: int = 128, block_e: int = 128,
                   block_k: int = 512,
                   interpret: bool = False, operand_dtype=jnp.bfloat16):
    if interpret is True:
        # boolean interpret lacks TPU-primitive (prng_*) rules off-TPU;
        # InterpretParams carries the TPU interpreter
        interpret = pltpu.InterpretParams()
        operand_dtype = jnp.float32  # interpreter numerics for exact tests
    b, d0_in = x0.shape
    e = w0.shape[1]
    # bf16 operands keep the streamed tiles far inside the 16 MB VMEM
    # budget; the MXU accumulates every dot in f32 via
    # preferred_element_type and the K accumulator scratch is f32.
    x0p = _pad_to(x0.astype(operand_dtype), 0, block_b)
    x1p = _pad_to(_pad_to(x1.astype(operand_dtype), 0, block_b), 1, block_k)
    w1p = _pad_to(w1.astype(operand_dtype), 0, block_k)
    p0p = _pad_to(p0.reshape(-1, 1).astype(jnp.float32), 0, block_b)
    bp = x0p.shape[0]
    kp = x1p.shape[1]
    grid = (bp // block_b, e // block_e, kp // block_k)

    out, choose = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, d0_in), lambda i, j, k, s: (i, 0)),
                pl.BlockSpec((block_b, block_k), lambda i, j, k, s: (i, k)),
                pl.BlockSpec((d0_in, block_e), lambda i, j, k, s: (0, j)),
                pl.BlockSpec((1, block_e), lambda i, j, k, s: (0, j)),
                pl.BlockSpec((block_k, block_e), lambda i, j, k, s: (k, j)),
                pl.BlockSpec((1, block_e), lambda i, j, k, s: (0, j)),
                pl.BlockSpec((block_b, 1), lambda i, j, k, s: (i, 0)),
                pl.BlockSpec((1, block_e), lambda i, j, k, s: (0, j)),
            ],
            out_specs=[
                pl.BlockSpec((block_b, block_e), lambda i, j, k, s: (i, j)),
                pl.BlockSpec((block_b, block_e), lambda i, j, k, s: (i, j)),
            ],
            scratch_shapes=[pltpu.VMEM((block_b, block_e), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bp, e), jnp.float32),
            jax.ShapeDtypeStruct((bp, e), jnp.float32),
        ],
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32),
      x0p, x1p,
      w0.astype(operand_dtype), b0.reshape(1, -1).astype(jnp.float32),
      w1p, b1.reshape(1, -1).astype(jnp.float32),
      p0p, e_mask.reshape(1, -1).astype(jnp.float32))
    return out[:b], choose[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_embrace(x0, x1, w0, b0, w1, b1, p0, e_mask, seed,
                  interpret=False):
    """Fused docking + stochastic embracement.

    x0 [B, D0], x1 [B, D1]; w0 [D0, E], w1 [D1, E]; p0 [B] prob of picking
    modality 0 per feature; e_mask [E] embracement-size mask; seed int32
    scalar (may be traced — it rides the scalar-prefetch lane).
    Returns [B, E].
    """
    out, _ = _fused_fwd_raw(x0, x1, w0, b0, w1, b1, p0, e_mask, seed,
                            interpret=interpret)
    return out


def _fwd(x0, x1, w0, b0, w1, b1, p0, e_mask, seed, interpret):
    out, choose = _fused_fwd_raw(x0, x1, w0, b0, w1, b1, p0, e_mask, seed,
                                 interpret=interpret)
    return out, (x0, x1, w0, b0, w1, b1, e_mask, choose, out)


def _bwd(interpret, res, g):
    import numpy as np

    x0, x1, w0, b0, w1, b1, e_mask, choose, out = res
    g = g * e_mask[None, :]
    # out = choose * relu(x0 w0 + b0) + (1-choose) * relu(x1 w1 + b1)
    # relu' = out > 0 where the branch was selected (out holds the selected
    # branch's value, masked)
    relu_live = (out > 0).astype(g.dtype)
    g0 = g * choose * relu_live
    g1 = g * (1.0 - choose) * relu_live
    dx0 = g0 @ w0.T
    dw0 = x0.T @ g0
    db0 = g0.sum(0)
    dx1 = g1 @ w1.T
    dw1 = x1.T @ g1
    db1 = g1.sum(0)
    dp0 = jnp.zeros(x0.shape[:1], x0.dtype)  # sampling is not differentiated
    demask = jnp.zeros_like(e_mask)
    dseed = np.zeros((), jax.dtypes.float0)  # integer arg: symbolic zero
    return dx0, dx1, dw0, db0, dw1, db1, dp0, demask, dseed


fused_embrace.defvjp(_fwd, _bwd)
