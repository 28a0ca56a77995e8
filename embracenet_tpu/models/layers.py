"""Masked building blocks for architecture supernets.

Why supernets: the reference samples layer counts, widths, kernel sizes and
dropout rates inside each model's ``__init__`` via Optuna
(`BIOINF_tesi/models/FF_net.py:18-46`, `models/CNN_net.py:26-57`).  Variable
shapes are hostile to XLA (a recompile per architecture) and make parallel
trials impossible.  Here every tunable architecture lives inside a fixed
maximal shape; the sampled hyperparameters become *traced masks*:

  * width menus      -> feature-channel masks over the maximal width,
  * kernel-size menu -> centered tap masks over the maximal kernel,
  * depth            -> pass-through selection between consecutive blocks.

A population of N trials is then ``vmap``-ed over per-trial params + masks and
sharded over the mesh's ``trial`` axis.  Each trial's effective function is
*identical* to the reference architecture it encodes (tested against explicit
small networks in ``tests/test_models.py``).

Initialisation parity: torch ``nn.Linear``/``nn.Conv1d`` default init is
kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights
and the same bound for biases.  Supernet sub-blocks are initialised with the
*trial's actual fan-in*, not the maximal one, so training dynamics match the
reference's per-architecture init.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def torch_uniform_init(key, shape, fan_in):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv1d default."""
    # lax.rsqrt, not 1/sqrt: XLA rewrites the latter to rsqrt under jit but
    # not eagerly, so the two paths would differ by 1 ulp on non-power-of-two
    # fans (population init must be bit-identical jitted vs eager).
    bound = jax.lax.rsqrt(jnp.maximum(jnp.asarray(fan_in, jnp.float32), 1.0))
    return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0) * bound


def width_mask(max_width: int, width) -> jnp.ndarray:
    """[max_width] float mask with ones below ``width`` (traced scalar ok)."""
    return (jnp.arange(max_width) < width).astype(jnp.float32)


def kernel_tap_mask(max_kernel: int, kernel) -> jnp.ndarray:
    """Centered tap mask: a same-padded conv with ``max_kernel`` taps whose
    mask keeps the centered ``kernel`` taps computes exactly a same-padded
    ``kernel``-tap conv (both paddings are symmetric for odd sizes)."""
    idx = jnp.arange(max_kernel)
    lo = (max_kernel - kernel) // 2
    return ((idx >= lo) & (idx < lo + kernel)).astype(jnp.float32)


def dropout(x, rate, key, train: bool):
    """Inverted dropout, torch semantics; ``rate`` may be a traced scalar."""
    if not train:
        return x
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / jnp.maximum(keep, 1e-8), 0.0)


def linear(x, w, b, compute_dtype=None):
    """y = x @ w + b.  ``compute_dtype=bfloat16`` feeds the MXU at full rate
    with fp32 accumulation; ``None`` forces true fp32 (TPU default matmul
    precision would otherwise silently round inputs to bf16)."""
    if compute_dtype is not None:
        y = jnp.dot(x.astype(compute_dtype), w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    return y + b


def conv1d_ncw(x, w, compute_dtype=None):
    """Same-padded 1-D conv, NCW layout (x: [B,C,L], w: [O,I,K]).

    In low-precision mode the conv runs wholly in ``compute_dtype`` and the
    result is upcast afterwards: JAX's conv transpose rule rejects the
    mixed bf16-in/f32-out form (`preferred_element_type` widening breaks
    under grad), and the MXU accumulates in fp32 internally either way.
    """
    k = w.shape[-1]
    kwargs = dict(
        window_strides=(1,),
        padding=[((k - 1) // 2, (k - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if compute_dtype is not None:
        y = lax.conv_general_dilated(
            x.astype(compute_dtype), w.astype(compute_dtype), **kwargs)
        return y.astype(jnp.float32)
    return lax.conv_general_dilated(
        x, w, preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST, **kwargs)


def maxpool1d(x, kernel: int = 10, stride: int = 2):
    """torch MaxPool1d(kernel, stride), floor mode. x: [B, C, L]."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, 1, kernel),
        window_strides=(1, 1, stride),
        padding="VALID",
    )


# ---------------------------------------------------------------------------
# BatchNorm1d with torch semantics + padding-row masking
# ---------------------------------------------------------------------------

BN_EPS = 1e-5
BN_MOMENTUM = 0.1


def batchnorm_init(n_channels: int):
    params = {
        "scale": jnp.ones((n_channels,), jnp.float32),
        "bias": jnp.zeros((n_channels,), jnp.float32),
    }
    state = {
        "mean": jnp.zeros((n_channels,), jnp.float32),
        "var": jnp.ones((n_channels,), jnp.float32),
    }
    return params, state


def batchnorm_apply(x, params, state, train: bool, row_mask=None):
    """BatchNorm1d over [B, C, L] (stats over B and L per channel).

    ``row_mask`` ([B]) excludes padded rows from the batch statistics so a
    padded static batch normalises identically to the reference's ragged
    batch.  Running stats use the unbiased variance, torch-style.
    Returns (y, new_state).
    """
    if not train:
        mean, var = state["mean"], state["var"]
        inv = lax.rsqrt(var + BN_EPS)
        y = (x - mean[None, :, None]) * inv[None, :, None]
        y = y * params["scale"][None, :, None] + params["bias"][None, :, None]
        return y, state

    if row_mask is None:
        row_mask = jnp.ones((x.shape[0],), jnp.float32)
    m = row_mask.astype(jnp.float32)[:, None, None]
    n = jnp.maximum(jnp.sum(m) * x.shape[-1], 1.0)
    mean = jnp.sum(x * m, axis=(0, 2)) / n
    var = jnp.sum(((x - mean[None, :, None]) ** 2) * m, axis=(0, 2)) / n
    inv = lax.rsqrt(var + BN_EPS)
    y = (x - mean[None, :, None]) * inv[None, :, None]
    y = y * params["scale"][None, :, None] + params["bias"][None, :, None]
    unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
    new_state = {
        "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
        "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
    }
    return y, new_state
