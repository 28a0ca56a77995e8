"""CNN+LSTM sequence model (reference `BIOINF_tesi/models/CNN_LSTM_net.py`).

Architecture: 1-2 conv blocks (same menus as the CNN's first two layers),
then the conv output ``[B, C, L]`` is reshaped to ``[B, C*L/4, 4]`` and fed
to an ``LSTM(4 -> hidden in {32,64,128}, 1-2 layers)``; the flattened LSTM
outputs pass through ``Linear(., 1000) -> Linear(1000, 64) -> Linear(64, 2)``
with no activations (`CNN_LSTM_net.py:78-95`).

Reference quirks:
  * the first FC layer is re-instantiated inside ``forward`` every call
    (`:85`) so it could never learn; we give it learned parameters instead
    (documented divergence — the reference never trains this model: it is
    imported by the notebooks but absent from results_dict.pickle).
  * LSTM timestep count depends on the sampled conv channels, so unlike the
    other families this one is *not* shape-uniform across trials; HPO runs
    trials of this family sequentially (see hpo/search.py fallback) instead
    of as one vmapped population.

Hyperparameters (concrete per trial): ``n_layers`` (1-2), ``channels``,
``kernels``, ``dropout`` (conv part), ``lstm_hidden`` in {32, 64, 128},
``lstm_layers`` (1-2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from embracenet_tpu.ops.convmath import CNN_LENGTHS
from embracenet_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv1d_ncw,
    dropout as _dropout,
    torch_uniform_init,
    maxpool1d,
)

LSTM_HIDDEN_MENU = (32, 64, 128)


def _lstm_init(key, input_size, hidden, n_layers):
    """torch nn.LSTM default init: U(-1/sqrt(hidden), 1/sqrt(hidden))."""
    params = []
    keys = jax.random.split(key, 4 * n_layers)
    for layer in range(n_layers):
        d_in = input_size if layer == 0 else hidden
        k0, k1, k2, k3 = keys[4 * layer:4 * layer + 4]
        params.append({
            "w_ih": torch_uniform_init(k0, (d_in, 4 * hidden), hidden),
            "w_hh": torch_uniform_init(k1, (hidden, 4 * hidden), hidden),
            "b_ih": torch_uniform_init(k2, (4 * hidden,), hidden),
            "b_hh": torch_uniform_init(k3, (4 * hidden,), hidden),
        })
    return params


def _lstm_apply(params, x):
    """x: [B, T, D] -> outputs [B, T, H] (batch_first, torch gate order
    i, f, g, o)."""
    b = x.shape[0]
    for layer_params in params:
        hidden = layer_params["w_hh"].shape[0]
        h0 = jnp.zeros((b, hidden))
        c0 = jnp.zeros((b, hidden))

        def cell(carry, xt, lp=layer_params, hid=hidden):
            h, c = carry
            gates = xt @ lp["w_ih"] + lp["b_ih"] + h @ lp["w_hh"] + lp["b_hh"]
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        _, outs = jax.lax.scan(cell, (h0, c0), jnp.swapaxes(x, 0, 1))
        x = jnp.swapaxes(outs, 0, 1)
    return x


def timesteps(hp) -> int:
    depth = int(hp["n_layers"])
    c = int(hp["channels"][depth - 1])
    length = CNN_LENGTHS[depth - 1]
    assert (c * length) % 4 == 0
    return c * length // 4


def init(key, hp, n_classes: int = 2):
    depth = int(hp["n_layers"])
    assert depth <= 2, "reference CNN_LSTM uses 1-2 conv blocks"
    keys = jax.random.split(key, depth * 2 + 8)
    params = {}
    bn_state = {}
    c_in = 4
    for i in range(depth):
        c_out = int(hp["channels"][i])
        k = int(hp["kernels"][i])
        fan_in = c_in * k
        params[f"conv_w{i}"] = torch_uniform_init(keys[2 * i],
                                                  (c_out, c_in, k), fan_in)
        params[f"conv_b{i}"] = torch_uniform_init(keys[2 * i + 1], (c_out,),
                                                  fan_in)
        bn_p, bn_s = batchnorm_init(c_out)
        params[f"bn{i}"] = bn_p
        bn_state[f"bn{i}"] = bn_s
        c_in = c_out

    hidden = int(hp["lstm_hidden"])
    params["lstm"] = _lstm_init(keys[-6], 4, hidden, int(hp["lstm_layers"]))
    t = timesteps(hp)
    flat = t * hidden
    params["w_fc1"] = torch_uniform_init(keys[-5], (flat, 1000), flat)
    params["b_fc1"] = torch_uniform_init(keys[-4], (1000,), flat)
    params["w_fc2"] = torch_uniform_init(keys[-3], (1000, 64), 1000)
    params["b_fc2"] = torch_uniform_init(keys[-2], (64,), 1000)
    params["w_head"] = torch_uniform_init(keys[-1], (64, n_classes), 64)
    params["b_head"] = torch_uniform_init(
        jax.random.fold_in(keys[-1], 1), (n_classes,), 64)
    return params, bn_state


def apply(params, bn_state, hp, x, *, train: bool = False, key=None,
          row_mask=None, compute_dtype=None):
    """x: one-hot [B, 4, 256] -> (logits [B, 2], new_bn_state)."""
    depth = int(hp["n_layers"])
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, depth)
    new_bn = dict(bn_state)
    h = x
    for i in range(depth):
        z = conv1d_ncw(h, params[f"conv_w{i}"], compute_dtype) \
            + params[f"conv_b{i}"][None, :, None]
        z, bn_s = batchnorm_apply(z, params[f"bn{i}"], bn_state[f"bn{i}"],
                                  train, row_mask)
        new_bn[f"bn{i}"] = bn_s
        z = jax.nn.relu(z)
        z = maxpool1d(z)
        z = _dropout(z, float(hp["dropout"][i]), keys[i], train)
        h = z
    b = h.shape[0]
    seq = h.reshape(b, -1, 4)               # [B, C*L/4, 4] (reference :84)
    out = _lstm_apply(params["lstm"], seq)
    flat = out.reshape(b, -1)
    z = flat @ params["w_fc1"] + params["b_fc1"]
    z = z @ params["w_fc2"] + params["b_fc2"]
    logits = z @ params["w_head"] + params["b_head"]
    return logits, new_bn
