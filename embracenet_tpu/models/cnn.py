"""CNN supernet (DNA-sequence branch).

Encodes the reference's tunable 1-D CNN family — 1-4 blocks of
``Conv1d(same-pad, k in {5,11,15}) + BatchNorm1d + ReLU + MaxPool1d(10, 2) +
Dropout`` followed by a purely linear FC head ``flat -> 1000 -> 64 -> 2``
(`BIOINF_tesi/models/CNN_net.py:10-83`; note the head has **no activations**
— a reference quirk we reproduce; headless variant `CNN_pre.py:10-76`) — as a
fixed-shape masked supernet:

  * channel menus -> channel masks over maximal channels (64, 96, 256, 512),
  * kernel menu   -> centered tap masks over the maximal 15-tap kernel
    (valid because every conv is same-padded, `CNN_net.py:39-41`),
  * depth         -> selection among the four flatten candidates; the length
    trajectory 256 -> 124 -> 58 -> 25 -> 8 is kernel-independent
    (see ops/convmath.py).

Input: one-hot DNA ``[B, 4, 256]``.  Hyperparameters (traced per trial):
``n_layers`` i32, ``channels`` i32[4], ``kernels`` i32[4], ``dropout`` f32[4].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from embracenet_tpu.config import (
    CNN_HEAD_FC,
    CNN_IN_CHANNELS,
    CNN_MAX_CHANNELS,
    CNN_MAX_KERNEL,
    CNN_MAX_LAYERS,
)
from embracenet_tpu.ops.convmath import CNN_LENGTHS
from embracenet_tpu.models.layers import (
    batchnorm_apply,
    batchnorm_init,
    conv1d_ncw,
    dropout as _dropout,
    kernel_tap_mask,
    linear,
    maxpool1d,
    torch_uniform_init,
    width_mask,
)

#: flatten size of each depth candidate (channels_max * length)
FLAT_SIZES = tuple(c * l for c, l in zip(CNN_MAX_CHANNELS, CNN_LENGTHS))
FLAT_MAX = max(FLAT_SIZES)  # 7936 = 64 * 124


def fan_ins(hp, head: bool = True):
    """Per-layer init fan-ins, the only concrete-hp input to ``init``:
    ``[CNN_MAX_LAYERS (+3 with head: flatten width, fc1, fc2)]`` f32.  The
    two FC fans are fixed constants but still ride the array so the traced
    init sees every fan as runtime data — XLA's constant folding of
    ``rsqrt(literal)`` differs from the runtime op by 1 ulp, which would
    break jitted-vs-eager bit-identity.  See ffnn.fan_ins for why this is
    split out."""
    import numpy as np

    n_layers = int(hp["n_layers"])
    channels = [int(c) for c in hp["channels"]]
    kernels = [int(k) for k in hp["kernels"]]
    fans = []
    c_in_actual = CNN_IN_CHANNELS
    for i in range(CNN_MAX_LAYERS):
        fans.append(c_in_actual * kernels[i])
        if i < n_layers:
            c_in_actual = channels[i]
    if head:
        fans.append(channels[n_layers - 1] * CNN_LENGTHS[n_layers - 1])
        fans.extend(CNN_HEAD_FC)
    return np.asarray(fans, np.float32)


def init_from_fans(key, fans, n_classes: int = 2, head: bool = True):
    """Traceable init: ``fans`` may be a traced f32 vector (see fan_ins)."""
    keys = jax.random.split(key, 2 * CNN_MAX_LAYERS + 6)
    params = {}
    bn_state = {}
    for i in range(CNN_MAX_LAYERS):
        c_in_max = CNN_IN_CHANNELS if i == 0 else CNN_MAX_CHANNELS[i - 1]
        c_out_max = CNN_MAX_CHANNELS[i]
        params[f"conv_w{i}"] = torch_uniform_init(
            keys[2 * i], (c_out_max, c_in_max, CNN_MAX_KERNEL), fans[i])
        params[f"conv_b{i}"] = torch_uniform_init(keys[2 * i + 1], (c_out_max,),
                                                  fans[i])
        bn_p, bn_s = batchnorm_init(c_out_max)
        params[f"bn{i}"] = bn_p
        bn_state[f"bn{i}"] = bn_s
    if head:
        f1, f2 = CNN_HEAD_FC
        params["w_fc1"] = torch_uniform_init(keys[-6], (FLAT_MAX, f1), fans[-3])
        params["b_fc1"] = torch_uniform_init(keys[-5], (f1,), fans[-3])
        params["w_fc2"] = torch_uniform_init(keys[-4], (f1, f2), fans[-2])
        params["b_fc2"] = torch_uniform_init(keys[-3], (f2,), fans[-2])
        params["w_head"] = torch_uniform_init(keys[-2], (f2, n_classes), fans[-1])
        params["b_head"] = torch_uniform_init(keys[-1], (n_classes,), fans[-1])
    return params, bn_state


def init(key, hp, n_classes: int = 2, head: bool = True):
    """Per-trial init with the trial's actual fan-ins (torch parity)."""
    return init_from_fans(key, fan_ins(hp, head), n_classes, head)


def flat_bucket(max_depth: int, max_channels: tuple | None) -> int:
    """Flatten width of a (depth, channel) bucket — FLAT_MAX unsliced."""
    mc = max_channels or CNN_MAX_CHANNELS
    return max(mc[i] * CNN_LENGTHS[i] for i in range(max_depth))


def features(params, bn_state, hp, x, *, train: bool = False, key=None,
             row_mask=None, compute_dtype=None, max_depth: int | None = None,
             max_channels: tuple | None = None,
             max_kernels: tuple | None = None):
    """Headless forward (reference ``CNN_pre``).

    Returns ``(flat [B, FB], flat_mask [FB], new_bn_state)`` where
    ``FB = flat_bucket(max_depth, max_channels)`` (= FLAT_MAX unsliced).
    ``sum(flat_mask)`` equals the reference's ``CNN_pre.output_size``.

    ``max_depth`` (static Python int) compiles only the first ``max_depth``
    blocks — a depth bucket.  A vmapped population whose deepest trial has
    ``n_layers == 2`` then skips the two most expensive conv blocks entirely
    (block 3 alone is ~60% of the supernet's FLOPs).  Trials with
    ``n_layers > max_depth`` would be silently wrong; callers must pass the
    population max (the train engine does).

    ``max_channels`` (static per-layer ints <= CNN_MAX_CHANNELS) is the
    *width bucket*: weights/bias/BN are statically sliced to the
    population's per-layer channel maxima before the convs, so compute costs
    the bucket's FLOPs instead of the global supernet's.  Exact: channels
    beyond a trial's mask are zero, and the channel-major flatten makes
    valid features a prefix regardless of the allocated width.  Params keep
    full supernet shapes (checkpoints/optimizer state are layout-stable);
    BN state is written back into the full-shape buffers.
    """
    n_layers = hp["n_layers"]
    channels = hp["channels"]
    kernels = hp["kernels"]
    rates = hp["dropout"]
    if max_depth is None:
        max_depth = CNN_MAX_LAYERS
    mc = tuple(max_channels) if max_channels else CNN_MAX_CHANNELS
    flat_bk = flat_bucket(max_depth, mc)
    if key is None:
        key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, CNN_MAX_LAYERS)

    new_bn_state = dict(bn_state)
    h = x  # [B, 4, 256]
    flats = []
    for i in range(max_depth):
        c_in = CNN_IN_CHANNELS if i == 0 else mc[i - 1]
        c_out = mc[i]
        # kernel bucket: the centered mk taps of a same-padded CNN_MAX_KERNEL
        # conv compute exactly a same-padded mk-tap conv (odd sizes, both
        # paddings symmetric), so slicing to the population's per-layer max
        # kernel cuts conv FLOPs with identical math
        mk = max_kernels[i] if max_kernels else CNN_MAX_KERNEL
        lo = (CNN_MAX_KERNEL - mk) // 2
        tap = kernel_tap_mask(mk, kernels[i])
        w = params[f"conv_w{i}"][:c_out, :c_in, lo:lo + mk] * tap[None, None, :]
        z = conv1d_ncw(h, w, compute_dtype) \
            + params[f"conv_b{i}"][:c_out][None, :, None]
        bn_p = {k: v[:c_out] for k, v in params[f"bn{i}"].items()}
        bn_s = {k: v[:c_out] for k, v in bn_state[f"bn{i}"].items()}
        z, bn_new = batchnorm_apply(z, bn_p, bn_s, train, row_mask)
        new_bn_state[f"bn{i}"] = {
            k: jnp.asarray(bn_state[f"bn{i}"][k]).at[:c_out].set(bn_new[k])
            for k in bn_new}  # asarray: callers may pass numpy bn state
        z = jax.nn.relu(z)
        z = maxpool1d(z)
        z = _dropout(z, rates[i], keys[i], train)
        cmask = width_mask(c_out, channels[i])
        z = z * cmask[None, :, None]
        h = z
        flat = z.reshape(z.shape[0], -1)
        flats.append(jnp.pad(flat, ((0, 0), (0, flat_bk - flat.shape[1]))))

    # depth selection among the flatten candidates
    out = flats[0]
    for d in range(1, max_depth):
        out = jnp.where(n_layers > d, flats[d], out)

    # valid features occupy [0, channels * length) (channel-major flatten)
    lengths = jnp.asarray(CNN_LENGTHS)
    depth_idx = jnp.clip(n_layers - 1, 0, max_depth - 1)
    flat_valid = jnp.asarray(channels)[depth_idx] * lengths[depth_idx]
    flat_mask = width_mask(flat_bk, flat_valid)
    return out * flat_mask, flat_mask, new_bn_state


def apply(params, bn_state, hp, x, *, train: bool = False, key=None,
          row_mask=None, compute_dtype=None, max_depth: int | None = None,
          max_channels: tuple | None = None,
          max_kernels: tuple | None = None):
    """Headful forward -> (logits [B, n_classes], new_bn_state).

    The FC head is linear->linear->linear with no activations
    (`CNN_net.py:77-83` parity).
    """
    flat, _, new_bn_state = features(params, bn_state, hp, x, train=train,
                                     key=key, row_mask=row_mask,
                                     compute_dtype=compute_dtype,
                                     max_depth=max_depth,
                                     max_channels=max_channels,
                                     max_kernels=max_kernels)
    h = linear(flat, params["w_fc1"][:flat.shape[1], :], params["b_fc1"],
               compute_dtype)
    h = linear(h, params["w_fc2"], params["b_fc2"], compute_dtype)
    return linear(h, params["w_head"], params["b_head"], compute_dtype), new_bn_state
