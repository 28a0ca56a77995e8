"""EmbraceNet fusion core + multimodal wrapper (supernet form).

Reference: `BIOINF_tesi/models/EmbraceNetMultimodal.py`.
  * Docking: per-modality ``Linear(d_i -> c) + ReLU`` (`:52-60`).
  * Selection probabilities ``p * availability`` normalised per row (`:69-76`).
  * Embracement: ``torch.multinomial(p, num_samples=c, replacement=True)``
    draws an *iid* modality index per output feature (`:84`), then a one-hot
    toggle mask picks that modality's docking value (`:85-88`).

With two modalities the categorical draw collapses to a per-feature Bernoulli
select — no ``[B, c, m]`` one-hot stack is ever materialised here; the fused
Pallas kernel (ops/pallas/embrace.py) goes further and fuses docking matmuls
with the stochastic select.

Wrapper (`EmbraceNetMultimodal`, `:94-193`): FFNN_pre + CNN_pre branches, a
tuned embracement size in {512, 768, 1024}, 0-2 post Linear+ReLU+Dropout
layers + ``Linear(., 2)`` head, a tuned scalar ``selection_probabilities_FFNN``
p -> [p, 1-p], and *modality dropout*: while training, with probability 0.5
per batch each sample keeps exactly one uniformly chosen modality (`:178-182`).

Hyperparameters (traced): ``ffnn`` sub-dict, ``cnn`` sub-dict,
``embrace_size`` i32, ``n_post`` i32, ``post_widths`` i32[2],
``post_dropout`` f32[2], ``p_ffnn`` f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from embracenet_tpu.config import (
    EMBRACE_MAX_POST_LAYERS,
    EMBRACE_MAX_SIZE,
    FFNN_MAX_WIDTH,
    MODALITY_DROPOUT_P,
)
from embracenet_tpu.models import cnn as cnn_mod
from embracenet_tpu.models import ffnn as ffnn_mod
from embracenet_tpu.models.cnn import FLAT_MAX
from embracenet_tpu.models.layers import (
    dropout as _dropout,
    linear,
    torch_uniform_init,
    width_mask,
)
from embracenet_tpu.ops.convmath import CNN_LENGTHS

E = EMBRACE_MAX_SIZE          # 1024
P = 512                       # post-layer space (max of post width menus)


def embrace(dockings, key, availabilities=None, selection_probabilities=None,
            e_mask=None):
    """Stochastic embracement over a list of docked modalities.

    ``dockings``: list of [B, E] arrays (already ReLU-ed and e-masked).
    Matches `EmbraceNetMultimodal.py:63-88` semantics with jax.random.
    """
    m = len(dockings)
    b = dockings[0].shape[0]
    if availabilities is None:
        availabilities = jnp.ones((b, m), jnp.float32)
    if selection_probabilities is None:
        selection_probabilities = jnp.ones((b, m), jnp.float32)
    p = selection_probabilities * availabilities
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)

    if m == 2:
        # draw at the full embracement width and slice: a width-bucketed
        # docking (E_bucket < E) then selects bitwise-identically to the
        # unbucketed program under the same key
        u = jax.random.uniform(key, (b, E))[:, :dockings[0].shape[1]]
        out = jnp.where(u < p[:, 0:1], dockings[0], dockings[1])
    else:
        logits = jnp.log(jnp.maximum(p, 1e-30))
        idx = jax.random.categorical(
            key, logits[:, None, :], axis=-1,
            shape=(b, dockings[0].shape[1]))
        stack = jnp.stack(dockings, axis=-1)
        out = jnp.take_along_axis(stack, idx[..., None], axis=-1)[..., 0]
    if e_mask is not None:
        out = out * e_mask
    return out


def fan_ins(hp, in_features_ffnn: int):
    """Concrete init fan-ins for the whole multimodal net (see ffnn.fan_ins):
    a dict pytree so a population stacks leaf-wise for the jitted vmap."""
    import numpy as np

    n_post = int(hp["n_post"])
    post_widths = [int(w) for w in hp["post_widths"]]
    e_size = int(hp["embrace_size"])
    ffnn_out = int(hp["ffnn"]["widths"][int(hp["ffnn"]["n_layers"]) - 1])
    cnn_depth = int(hp["cnn"]["n_layers"])
    cnn_out = int(hp["cnn"]["channels"][cnn_depth - 1]) * CNN_LENGTHS[cnn_depth - 1]

    post = []
    fan_in = e_size
    for i in range(EMBRACE_MAX_POST_LAYERS):
        post.append(fan_in)
        if i < n_post:
            fan_in = post_widths[i]
    head_fan = e_size if n_post == 0 else post_widths[n_post - 1]
    return {"ffnn": ffnn_mod.fan_ins(hp["ffnn"], in_features_ffnn, head=False),
            "cnn": cnn_mod.fan_ins(hp["cnn"], head=False),
            "dock": np.asarray([ffnn_out, cnn_out], np.float32),
            "post": np.asarray(post, np.float32),
            "head": np.asarray(head_fan, np.float32)}


def init_from_fans(key, fans, in_features_ffnn: int, n_classes: int = 2):
    """Traceable init (``fans`` from fan_ins; may be traced)."""
    k_ffnn, k_cnn, k_d0, k_d0b, k_d1, k_d1b, k_post, k_head, k_headb = \
        jax.random.split(key, 9)
    ffnn_params = ffnn_mod.init_from_fans(k_ffnn, fans["ffnn"],
                                          in_features_ffnn, head=False)
    cnn_params, bn_state = cnn_mod.init_from_fans(k_cnn, fans["cnn"],
                                                  head=False)
    params = {
        "ffnn": ffnn_params,
        "cnn": cnn_params,
        "dock0_w": torch_uniform_init(k_d0, (FFNN_MAX_WIDTH, E), fans["dock"][0]),
        "dock0_b": torch_uniform_init(k_d0b, (E,), fans["dock"][0]),
        "dock1_w": torch_uniform_init(k_d1, (FLAT_MAX, E), fans["dock"][1]),
        "dock1_b": torch_uniform_init(k_d1b, (E,), fans["dock"][1]),
    }
    pk = jax.random.split(k_post, 2 * EMBRACE_MAX_POST_LAYERS)
    for i in range(EMBRACE_MAX_POST_LAYERS):
        d_in = E if i == 0 else P
        params[f"post_w{i}"] = torch_uniform_init(pk[2 * i], (d_in, P),
                                                  fans["post"][i])
        params[f"post_b{i}"] = torch_uniform_init(pk[2 * i + 1], (P,),
                                                  fans["post"][i])
    params["head_w"] = torch_uniform_init(k_head, (E + P, n_classes),
                                          fans["head"])
    params["head_b"] = torch_uniform_init(k_headb, (n_classes,), fans["head"])
    return params, bn_state


def init(key, hp, in_features_ffnn: int, n_classes: int = 2):
    """Init FFNN/CNN branches, docking layers, post MLP and head."""
    return init_from_fans(key, fan_ins(hp, in_features_ffnn),
                          in_features_ffnn, n_classes)


def apply(params, bn_state, hp, x_ffnn, x_cnn, *, train: bool = False,
          key=None, row_mask=None, availabilities=None,
          modality_dropout: bool = True, compute_dtype=None,
          cnn_max_depth: int | None = None,
          cnn_max_channels: tuple | None = None,
          cnn_max_kernels: tuple | None = None,
          ffnn_max_width: int | None = None,
          embrace_max: int | None = None,
          post_max: int | None = None,
          fused: bool = False):
    """Forward -> (logits [B, 2], new_bn_state).

    The ``*_max`` statics are width buckets (population maxima): weights are
    statically sliced so compute costs the bucket dims, exactly equivalent
    to the full supernet (masked features are zero and prefix-aligned).
    ``fused=True`` runs docking + embracement as one Pallas TPU kernel
    (same distribution, different RNG stream than the XLA path).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_ffnn, k_cnn, k_coin, k_target, k_embrace, k_post = jax.random.split(key, 6)
    EB = embrace_max or E
    PB = post_max or P

    f_ffnn, _ = ffnn_mod.features(params["ffnn"], hp["ffnn"], x_ffnn,
                                  train=train, key=k_ffnn,
                                  compute_dtype=compute_dtype,
                                  max_width=ffnn_max_width)
    f_cnn, _, new_bn_state = cnn_mod.features(
        params["cnn"], bn_state, hp["cnn"], x_cnn, train=train, key=k_cnn,
        row_mask=row_mask, compute_dtype=compute_dtype,
        max_depth=cnn_max_depth, max_channels=cnn_max_channels,
        max_kernels=cnn_max_kernels)

    e_mask = width_mask(EB, hp["embrace_size"])
    b = f_ffnn.shape[0]
    # modality dropout (EmbraceNetMultimodal.py:178-182): batch-level coin,
    # then per-sample single-modality availability.
    if availabilities is None and train and modality_dropout:
        coin = jax.random.uniform(k_coin, ())
        target = jnp.round(jax.random.uniform(k_target, (b,))).astype(jnp.int32)
        one_hot_avail = jax.nn.one_hot(target, 2)
        availabilities = jnp.where(coin >= MODALITY_DROPOUT_P,
                                   one_hot_avail, jnp.ones((b, 2)))
    p = jnp.stack([jnp.broadcast_to(hp["p_ffnn"], (b,)),
                   jnp.broadcast_to(1.0 - hp["p_ffnn"], (b,))], axis=-1)

    if fused:
        # one Pallas kernel: both docking matmuls + ReLU + on-chip PRNG
        # draw + select, no [B, E] docking activations in HBM
        # (ops/pallas/embrace.py).  Availability folds into the per-row
        # Bernoulli prob exactly as embrace() normalises it.
        from embracenet_tpu.ops.pallas.embrace import fused_embrace

        pa = p * (availabilities if availabilities is not None
                  else jnp.ones((b, 2)))
        p0 = pa[:, 0] / jnp.maximum(pa.sum(-1), 1e-30)
        seed = jax.random.randint(k_embrace, (), 0, jnp.int32(2 ** 31 - 1),
                                  dtype=jnp.int32)
        h = fused_embrace(
            f_ffnn, f_cnn,
            params["dock0_w"][:f_ffnn.shape[1], :EB],
            params["dock0_b"][:EB],
            params["dock1_w"][:f_cnn.shape[1], :EB],
            params["dock1_b"][:EB],
            p0, e_mask, seed)
    else:
        d0 = jax.nn.relu(linear(
            f_ffnn, params["dock0_w"][:f_ffnn.shape[1], :EB],
            params["dock0_b"][:EB], compute_dtype)) * e_mask
        d1 = jax.nn.relu(linear(
            f_cnn, params["dock1_w"][:f_cnn.shape[1], :EB],
            params["dock1_b"][:EB], compute_dtype)) * e_mask
        h = embrace([d0, d1], k_embrace, availabilities=availabilities,
                    selection_probabilities=p, e_mask=e_mask)

    # post MLP (0-2 layers) with pass-through selection
    n_post = hp["n_post"]
    pw = hp["post_widths"]
    pr = hp["post_dropout"]
    pk = jax.random.split(k_post, EMBRACE_MAX_POST_LAYERS)
    hp_post = jnp.zeros((b, PB), jnp.float32)
    for i in range(EMBRACE_MAX_POST_LAYERS):
        inp = h if i == 0 else hp_post
        w = params[f"post_w{i}"][:EB, :PB] if i == 0 \
            else params[f"post_w{i}"][:PB, :PB]
        mask = width_mask(PB, pw[i])
        z = jax.nn.relu(linear(inp, w, params[f"post_b{i}"][:PB],
                               compute_dtype)) * mask
        z = _dropout(z, pr[i], pk[i], train) * mask
        hp_post = jnp.where(i < n_post, z, hp_post)

    head_in = jnp.concatenate(
        [h * (n_post == 0), hp_post * (n_post > 0)], axis=-1)
    # head rows follow the [E | P] concat layout; pick the bucketed rows of
    # each block so the slice matches head_in = [EB | PB].  A pre-shrunk
    # leaf (training/slicing.py) already has the bucket layout — detected
    # statically by row count.
    if params["head_w"].shape[0] == EB + PB:
        head_w = params["head_w"]
    else:
        head_w = jnp.concatenate(
            [params["head_w"][:EB], params["head_w"][E:E + PB]], axis=0)
    logits = linear(head_in, head_w, params["head_b"], compute_dtype)
    return logits, new_bn_state
