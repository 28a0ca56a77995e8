"""Torch-parity optimizers (Adam, Nadam, RMSprop) as branchless JAX updates.

The reference samples the optimizer *kind* per Optuna trial
(`BIOINF_tesi/models/utils/training_models.py:269-276`; registry
`models/utils/optim/__init__.py`: torch Adam / torch RMSprop / timm Nadam).
To train a whole hyperparameter population as one ``vmap``, the optimizer
choice must be a traced value, not Python control flow.  All three updates
share state ``(m, v, step, m_schedule)``; the candidate parameter deltas are
computed elementwise and selected by ``opt_id`` — on TPU this fuses into the
same VPU pass, costing a few extra FLOPs instead of a compilation per
optimizer.

Semantics (verified against torch in ``tests/test_optim.py``):
  * weight decay is *coupled* (added to the gradient), torch-style.
  * Adam: betas (0.9, 0.999), eps 1e-8, bias correction on both moments.
  * RMSprop: alpha 0.99, eps 1e-8, no momentum, not centered.
  * Nadam: timm's legacy Nadam with schedule_decay 4e-3.

Low-precision state (the HBM-roofline lever): the workload's arithmetic
intensity is AI = 6PB / bytes-streamed-per-param — independent of model
size — so at the reference's fixed B=100 the step is HBM-bound and the
ceiling scales inversely with optimizer-state bytes (docs/STATUS.md
roofline note).  Two knobs, composable:

  * ``state_dtype=bfloat16``: m/v stored bf16 (same exponent range as f32,
    8-bit mantissa); the update math upcasts to f32, computes, rounds back.
  * ``master=True``: ``state['master']`` keeps the f32 source-of-truth
    weights so the *live* params pytree can be stored bf16 — fwd/bwd then
    stream 2 bytes/param instead of 4, and the f32 master preserves small
    updates (lr down to 1e-5) that pure-bf16 weights would round away.

With both off, every ``astype`` is a no-op and the update is bit-identical
to the original f32 path (torch-golden-tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ADAM, NADAM, RMSPROP = 0, 1, 2
OPTIMIZER_IDS = {"Adam": ADAM, "Nadam": NADAM, "RMSprop": RMSPROP}

_B1, _B2 = 0.9, 0.999
_RMS_ALPHA = 0.99
_EPS = 1e-8
_SCHED_DECAY = 4e-3


def init_state(params, state_dtype=None, master: bool = False):
    """Optimizer state pytree: per-leaf (m, v) plus scalar step/schedule.

    ``state_dtype``: storage dtype for the moments (None = match params).
    ``master=True`` adds ``state['master']`` — an f32 copy of ``params``
    that becomes the source of truth when the live params are stored bf16
    (see module docstring)."""
    def z(p):
        return jnp.zeros(p.shape, state_dtype or p.dtype)

    state = {
        "m": jax.tree.map(z, params),
        "v": jax.tree.map(z, params),
        "step": jnp.zeros((), jnp.float32),
        "m_schedule": jnp.ones((), jnp.float32),
    }
    if master:
        state["master"] = jax.tree.map(
            lambda p: p.astype(jnp.float32), params)
    return state


def apply_update(params, grads, state, opt_id, lr, weight_decay):
    """One optimizer step.  ``opt_id``/``lr``/``weight_decay`` may be traced
    scalars (vmapped across a trial population)."""
    step = state["step"] + 1.0
    opt_id = jnp.asarray(opt_id)
    lr = jnp.asarray(lr, jnp.float32)
    weight_decay = jnp.asarray(weight_decay, jnp.float32)

    beta2 = jnp.where(opt_id == RMSPROP, _RMS_ALPHA, _B2)

    # Nadam momentum schedule (timm legacy Nadam).
    mu_t = _B1 * (1.0 - 0.5 * 0.96 ** (step * _SCHED_DECAY))
    mu_t1 = _B1 * (1.0 - 0.5 * 0.96 ** ((step + 1.0) * _SCHED_DECAY))
    m_sched_new = state["m_schedule"] * mu_t
    m_sched_next = m_sched_new * mu_t1

    bc1 = 1.0 - _B1 ** step
    bc2 = 1.0 - beta2 ** step

    # All three updates share the form delta = (cg*g + cm*m_new) / denom
    # with denom = sqrt(v_new * vscale) + eps; selecting the three scalars
    # per optimizer gives ONE elementwise pass over the parameters instead
    # of computing three candidate deltas (3x VPU + memory traffic on the
    # whole population's parameter state):
    #   Adam:    cg = 0,                      cm = 1/bc1,        vscale = 1/bc2
    #   Nadam:   cg = (1-mu_t)/(1-msched),    cm = mu_t1/(1-msched'), 1/bc2
    #   RMSprop: cg = 1,                      cm = 0,            vscale = 1
    nadam_cg = (1.0 - mu_t) / (1.0 - m_sched_new)
    nadam_cm = mu_t1 / (1.0 - m_sched_next)
    cg = jnp.where(opt_id == RMSPROP, 1.0,
                   jnp.where(opt_id == NADAM, nadam_cg, 0.0))
    cm = jnp.where(opt_id == RMSPROP, 0.0,
                   jnp.where(opt_id == NADAM, nadam_cm, 1.0 / bc1))
    vscale = jnp.where(opt_id == RMSPROP, 1.0, 1.0 / bc2)

    def leaf_update(p, g, m, v, w):
        # w is the f32 master (or None when params are the source of truth).
        # All math in f32; m/v round back to their storage dtype on write —
        # with f32 storage and no master every astype is a no-op and this is
        # bit-identical to the plain f32 update.
        src = p if w is None else w
        p32 = src.astype(jnp.float32)
        g = g.astype(jnp.float32) + weight_decay * p32  # coupled wd (torch)
        m_new = _B1 * m.astype(jnp.float32) + (1.0 - _B1) * g
        v_new = beta2 * v.astype(jnp.float32) + (1.0 - beta2) * g * g
        denom = jnp.sqrt(v_new * vscale) + _EPS
        delta = (cg * g + cm * m_new) / denom
        new_w = p32 - lr * delta
        return (new_w.astype(p.dtype), m_new.astype(m.dtype),
                v_new.astype(v.dtype),
                None if w is None else new_w)

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    flat_w = (treedef.flatten_up_to(state["master"])
              if "master" in state else [None] * len(flat_p))
    out = [leaf_update(p, g, m, v, w)
           for p, g, m, v, w in zip(flat_p, flat_g, flat_m, flat_v, flat_w)]
    new_params = treedef.unflatten([o[0] for o in out])
    new_state = {
        "m": treedef.unflatten([o[1] for o in out]),
        "v": treedef.unflatten([o[2] for o in out]),
        "step": step,
        "m_schedule": m_sched_new,
    }
    if "master" in state:
        new_state["master"] = treedef.unflatten([o[3] for o in out])
    return new_params, new_state
