"""PLC training task (reference training_tf2/train_plc.py + plc_loader.py).

Loss = masked feature L1 + idct band L1 (+ optional signed bias) + clamped
pitch terms + correlation hinge (plc_loss, train_plc.py:160-178). Loss
simulation: real loss traces with random offsets + independent 10% Burg
dropout (plc_loader.py:56-89), here as pure functions of a PRNG key.
"""
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..constants import NB_BANDS, NB_FEATURES
from ..models import plc as plc_model
from ..ops import dsp


def plc_loss(y_true, y_pred, lost_mask, alpha: float = 1.0,
             bias: float = 0.0):
    """train_plc.py:160-178. y_true/y_pred: (B, T, 20); lost_mask:
    (B, T, 1) with 1 on LOST frames — the loss supervises the frames the
    net must conceal (the reference appends `1.0 - out_lost` as the mask
    column, plc_loader.py:83)."""
    e = (y_pred - y_true) * lost_mask
    e_bands = dsp.idct(e[..., :NB_BANDS])
    bias_mask = jnp.clip(4.0 * y_true[..., 19:20], 0.0, 1.0)
    return (jnp.mean(jnp.abs(e))
            + 0.1 * jnp.mean(jnp.maximum(0.0, -e[..., 19:20]))
            + alpha * jnp.mean(jnp.abs(e_bands)
                               + bias * bias_mask
                               * jnp.maximum(0.0, e_bands))
            + jnp.mean(jnp.minimum(jnp.abs(e[..., 18:19]), 1.0))
            + 8.0 * jnp.mean(jnp.minimum(jnp.abs(e[..., 18:19]), 0.4)))


def make_batch(rng: jax.Array, features: jax.Array, lost_trace: jax.Array):
    """Build PLC training inputs from clean [burg36 | feat20] sequences and
    a loss trace (plc_loader.py:56-89).

    features: (B, T, 56); lost_trace: (B, T) in {0, 1}, 1 = received.
    Returns dict(inputs (B, T, 57), targets (B, T, 20), mask (B, T, 1)).
    """
    k1, _ = jax.random.split(rng)
    B, T, _ = features.shape
    nb_burg = 2 * NB_BANDS
    received = lost_trace[..., None].astype(jnp.float32)   # 1 = received
    burg_ok = (jax.random.uniform(k1, (B, T, 1)) > 0.1).astype(jnp.float32)
    in_feats = features * received
    in_feats = in_feats.at[..., :nb_burg].multiply(burg_ok)
    flag = received * (2.0 * burg_ok - 1.0)                # {1, -1}, 0 lost
    inputs = jnp.concatenate([in_feats, flag], axis=-1)
    targets = features[..., nb_burg:]
    # the loss supervises LOST frames (the reference target's mask column
    # is `1.0 - out_lost`, plc_loader.py:79-84 — round-4 polarity fix:
    # masking by `received` trains the net to echo visible frames and
    # leaves concealment barely better than predict-zero)
    return {"inputs": inputs, "targets": targets, "mask": 1.0 - received}


def loss_fn(params, batch, cfg=plc_model.PLCConfig(), alpha=1.0, bias=0.0):
    pred = plc_model.forward_sequence(params, batch["inputs"], cfg)
    total = plc_loss(batch["targets"], pred, batch["mask"], alpha, bias)
    e = (pred - batch["targets"]) * batch["mask"]
    return total, {"loss": total, "l1": jnp.mean(jnp.abs(e)),
                   "ceps_l1": jnp.mean(jnp.abs(e[..., :NB_BANDS]))}


def make_optimizer(lr: float = 1e-3, decay: float = 2.5e-5):
    """Adam(beta2=.99) + 1/(1+decay t): the reference driver's defaults
    when lr is omitted (train_plc.py:143-148, opt at :225)."""
    sched = lambda t: lr / (1.0 + decay * t)
    return optax.chain(optax.scale_by_adam(b2=0.99),
                       optax.scale_by_learning_rate(sched))


@functools.partial(jax.jit, static_argnames=("cfg", "opt"))
def train_step(params, opt_state, batch, cfg, opt):
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, cfg)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
