"""LPCNet training task: teacher-forced forward pass, loss, and train step.

The training graph mirrors training_tf2/lpcnet.py:312-475 but is re-staged
for TPU: everything time-parallel is lifted out of the recurrence (input-side
GRU matmuls run as one big (B*S, .) x (., .) MXU matmul) and only the
irreducible recurrent part runs inside lax.scan.

Data contract per batch (see training_tf2/dataloader.py:17-70 and
src/dump_data.c:84-108):
  sig_in   (B, S)  lagged/noisy input signal (linear, int16 range)
  sig_out  (B, S)  clean target signal
  features (B, T+4, 20)   feature frames, incl. conv lookahead context
  periods  (B, T+4) int32 pitch embedding indices
  lpc      (B, T, 16)     LPC per output frame (non-E2E mode)
with S == T * frame_size. The +4 frames feed the two valid-padded convs
(training uses padding='valid', lpcnet.py:334).
"""
import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import layers, lpcnet
from ..ops import activations
from . import losses


def _valid_frame_net(params, features, periods, cfg):
    """Frame conditioning with valid padding: (B, T+4, .) -> (B, T, cond)."""
    ap = cfg.approx
    pe = layers.embedding_apply(params["embed_pitch"], periods)
    x = jnp.concatenate([features[..., :cfg.nb_features], pe], axis=-1)
    for name in ("conv1", "conv2"):
        p = params[name]
        x = jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1,), padding="VALID",
            dimension_numbers=("NTC", "TIO", "NTC"))
        x = activations.get("tanh", ap)(x + p["b"])
    x = layers.dense_apply(params["dense1"], x, "tanh", ap)
    x = layers.dense_apply(params["dense2"], x, "tanh", ap)
    return x


def _diff_embed(table, u):
    """Fractional embedding lookup (diffembed.py:42-49). u: continuous
    mu-law in [0, 255]; linear interp between adjacent rows."""
    alpha = (u - jnp.floor(u))[..., None]
    lo = u.astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, 255)
    return (1 - alpha) * jnp.take(table, lo, axis=0) \
        + alpha * jnp.take(table, hi, axis=0)


def _gru_scan(zrh_in, h0, wr, br, approx):
    """Run a reset-after GRU over time given precomputed input-side
    preactivations. zrh_in: (B, S, 3N); returns (B, S, N) states."""
    n = h0.shape[-1]
    sig = activations.get("sigmoid", approx)
    act = activations.get("tanh", approx)

    def step(h, zrh):
        recur = h @ wr + br
        z = sig(zrh[..., :n] + recur[..., :n])
        r = sig(zrh[..., n:2 * n] + recur[..., n:2 * n])
        hc = act(zrh[..., 2 * n:] + r * recur[..., 2 * n:])
        h = z * h + (1 - z) * hc
        return h, h

    _, hs = jax.lax.scan(step, h0, zrh_in.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def forward(params, batch, cfg: lpcnet.LPCNetConfig,
            rng: Optional[jax.Array] = None,
            train: bool = True) -> Dict[str, jax.Array]:
    """Teacher-forced forward. Returns tensor_preds, real_preds, pdf
    (training_tf2/lpcnet.py:357-439)."""
    fs = cfg.frame_size
    sig_in = batch["sig_in"].astype(jnp.float32)
    B, S = sig_in.shape

    cfeat = _valid_frame_net(params, batch["features"], batch["periods"], cfg)
    T = cfeat.shape[1]
    assert T * fs == S, (T, fs, S)

    if cfg.e2e:
        rc = cfeat[..., :cfg.lpc_order]
        lpc = losses.rc2lpc(rc)
    else:
        rc = None
        lpc = batch["lpc"].astype(jnp.float32)

    gamma_w = cfg.lpc_gamma ** np.arange(1, cfg.lpc_order + 1, dtype=np.float32)
    tensor_preds = losses.diff_pred(sig_in, lpc * gamma_w, fs)
    real_preds = losses.diff_pred(sig_in, lpc, fs)
    past_errors = losses.l2u(sig_in - jnp.roll(tensor_preds, 1, axis=1))

    cpcm = jnp.stack([losses.l2u(sig_in), losses.l2u(tensor_preds),
                      past_errors], axis=-1)  # (B, S, 3)
    if train and rng is not None:
        rng, k1, k2 = jax.random.split(rng, 3)
        cpcm = cpcm + 0.3 * jax.random.normal(k1, cpcm.shape)  # lpcnet.py:371
    emb = _diff_embed(params["embed_sig"]["e"], jnp.clip(cpcm, 0.0, 255.0))
    emb = emb.reshape(B, S, 3 * cfg.embed_sig_size)

    cfeat_rep = jnp.repeat(cfeat, fs, axis=1)  # (B, S, cond)
    rnn_in = jnp.concatenate([emb, cfeat_rep], axis=-1)

    # GRU-A: input matmul hoisted out of the scan (one MXU matmul over B*S)
    ga = params["gru_a"]
    zrh_a = rnn_in @ ga["wi"] + ga["bi"]
    h0a = jnp.zeros((B, cfg.gru_a_units), jnp.float32)
    out_a = _gru_scan(zrh_a, h0a, ga["wr"], ga["br"], cfg.approx)
    if train and rng is not None:
        out_a = out_a + 0.005 * jax.random.normal(k2, out_a.shape)  # :425

    gb = params["gru_b"]
    in_b = jnp.concatenate([out_a, cfeat_rep], axis=-1)
    zrh_b = in_b @ gb["wi"] + gb["bi"]
    h0b = jnp.zeros((B, cfg.gru_b_units), jnp.float32)
    out_b = _gru_scan(zrh_b, h0b, gb["wr"], gb["br"], cfg.approx)

    # dual-FC with sigmoid (tree-node probs), then tree -> pdf
    dfc = params["dual_fc"]
    act = activations.get("tanh", cfg.approx)
    y = jnp.einsum("bsi,cio->bsco", out_b, dfc["w"]) + dfc["b"]
    nodes = activations.get("sigmoid", cfg.approx)(
        jnp.sum(act(y) * dfc["factor"], axis=-2))
    pdf = losses.tree_to_pdf(nodes)

    return {"tensor_preds": tensor_preds, "real_preds": real_preds,
            "pdf": pdf, "rc": rc}


def loss_fn(params, batch, cfg, rng=None, train=True):
    out = forward(params, batch, cfg, rng, train)
    sig_out = batch["sig_out"].astype(jnp.float32)
    if cfg.e2e:
        # weights [1, 2] on [interp_mulaw(gamma=2), matchlar]
        # (train_lpcnet.py:244-254)
        lm = losses.interp_mulaw(sig_out, out["tensor_preds"],
                                 out["real_preds"], out["pdf"], gamma=2.0)
        rc_true = losses.lpc2rc(batch["lpc"].astype(jnp.float32))
        ml = losses.loss_matchlar(rc_true, out["rc"])
        total = jnp.mean(lm) + 2.0 * jnp.mean(ml)
    else:
        total = jnp.mean(losses.metric_cel(sig_out, out["tensor_preds"],
                                           out["pdf"]))
    metrics = {"loss": total,
               "cel": jnp.mean(losses.metric_cel(
                   sig_out, out["tensor_preds"], out["pdf"]))}
    return total, metrics


def weight_clip(params, c: float = 0.992):
    """WeightClip(0.992) constraint on GRU kernels (lpcnet.py:287-309):
    rescale so |w[2i]| + |w[2i+1]| <= c along the input axis (avoids int8
    dot-product saturation)."""
    def clip_kernel(p):
        a = jnp.abs(p)
        pair = a[0::2] + a[1::2]
        denom = jnp.maximum(c, jnp.repeat(pair, 2, axis=0))
        return c * p / denom

    out = dict(params)
    ga = dict(params["gru_a"]); gb = dict(params["gru_b"])
    ga["wr"] = clip_kernel(params["gru_a"]["wr"])
    gb["wi"] = clip_kernel(params["gru_b"]["wi"])
    gb["wr"] = clip_kernel(params["gru_b"]["wr"])
    out["gru_a"], out["gru_b"] = ga, gb
    return out


def make_optimizer(lr: float = 1e-3, decay: float = 5e-5,
                   b1: float = 0.5, b2: float = 0.8):
    """Adam(beta_1=.5, beta_2=.8) with 1/(1+decay*t) LR decay — the
    reference's exact optimizer (train_lpcnet.py:229). The low betas make
    Adam react fast to the noisy per-sample CE gradient; override via
    --beta1/--beta2 on the CLI."""
    sched = lambda t: lr / (1.0 + decay * t)
    return optax.chain(optax.scale_by_adam(b1=b1, b2=b2),
                       optax.scale_by_learning_rate(sched))


@functools.partial(jax.jit, static_argnames=("cfg", "opt"))
def train_step(params, opt_state, batch, rng, cfg, opt):
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, cfg, rng)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    params = weight_clip(params)
    return params, opt_state, metrics
