"""RDO-VAE training task (reference training_tf2/train_rdovae.py + the
end-to-end graph rdovae.py:447-557).

Per batch: lambda quantization level sampled per sequence, latents encoded
at 50 Hz, scaled/dead-zoned, two parallel quantization paths (hard round
with STE, additive uniform noise), two dframe offsets decoded through the
split decoder with PVQ-quantized resume states, and the 4-headed loss
[feat_dist(hard), feat_dist(noise), sq1_rate, sq2_rate] with weights
[.5, .5, 1, .1] (train_rdovae.py:149-159).
"""
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import rdovae as rv


def sample_lambda(rng: jax.Array, batch: int, nsteps: int,
                  nb_quant: int = 16):
    """Per-sequence quant level and lambda (train_rdovae.py:183-189).
    Returns (quant_id (B, nsteps) int32, lam (B, nsteps, 1))."""
    q = jax.random.randint(rng, (batch, 1), 0, nb_quant)
    q = jnp.broadcast_to(q, (batch, nsteps))
    lam = 2e-4 * jnp.exp(q.astype(jnp.float32) / 3.8)
    return q, lam[..., None]


def split_decode(params, z, states, cfg, nb_chunks: int = 4):
    """Chunked decode with quantized resume states (rdovae.py:413-431).
    z: (B, S, 80) dframe-rate latents; states: (B, S, 24) PVQ states.
    Each chunk [b, e) decodes with the state at its last step."""
    S = z.shape[1]
    L = max(1, -(-S // nb_chunks))   # ceil: cover the tail when S % nb != 0
    outs = []
    for c in range(nb_chunks):
        b, e = c * L, min((c + 1) * L, S)
        if b >= e:
            break
        outs.append(rv.decode(params, z[:, b:e], states[:, e - 1], cfg))
    return jnp.concatenate(outs, axis=1)


def _tensor_concat(outs):
    """Align the two offset decodes (rdovae.py:433-444). outs: list of 2
    (B, T, 20) -> (2, B, T, 20)."""
    x0, x1 = outs
    row0 = jnp.concatenate([x0[:, 2:, :], x1[:, -2:, :]], axis=1)
    return jnp.stack([row0, x1], axis=0)


def forward(params, feats, quant_id, rng, cfg: rv.RDOVAEConfig):
    """feats: (B, T, 20) (T % 8 == 0), quant_id: (B, T/2).
    Returns dict with decoded outputs and rate-loss ingredients."""
    B, T, _ = feats.shape
    z, state = rv.encode(params, feats, cfg)          # (B, T/2, .)
    qp = rv.quant_params(params, quant_id, cfg)
    ze = z * qp["scale"]
    dze = rv.apply_dead_zone(ze, qp["dead_zone"])
    ndze = rv.noise_quantize(rng, dze)
    dze_quant = rv.hard_quantize(dze) / qp["scale"]
    ndze_unquant = ndze / qp["scale"]
    state_q = rv.pvq_quantize(state, cfg.pvq_k)

    hard_outs, noise_outs = [], []
    for i in range(cfg.bunch // 2):
        zi = dze_quant[:, i::2]
        ni = ndze_unquant[:, i::2]
        si = state_q[:, i::2]
        hard_outs.append(split_decode(params, zi, si, cfg))
        noise_outs.append(split_decode(params, ni, si, cfg))
    combined = _tensor_concat(hard_outs)     # (2, B, T, 20)
    unquant = _tensor_concat(noise_outs)
    return {"combined": combined, "unquant": unquant, "dze": dze,
            "soft": qp["soft"], "hard": qp["hard"]}


def loss_fn(params, feats, quant_id, lam, rng, cfg: rv.RDOVAEConfig,
            weights=(0.5, 0.5, 1.0, 0.1)):
    out = forward(params, feats, quant_id, rng, cfg)
    lam_up = jnp.repeat(lam, 2, axis=1)      # pair rate -> frame rate
    fd_hard = rv.feat_dist_loss(feats[None], out["combined"], lam_up[None])
    fd_noise = rv.feat_dist_loss(feats[None], out["unquant"], lam_up[None])
    r1 = rv.sq1_rate_loss(out["dze"], out["soft"], lam)
    r2 = rv.sq2_rate_loss(out["dze"], out["hard"], lam)
    total = (weights[0] * fd_hard + weights[1] * fd_noise
             + weights[2] * r1 + weights[3] * r2)
    bits = rv.sq_rate_metric(out["dze"], out["hard"])
    return total, {"loss": total, "feat_dist_hard": fd_hard,
                   "feat_dist_noise": fd_noise, "rate_soft": r1,
                   "rate_hard": r2, "bits_per_dframe": bits}


def weight_clip(params, c: float = 0.496):
    """WeightClip(0.496) on dense/GRU kernels (rdovae.py:60-83)."""
    def clip_kernel(p):
        a = jnp.abs(p)
        pair = a[0::2] + a[1::2]
        return c * p / jnp.maximum(c, jnp.repeat(pair, 2, axis=0))

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict) and ("w" in v or "wi" in v):
                v = dict(v)
                for kk in ("w", "wi", "wr"):
                    if kk in v and v[kk].ndim == 2:
                        v[kk] = clip_kernel(v[kk])
                out[k] = v
            elif isinstance(v, dict):
                out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


def make_optimizer(lr: float = 1e-3, decay: float = 2.5e-5):
    """Adam(beta2=.99) + 1/(1+decay t) (train_rdovae.py:139)."""
    sched = lambda t: lr / (1.0 + decay * t)
    return optax.chain(optax.scale_by_adam(b2=0.99),
                       optax.scale_by_learning_rate(sched))


@functools.partial(jax.jit, static_argnames=("cfg", "opt"))
def train_step(params, opt_state, feats, quant_id, lam, rng, cfg, opt):
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, feats, quant_id, lam, rng, cfg)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    params = weight_clip(params)
    return params, opt_state, metrics
