"""DRED RDO-VAE: rate-distortion-optimized feature coding for redundancy.

Re-design of the reference RDO-VAE (training_tf2/rdovae.py:256-557; C
inference src/dred_rdovae_{enc,dec}.c) in functional JAX.

Structure (per 20-ms "dframe" = 4 feature frames):
  encoder: feature pairs (40) -> [Dense256 tanh | GRU | Dense256 | GRU |
    Dense256 | GRU | Dense | Dense], all-layer concat -> causal Conv1D(k=4)
    -> 80 latents; concat -> Dense128 -> Dense24 tanh initial decoder state
    (rdovae.py:257-329)
  quantization: per-lambda Embedding(16, 6*80) giving scale (softplus),
    dead zone (softplus * .05), soft & hard entropy-model params (sigmoid)
    (rdovae.py:465-523); hard quantize = round with straight-through
    gradient; decoder state PVQ-quantized with k=82 (rdovae.py:210-247)
  decoder: mirrored stack over time-reversed latents, 3 state-init denses,
    dec_final emits a quadruple (4 x 20) feature frame per latent step
    (rdovae.py:333-414)
  split decode: 100-step chunks with quantized resume states
    (rdovae.py:413-431) - the stream-resume mechanism DRED relies on.
"""
import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import activations
from . import layers


@dataclasses.dataclass(frozen=True)
class RDOVAEConfig:
    nb_features: int = 20
    nb_latents: int = 80          # nb_bits (train_rdovae.py:145)
    bunch: int = 4
    nb_quant: int = 16            # lambda quantization levels
    cond_size: int = 1024         # GRU width (train_rdovae.py:56-62)
    cond_size2: int = 256         # dense width
    state_dim: int = 24
    pvq_k: int = 82
    approx: bool = False

    @property
    def pair_size(self) -> int:
        return 2 * self.nb_features  # encoder consumes feature pairs

    @property
    def concat_size(self) -> int:
        return 3 * self.cond_size2 + 5 * self.cond_size


def init_params(rng: jax.Array, cfg: RDOVAEConfig = RDOVAEConfig()):
    ks = jax.random.split(rng, 24)
    c, c2 = cfg.cond_size, cfg.cond_size2
    enc = {
        "dense1": layers.dense_init(ks[0], cfg.pair_size, c2),
        "gru2": layers.gru_init(ks[1], c2, c),
        "dense3": layers.dense_init(ks[2], c, c2),
        "gru4": layers.gru_init(ks[3], c2, c),
        "dense5": layers.dense_init(ks[4], c, c2),
        "gru6": layers.gru_init(ks[5], c2, c),
        "dense7": layers.dense_init(ks[6], c, c),
        "dense8": layers.dense_init(ks[7], c, c),
        # causal conv k=4 over the concat (rdovae.py:310-312)
        "bits_conv": layers.conv1d_init(ks[8], cfg.concat_size,
                                        cfg.nb_latents, 4),
        "gdense1": layers.dense_init(ks[9], cfg.concat_size, 128),
        "gdense2": layers.dense_init(ks[10], 128, cfg.state_dim),
    }
    dec = {
        "dense1": layers.dense_init(ks[11], cfg.nb_latents, c2),
        "gru2": layers.gru_init(ks[12], c2, c),
        "dense3": layers.dense_init(ks[13], c, c2),
        "gru4": layers.gru_init(ks[14], c2, c),
        "dense5": layers.dense_init(ks[15], c, c2),
        "gru6": layers.gru_init(ks[16], c2, c),
        "dense7": layers.dense_init(ks[17], c, c),
        "dense8": layers.dense_init(ks[18], c, c),
        "state1": layers.dense_init(ks[19], cfg.state_dim, c),
        "state2": layers.dense_init(ks[20], cfg.state_dim, c),
        "state3": layers.dense_init(ks[21], cfg.state_dim, c),
        "final": layers.dense_init(ks[22], cfg.concat_size,
                                   cfg.bunch * cfg.nb_features),
    }
    # quant embedding initialized to zeros (rdovae.py:466)
    quant = {"e": jnp.zeros((cfg.nb_quant, 6 * cfg.nb_latents), jnp.float32)}
    return {"enc": enc, "dec": dec, "quant_embed": quant}


def rate_aware_quant_init(params, cfg: RDOVAEConfig = RDOVAEConfig(),
                          lam_min: float = 2e-4, denom: float = 3.8):
    """Initialize the per-level quantizer SCALES on the uniform-quantizer
    rate-distortion optimum instead of all-equal.

    The reference zero-inits the lambda embedding (rdovae.py:466), so all
    16 levels start with softplus(0) = 0.693 scales and must differentiate
    purely through the lambda-weighted loss — which takes many epochs on a
    large corpus (an undertrained checkpoint quantizes every level almost
    identically). For loss lam*D + R with a uniform quantizer
    (D ~= delta^2/12, R ~= -log2 delta per dimension), the optimal step
    solves d/d delta = 0 => delta ∝ lam^{-1/2}, i.e. scale ∝ sqrt(lam).
    This sets scale(q) = 0.693 * sqrt(lam(q)/lam(mid)) — the mid level
    keeps the reference's starting scale, the RD frontier is ordered from
    step 0, and the embedding remains fully trainable (init only; a
    documented divergence from the reference's zero init).
    """
    nb, nq = cfg.nb_latents, cfg.nb_quant
    q = np.arange(nq, dtype=np.float32)
    lam = lam_min * np.exp(q / denom)
    mid = lam_min * np.exp(0.5 * (nq - 1) / denom)
    target = 0.693147 * np.sqrt(lam / mid)            # (nq,)
    # softplus^{-1}(y) = log(expm1(y))
    raw = np.log(np.expm1(target)).astype(np.float32)
    e = np.asarray(params["quant_embed"]["e"]).copy()
    e[:, :nb] = raw[:, None]
    return {**params, "quant_embed": {"e": jnp.asarray(e)}}


def _gru_seq(p, x, h0, approx):
    """GRU over (B, T, in) with hoisted input matmul -> (B, T, N)."""
    zrh = x @ p["wi"] + p["bi"]
    n = h0.shape[-1]
    sig = activations.get("sigmoid", approx)
    act = activations.get("tanh", approx)

    def step(h, z):
        recur = h @ p["wr"] + p["br"]
        zz = sig(z[..., :n] + recur[..., :n])
        rr = sig(z[..., n:2 * n] + recur[..., n:2 * n])
        hc = act(z[..., 2 * n:] + rr * recur[..., 2 * n:])
        h = zz * h + (1 - zz) * hc
        return h, h

    _, hs = jax.lax.scan(step, h0, zrh.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2)


def encode(params, feats: jax.Array, cfg: RDOVAEConfig = RDOVAEConfig()):
    """feats: (B, T, 20) with T even -> (z (B, T/2, 80),
    state (B, T/2, 24)). 50 Hz latent rate; downselection to dframes
    happens in the quantizer/trainer (rdovae.py:527-534)."""
    p = params["enc"]
    ap = cfg.approx
    B, T, F = feats.shape
    x = feats.reshape(B, T // 2, 2 * F)
    c = cfg.cond_size
    d1 = layers.dense_apply(p["dense1"], x, "tanh", ap)
    d2 = _gru_seq(p["gru2"], d1, jnp.zeros((B, c)), ap)
    d3 = layers.dense_apply(p["dense3"], d2, "tanh", ap)
    d4 = _gru_seq(p["gru4"], d3, jnp.zeros((B, c)), ap)
    d5 = layers.dense_apply(p["dense5"], d4, "tanh", ap)
    d6 = _gru_seq(p["gru6"], d5, jnp.zeros((B, c)), ap)
    d7 = layers.dense_apply(p["dense7"], d6, "tanh", ap)
    d8 = layers.dense_apply(p["dense8"], d7, "tanh", ap)
    pre = jnp.concatenate([d1, d2, d3, d4, d5, d6, d7, d8], axis=-1)
    # causal conv k=4: pad 3 on the left (Keras padding='causal')
    w = p["bits_conv"]["w"]
    pre_pad = jnp.pad(pre, ((0, 0), (3, 0), (0, 0)))
    z = jax.lax.conv_general_dilated(
        pre_pad, w, (1,), "VALID",
        dimension_numbers=("NTC", "TIO", "NTC")) + p["bits_conv"]["b"]
    g = layers.dense_apply(p["gdense1"], pre, "tanh", ap)
    state = layers.dense_apply(p["gdense2"], g, "tanh", ap)
    return z, state


def decode(params, z: jax.Array, init_state: jax.Array,
           cfg: RDOVAEConfig = RDOVAEConfig()):
    """z: (B, S, 80) latents (one per dframe), init_state: (B, 24).
    Returns (B, S*4, 20) feature frames. The reference decodes the latent
    sequence time-reversed (rdovae.py:395-414)."""
    p = params["dec"]
    ap = cfg.approx
    B = z.shape[0]
    zr = z[:, ::-1]
    s1 = layers.dense_apply(p["state1"], init_state, "tanh", ap)
    s2 = layers.dense_apply(p["state2"], init_state, "tanh", ap)
    s3 = layers.dense_apply(p["state3"], init_state, "tanh", ap)
    d1 = layers.dense_apply(p["dense1"], zr, "tanh", ap)
    d2 = _gru_seq(p["gru2"], d1, s1, ap)
    d3 = layers.dense_apply(p["dense3"], d2, "tanh", ap)
    d4 = _gru_seq(p["gru4"], d3, s2, ap)
    d5 = layers.dense_apply(p["dense5"], d4, "tanh", ap)
    d6 = _gru_seq(p["gru6"], d5, s3, ap)
    d7 = layers.dense_apply(p["dense7"], d6, "tanh", ap)
    d8 = layers.dense_apply(p["dense8"], d7, "tanh", ap)
    cat = jnp.concatenate([d1, d2, d3, d4, d5, d6, d7, d8], axis=-1)
    quad = layers.dense_apply(p["final"], cat, "linear", ap)
    out = quad.reshape(B, -1, cfg.nb_features)
    return out[:, ::-1]


# ------------------------------------------------------------ quantization

def quant_params(params, quant_id: jax.Array, cfg: RDOVAEConfig):
    """Per-position quantizer parameters from the lambda embedding
    (rdovae.py:465-512). quant_id: (...,) int32 in [0, nb_quant).
    Returns dict(scale, dead_zone, soft_r, soft_p0, hard_r, hard_p0)."""
    nb = cfg.nb_latents
    e = jnp.take(params["quant_embed"]["e"], quant_id, axis=0)
    scale = jax.nn.softplus(e[..., :nb])
    dead_zone = jax.nn.softplus(e[..., nb:2 * nb])
    soft = jax.nn.sigmoid(e[..., 2 * nb:4 * nb])
    hard = jax.nn.sigmoid(e[..., 4 * nb:6 * nb])
    return {"scale": scale, "dead_zone": dead_zone,
            "soft": soft, "hard": hard}


def apply_dead_zone(x: jax.Array, dead_zone: jax.Array) -> jax.Array:
    """y = x - d*tanh(x / (.1 + d)), d = .05*dead_zone (rdovae.py:103-107)."""
    d = dead_zone * 0.05
    return x - d * jnp.tanh(x / (0.1 + d))


def hard_quantize(x: jax.Array) -> jax.Array:
    """Round with straight-through gradient (rdovae.py:97-100)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def noise_quantize(rng: jax.Array, x: jax.Array) -> jax.Array:
    """Additive U(-.5,.5) quantization noise (uniform_noise.py:53-66)."""
    return x + jax.random.uniform(rng, x.shape, minval=-0.5, maxval=0.5)


def pvq_quantize(x: jax.Array, k: int, iters: int = 10) -> jax.Array:
    """Unit-norm PVQ with straight-through gradient (rdovae.py:210-247).
    x: (..., D)."""
    xn = x / (1e-15 + jnp.linalg.norm(x, axis=-1, keepdims=True))
    xl1 = xn / jnp.sum(jnp.abs(xn), axis=-1, keepdims=True)
    kx = k * xl1
    y = jnp.round(kx)
    newk = jnp.full(x.shape[:-1] + (1,), float(k), x.dtype)
    for _ in range(iters):
        kk = jnp.sum(jnp.abs(y), axis=-1, keepdims=True)
        plus = 1.000001 * jnp.min(
            (jnp.abs(y) + 0.5) / (jnp.abs(kx) + 1e-15), axis=-1, keepdims=True)
        minus = 0.999999 * jnp.max(
            (jnp.abs(y) - 0.5) / (jnp.abs(kx) + 1e-15), axis=-1, keepdims=True)
        factor = jnp.where(kk > k, minus, plus)
        factor = jnp.where(kk == k, jnp.ones_like(factor), factor)
        newk = newk * factor
        kx = newk * xl1
        y = jnp.round(kx)
    q = y / (1e-15 + jnp.linalg.norm(y, axis=-1, keepdims=True))
    return xn + jax.lax.stop_gradient(q - xn)


# ------------------------------------------------------------------ losses

_LOG2_E = 1.4427
_EPS = 1e-6


def _safelog2(x):
    return _LOG2_E * jnp.log(_EPS + x)


def feat_dist_loss(y_true, y_pred, lam):
    """Lambda-weighted cepstral/pitch/corr distortion (rdovae.py:129-146).
    y_true: (B, T, 20); y_pred: (B, T, 20); lam: (B, T, 1)."""
    lambda_1 = 1.0 / jnp.sqrt(lam[..., 0])
    ceps = y_pred[..., :18] - y_true[..., :18]
    pitch = 2.0 * (y_pred[..., 18:19] - y_true[..., 18:19]) \
        / (y_true[..., 18:19] + 2.0)
    corr = y_pred[..., 19:] - y_true[..., 19:]
    pitch_weight = jnp.square(jnp.maximum(0.0, y_true[..., 19:] + 0.5))
    inner = jnp.mean(jnp.square(ceps), axis=-1) \
        + 10.0 * (1 / 18.0) * jnp.mean(jnp.abs(pitch) * pitch_weight,
                                       axis=-1) \
        + (1 / 18.0) * jnp.mean(jnp.square(corr), axis=-1)
    return jnp.mean(lambda_1 * inner)


def _rate(z, r, p0):
    """Entropy model -log2 P(z) (rdovae.py:sq2_rate_loss body)."""
    y0 = jnp.maximum(0.0, 1.0 - jnp.abs(z)) ** 2
    return (-y0 * _safelog2(p0 * r ** jnp.abs(z))
            - (1 - y0) * _safelog2(0.5 * (1 - p0) * (1 - r)
                                   * r ** (jnp.abs(z) - 1.0)))


def sq1_rate_loss(z, soft, lam):
    """Soft (continuous) rate loss (rdovae.py:149-170). z: (B, S, 80)
    dead-zoned unrounded symbols; soft: (B, S, 160); lam: (B, S, 1)."""
    n = z.shape[-1]
    p0 = soft[..., :n]
    r = soft[..., n:]
    p0 = 1.0 - r ** (0.5 + 0.5 * p0)
    rate = -_safelog2((1 - r) / (1 + r) * r ** jnp.abs(z))
    return jnp.mean(jnp.sqrt(lam[..., 0]) * jnp.sum(rate, axis=-1))


def sq2_rate_loss(z, hard, lam):
    """Hard (rounded) rate loss (rdovae.py:173-187)."""
    n = z.shape[-1]
    p0 = hard[..., :n]
    r = hard[..., n:]
    p0 = 1.0 - r ** (0.5 + 0.5 * p0)
    rate = _rate(jnp.round(z), r, p0)
    return jnp.mean(jnp.sqrt(lam[..., 0]) * jnp.sum(rate, axis=-1))


def sq_rate_metric(z, hard):
    """Bits-per-step estimate of rounded symbols (rdovae.py:190-207)."""
    n = z.shape[-1]
    p0 = hard[..., :n]
    r = hard[..., n:]
    p0 = 1.0 - r ** (0.5 + 0.5 * p0)
    return jnp.mean(jnp.sum(_rate(jnp.round(z), r, p0), axis=-1))
