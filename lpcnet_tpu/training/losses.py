"""Training losses and differentiable DSP helpers for LPCNet.

Functional JAX equivalents of the reference training math:
  - exact-log mu-law pair (training_tf2/tf_funcs.py:17-30)
  - differentiable LPC prediction (tf_funcs.py:36-55)
  - differentiable LPC<->RC (tf_funcs.py:59-93, dataloader.py:6-14)
  - binary-tree -> 256-way pdf expansion (lpcnet.py:66-94)
  - cross-entropy family (lossfuncs.py:95-106, :30-53, :76-93, :108-129)
"""
import jax
import jax.numpy as jnp
import numpy as np

_SCALE = 255.0 / 32768.0
_SCALE_1 = 32768.0 / 255.0
_LOG256 = np.log(256.0).astype(np.float32)


def l2u(x: jax.Array) -> jax.Array:
    """Continuous mu-law with exact log (tf_funcs.py:17-23)."""
    s = jnp.sign(x)
    u = s * (128.0 * jnp.log1p(_SCALE * jnp.abs(x)) / _LOG256)
    return jnp.clip(128.0 + u, 0.0, 255.0)


def u2l(u: jax.Array) -> jax.Array:
    """Inverse continuous mu-law (tf_funcs.py:26-30)."""
    u = u.astype(jnp.float32) - 128.0
    return jnp.sign(u) * _SCALE_1 * (jnp.exp(jnp.abs(u) / 128.0 * _LOG256) - 1.0)


def diff_pred(x: jax.Array, lpc: jax.Array, frame_size: int = 160) -> jax.Array:
    """Differentiable LPC prediction (tf_funcs.py:36-55).

    x: (B, S) lagged signal; lpc: (B, T, 16) per-frame coefficients with
    S == T*frame_size. pred[s] = -sum_i lpc[s//fs, i] * x[s - i] (x is
    already lagged by one sample in the training data, dump_data.c:84-108).
    """
    order = lpc.shape[-1]
    B, S = x.shape
    xp = jnp.pad(x, ((0, 0), (order, 0)))
    # lags matrix: (B, S, order), column i = x[s - i]
    lags = jnp.stack([xp[:, order - i:order - i + S] for i in range(order)],
                     axis=-1)
    lpc_rep = jnp.repeat(lpc, frame_size, axis=1)  # (B, S, order)
    return -jnp.sum(lags * lpc_rep, axis=-1)


def lpc2rc(lpc: jax.Array) -> jax.Array:
    """LPC -> reflection coefficients, step-down (dataloader.py:6-14)."""
    order = lpc.shape[-1]
    rc = jnp.zeros_like(lpc)
    cur = lpc
    for i in range(order, 0, -1):
        ki = cur[..., i - 1]
        rc = rc.at[..., i - 1].set(ki)
        if i > 1:
            k = ki[..., None]
            cur = (cur[..., :i - 1] - k * cur[..., i - 2::-1]) / (1.0 - k * k)
    return rc


def rc2lpc(rc: jax.Array) -> jax.Array:
    """RC -> LPC step-up (tf_funcs.py diff_rc2lpc:59-76)."""
    order = rc.shape[-1]
    lpc = rc[..., :1]
    for i in range(1, order):
        ki = rc[..., i:i + 1]
        lpc = jnp.concatenate([lpc + ki * lpc[..., ::-1], ki], axis=-1)
    return lpc


def tree_to_pdf(p: jax.Array) -> jax.Array:
    """Expand 256 sigmoid tree-node probs into a 256-way leaf pdf
    (lpcnet.py:66-94). p: (..., 256) heap-ordered node probabilities
    (index 0 unused, root at 1). Returns (..., 256) pdf."""
    levels = []
    for b in range(8):
        nodes = p[..., (1 << b):(1 << (b + 1))]       # (..., 2^b)
        both = jnp.stack([1.0 - nodes, nodes], axis=-1)  # (..., 2^b, 2)
        flat = both.reshape(p.shape[:-1] + (2 << b,))
        reps = 256 // (2 << b)
        levels.append(jnp.repeat(flat, reps, axis=-1))
    out = levels[0]
    for lv in levels[1:]:
        out = out * lv
    return out


def _sparse_ce(pdf: jax.Array, idx: jax.Array) -> jax.Array:
    """-log pdf[idx], per element (Keras SparseCategoricalCrossentropy)."""
    p = jnp.take_along_axis(pdf, idx[..., None], axis=-1)[..., 0]
    return -jnp.log(jnp.maximum(p, 1e-7))


def metric_cel(sig_out, preds, pdf):
    """Rounded CE on the mu-law excitation (lossfuncs.py:95-106)."""
    e_gt = jnp.clip(jnp.round(l2u(sig_out - preds)), 0, 255).astype(jnp.int32)
    return _sparse_ce(pdf, e_gt)


def metric_icel(sig_out, preds, pdf):
    """Interpolated CE (lossfuncs.py:76-93)."""
    e = l2u(sig_out - preds)
    alpha = e - jnp.floor(e)
    e_lo = jnp.clip(e, 0, 254).astype(jnp.int32)
    interp = (1 - alpha[..., None]) * pdf + alpha[..., None] * jnp.roll(
        pdf, -1, axis=-1)
    return _sparse_ce(interp, e_lo)


def interp_mulaw(sig_out, preds, real_preds, pdf, gamma: float = 1.0):
    """Interpolated + compensated loss for E2E training (lossfuncs.py:30-53)."""
    e = l2u(sig_out - preds)
    exc = l2u(sig_out - real_preds)
    prob_comp = jnp.abs(e - 128.0) / 128.0 * _LOG256
    reg = jnp.abs(exc - 128.0) / 128.0 * _LOG256
    alpha = e - jnp.floor(e)
    e_lo = jnp.clip(e, 0, 254).astype(jnp.int32)
    interp = (1 - alpha[..., None]) * pdf + alpha[..., None] * jnp.roll(
        pdf, -1, axis=-1)
    return _sparse_ce(interp, e_lo) + prob_comp + gamma * reg


def metric_exc_sd(sig_out, preds):
    """Excitation spread metric (lossfuncs.py:108-115)."""
    e = l2u(sig_out - preds)
    return (e - 128.0) ** 2


def loss_matchlar(rc_true, rc_model):
    """Log-area-ratio match for E2E RC outputs (lossfuncs.py:119-129)."""
    def lar(x):
        return jnp.log((1.01 + x) / (1.01 - x))
    return jnp.mean((lar(rc_model) - lar(rc_true)) ** 2, axis=-1)
