"""Functional NN layers (param pytrees + pure apply fns).

Semantics match the reference layer runtime (src/nnet.c) and its Keras twins
(training_tf2/lpcnet.py, mdense.py), but the implementation is batched JAX:
every op is expressed as a matmul over a stream batch so XLA tiles it onto
the MXU. Weight layout convention: kernels are (in, out) like Keras, GRU
gates ordered [z | r | h] (reset-after), biases split input/recurrent.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import activations


def dense_init(rng, nin, nout, scale=None):
    kr, _ = jax.random.split(rng)
    scale = scale if scale is not None else (6.0 / (nin + nout)) ** 0.5
    return {
        "w": jax.random.uniform(kr, (nin, nout), jnp.float32, -scale, scale),
        "b": jnp.zeros((nout,), jnp.float32),
    }


def dense_apply(p, x, act="linear", approx=False):
    """y = act(x @ w + b)  (reference _lpcnet_compute_dense, nnet.c:122-135)."""
    y = x @ p["w"] + p["b"]
    return activations.get(act, approx)(y)


def embedding_init(rng, num, dim, scale=None):
    scale = scale if scale is not None else 1.0
    return {"e": scale * jax.random.normal(rng, (num, dim), jnp.float32)}


def embedding_apply(p, idx):
    """Row gather (nnet.c:472-482)."""
    return jnp.take(p["e"], idx, axis=0)


def gru_init(rng, nin, n):
    k1, k2 = jax.random.split(rng)
    s_in = (6.0 / (nin + 3 * n)) ** 0.5
    return {
        "wi": jax.random.uniform(k1, (nin, 3 * n), jnp.float32, -s_in, s_in),
        "wr": jax.random.orthogonal(k2, n, (3,)).transpose(1, 0, 2)
              .reshape(n, 3 * n).astype(jnp.float32),
        "bi": jnp.zeros((3 * n,), jnp.float32),
        "br": jnp.zeros((3 * n,), jnp.float32),
    }


def gru_apply(p, h, x, act="tanh", approx=False, extra_bias=None):
    """Reset-after GRU step, gate order [z|r|h] (nnet.c compute_gru2:281-322).

    h: (..., N) state, x: (..., nin) input. extra_bias optionally adds an
    external per-step condition vector to the input-side preactivation, which
    is how the frame-rate conditioning enters GRU-B (compute_gruB,
    nnet.c:326-372). Returns new state.
    """
    n = h.shape[-1]
    zrh = x @ p["wi"] + p["bi"]
    if extra_bias is not None:
        zrh = zrh + extra_bias
    recur = h @ p["wr"] + p["br"]
    sig = activations.get("sigmoid", approx)
    z = sig(zrh[..., :n] + recur[..., :n])
    r = sig(zrh[..., n:2 * n] + recur[..., n:2 * n])
    hcand = zrh[..., 2 * n:] + r * recur[..., 2 * n:]
    hcand = activations.get(act, approx)(hcand)
    return z * h + (1.0 - z) * hcand


def gru_precomputed_apply(p, h, zrh_in, act="tanh", approx=False):
    """GRU step where the input-side matmul (+ input bias) is already folded
    into zrh_in (compute_gru3 / compute_sparse_gru, nnet.c:375-448). Used for
    GRU-A whose inputs are embedding lookups precomputed as E @ Wi tables."""
    n = h.shape[-1]
    recur = h @ p["wr"] + p["br"]
    sig = activations.get("sigmoid", approx)
    z = sig(zrh_in[..., :n] + recur[..., :n])
    r = sig(zrh_in[..., n:2 * n] + recur[..., n:2 * n])
    hcand = zrh_in[..., 2 * n:] + r * recur[..., 2 * n:]
    hcand = activations.get(act, approx)(hcand)
    return z * h + (1.0 - z) * hcand


def conv1d_init(rng, nin, nout, ksize):
    s = (6.0 / (nin * ksize + nout)) ** 0.5
    return {
        "w": jax.random.uniform(rng, (ksize, nin, nout), jnp.float32, -s, s),
        "b": jnp.zeros((nout,), jnp.float32),
    }


def conv1d_same_apply(p, x, act="tanh", approx=False):
    """'same'-padded 1D conv over time, matching the Keras training layers
    (training_tf2/lpcnet.py:335-340). x: (B, T, nin) -> (B, T, nout).

    The reference C runs this causally with a 2-frame delay line
    (nnet.c:452-470 + warm-up zeroing lpcnet.c:98-101); zero 'same' padding
    reproduces the zero-initialized conv state at stream start.
    """
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"))
    return activations.get(act, approx)(y + p["b"])


def conv1d_step(p, mem, x, act="tanh", approx=False):
    """Streaming conv step with ring state (nnet.c compute_conv1d:452-470).

    mem: (..., ksize-1, nin) past inputs; x: (..., nin) current input.
    Returns (y, new_mem). Output corresponds to the window ending at x, i.e.
    the 'same' output delayed by (ksize-1)//2 frames."""
    ksize = p["w"].shape[0]
    window = jnp.concatenate([mem, x[..., None, :]], axis=-2)  # (..., k, nin)
    y = jnp.einsum("...ki,kio->...o", window, p["w"]) + p["b"]
    new_mem = window[..., 1:, :] if ksize > 1 else mem
    return activations.get(act, approx)(y), new_mem


def dualfc_init(rng, nin, nout):
    """MDense with 2 channels (training_tf2/mdense.py:73-81)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    s = (6.0 / (nin + nout)) ** 0.5
    return {
        "w": jax.random.uniform(k1, (2, nin, nout), jnp.float32, -s, s),
        "b": jnp.zeros((2, nout), jnp.float32),
        "factor": jnp.ones((2, nout), jnp.float32)
                  + 0.01 * jax.random.normal(k3, (2, nout)),
    }


def dualfc_logits(p, x, approx=False):
    """All-class dual-FC logits: sum_c factor_c * tanh(x @ w_c + b_c).

    The C samples lazily down a binary tree touching only 16 of 256 rows
    (sample_mdense, nnet.c:163-214); on TPU the full (B,16)x(16,512) matmul
    is cheaper than gathers, and the tree walk then just indexes these
    logits — the sampled bits are identical. x: (..., nin) -> (..., nout)."""
    tanh = activations.get("tanh", approx)
    y = jnp.einsum("...i,cio->...co", x, p["w"]) + p["b"]
    y = tanh(y) * p["factor"]
    return y.sum(axis=-2)
