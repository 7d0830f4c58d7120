"""LPCNet vocoder model: frame-rate conditioning net + AR sample-rate net.

Network topology matches the reference (training model:
training_tf2/lpcnet.py:312-475; C engine: src/lpcnet.c) but the execution
model is TPU-native: everything is batched over a stream axis B, the
frame-rate net runs as parallel convs/matmuls over (B, T) chunks, and the
16 kHz autoregressive loop is a lax.scan whose per-step work is a handful of
(B, .) x (., .) matmuls on the MXU (see kernels/sample_scan.py).

Parameter layout (training parametrization):
  embed_pitch : Embedding(256, 64)         (lpcnet.py:342)
  conv1/conv2 : Conv1D(cond, k=3, tanh)    (lpcnet.py:335-340)
  dense1/2    : Dense(cond, tanh)          (lpcnet.py:346-348)
  embed_sig   : shared mu-law Embedding(256, 128) for [sig, pred, exc]
                (diff_Embed, lpcnet.py:369-372)
  gru_a       : GRU(384), input [3*128 embeddings | cond] = 512
  gru_b       : GRU(16),  input [gru_a out | cond] = 512... wait 384+128
  dual_fc     : MDense(256, 2 channels)    (lpcnet.py:427)

For inference we precompute, exactly like the reference's C export
(training_tf2/dump_lpcnet.py:450-469):
  sig/pred/exc tables: embed_sig @ Wi_a[slice]  -> three (256, 3*384) tables
  cond_a = cfeat @ Wi_a[384:512] + bi_a        -> per-frame (3*384)
  cond_b = cfeat @ Wi_b[384:512] + bi_b        -> per-frame (3*16)
so the per-sample GRU-A input is three gathers + the frame condition.
"""
import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (FRAME_SIZE, LPC_ORDER, NB_BANDS, NB_FEATURES)
from ..ops import dsp
from . import layers


@dataclasses.dataclass(frozen=True)
class LPCNetConfig:
    gru_a_units: int = 384
    gru_b_units: int = 16
    cond_size: int = 128
    embed_sig_size: int = 128
    embed_pitch_size: int = 64
    pcm_levels: int = 256
    nb_features: int = NB_FEATURES
    lpc_order: int = LPC_ORDER
    frame_size: int = FRAME_SIZE
    lpc_gamma: float = 1.0      # bandwidth expansion (lpcnet.c:116-118)
    e2e: bool = False           # rc2lpc end-to-end mode (lpcnet.c:56-79)
    lookahead: int = 2          # FEATURES_DELAY
    approx: bool = False        # use reference table/pade activations
    preemph: float = 0.85       # PREEMPH (lpcnet.c:40)

    @property
    def rnn_in_size(self) -> int:
        return 3 * self.embed_sig_size + self.cond_size  # 512

    @property
    def frame_in_size(self) -> int:
        return self.nb_features + self.embed_pitch_size  # 84


def init_params(rng: jax.Array, cfg: LPCNetConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    na, nb, nc = cfg.gru_a_units, cfg.gru_b_units, cfg.cond_size
    return {
        "embed_pitch": layers.embedding_init(ks[0], cfg.pcm_levels,
                                             cfg.embed_pitch_size, scale=0.1),
        "conv1": layers.conv1d_init(ks[1], cfg.frame_in_size, nc, 3),
        "conv2": layers.conv1d_init(ks[2], nc, nc, 3),
        "dense1": layers.dense_init(ks[3], nc, nc),
        "dense2": layers.dense_init(ks[4], nc, nc),
        "embed_sig": layers.embedding_init(ks[5], cfg.pcm_levels,
                                           cfg.embed_sig_size, scale=0.1),
        "gru_a": layers.gru_init(ks[6], cfg.rnn_in_size, na),
        "gru_b": layers.gru_init(ks[7], na + nc, nb),
        "dual_fc": layers.dualfc_init(ks[5], nb, cfg.pcm_levels),
    }


def pitch_index(features: jax.Array) -> jax.Array:
    """Quantize the pitch feature to an embedding index (lpcnet.c:92-94):
    floor(.1 + 50*f[NB_BANDS] + 100), clamped to [33, 255]."""
    p = jnp.floor(0.1 + 50.0 * features[..., NB_BANDS] + 100.0)
    return jnp.clip(p, 33, 255).astype(jnp.int32)


def frame_features_net(params, features, pitch_idx, cfg: LPCNetConfig):
    """Frame-rate conditioning over a chunk: (B, T, 20) -> cfeat (B, T, cond).

    'same'-padded convs mirror the training graph; the C's causal delay line
    + warm-up zeroing (lpcnet.c:98-101) is the streaming equivalent with the
    output shifted by FEATURES_DELAY frames.
    """
    ap = cfg.approx
    pe = layers.embedding_apply(params["embed_pitch"], pitch_idx)
    x = jnp.concatenate([features[..., :cfg.nb_features], pe], axis=-1)
    x = layers.conv1d_same_apply(params["conv1"], x, "tanh", ap)
    x = layers.conv1d_same_apply(params["conv2"], x, "tanh", ap)
    x = layers.dense_apply(params["dense1"], x, "tanh", ap)
    x = layers.dense_apply(params["dense2"], x, "tanh", ap)
    return x


def precompute_sample_tables(params, cfg: LPCNetConfig) -> Dict[str, Any]:
    """Fold the shared mu-law embedding through GRU-A's input kernel into
    three per-value additive tables, and split the condition kernels
    (training_tf2/dump_lpcnet.py:450-469). Returns the inference pytree
    consumed by kernels.sample_scan."""
    es = cfg.embed_sig_size
    wi_a = params["gru_a"]["wi"]           # (3*es + cond, 3*Na)
    e = params["embed_sig"]["e"]           # (256, es)
    tbl_sig = e @ wi_a[:es]
    tbl_pred = e @ wi_a[es:2 * es]
    tbl_exc = e @ wi_a[2 * es:3 * es]
    cond_a_w = wi_a[3 * es:]               # (cond, 3*Na)
    wi_b = params["gru_b"]["wi"]           # (Na + cond, 3*Nb)
    return {
        "tbl_sig": tbl_sig, "tbl_pred": tbl_pred, "tbl_exc": tbl_exc,
        "cond_a_w": cond_a_w, "bi_a": params["gru_a"]["bi"],
        "wr_a": params["gru_a"]["wr"], "br_a": params["gru_a"]["br"],
        "wi_b": wi_b[:cfg.gru_a_units], "cond_b_w": wi_b[cfg.gru_a_units:],
        "bi_b": params["gru_b"]["bi"],
        "wr_b": params["gru_b"]["wr"], "br_b": params["gru_b"]["br"],
        "dual_fc": params["dual_fc"],
    }


def frame_conditions(params, features, cfg: LPCNetConfig,
                     tables: Optional[Dict[str, Any]] = None):
    """Compute per-frame conditioning for synthesis.

    features: (B, T, >=20) [+ optionally 36 with LPC tail].
    Returns dict with cond_a (B,T,3Na), cond_b (B,T,3Nb), lpc (B,T,16).
    LPC comes from the cepstrum (lpc_from_cepstrum, lpcnet.c:109-115) unless
    cfg.e2e, in which case it derives from dense2's first 16 outputs as
    reflection coefficients (rc2lpc, lpcnet.c:56-79).
    """
    if tables is None:
        tables = precompute_sample_tables(params, cfg)
    pidx = pitch_index(features)
    cfeat = frame_features_net(params, features, pidx, cfg)
    cond_a = cfeat @ tables["cond_a_w"] + tables["bi_a"]
    cond_b = cfeat @ tables["cond_b_w"] + tables["bi_b"]
    if cfg.e2e:
        lpc = rc2lpc(cfeat[..., :cfg.lpc_order])
    else:
        lpc, _ = dsp.lpc_from_cepstrum(features[..., :NB_BANDS])
    if cfg.lpc_gamma != 1.0:
        lpc = dsp.lpc_weighting(lpc, cfg.lpc_gamma)
    return {"cond_a": cond_a, "cond_b": cond_b, "lpc": lpc, "cfeat": cfeat}


def frame_net_init_state(batch: int, cfg: LPCNetConfig):
    """Streaming frame-network state (conv delay lines + LPC pipeline),
    the functional twin of NNetState + old_lpc (lpcnet_private.h:33-47)."""
    return {
        "conv1_mem": jnp.zeros((batch, 2, cfg.frame_in_size), jnp.float32),
        "conv2_mem": jnp.zeros((batch, 2, cfg.cond_size), jnp.float32),
        "old_lpc": jnp.zeros((batch, cfg.lookahead, cfg.lpc_order),
                             jnp.float32),
        "frame_count": jnp.zeros((batch,), jnp.int32),
    }


def frame_net_step(params, tables, fstate, features, cfg: LPCNetConfig):
    """One streaming frame-conditioning step (run_frame_network,
    lpcnet.c:82-120): causal convs with warm-up zeroing, FEATURES_DELAY LPC
    delay line. features: (B, >=20). Returns (new_fstate, dict with cond_a,
    cond_b, lpc aligned to the conv-delayed conditions)."""
    ap = cfg.approx
    pidx = pitch_index(features)
    pe = layers.embedding_apply(params["embed_pitch"], pidx)
    x = jnp.concatenate([features[..., :cfg.nb_features], pe], axis=-1)
    c1, c1_mem = layers.conv1d_step(params["conv1"], fstate["conv1_mem"], x,
                                    "tanh", ap)
    fc = fstate["frame_count"]
    c1 = jnp.where((fc < 1)[:, None], 0.0, c1)       # lpcnet.c:99
    c2, c2_mem = layers.conv1d_step(params["conv2"], fstate["conv2_mem"], c1,
                                    "tanh", ap)
    c2 = jnp.where((fc < cfg.lookahead)[:, None], 0.0, c2)  # lpcnet.c:101
    h = layers.dense_apply(params["dense1"], c2, "tanh", ap)
    cfeat = layers.dense_apply(params["dense2"], h, "tanh", ap)
    cond_a = cfeat @ tables["cond_a_w"] + tables["bi_a"]
    cond_b = cfeat @ tables["cond_b_w"] + tables["bi_b"]
    if cfg.e2e:
        lpc = rc2lpc(cfeat[..., :cfg.lpc_order])
        old_lpc = fstate["old_lpc"]
    elif cfg.lookahead == 0:
        # no-lookahead models use the current frame's LPC directly
        # (the FEATURES_DELAY loop body vanishes, lpcnet.c:109-115)
        lpc, _ = dsp.lpc_from_cepstrum(features[..., :NB_BANDS])
        old_lpc = fstate["old_lpc"]
    else:
        # LPC delayed by FEATURES_DELAY frames (lpcnet.c:109-115)
        new_lpc, _ = dsp.lpc_from_cepstrum(features[..., :NB_BANDS])
        lpc = fstate["old_lpc"][:, -1]
        old_lpc = jnp.concatenate(
            [new_lpc[:, None], fstate["old_lpc"][:, :-1]], axis=1)
    if cfg.lpc_gamma != 1.0:
        lpc = dsp.lpc_weighting(lpc, cfg.lpc_gamma)
    new_fstate = {"conv1_mem": c1_mem, "conv2_mem": c2_mem,
                  "old_lpc": old_lpc,
                  "frame_count": jnp.minimum(fc + 1, 1000)}
    return new_fstate, {"cond_a": cond_a, "cond_b": cond_b, "lpc": lpc,
                        "cfeat": cfeat}


def rc2lpc(rc: jax.Array) -> jax.Array:
    """Reflection coefficients -> LPC by the step-up recursion
    (lpcnet.c:56-79). rc: (..., order)."""
    order = rc.shape[-1]
    lpc = rc
    for i in range(1, order):
        # a_j += a_i * a_{i-1-j} for j < i, using pre-update values
        idx = (i - 1 - jnp.arange(order)) % order
        a_rev = jnp.take(lpc, idx, axis=-1)
        upd = lpc + lpc[..., i:i + 1] * a_rev
        lpc = jnp.where(jnp.arange(order) < i, upd, lpc)
    return lpc
