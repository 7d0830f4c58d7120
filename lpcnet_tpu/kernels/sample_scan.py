"""The 16 kHz autoregressive synthesis loop, batched over streams.

This is the reference's hot loop (lpcnet_synthesize_tail_impl, src/lpcnet.c:
235-271 + run_sample_network lpcnet.c:146-167) re-designed for TPU: instead
of one scalar sample pipeline, B independent streams advance in lockstep
through a lax.scan. Every per-sample op is a (B, .) x (., .) matmul (MXU) or
an elementwise/gather op (VPU), and all state lives in registers/VMEM across
the scan. Time steps are inherently sequential (AR dependence); throughput
comes from the stream batch.

Per sample, per stream:
  1. order-16 LPC prediction                        (lpcnet.c:252)
  2. mu-law quantize last signal + prediction       (lpcnet.c:253-254)
  3. GRU-A input = frame condition + 3 table gathers (nnet.c:484-491)
  4. GRU-A (384) step: (B,384)x(384,1152) matmul    (nnet.c:410-448)
  5. GRU-B (16) step with condition bias            (nnet.c:326-372)
  6. dual-FC 256-way logits + 8-bit binary-tree sample with KISS99
     thresholds                                     (nnet.c:163-214)
  7. excitation -> signal, de-emphasis, clip, round (lpcnet.c:260-269)

Teacher forcing ("preload", lpcnet.c:256-261) replaces the sampled
excitation with the one derived from a target waveform for sample indices
below a per-stream threshold; PLC and decoder resync depend on it.
"""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LPC_ORDER
from ..ops import activations
from ..ops.kiss99 import kiss99_next
from ..ops.mulaw import lin2ulaw, ulaw2lin
from ..ops.tables import SAMPLING_LOGIT_TABLE


def init_state(batch: int, cfg, rng_seed: Optional[np.ndarray] = None
               ) -> Dict[str, jax.Array]:
    """Fresh synthesis state (lpcnet_reset, lpcnet.c:174-182)."""
    from ..ops import kiss99 as k99
    if rng_seed is None:
        rng_seed = k99.batched_seed(batch)
    return {
        "gru_a": jnp.zeros((batch, cfg.gru_a_units), jnp.float32),
        "gru_b": jnp.zeros((batch, cfg.gru_b_units), jnp.float32),
        "last_sig": jnp.zeros((batch, LPC_ORDER), jnp.float32),
        "last_exc": jnp.full((batch,), 128, jnp.int32),  # lin2ulaw(0)
        "deemph": jnp.zeros((batch,), jnp.float32),
        "rng": jnp.asarray(rng_seed),
    }


def _sample_tree(logits: jax.Array, rng: jax.Array):
    """Hierarchical 8-bit sampling (sample_mdense, nnet.c:163-214).

    logits: (B, 256) dual-FC outputs BEFORE sigmoid; the C compares random
    thresholds in logit space against the table -log((1-p)/p). Two KISS99
    draws supply 8 threshold bytes. Returns (exc (B,) int32, new rng)."""
    tbl = jnp.asarray(SAMPLING_LOGIT_TABLE)
    rng, r1 = kiss99_next(rng)
    rng, r2 = kiss99_next(rng)
    thr = []
    for r in (r1, r2):
        for k in range(4):
            thr.append(tbl[((r >> (8 * k)) & 0xFF).astype(jnp.int32)])
    val = jnp.zeros(logits.shape[:-1], jnp.int32)
    for b in range(8):
        idx = val | (1 << b)
        logit = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
        bit = (thr[b] < logit).astype(jnp.int32)
        val = (val << 1) | bit
    return val, rng


def _gru(h, zrh_in, wr, br, approx):
    """Reset-after GRU step with precomputed input-side preactivation."""
    n = h.shape[-1]
    recur = h @ wr + br
    sig = activations.get("sigmoid", approx)
    act = activations.get("tanh", approx)
    z = sig(zrh_in[..., :n] + recur[..., :n])
    r = sig(zrh_in[..., n:2 * n] + recur[..., n:2 * n])
    hcand = act(zrh_in[..., 2 * n:] + r * recur[..., 2 * n:])
    return z * h + (1.0 - z) * hcand


def _sample_temperature(logits: jax.Array, rng: jax.Array,
                        temp_exp: jax.Array, approx: bool):
    """Temperature/PDF-floor sampling (training_tf2/test_lpcnet.py:131-138):
    expand the tree nodes to a 256-way pdf, sharpen voiced frames with
    p *= p^temp_exp, cut the tail below 0.002, and draw by inverse CDF
    from one KISS99 uniform. A quality knob for deployments — the stock
    tree sampler (temp_exp None) is the C-bit-exact path."""
    from ..training.losses import tree_to_pdf
    sig = activations.get("sigmoid", approx)
    pdf = tree_to_pdf(sig(logits))
    pdf = pdf * jnp.power(jnp.maximum(pdf, 1e-18), temp_exp[..., None])
    pdf = pdf / (1e-18 + jnp.sum(pdf, -1, keepdims=True))
    pdf = jnp.maximum(pdf - 0.002, 0.0)
    pdf = pdf / (1e-8 + jnp.sum(pdf, -1, keepdims=True))
    rng, r = kiss99_next(rng)
    u = r.astype(jnp.float32) / np.float32(4294967296.0)
    cdf = jnp.cumsum(pdf, axis=-1)
    exc = jnp.sum((cdf < u[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(exc, 0, 255), rng


def sample_step(tables: Dict[str, Any], state: Dict[str, jax.Array],
                cond_a: jax.Array, cond_b: jax.Array, lpc: jax.Array,
                approx: bool, preemph: float,
                target: Optional[jax.Array] = None,
                teacher_mask: Optional[jax.Array] = None,
                temp_exp: Optional[jax.Array] = None):
    """One 1/16000 s step for all streams. cond_*: (B, 3N), lpc: (B, 16).
    temp_exp: optional (B,) sharpening exponent (temperature mode)."""
    # 1. LPC prediction (lpcnet.c:252)
    pred = -jnp.sum(state["last_sig"] * lpc, axis=-1)
    # 2. quantize inputs
    lsu = lin2ulaw(state["last_sig"][..., 0])
    pu = lin2ulaw(pred)
    # 3-4. GRU-A
    zrh_a = (cond_a
             + jnp.take(tables["tbl_sig"], lsu, axis=0)
             + jnp.take(tables["tbl_pred"], pu, axis=0)
             + jnp.take(tables["tbl_exc"], state["last_exc"], axis=0))
    gru_a = _gru(state["gru_a"], zrh_a, tables["wr_a"], tables["br_a"], approx)
    # 5. GRU-B
    zrh_b = cond_b + gru_a @ tables["wi_b"]
    gru_b = _gru(state["gru_b"], zrh_b, tables["wr_b"], tables["br_b"], approx)
    # 6. dual-FC logits + tree sample
    dfc = tables["dual_fc"]
    act = activations.get("tanh", approx)
    y = jnp.einsum("bi,cio->bco", gru_b, dfc["w"]) + dfc["b"]
    logits = jnp.sum(act(y) * dfc["factor"], axis=-2)
    if temp_exp is not None:
        exc, rng = _sample_temperature(logits, state["rng"], temp_exp,
                                       approx)
    else:
        exc, rng = _sample_tree(logits, state["rng"])
    # 7. excitation -> signal
    if target is not None:
        tf_sig = target - preemph * state["deemph"]
        tf_exc = lin2ulaw(tf_sig - pred)
        exc = jnp.where(teacher_mask, tf_exc, exc)
        pcm = jnp.where(teacher_mask, tf_sig, pred + ulaw2lin(exc))
    else:
        pcm = pred + ulaw2lin(exc)
    last_sig = jnp.concatenate(
        [pcm[..., None], state["last_sig"][..., :-1]], axis=-1)
    out = pcm + preemph * state["deemph"]
    deemph = out
    out = jnp.clip(out, -32767.0, 32767.0)
    out = jnp.floor(0.5 + out)  # (lpcnet.c:269)
    if target is not None:
        out = jnp.where(teacher_mask, target, out)
    new_state = {"gru_a": gru_a, "gru_b": gru_b, "last_sig": last_sig,
                 "last_exc": exc, "deemph": deemph, "rng": rng}
    return new_state, out


def synth_samples(tables: Dict[str, Any], state: Dict[str, jax.Array],
                  cond: Dict[str, jax.Array], cfg, nsamples: int,
                  target: Optional[jax.Array] = None,
                  preload: Optional[jax.Array] = None,
                  n_active: Optional[jax.Array] = None,
                  force_from: Optional[jax.Array] = None
                  ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Synthesize `nsamples` steps under ONE condition set — the equivalent
    of lpcnet_synthesize_tail_impl (lpcnet.c:235-271) called standalone,
    as the PLC engines do for sub-frame segments.

    cond: cond_a (B,3Na), cond_b (B,3Nb), lpc (B,16).
    target: optional (B, nsamples); preload: optional (B,) int32 — samples
    [0, preload) are teacher-forced. force_from: optional (B,) int32 —
    samples [force_from, nsamples) are ALSO teacher-forced (tail forcing;
    with it given, preload defaults to 0 instead of nsamples). n_active:
    optional (B,) int32 — per stream, only steps [0, n_active) advance
    state / emit output (the batched form of the C's variable-length
    synthesize calls; inactive streams keep their state, RNG included).
    Returns (state, (B, nsamples))."""
    approx, preemph = cfg.approx, cfg.preemph
    ca, cb, lp = cond["cond_a"], cond["cond_b"], cond["lpc"]

    def body(st, i):
        if target is not None:
            if preload is not None:
                pl = preload
            elif force_from is not None:
                pl = jnp.zeros(ca.shape[:1], jnp.int32)
            else:
                pl = jnp.full(ca.shape[:1], nsamples, jnp.int32)
            tmask = i < pl
            if force_from is not None:
                tmask = tmask | (i >= force_from)
            new_st, out = sample_step(tables, st, ca, cb, lp, approx,
                                      preemph, target=target[:, i],
                                      teacher_mask=tmask)
        else:
            new_st, out = sample_step(tables, st, ca, cb, lp, approx,
                                      preemph)
        if n_active is not None:
            act = i < n_active
            new_st = jax.tree.map(
                lambda n, o: jnp.where(
                    act.reshape(act.shape + (1,) * (n.ndim - 1)), n, o),
                new_st, st)
            out = jnp.where(act, out, 0.0)
        return new_st, out

    state, pcm = jax.lax.scan(body, state, jnp.arange(nsamples))
    return state, pcm.T


def teacher_advance(tables: Dict[str, Any], state: Dict[str, jax.Array],
                    cond: Dict[str, jax.Array], cfg, target: jax.Array
                    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """State advance over a FULLY teacher-forced segment WITHOUT the AR
    sample loop — the fast path for resync passes whose output is the
    target itself (PLC good-frame updates, decoder priming).

    Equivalent to synth_samples(..., target=target, preload=nsamples)
    including the RNG advance (2 draws per sample), but restructured: under
    full teacher forcing the excitation sequence is a function of the
    target alone (lpcnet.c:256-261 — exc comes from the target, not the
    sampler), so the cross-sample serial chain through
    pred -> mu-law -> GRU -> sample disappears. The mu-law/embedding math
    for ALL samples becomes batched (B*nsamples) tensor ops; only the GRU-A
    and GRU-B recurrences remain sequential (one (B,N)x(N,3N) matmul per
    step), and the dual-FC/tree-sampling work (whose result is discarded
    under forcing) is skipped entirely. ~2-4x faster than the AR kernels
    for this purpose and exact to float-rounding: the deemphasis chain is
    replicated op-for-op in a scalar scan.

    cond: cond_a (B,3Na), cond_b (B,3Nb), lpc (B,16); target (B, nsamples).
    Returns (new_state, target) — the forced output IS the target
    (sample_step line `out = where(mask, target, out)`)."""
    approx = cfg.approx
    ca, cb = cond["cond_a"], cond["cond_b"]
    seqs = teacher_sequences(state, cond, cfg, target)
    lsu, pu, exc_prev = seqs["lsu"], seqs["pu"], seqs["exc_prev"]
    ns = target.shape[1]
    zrh_a = (ca[:, None]
             + jnp.take(tables["tbl_sig"], lsu, axis=0)
             + jnp.take(tables["tbl_pred"], pu, axis=0)
             + jnp.take(tables["tbl_exc"], exc_prev, axis=0))  # (B,ns,3Na)

    def gru_seq(h0, zrh_t, wr, br):
        def step(h, z):
            h = _gru(h, z, wr, br, approx)
            return h, h

        return jax.lax.scan(step, h0, zrh_t)

    gru_a, gru_a_seq = gru_seq(state["gru_a"], zrh_a.transpose(1, 0, 2),
                               tables["wr_a"], tables["br_a"])
    zrh_b = cb[None] + gru_a_seq @ tables["wi_b"]       # (ns, B, 3Nb)
    gru_b, _ = gru_seq(state["gru_b"], zrh_b, tables["wr_b"],
                       tables["br_b"])

    # RNG parity: the forced loop still consumes 2 KISS99 draws per sample
    def rstep(r, _):
        r, _ = kiss99_next(r)
        return r, None

    rng, _ = jax.lax.scan(rstep, state["rng"], None, length=2 * ns)

    new_state = {"gru_a": gru_a, "gru_b": gru_b,
                 "last_sig": seqs["last_sig"], "last_exc": seqs["last_exc"],
                 "deemph": seqs["deemph"], "rng": rng}
    return new_state, target


def teacher_sequences(state, cond, cfg, target):
    """Precompute everything but the GRU recurrences for a fully forced
    segment: under teacher forcing the signal/excitation chain is a
    function of the target alone, so the mu-law indices for ALL samples are
    batched tensor ops. Returns dict(lsu, pu, exc_prev (B, ns) int32 GRU-A
    gather indices; last_sig, last_exc, deemph — the non-GRU state after
    the segment). Shared by the scan and pallas teacher-advance paths."""
    preemph = cfg.preemph
    lp = cond["lpc"]
    B, ns = target.shape

    # deemphasis / forced-signal chain (sample_step step 7): sequential but
    # scalar-per-stream; replicate the exact op order of sample_step
    def dscan(d, t):
        pd = preemph * d
        tf = t - pd
        return tf + pd, tf

    deemph, tf = jax.lax.scan(dscan, state["deemph"], target.T)
    tf = tf.T                                           # (B, ns) pcm values

    # lagged forced-signal matrix -> batched LPC prediction for all samples
    sig_seq = jnp.concatenate([state["last_sig"][:, ::-1], tf], axis=1)
    lags = jnp.stack(
        [sig_seq[:, LPC_ORDER - 1 - j:LPC_ORDER - 1 - j + ns]
         for j in range(LPC_ORDER)], axis=-1)           # (B, ns, 16)
    pred = -jnp.sum(lags * lp[:, None, :], axis=-1)
    exc = lin2ulaw(tf - pred)
    lsu = lin2ulaw(lags[..., 0])                        # last_sig[i][0]
    pu = lin2ulaw(pred)
    exc_prev = jnp.concatenate([state["last_exc"][:, None], exc[:, :-1]],
                               axis=1)
    return {"lsu": lsu, "pu": pu, "exc_prev": exc_prev,
            "last_sig": sig_seq[:, -LPC_ORDER:][:, ::-1],
            "last_exc": exc[:, -1], "deemph": deemph}


def synthesize_frames(tables: Dict[str, Any], state: Dict[str, jax.Array],
                      conds: Dict[str, jax.Array], cfg,
                      target: Optional[jax.Array] = None,
                      preload: Optional[jax.Array] = None,
                      temp_exp: Optional[jax.Array] = None
                      ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """Synthesize T frames for B streams.

    conds: cond_a (B,T,3Na), cond_b (B,T,3Nb), lpc (B,T,16)   [frame rate]
    target: optional (B, T*frame_size) teacher waveform (float, 16-bit range)
    preload: optional (B, T) int32 — per frame, samples [0, preload) are
             teacher-forced (lpcnet_synthesize_impl's preload arg).
    temp_exp: optional (B, T) per-frame sharpening exponents (temperature
             sampling mode, training_tf2/test_lpcnet.py:131-138).
    Returns (new_state, pcm (B, T*frame_size) float32 of rounded samples).
    """
    B, T = conds["cond_a"].shape[:2]
    fs = cfg.frame_size
    approx, preemph = cfg.approx, cfg.preemph

    tgt = None
    if target is not None:
        tgt = target.reshape(B, T, fs).transpose(1, 0, 2)  # (T, B, fs)
    pre = None
    if preload is not None:
        pre = preload.transpose(1, 0)  # (T, B)

    cond_a = conds["cond_a"].transpose(1, 0, 2)
    cond_b = conds["cond_b"].transpose(1, 0, 2)
    lpc = conds["lpc"].transpose(1, 0, 2)

    if tgt is not None:
        def frame_body(state, frame_inputs):
            ca, cb, lp, tg, pl = frame_inputs

            def samp_body(st, i):
                return sample_step(tables, st, ca, cb, lp, approx, preemph,
                                   target=tg[:, i], teacher_mask=i < pl)

            return jax.lax.scan(samp_body, state, jnp.arange(fs))

        state, pcm = jax.lax.scan(frame_body, state,
                                  (cond_a, cond_b, lpc, tgt, pre))
    else:
        te = temp_exp.transpose(1, 0) if temp_exp is not None else None

        def frame_body(state, frame_inputs):
            if te is not None:
                ca, cb, lp, tx = frame_inputs
            else:
                (ca, cb, lp), tx = frame_inputs, None

            def samp_body(st, _):
                return sample_step(tables, st, ca, cb, lp, approx, preemph,
                                   temp_exp=tx)

            return jax.lax.scan(samp_body, state, jnp.arange(fs))

        xs = (cond_a, cond_b, lpc, te) if te is not None \
            else (cond_a, cond_b, lpc)
        state, pcm = jax.lax.scan(frame_body, state, xs)
    # pcm: (T, fs, B) -> (B, T*fs)
    return state, pcm.transpose(2, 0, 1).reshape(B, T * fs)
