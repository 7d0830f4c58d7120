"""DOT_PROD (int8) inference-numerics twin of the reference's deployed
quantized arithmetic.

The reference's DEFAULT build (no --disable-dot-product) runs the two GRU
matvecs of the sample network in quantized form: weights pre-quantized to
int8 at scale 128 (clip(round(128*w), -128, 127) — dump_lpcnet.py:57-61,
85-122), activations quantized online per step, 8x4-block dot products,
result rescaled by SCALE_1 = 1/(128*127) (src/vec.h:200-340). Two flavors
exist:

  * signed (portable C, vec.h:274-340, DOT_PROD without USE_SU_BIAS):
    x_i8 = floor(.5 + 127*x), regular biases;
  * unsigned+SU (AVX2/NEON, vec_avx.h:690-906, vec.h:204-270 with
    USE_SU_BIAS): x_u8 = 127 + floor(.5 + 127*x), with alternate "SU"
    biases pre-compensating the +127 offset:
    subias = bias - sum_rows(W_q)/128 (dump_lpcnet.py:139-141, 190-193).

In exact integer arithmetic the two flavors are IDENTICAL:
W^T(x+127)/(128*127) - sum(W)/128 == W^T x/(128*127); the C pair differs
only in float accumulation order. This module emulates BOTH on top of the
scan kernel, with the dot products accumulated exactly in int32 (the
portable C accumulates in float over 4-column groups; each group sum is
exact below 2^24, so the int32 emulation agrees to the same +-1-LSB class
as the float engines — measured in test_ref_parity.py::
TestDotProdWaveformParity against the compiled portable DOT_PROD
reference build). The unquantized paths (mu-law embeddings summed in
float by compute_gru_a_input nnet.c:484-503, the dual-FC sampler
nnet.c:163-214, the frame-rate network) are shared with sample_scan
unchanged — exactly the reference's split.

Everything affected: GRU-A recurrent (sparse blocks + float diag,
compute_sparse_gru nnet.c:410-448), GRU-B input + recurrent
(compute_gruB nnet.c:326-372).
"""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import activations
from ..ops.mulaw import lin2ulaw, ulaw2lin
from .sample_scan import _sample_tree

SCALE = np.float32(128.0 * 127.0)
# the C computes 1.f/128.f/127.f left-to-right: (1/128 exact) / 127
SCALE_1 = np.float32(np.float32(1.0 / 128.0) / np.float32(127.0))


def _quant_w(w) -> jnp.ndarray:
    """int8 quantization at scale 128 (dump_lpcnet.py:57-61)."""
    return jnp.clip(jnp.round(jnp.asarray(w, jnp.float32) * 128.0),
                    -128, 127).astype(jnp.int32)


def quantize_tables(tables: Dict[str, Any], cfg,
                    su_bias: bool = False) -> Dict[str, Any]:
    """Derive the DOT_PROD inference tables from the float sample tables
    (models/lpcnet.py::precompute_sample_tables). The quantization grid
    matches utils/export_ref exactly, so the emulation sees the same int8
    weights a reference build loads from our exported blob.

    su_bias=False: the portable-C flavor (signed activations);
    su_bias=True: the AVX/NEON flavor (unsigned activations + SU biases).
    """
    na = cfg.gru_a_units
    nb = cfg.gru_b_units
    wr_a = jnp.asarray(tables["wr_a"], jnp.float32)       # (na, 3na)
    # diag stays float, removed from the quantized blocks
    # (export_ref.export_lpcnet_arrays, dump_lpcnet.py:450-460)
    diag = jnp.concatenate([jnp.diag(wr_a[:, k * na:(k + 1) * na])
                            for k in range(3)])           # (3na,)
    eye3 = jnp.concatenate([jnp.eye(na)] * 3, axis=1)
    wr_a_nd = wr_a * (1.0 - eye3)
    q = {
        "diag_a": diag,
        "qr_a": _quant_w(wr_a_nd),                        # (na, 3na)
        "qi_b": _quant_w(tables["wi_b"]),                 # (na, 3nb)
        "qr_b": _quant_w(tables["wr_b"]),                 # (nb, 3nb)
        "su": bool(su_bias),
    }
    br_a = jnp.asarray(tables["br_a"], jnp.float32)
    br_b = jnp.asarray(tables["br_b"], jnp.float32)
    if su_bias:
        # subias = bias - sum_rows(Wq)/128 (dump_lpcnet.py:139-141,190-193)
        q["br_a"] = br_a - jnp.sum(q["qr_a"], 0) / 128.0
        q["bi_b_extra"] = -jnp.sum(q["qi_b"], 0) / 128.0   # added to cond_b
        q["br_b"] = br_b - jnp.sum(q["qr_b"], 0) / 128.0
    else:
        q["br_a"] = br_a
        q["bi_b_extra"] = jnp.zeros((3 * nb,), jnp.float32)
        q["br_b"] = br_b
    return q


def _qx(x: jax.Array, su: bool) -> jax.Array:
    """Online activation quantization (vec.h:243 / :281). Returns int32."""
    xi = jnp.floor(0.5 + 127.0 * x).astype(jnp.int32)
    return xi + 127 if su else xi


def _qdot(bias: jax.Array, qw: jax.Array, x: jax.Array, su: bool
          ) -> jax.Array:
    """out = (bias*SCALE + x_q^T W_q) * SCALE_1 — the sgemv_accum8x4
    contract (vec.h:206-236). The integer dot is exact in int32; the C's
    float 4-column-group accumulation agrees to <=1 ulp at the ~2^22
    magnitudes involved, which is below every comparison threshold in the
    sample network (asserted at waveform level in the parity test)."""
    dot = (_qx(x, su)[..., None, :] @ qw).squeeze(-2).astype(jnp.float32)
    return (bias * SCALE + dot) * SCALE_1


def sample_step_dotprod(tables: Dict[str, Any], q: Dict[str, Any],
                        state: Dict[str, jax.Array],
                        cond_a: jax.Array, cond_b: jax.Array,
                        lpc: jax.Array, approx: bool, preemph: float,
                        target: Optional[jax.Array] = None,
                        teacher_mask: Optional[jax.Array] = None):
    """One AR step with the reference's quantized GRU arithmetic — the
    DOT_PROD twin of sample_scan.sample_step. Op order follows
    compute_sparse_gru (nnet.c:410-448) and compute_gruB (nnet.c:326-372).
    """
    su = q["su"]
    na = q["diag_a"].shape[0] // 3
    nb = q["qr_b"].shape[0]
    sig = activations.get("sigmoid", approx)
    act = activations.get("tanh", approx)

    pred = -jnp.sum(state["last_sig"] * lpc, axis=-1)
    lsu = lin2ulaw(state["last_sig"][..., 0])
    pu = lin2ulaw(pred)
    # compute_gru_a_input (float, nnet.c:484-491)
    inp = (cond_a
           + jnp.take(tables["tbl_sig"], lsu, axis=0)
           + jnp.take(tables["tbl_pred"], pu, axis=0)
           + jnp.take(tables["tbl_exc"], state["last_exc"], axis=0))
    # sparse GRU-A: bias + diag*state (+ input on z/r), then quantized dot
    h_a = state["gru_a"]
    state3 = jnp.tile(h_a, (1, 3))
    base = q["br_a"] + q["diag_a"] * state3
    base = base.at[..., :2 * na].add(inp[..., :2 * na])
    recur = _qdot(base, q["qr_a"], h_a, su)
    z = sig(recur[..., :na])
    r = sig(recur[..., na:2 * na])
    hcand = act(recur[..., 2 * na:] * r + inp[..., 2 * na:])
    gru_a = z * h_a + (1.0 - z) * hcand

    # GRU-B: quantized input dot over gru_a + quantized recurrent dot
    zrh = _qdot(cond_b + q["bi_b_extra"], q["qi_b"], gru_a, su)
    rec_b = _qdot(q["br_b"], q["qr_b"], state["gru_b"], su)
    zb = sig(zrh[..., :nb] + rec_b[..., :nb])
    rb = sig(zrh[..., nb:2 * nb] + rec_b[..., nb:2 * nb])
    hb = act(zrh[..., 2 * nb:] + rec_b[..., 2 * nb:] * rb)
    gru_b = zb * state["gru_b"] + (1.0 - zb) * hb

    # dual-FC + tree sampler: float path, shared with sample_scan
    dfc = tables["dual_fc"]
    y = jnp.einsum("bi,cio->bco", gru_b, dfc["w"]) + dfc["b"]
    logits = jnp.sum(act(y) * dfc["factor"], axis=-2)
    exc, rng = _sample_tree(logits, state["rng"])

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
    out = jnp.floor(0.5 + out)
    if target is not None:
        out = jnp.where(teacher_mask, target, out)
    new_state = {"gru_a": gru_a, "gru_b": gru_b, "last_sig": last_sig,
                 "last_exc": exc, "deemph": deemph, "rng": rng}
    return new_state, out


def synth_samples_dotprod(tables: Dict[str, Any], q: Dict[str, Any],
                          state: Dict[str, jax.Array],
                          cond: Dict[str, jax.Array], cfg, nsamples: int,
                          target: Optional[jax.Array] = None,
                          preload: Optional[jax.Array] = None
                          ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """nsamples quantized AR steps under one condition set (the DOT_PROD
    twin of sample_scan.synth_samples, free-run + preload forcing)."""
    ca, cb, lp = cond["cond_a"], cond["cond_b"], cond["lpc"]

    def body(st, i):
        if target is not None:
            pl = (preload if preload is not None
                  else jnp.full(ca.shape[:1], nsamples, jnp.int32))
            return sample_step_dotprod(tables, q, st, ca, cb, lp,
                                       cfg.approx, cfg.preemph,
                                       target=target[:, i],
                                       teacher_mask=i < pl)
        return sample_step_dotprod(tables, q, st, ca, cb, lp, cfg.approx,
                                   cfg.preemph)

    state, pcm = jax.lax.scan(body, state, jnp.arange(nsamples))
    return state, pcm.T


def synthesize_frames_dotprod(tables: Dict[str, Any], q: Dict[str, Any],
                              state: Dict[str, jax.Array],
                              conds: Dict[str, jax.Array], cfg
                              ) -> Tuple[Dict[str, jax.Array], jax.Array]:
    """T-frame batched synthesis with the quantized sample network."""
    B, T = conds["cond_a"].shape[:2]
    fs = cfg.frame_size

    def frame_body(st, inp):
        ca, cb, lp = inp

        def samp(st2, _):
            return sample_step_dotprod(tables, q, st2, ca, cb, lp,
                                       cfg.approx, cfg.preemph)

        return jax.lax.scan(samp, st, None, length=fs)

    state, pcm = jax.lax.scan(
        frame_body, state,
        (conds["cond_a"].transpose(1, 0, 2),
         conds["cond_b"].transpose(1, 0, 2),
         conds["lpc"].transpose(1, 0, 2)))
    return state, pcm.transpose(2, 0, 1).reshape(B, T * fs)
