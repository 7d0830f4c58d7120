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
scan kernel, reproducing the C's float accumulation order exactly
(c_accum=True, the default): each 4-column group dot is an exact integer
(4 products < 2^15 summed left-to-right stays < 2^17, exact in float),
and the groups are folded into the bias*SCALE accumulator sequentially in
ascending column order in float32 — precisely what sgemv_accum8x4 /
sparse_sgemv_accum8x4 do (vec.h:206-340). Skipped all-zero sparse blocks
add exactly 0.0f, so the dense fold is bit-identical to the C's sparse
fold. Together with the strict two-rounded float helpers below (_mul,
_tanh_c, _sigmoid_c, _lin2ulaw_c — every mul-add pair kept un-contracted)
this makes the engine BIT-IDENTICAL to the compiled portable DOT_PROD
reference under injected conditions: measured 100.0% sample-exact over
12800 samples, both flavors (test_ref_parity.py::
TestDotProdWaveformParity). c_accum=False instead accumulates the
integer dot exactly in int32 — the "ideal" quantized semantics, which
forks stochastic AR trajectories vs the C (measured 85% sample-
identical, distributionally equivalent). Through the FULL reference
binary (frame network included) the match is distributional-only: the
frame net's XLA-vs-C float-association ulps get amplified by the
activation quantizer floor(.5+127*h) into trajectory forks (measured
85%/corr 0.995, TestInt8Deployment). The
unquantized paths (mu-law embeddings summed in float by
compute_gru_a_input nnet.c:484-503, the dual-FC sampler nnet.c:163-214,
the frame-rate network) are shared with sample_scan unchanged — exactly
the reference's split.

Everything affected: GRU-A recurrent (sparse blocks + float diag,
compute_sparse_gru nnet.c:410-448), GRU-B input + recurrent
(compute_gruB nnet.c:326-372).
"""
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mulaw import ulaw2lin
from ..ops.tables import TANSIG_TABLE
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


def _mul(a, b):
    """fl32(a*b) with FMA contraction into a downstream add BLOCKED.

    The C (gcc -O2, baseline x86-64, no FMA ISA) rounds every multiply
    before the following add; XLA CPU sometimes contracts mul+add chains
    into single-rounded FMAs depending on how the surrounding graph fuses,
    which perturbs the product's low bit. That ulp is harmless in the
    float engine but FORKS the quantized engine: the activation quantizer
    floor(.5+127*h) amplifies it into a full int8 LSB (module docstring).

    Neither optimization_barrier nor any XLA_FLAGS knob stops the CPU
    backend's contraction (measured; the barrier splits HLO fusions but
    LLVM still fuses the pair). Routing the product through
    min(p, FLT_MAX) does: value-identity for every finite float, and LLVM
    cannot contract across the min instruction (verified two-rounded on
    54k boundary cases)."""
    return jnp.minimum(a * b, jnp.float32(3.4028235e38))


def _tanh_c(x):
    """tanh_approx (vec.h:82-99) with every mul-add pair kept two-rounded
    (see _mul) — the strict-parity twin of activations.tanh_approx."""
    x = x.astype(jnp.float32)
    sign = jnp.where(x < 0, jnp.float32(-1.0), jnp.float32(1.0))
    ax = jnp.abs(x)
    i = jnp.floor(jnp.float32(0.5)
                  + _mul(jnp.float32(25.0), ax)).astype(jnp.int32)
    i = jnp.clip(i, 0, 200)
    dx = ax - _mul(jnp.float32(0.04), i.astype(jnp.float32))
    y = jnp.take(jnp.asarray(TANSIG_TABLE), i, axis=0)
    dy = jnp.float32(1.0) - _mul(y, y)
    t3 = jnp.float32(1.0) - _mul(y, dx)
    y = y + _mul(_mul(dx, dy), t3)
    return sign * y


def _sigmoid_c(x):
    """sigmoid_approx (vec.h:101-104), strict two-rounded form."""
    return jnp.float32(0.5) + _mul(jnp.float32(0.5),
                                   _tanh_c(jnp.float32(0.5) * x))


def _lin2ulaw_c(x):
    """lin2ulaw (common.h:47-58) with the log2_approx polynomial kept
    two-rounded. The final floor(.5+u) is exact in f32 (0.5 is a multiple
    of every ulp below 256), so it equals the C's double floor."""
    x = jnp.asarray(x).astype(jnp.float32)
    ax = jnp.abs(x)
    arg = jnp.float32(1.0) + _mul(jnp.float32(255.0 / 32768.0), ax)
    xi = jax.lax.bitcast_convert_type(arg, jnp.int32)
    integer = (xi >> 23) - 127
    xi = xi - (integer << 23)
    fm = jax.lax.bitcast_convert_type(xi, jnp.float32)
    frac = fm - jnp.float32(1.5)
    poly = jnp.float32(-0.41445418) + _mul(frac, (
        jnp.float32(0.95909232) + _mul(frac, (
            jnp.float32(-0.33951290)
            + _mul(frac, jnp.float32(0.16541097))))))
    l2 = (1 + integer).astype(jnp.float32) + poly
    la = jnp.float32(0.69315) * l2
    s = jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    u = jnp.float32(128.0) + _mul(s, jnp.float32(128.0) * la
                                  / jnp.float32(5.5451774445))
    u = jnp.clip(u, 0.0, 255.0)
    return jnp.floor(jnp.float32(0.5) + u).astype(jnp.int32)


def _qx(x: jax.Array, su: bool) -> jax.Array:
    """Online activation quantization (vec.h:243 / :281). Returns int32."""
    xi = jnp.floor(0.5 + _mul(jnp.float32(127.0), x)).astype(jnp.int32)
    return xi + 127 if su else xi


def _qdot(bias: jax.Array, qw: jax.Array, x: jax.Array, su: bool,
          c_accum: bool = True) -> jax.Array:
    """out = (bias*SCALE + x_q^T W_q) * SCALE_1 — the sgemv_accum8x4
    contract (vec.h:206-236). c_accum=True reproduces the C's float
    accumulation bit-for-bit: exact-integer 4-column group dots folded
    left-to-right into the float32 accumulator (see module docstring);
    c_accum=False takes the exact int32 dot in one shot."""
    xq = _qx(x, su)
    if not c_accum:
        dot = (xq[..., None, :] @ qw).squeeze(-2).astype(jnp.float32)
        return (bias * SCALE + dot) * SCALE_1
    cols = qw.shape[0]
    G = cols // 4
    # exact per-group integer dots: (..., G, out)
    parts = jnp.einsum("...gk,gko->...go", xq.reshape(xq.shape[:-1] +
                                                      (G, 4)),
                       qw.reshape(G, 4, -1))
    acc0 = jnp.broadcast_to(_mul(bias, SCALE),
                            parts.shape[:-2] + parts.shape[-1:])

    def fold(acc, p):
        return acc + p.astype(jnp.float32), None

    acc, _ = jax.lax.scan(fold, acc0, jnp.moveaxis(parts, -2, 0))
    # _mul: the scaled result feeds gate adds (zrh + recur) downstream
    return _mul(acc, SCALE_1)


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
    del approx   # strict C-rounded activations are always used here
    sig = _sigmoid_c
    act = _tanh_c

    # sequential 16-term sum in the C's order (lpcnet.c:252) — every float
    # op feeding the activation quantizer must be bit-exact with the C or
    # the quantizer amplifies the ulp into a trajectory fork (module
    # docstring); _mul keeps each product two-rounded like the C's
    pred = jnp.zeros_like(state["deemph"])
    for j in range(lpc.shape[-1]):
        pred = pred - _mul(state["last_sig"][..., j], lpc[..., j])
    lsu = _lin2ulaw_c(state["last_sig"][..., 0])
    pu = _lin2ulaw_c(pred)
    # compute_gru_a_input (float, nnet.c:484-491)
    inp = (cond_a
           + jnp.take(tables["tbl_sig"], lsu, axis=0)
           + jnp.take(tables["tbl_pred"], pu, axis=0)
           + jnp.take(tables["tbl_exc"], state["last_exc"], axis=0))
    # sparse GRU-A: bias + diag*state (+ input on z/r), then quantized dot
    h_a = state["gru_a"]
    state3 = jnp.tile(h_a, (1, 3))
    base = q["br_a"] + _mul(q["diag_a"], state3)
    base = base.at[..., :2 * na].add(inp[..., :2 * na])
    recur = _qdot(base, q["qr_a"], h_a, su)
    z = sig(recur[..., :na])
    r = sig(recur[..., na:2 * na])
    hcand = act(_mul(recur[..., 2 * na:], r) + inp[..., 2 * na:])
    gru_a = _mul(z, h_a) + _mul(jnp.float32(1.0) - z, hcand)

    # GRU-B: quantized input dot over gru_a + quantized recurrent dot
    zrh = _qdot(cond_b + q["bi_b_extra"], q["qi_b"], gru_a, su)
    rec_b = _qdot(q["br_b"], q["qr_b"], state["gru_b"], su)
    zb = sig(zrh[..., :nb] + rec_b[..., :nb])
    rb = sig(zrh[..., nb:2 * nb] + rec_b[..., nb:2 * nb])
    hb = act(zrh[..., 2 * nb:] + _mul(rec_b[..., 2 * nb:], rb))
    gru_b = _mul(zb, state["gru_b"]) + _mul(jnp.float32(1.0) - zb, hb)

    # dual-FC + tree sampler. The C accumulates each row's 16-term dot
    # sequentially (sample_mdense nnet.c:195-199) and combines channels as
    # f1*tanh(s1) + f2*tanh(s2) (:201-203); replicate that association
    # explicitly — a matmul's reduction order is backend/thread-count
    # dependent (XLA CPU re-tiles with jax_num_cpu_devices), and any logit
    # ulp can flip a tree decision and fork the AR trajectory.
    dfc = tables["dual_fc"]
    y = jnp.broadcast_to(dfc["b"], gru_b.shape[:-1] + dfc["b"].shape)
    for j in range(gru_b.shape[-1]):
        y = y + _mul(gru_b[..., j, None, None], dfc["w"][:, j, :])
    ty = act(y)
    logits = (_mul(dfc["factor"][0], ty[..., 0, :])
              + _mul(dfc["factor"][1], ty[..., 1, :]))
    exc, rng = _sample_tree(logits, state["rng"])

    if target is not None:
        tf_sig = target - _mul(jnp.float32(preemph), state["deemph"])
        tf_exc = _lin2ulaw_c(tf_sig - pred)
        exc = jnp.where(teacher_mask, tf_exc, exc)
        pcm = jnp.where(teacher_mask, tf_sig, pred + ulaw2lin(exc))
    else:
        pcm = pred + ulaw2lin(exc)
    last_sig = jnp.concatenate(
        [pcm[..., None], state["last_sig"][..., :-1]], axis=-1)
    out = pcm + _mul(jnp.float32(preemph), state["deemph"])
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
