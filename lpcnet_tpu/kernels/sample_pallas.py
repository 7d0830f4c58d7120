"""Fused Pallas TPU kernel for the AR sample loop.

One kernel invocation synthesizes a full 10-ms frame (160 samples) for a
batch of streams with ALL weights and states resident in VMEM: zero HBM
traffic inside the sample loop. This is the speed-of-light structure for
the reference's hot loop (lpcnet_synthesize_tail_impl, lpcnet.c:235-271):
the lax.scan baseline re-stages weights from HBM every sample step, which
is exactly the bandwidth bottleneck this kernel removes.

TPU-native choices:
  * mu-law embedding lookups and the sampling-logit table are one-hot
    matmuls on the MXU (a (B,256)x(256,3N) product beats per-lane gathers)
  * the binary-tree bit decisions select logits with iota==index masks (VPU)
  * KISS99 advances as vectorized uint32 lane math
  * states live in the kernel's loop carry; the frame's 160 iterations are
    a fori_loop entirely inside VMEM

Weights are expected in float32 (2.5 MB) - fits VMEM with room for a
batch tile of a few hundred streams.

Perf experiments tried and rejected on v5e (2026-08, keep for later rounds;
baseline for all numbers: variant="base", tile 256, B=1024 -> ~2730x RT,
3.76 ms per 50-frame call):
  * single-launch grid=(tiles, frames) with VMEM-carried state: ~10%
    slower than lax.scan over per-frame launches (XLA overlaps the next
    frame's conditioning with the running kernel).
  * int8 MXU path (one-hot tables + GRU-A recurrent at scale-127): only
    +7% — the loop is VPU/latency-bound, not MXU-bound.
  * hoisting the KISS99 threshold stream out of the kernel (it is data-
    independent, so (T*160, 8, B) thresholds can be precomputed
    vectorized): any dynamic ref read inside THIS kernel's sample loop
    crashes Mosaic's VectorLayoutInferer::inferReshape ("arr.size() >=
    layout_rank(implicit_dim) (1 vs. 2)"), though the same read pattern
    compiles in isolation. Re-try when Mosaic updates.
  * variant="fuse": the 3 mu-law one-hot matmuls fused into ONE
    (B,768)x(768,1152) product + the dual-FC channels into one
    (B,16)x(16,512): measured -6% (2546x) — the wider one-hot iota/
    compare costs more VPU time than the saved MXU issues.
  * variant="opt" (fuse + software-pipelined thresholds, drawing the NEXT
    sample's thresholds each iteration so they leave the serialized
    chain): -11% total (2428x) — Mosaic executes the body in order, so
    the "pipelining" only adds 8 (B,) loop-carry registers of overhead.
    Both variants remain selectable and bit-identical to base
    (test_pallas_kernel.py) for re-testing on future toolchains.
  * batch tile 512 / 1024 (fewer serialized tile launches per frame):
    fails TPU compilation — VMEM overflow (weights 5.6 MB + per-sample
    (B,1152)-class temporaries exceed 16 MB at tile 512).
  * ablation (bt=128): replacing the mu-law indices with constants lets
    the compiler hoist the one-hot matmuls out of the loop and the frame
    drops 0.26 -> 0.06 ms — i.e. the loop is bound by the serialized
    data-dependent chain (pred -> mu-law -> gather -> GRU -> sample),
    not by any single op's throughput. Bigger wins need restructuring,
    and the restructurings tried so far all measured negative.
  * batch scaling: RT/chip is FLAT at 2620-2730x across B=1024/2048/4096
    (tiles serialize, per-tile latency fixed) — the per-chip ceiling of
    this architecture; scale further via stream-DP across chips
    (parallel/mesh.py), which is collective-free.
  * variant="flat" (round 3): the threshold lookups + tree walk are
    ~16 chain-serialized (B,256)-wide mask/reduce groups per sample — a
    large slice of the ~6 us serialized chain. The flat form moves the 8
    threshold lookups off the chain (RNG-only) and scores all 256 leaves
    with one compare + ONE (B,256)x(256,256) MXU matmul against a static
    +-1 path matrix + one match-reduce (~3 on-chain groups for the whole
    sampler). Same strict comparisons, bit-identical (test_pallas_kernel).
    A first flat attempt ((B,8,256) one-hot + concat-doubling score build)
    overflowed Mosaic's 16 MB scoped VMEM even at tile 128; the matmul
    scorer's live set is 3 (B,256) temporaries + a 256 KB static table.
    Measured on v5e: see the kernel-variant table in PERF.md.
"""
import functools
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import LPC_ORDER
from ..ops.mulaw import ULAW2LIN_TABLE
from ..ops.tables import SAMPLING_LOGIT_TABLE

_LOG256 = np.float32(5.5451774445)

# Mosaic's default scoped-VMEM guardrail is 16 MB; the teacher-forcing
# kernel's live set at tile 256 with the flat sampling tree sits right at
# that edge (16.09 MB), and the round-4 batch tile of 512 needs ~2x that
# again. v5e has 128 MB of VMEM — raise the per-kernel limit so the
# compiler stops rejecting layouts that fit the hardware.
_VMEM_LIMIT_MB = int(os.environ.get("LPCNET_PALLAS_VMEM_MB", "100"))


def _compiler_params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT_MB * 1024 * 1024)


# variant="flat" static tables (matmul tree scorer). The 8-bit tree walk
# (nnet.c:186-211) visits heap node n_b(c) = 2^b + (c >> (8-b)) at level b
# and takes bit r_b(c) = (c >> (7-b)) & 1 on the path to leaf byte c.
# Scoring a candidate c = counting the levels whose threshold comparison
# cmp[n] = (thr_level(n) < logits[n]) agrees with r_b(c); exactly the
# walked leaf agrees on all 8. With cmp in {0,1}^(B,256) over all heap
# nodes (column 0 unused),
#     score(c) = cmp @ D[:, c] + (8 - popcount(c)),
#     D[n, c]  = sum_b [n == n_b(c)] * (2*r_b(c) - 1)  in {-1, 0, +1},
# i.e. ONE (B,256)x(256,256) MXU matmul whose operands are small exact
# integers (bit-exact under any MXU precision mode), then match
# cmp @ D == popcount(c). This replaces the walk's 8 chain-serialized
# mask/reduce/compare groups with compare -> matmul -> match (~3 groups).
_FLAT_SCORE_W = np.zeros((256, 256), np.float32)
_FLAT_TARGET_LEAF = np.zeros((2, 256), np.float32)
for _c in range(256):
    for _b in range(8):
        _n = (1 << _b) + (_c >> (8 - _b))
        _r = (_c >> (7 - _b)) & 1
        _FLAT_SCORE_W[_n, _c] = 2.0 * _r - 1.0
        _FLAT_TARGET_LEAF[0, _c] += _r
    _FLAT_TARGET_LEAF[1, _c] = _c
# level-of-node masks: _FLAT_LVL[b, n] = 1 iff floor(log2(n)) == b (node 0
# is unused and assigned level 0); spreads the 8 per-sample thresholds
# across their node columns with exact {0,1} multiplies, off the chain.
_FLAT_LVL = np.zeros((8, 256), np.float32)
_FLAT_LVL[0, 0] = 1.0
for _n in range(1, 256):
    _FLAT_LVL[_n.bit_length() - 1, _n] = 1.0


def _lin2ulaw(x):
    """Bit-exact mu-law (common.h:47-58) with in-kernel bitcast log2."""
    x = x.astype(jnp.float32)
    ax = jnp.abs(x)
    arg = jnp.float32(1.0) + jnp.float32(255.0 / 32768.0) * ax
    xi = jax.lax.bitcast_convert_type(arg, jnp.int32)
    integer = (xi >> 23) - 127
    xi = xi - (integer << 23)
    f = jax.lax.bitcast_convert_type(xi, jnp.float32)
    frac = f - jnp.float32(1.5)
    poly = jnp.float32(-0.41445418) + frac * (
        jnp.float32(0.95909232)
        + frac * (jnp.float32(-0.33951290) + frac * jnp.float32(0.16541097)))
    l2 = (1 + integer).astype(jnp.float32) + poly
    s = jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    u = jnp.float32(128.0) + s * (jnp.float32(128.0) * jnp.float32(0.69315)
                                  * l2 / _LOG256)
    u = jnp.clip(u, 0.0, 255.0)
    return jnp.floor(jnp.float32(0.5) + u).astype(jnp.int32)


def _ulaw2lin(u, u2l_row):
    """Integer mu-law expansion, bit-exact with the C's double-exp
    evaluation: a one-hot row-select against ops/mulaw.ULAW2LIN_TABLE,
    shipped into the kernel as row 1 of the (2,256) logit/u2l table."""
    return jnp.sum(_onehot(u, 256) * u2l_row, axis=1)


def _onehot(idx, n, dtype=jnp.float32):
    """(B,) int32 -> (B, n) one-hot via broadcast iota."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], n), 1)
    return (cols == idx[:, None]).astype(dtype)


def _kiss99(rng):
    """rng: (B, 4) uint32 -> (new rng, draw (B,)) (kiss99.c:59-81)."""
    z, w, jsr, jcong = rng[:, 0], rng[:, 1], rng[:, 2], rng[:, 3]
    znew = jnp.uint32(36969) * (z & jnp.uint32(0xFFFF)) + (z >> 16)
    wnew = jnp.uint32(18000) * (w & jnp.uint32(0xFFFF)) + (w >> 16)
    mwc = (znew << 16) + wnew
    shr3 = jsr ^ (jsr << 13)
    shr3 = shr3 ^ (shr3 >> 17)
    shr3 = shr3 ^ (shr3 << 5)
    cong = jnp.uint32(69069) * jcong + jnp.uint32(1234567)
    out = (mwc ^ cong) + shr3
    return jnp.stack([znew, wnew, shr3, cong], axis=1), out


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _synth_loop(weights, cond_a, cond_b, lpc, carry, write_pcm,
                nsamples: int, preemph: float, wdtype,
                read_target=None, preload=None, n_active=None,
                force_from=None, flat_tree: bool = False):
    """The shared per-frame sample loop: `nsamples` AR steps under one
    condition set, writing rounded samples via write_pcm(i, out). `carry` is
    (gru_a, gru_b, last_sig, last_exc, deemph, rng); returns the final
    carry. All operands are VMEM-resident values.

    Teacher forcing (the C 'preload' mode, lpcnet.c:256-261):
    read_target(i) -> (B,) target samples; steps i < preload[b] follow the
    target instead of the sampled excitation. force_from: optional (B,) —
    steps i >= force_from[b] ALSO follow the target (the tail-forcing form
    the fused PLC step uses: good streams force the whole frame, blend
    streams only the second half, lost streams never). n_active: (B,) —
    steps i >= n_active[b] freeze that stream's state and emit 0 (the
    batched form of the C's variable-length synthesize calls). The RNG
    advances on active steps exactly as in sampling-only mode.

    flat_tree: evaluate the 8-bit sampling tree FLAT instead of walking it.
    The walk is 8 chain-serialized (threshold lookup, masked 256-wide
    reduce, compare) groups per sample; the flat form compares every heap
    node against its level's threshold at once, scores all 256 leaves with
    ONE (B,256)x(256,256) matmul against the static path matrix
    _FLAT_SCORE_W (see its comment), and reads off the unique
    popcount-matching leaf. The threshold spreading is RNG-only and off
    the chain, so the chain keeps just compare -> matmul -> match.
    Bit-identical by construction: the same strict thr<logit comparisons
    decide every bit, and all matmul operands are small exact integers.
    Requires (score_w, lvl_tbl, tgt_leaf) appended to `weights`."""
    if flat_tree:
        (tbl_sig, tbl_pred, tbl_exc, wr_a, br_a, wi_b, wr_b, br_b,
         dfc_w1, dfc_w2, dfc_b, dfc_f, logit_tbl,
         score_w, lvl_tbl, tgt_leaf) = weights
    else:
        (tbl_sig, tbl_pred, tbl_exc, wr_a, br_a, wi_b, wr_b, br_b,
         dfc_w1, dfc_w2, dfc_b, dfc_f, logit_tbl) = weights
    na = wr_a.shape[0]

    def gru(h, zrh, wr, br):
        n = h.shape[1]
        recur = jnp.dot(h, wr, preferred_element_type=jnp.float32) + br
        z = _sigmoid(zrh[:, :n] + recur[:, :n])
        r = _sigmoid(zrh[:, n:2 * n] + recur[:, n:2 * n])
        hc = jnp.tanh(zrh[:, 2 * n:] + r * recur[:, 2 * n:])
        return z * h + (1.0 - z) * hc

    def body(i, carry):
        gru_a, gru_b, last_sig, last_exc, deemph, rng = carry
        pred = -jnp.sum(last_sig * lpc, axis=1)
        lsu = _lin2ulaw(last_sig[:, 0])
        pu = _lin2ulaw(pred)
        # one-hot gathers on the MXU (weights optionally bf16: 4x MXU rate,
        # still finer-grained than the reference's int8 deployment path)
        zrh_a = (cond_a
                 + jnp.dot(_onehot(lsu, 256, wdtype), tbl_sig,
                           preferred_element_type=jnp.float32)
                 + jnp.dot(_onehot(pu, 256, wdtype), tbl_pred,
                           preferred_element_type=jnp.float32)
                 + jnp.dot(_onehot(last_exc, 256, wdtype), tbl_exc,
                           preferred_element_type=jnp.float32))
        gru_a_n = gru(gru_a, zrh_a, wr_a, br_a)
        zrh_b = cond_b + jnp.dot(gru_a_n, wi_b,
                                 preferred_element_type=jnp.float32)
        gru_b_n = gru(gru_b, zrh_b, wr_b, br_b)
        # dual-FC logits (B,16)x(16,256) x2 channels
        y1 = jnp.tanh(jnp.dot(gru_b_n, dfc_w1,
                              preferred_element_type=jnp.float32)
                      + dfc_b[0:1, :])
        y2 = jnp.tanh(jnp.dot(gru_b_n, dfc_w2,
                              preferred_element_type=jnp.float32)
                      + dfc_b[1:2, :])
        logits = y1 * dfc_f[0:1, :] + y2 * dfc_f[1:2, :]
        # thresholds: 2 KISS99 draws -> 8 logit-table bytes
        rng_n, r1 = _kiss99(rng)
        rng_n, r2 = _kiss99(rng_n)
        if flat_tree:
            # thresholds: 8 one-hot lookups spread across their heap-node
            # columns (exact {0,1} multiplies) — all off the serialized
            # chain (they depend only on the RNG, not on logits)
            thr_cols = jnp.zeros_like(logits)
            b = 0
            for r in (r1, r2):
                for k in range(4):
                    byt = ((r >> (8 * k))
                           & jnp.uint32(0xFF)).astype(jnp.int32)
                    t = jnp.sum(_onehot(byt, 256) * logit_tbl[0:1], axis=1)
                    thr_cols = thr_cols + t[:, None] * lvl_tbl[b:b + 1, :]
                    b += 1
            # on-chain: compare every heap node, one MXU matmul scores all
            # 256 leaves, the walked leaf is the unique popcount match
            cmp = (thr_cols < logits).astype(jnp.float32)
            dots = jnp.dot(cmp, score_w,
                           preferred_element_type=jnp.float32)
            exc = jnp.sum(
                jnp.where(dots == tgt_leaf[0:1, :], tgt_leaf[1:2, :], 0.0),
                axis=1).astype(jnp.int32)
        else:
            thrs = []
            for r in (r1, r2):
                for k in range(4):
                    b = ((r >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
                    thrs.append(jnp.sum(_onehot(b, 256) * logit_tbl[0:1],
                                         axis=1))
            # 8-bit tree walk with mask-selects (nnet.c:186-211)
            val = jnp.zeros((gru_b.shape[0],), jnp.int32)
            for b in range(8):
                idx = val | (1 << b)
                logit = jnp.sum(logits * _onehot(idx, 256), axis=1)
                bit = (thrs[b] < logit).astype(jnp.int32)
                val = (val << 1) | bit
            exc = val
        if read_target is not None:
            tgt = read_target(i)
            tf_sig = tgt - preemph * deemph
            tf_exc = _lin2ulaw(tf_sig - pred)
            # preload/force_from None-ness is static (machinery elision)
            tmask = None if preload is None else (i < preload)
            if force_from is not None:
                ff = i >= force_from
                tmask = ff if tmask is None else (tmask | ff)
            exc = jnp.where(tmask, tf_exc, exc)
            pcm = jnp.where(tmask, tf_sig,
                            pred + _ulaw2lin(exc, logit_tbl[1:2]))
        else:
            pcm = pred + _ulaw2lin(exc, logit_tbl[1:2])
        last_sig_n = jnp.concatenate([pcm[:, None], last_sig[:, :-1]],
                                     axis=1)
        out = pcm + preemph * deemph
        deemph_n = out
        out = jnp.clip(out, -32767.0, 32767.0)
        out = jnp.floor(0.5 + out)
        if read_target is not None:
            out = jnp.where(tmask, tgt, out)
        new = (gru_a_n, gru_b_n, last_sig_n, exc, deemph_n, rng_n)
        if n_active is not None:
            act = i < n_active
            actc = act[:, None]
            new = (jnp.where(actc, gru_a_n, gru_a),
                   jnp.where(actc, gru_b_n, gru_b),
                   jnp.where(actc, last_sig_n, last_sig),
                   jnp.where(act, exc, last_exc),
                   jnp.where(act, deemph_n, deemph),
                   jnp.where(actc, rng_n, rng))
            out = jnp.where(act, out, 0.0)
        write_pcm(i, out)
        return new

    return jax.lax.fori_loop(0, nsamples, body, carry)


def _synth_loop_opt(weights, cond_a, cond_b, lpc, carry, write_pcm,
                    nsamples: int, preemph: float, wdtype,
                    pipeline_thr: bool = True):
    """Critical-path-shortened variant of _synth_loop:
      * the 3 mu-law one-hot matmuls fuse into ONE (B,768)x(768,3Na)
        product (one MXU issue instead of three serialized ones)
      * the dual-FC channels fuse into one (B,16)x(16,512) matmul
      * the sampling thresholds (data-independent KISS99 draws + logit
        table lookups) are software-pipelined: each iteration computes the
        NEXT sample's thresholds, so they are off the serialized
        pred->ulaw->GRU->sample chain. The RNG consumption order matches
        the base loop draw-for-draw (the last iteration's lookahead draw
        is rolled back), so output is bit-identical to _synth_loop."""
    (tbl_cat, wr_a, br_a, wi_b, wr_b, br_b,
     dfc_w12, dfc_b, dfc_f, logit_tbl) = weights
    na = wr_a.shape[0]
    B = cond_a.shape[0]

    def gru(h, zrh, wr, br):
        n = h.shape[1]
        recur = jnp.dot(h, wr, preferred_element_type=jnp.float32) + br
        z = _sigmoid(zrh[:, :n] + recur[:, :n])
        r = _sigmoid(zrh[:, n:2 * n] + recur[:, n:2 * n])
        hc = jnp.tanh(zrh[:, 2 * n:] + r * recur[:, 2 * n:])
        return z * h + (1.0 - z) * hc

    def draw_thresholds(rng):
        # returns a TUPLE of 8 (B,) vectors: stacking them into one (8, B)
        # array crashes Mosaic's VectorLayoutInferer (same inferReshape
        # class as the round-1 threshold-hoisting note)
        rng, r1 = _kiss99(rng)
        rng, r2 = _kiss99(rng)
        rows = []
        for r in (r1, r2):
            for k in range(4):
                b = ((r >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32)
                rows.append(jnp.sum(_onehot(b, 256) * logit_tbl[0:1],
                                        axis=1))
        return rng, tuple(rows)

    gru_a0, gru_b0, last_sig0, exc0, deemph0, rng0 = carry
    if pipeline_thr:
        rng0, thr0 = draw_thresholds(rng0)
    else:
        thr0 = tuple(jnp.zeros_like(deemph0) for _ in range(8))

    def body(i, carry):
        gru_a, gru_b, last_sig, last_exc, deemph, rng, thr = carry
        if pipeline_thr:
            # next sample's thresholds: independent of this sample's chain
            rng_n, thr_n = draw_thresholds(rng)
            keep = (i < nsamples - 1)  # last lookahead draw is rolled back
            rng_n = jnp.where(keep, rng_n, rng)
            # thr_n of the last iteration is discarded with the carry;
            # only the rng rollback matters for stream identity
        else:
            rng_n, thr = draw_thresholds(rng)
            thr_n = thr
        pred = -jnp.sum(last_sig * lpc, axis=1)
        lsu = _lin2ulaw(last_sig[:, 0])
        pu = _lin2ulaw(pred)
        # one fused one-hot over [sig | pred | exc] lanes
        cols = jax.lax.broadcasted_iota(jnp.int32, (B, 768), 1)
        oh = ((cols == lsu[:, None]) | (cols == pu[:, None] + 256)
              | (cols == last_exc[:, None] + 512)).astype(wdtype)
        zrh_a = cond_a + jnp.dot(oh, tbl_cat,
                                 preferred_element_type=jnp.float32)
        gru_a = gru(gru_a, zrh_a, wr_a, br_a)
        zrh_b = cond_b + jnp.dot(gru_a, wi_b,
                                 preferred_element_type=jnp.float32)
        gru_b = gru(gru_b, zrh_b, wr_b, br_b)
        y12 = jnp.tanh(jnp.dot(gru_b, dfc_w12,
                               preferred_element_type=jnp.float32)
                       + dfc_b)                     # (B, 512)
        logits = (y12[:, :256] * dfc_f[0:1, :]
                  + y12[:, 256:] * dfc_f[1:2, :])
        val = jnp.zeros((B,), jnp.int32)
        for b in range(8):
            idx = val | (1 << b)
            logit = jnp.sum(logits * _onehot(idx, 256), axis=1)
            bit = (thr[b] < logit).astype(jnp.int32)
            val = (val << 1) | bit
        exc = val
        pcm = pred + _ulaw2lin(exc, logit_tbl[1:2])
        last_sig = jnp.concatenate([pcm[:, None], last_sig[:, :-1]], axis=1)
        out = pcm + preemph * deemph
        deemph = out
        out = jnp.clip(out, -32767.0, 32767.0)
        out = jnp.floor(0.5 + out)
        write_pcm(i, out)
        return gru_a, gru_b, last_sig, exc, deemph, rng_n, thr_n

    out = jax.lax.fori_loop(
        0, nsamples, body,
        (gru_a0, gru_b0, last_sig0, exc0, deemph0, rng0, thr0))
    return out[:6]


def _read_weights(tbl_sig_ref, tbl_pred_ref, tbl_exc_ref, wr_a_ref,
                  br_a_ref, wi_b_ref, wr_b_ref, br_b_ref, dfc_w1_ref,
                  dfc_w2_ref, dfc_b_ref, dfc_f_ref, logit_tbl_ref):
    return tuple(r[:] for r in (
        tbl_sig_ref, tbl_pred_ref, tbl_exc_ref, wr_a_ref, br_a_ref,
        wi_b_ref, wr_b_ref, br_b_ref, dfc_w1_ref, dfc_w2_ref, dfc_b_ref,
        dfc_f_ref, logit_tbl_ref))


def _frame_kernel(cond_a_ref, cond_b_ref, lpc_ref,
                  tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                  wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
                  dfc_w1_ref, dfc_w2_ref, dfc_b_ref, dfc_f_ref,
                  logit_tbl_ref,
                  gru_a_in, gru_b_in, sig_in, exc_in, deemph_in, rng_in,
                  gru_a_out, gru_b_out, sig_out, exc_out, deemph_out,
                  rng_out, pcm_ref, *, nsamples: int, preemph: float,
                  wdtype=jnp.float32):
    weights = _read_weights(tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                            wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref,
                            br_b_ref, dfc_w1_ref, dfc_w2_ref, dfc_b_ref,
                            dfc_f_ref, logit_tbl_ref)
    init = (gru_a_in[:], gru_b_in[:], sig_in[:], exc_in[:, 0],
            deemph_in[:, 0], rng_in[:])
    def write_pcm(i, out):
        pcm_ref[i, :] = out

    gru_a, gru_b, last_sig, exc, deemph, rng = _synth_loop(
        weights, cond_a_ref[:], cond_b_ref[:], lpc_ref[:], init, write_pcm,
        nsamples, preemph, wdtype)
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b
    sig_out[:] = last_sig
    exc_out[:] = exc[:, None]
    deemph_out[:] = deemph[:, None]
    rng_out[:] = rng


def _frame_kernel_flat(cond_a_ref, cond_b_ref, lpc_ref,
                       tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                       wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
                       dfc_w1_ref, dfc_w2_ref, dfc_b_ref, dfc_f_ref,
                       logit_tbl_ref, score_w_ref, lvl_ref, tgt_leaf_ref,
                       gru_a_in, gru_b_in, sig_in, exc_in, deemph_in,
                       rng_in, gru_a_out, gru_b_out, sig_out, exc_out,
                       deemph_out, rng_out, pcm_ref, *, nsamples: int,
                       preemph: float, wdtype=jnp.float32):
    """_frame_kernel with the flat (matmul-scored) sampling tree."""
    weights = _read_weights(tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                            wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref,
                            br_b_ref, dfc_w1_ref, dfc_w2_ref, dfc_b_ref,
                            dfc_f_ref, logit_tbl_ref) + (
                                score_w_ref[:], lvl_ref[:], tgt_leaf_ref[:])
    init = (gru_a_in[:], gru_b_in[:], sig_in[:], exc_in[:, 0],
            deemph_in[:, 0], rng_in[:])

    def write_pcm(i, out):
        pcm_ref[i, :] = out

    gru_a, gru_b, last_sig, exc, deemph, rng = _synth_loop(
        weights, cond_a_ref[:], cond_b_ref[:], lpc_ref[:], init, write_pcm,
        nsamples, preemph, wdtype, flat_tree=True)
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b
    sig_out[:] = last_sig
    exc_out[:] = exc[:, None]
    deemph_out[:] = deemph[:, None]
    rng_out[:] = rng


def _frame_kernel_opt(cond_a_ref, cond_b_ref, lpc_ref,
                      tbl_cat_ref, wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref,
                      br_b_ref, dfc_w12_ref, dfc_b_ref, dfc_f_ref,
                      logit_tbl_ref,
                      gru_a_in, gru_b_in, sig_in, exc_in, deemph_in, rng_in,
                      gru_a_out, gru_b_out, sig_out, exc_out, deemph_out,
                      rng_out, pcm_ref, *, nsamples: int, preemph: float,
                      wdtype=jnp.float32, pipeline_thr: bool = True):
    weights = tuple(r[:] for r in (
        tbl_cat_ref, wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
        dfc_w12_ref, dfc_b_ref, dfc_f_ref, logit_tbl_ref))
    init = (gru_a_in[:], gru_b_in[:], sig_in[:], exc_in[:, 0],
            deemph_in[:, 0], rng_in[:])

    def write_pcm(i, out):
        pcm_ref[i, :] = out

    gru_a, gru_b, last_sig, exc, deemph, rng = _synth_loop_opt(
        weights, cond_a_ref[:], cond_b_ref[:], lpc_ref[:], init, write_pcm,
        nsamples, preemph, wdtype, pipeline_thr=pipeline_thr)
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b
    sig_out[:] = last_sig
    exc_out[:] = exc[:, None]
    deemph_out[:] = deemph[:, None]
    rng_out[:] = rng


def _tf_frame_kernel(cond_a_ref, cond_b_ref, lpc_ref,
                     tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                     wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
                     dfc_w1_ref, dfc_w2_ref, dfc_b_ref, dfc_f_ref,
                     logit_tbl_ref, tgt_ref, pre_ref, act_ref, ff_ref,
                     gru_a_in, gru_b_in, sig_in, exc_in, deemph_in, rng_in,
                     gru_a_out, gru_b_out, sig_out, exc_out, deemph_out,
                     rng_out, pcm_ref, *, nsamples: int, preemph: float,
                     wdtype=jnp.float32, use_target: bool = True,
                     use_preload: bool = True, use_n_active: bool = True,
                     use_force_from: bool = True):
    """Teacher-forcing variant of _frame_kernel: target (nsamples, B) +
    per-stream preload, active counts, and tail-forcing starts. The
    use_* flags are STATIC: inert machinery is elided from the loop body
    (its refs are still passed to keep the spec count fixed)."""
    weights = _read_weights(tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                            wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref,
                            br_b_ref, dfc_w1_ref, dfc_w2_ref, dfc_b_ref,
                            dfc_f_ref, logit_tbl_ref)
    init = (gru_a_in[:], gru_b_in[:], sig_in[:], exc_in[:, 0],
            deemph_in[:, 0], rng_in[:])

    def write_pcm(i, out):
        pcm_ref[i, :] = out

    gru_a, gru_b, last_sig, exc, deemph, rng = _synth_loop(
        weights, cond_a_ref[:], cond_b_ref[:], lpc_ref[:], init, write_pcm,
        nsamples, preemph, wdtype,
        read_target=(lambda i: tgt_ref[i, :]) if use_target else None,
        preload=pre_ref[:, 0] if use_preload else None,
        n_active=act_ref[:, 0] if use_n_active else None,
        force_from=ff_ref[:, 0] if use_force_from else None)
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b
    sig_out[:] = last_sig
    exc_out[:] = exc[:, None]
    deemph_out[:] = deemph[:, None]
    rng_out[:] = rng


def _tf_frame_kernel_flat(cond_a_ref, cond_b_ref, lpc_ref,
                          tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                          wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
                          dfc_w1_ref, dfc_w2_ref, dfc_b_ref, dfc_f_ref,
                          logit_tbl_ref, score_w_ref, lvl_ref, tgt_leaf_ref,
                          tgt_ref, pre_ref, act_ref, ff_ref,
                          gru_a_in, gru_b_in, sig_in, exc_in, deemph_in,
                          rng_in, gru_a_out, gru_b_out, sig_out, exc_out,
                          deemph_out, rng_out, pcm_ref, *, nsamples: int,
                          preemph: float, wdtype=jnp.float32,
                          use_target: bool = True, use_preload: bool = True,
                          use_n_active: bool = True,
                          use_force_from: bool = True):
    """_tf_frame_kernel with the flat (matmul-scored) sampling tree."""
    weights = _read_weights(tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                            wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref,
                            br_b_ref, dfc_w1_ref, dfc_w2_ref, dfc_b_ref,
                            dfc_f_ref, logit_tbl_ref) + (
                                score_w_ref[:], lvl_ref[:], tgt_leaf_ref[:])
    init = (gru_a_in[:], gru_b_in[:], sig_in[:], exc_in[:, 0],
            deemph_in[:, 0], rng_in[:])

    def write_pcm(i, out):
        pcm_ref[i, :] = out

    gru_a, gru_b, last_sig, exc, deemph, rng = _synth_loop(
        weights, cond_a_ref[:], cond_b_ref[:], lpc_ref[:], init, write_pcm,
        nsamples, preemph, wdtype,
        read_target=(lambda i: tgt_ref[i, :]) if use_target else None,
        preload=pre_ref[:, 0] if use_preload else None,
        n_active=act_ref[:, 0] if use_n_active else None,
        force_from=ff_ref[:, 0] if use_force_from else None,
        flat_tree=True)
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b
    sig_out[:] = last_sig
    exc_out[:] = exc[:, None]
    deemph_out[:] = deemph[:, None]
    rng_out[:] = rng


def _teacher_kernel(cond_a_ref, cond_b_ref,
                    tbl_sig_ref, tbl_pred_ref, tbl_exc_ref,
                    wr_a_ref, br_a_ref, wi_b_ref, wr_b_ref, br_b_ref,
                    idx_sig_ref, idx_pred_ref, idx_exc_ref,
                    gru_a_in, gru_b_in,
                    gru_a_out, gru_b_out, *, nsamples: int, wdtype):
    """GRU-advance kernel for FULLY teacher-forced segments: the mu-law
    indices for every sample are precomputed outside (they depend only on
    the target — sample_scan.teacher_sequences), so the loop body is just
    embeddings + the two GRU recurrences. No dual-FC, no tree sampling, no
    RNG — the serialized per-sample chain shrinks to its irreducible
    recurrent core (cf. the bt=128 constant-index ablation in the module
    docstring: the same loop without data-dependent index computation runs
    ~4x faster)."""
    tbl_sig, tbl_pred, tbl_exc = (tbl_sig_ref[:], tbl_pred_ref[:],
                                  tbl_exc_ref[:])
    wr_a, br_a = wr_a_ref[:], br_a_ref[:]
    wi_b, wr_b, br_b = wi_b_ref[:], wr_b_ref[:], br_b_ref[:]
    cond_a, cond_b = cond_a_ref[:], cond_b_ref[:]

    def gru(h, zrh, wr, br):
        n = h.shape[1]
        recur = jnp.dot(h, wr, preferred_element_type=jnp.float32) + br
        z = _sigmoid(zrh[:, :n] + recur[:, :n])
        r = _sigmoid(zrh[:, n:2 * n] + recur[:, n:2 * n])
        hc = jnp.tanh(zrh[:, 2 * n:] + r * recur[:, 2 * n:])
        return z * h + (1.0 - z) * hc

    def body(i, carry):
        gru_a, gru_b = carry
        zrh_a = (cond_a
                 + jnp.dot(_onehot(idx_sig_ref[i, :], 256, wdtype), tbl_sig,
                           preferred_element_type=jnp.float32)
                 + jnp.dot(_onehot(idx_pred_ref[i, :], 256, wdtype),
                           tbl_pred, preferred_element_type=jnp.float32)
                 + jnp.dot(_onehot(idx_exc_ref[i, :], 256, wdtype), tbl_exc,
                           preferred_element_type=jnp.float32))
        gru_a = gru(gru_a, zrh_a, wr_a, br_a)
        zrh_b = cond_b + jnp.dot(gru_a, wi_b,
                                 preferred_element_type=jnp.float32)
        gru_b = gru(gru_b, zrh_b, wr_b, br_b)
        return gru_a, gru_b

    gru_a, gru_b = jax.lax.fori_loop(0, nsamples, body,
                                     (gru_a_in[:], gru_b_in[:]))
    gru_a_out[:] = gru_a
    gru_b_out[:] = gru_b


def teacher_advance_pallas(tables: Dict[str, Any],
                           state: Dict[str, jax.Array],
                           cond: Dict[str, jax.Array], cfg,
                           target: jax.Array, interpret: bool = False):
    """Fused twin of sample_scan.teacher_advance: sequences precomputed in
    XLA (small (B, ns) tensors), GRU recurrences advanced VMEM-resident.
    Returns (new_state, target)."""
    from . import sample_scan
    B, ns = target.shape
    Bp = max(8, -(-B // 8) * 8) if B <= MAX_BATCH_TILE \
        else -(-B // MAX_BATCH_TILE) * MAX_BATCH_TILE
    if Bp != B:
        pads = _pad_batch({"state": state, "cond": cond, "target": target},
                          B, Bp)
        new_state, _ = teacher_advance_pallas(
            tables, pads["state"], pads["cond"], cfg, pads["target"],
            interpret=interpret)
        return jax.tree.map(lambda x: x[:B], new_state), target

    seqs = sample_scan.teacher_sequences(state, cond, cfg, target)
    na, nb = cfg.gru_a_units, cfg.gru_b_units
    bt = min(B, MAX_BATCH_TILE)
    if B == bt:
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [full] * 15
        out_specs = (full, full)
        grid = None
    else:
        grid = (B // bt,)

        def bspec(rows):
            return pl.BlockSpec((bt, rows), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        def iseq():
            return pl.BlockSpec((ns, bt), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        in_specs = [
            bspec(3 * na), bspec(3 * nb),
            wspec((256, 3 * na)), wspec((256, 3 * na)), wspec((256, 3 * na)),
            wspec((na, 3 * na)), wspec((1, 3 * na)), wspec((na, 3 * nb)),
            wspec((nb, 3 * nb)), wspec((1, 3 * nb)),
            iseq(), iseq(), iseq(),
            bspec(na), bspec(nb),
        ]
        out_specs = (bspec(na), bspec(nb))
    out_shapes = (
        jax.ShapeDtypeStruct((B, na), jnp.float32),
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
    )
    kernel = functools.partial(_teacher_kernel, nsamples=ns,
                               wdtype=jnp.float32)
    call_kwargs = dict(out_shape=out_shapes, in_specs=in_specs,
                       out_specs=out_specs, interpret=interpret,
                       compiler_params=_compiler_params())
    if grid is not None:
        call_kwargs["grid"] = grid
    gru_a, gru_b = pl.pallas_call(kernel, **call_kwargs)(
        cond["cond_a"], cond["cond_b"],
        tables["tbl_sig"], tables["tbl_pred"], tables["tbl_exc"],
        tables["wr_a"], tables["br_a"][None, :], tables["wi_b"],
        tables["wr_b"], tables["br_b"][None, :],
        seqs["lsu"].T, seqs["pu"].T, seqs["exc_prev"].T,
        state["gru_a"], state["gru_b"])

    # RNG parity: 2 KISS99 draws per sample, advanced vectorized outside
    def rstep(r, _):
        r, _ = _host_kiss99(r)
        return r, None

    rng, _ = jax.lax.scan(rstep, state["rng"], None, length=2 * ns)
    new_state = {"gru_a": gru_a, "gru_b": gru_b,
                 "last_sig": seqs["last_sig"], "last_exc": seqs["last_exc"],
                 "deemph": seqs["deemph"], "rng": rng}
    return new_state, target


def _host_kiss99(rng):
    from ..ops.kiss99 import kiss99_next
    return kiss99_next(rng)


def synth_samples_pallas(tables: Dict[str, Any], state: Dict[str, jax.Array],
                         cond: Dict[str, jax.Array], cfg, nsamples: int,
                         target=None, preload=None, n_active=None,
                         force_from=None,
                         interpret: bool = False, variant: str = "base"):
    """Fused-kernel twin of sample_scan.synth_samples: `nsamples` AR steps
    under ONE condition set with optional teacher forcing and per-stream
    active counts — the primitive the PLC engines are built on. Unlike the
    scan path (which re-stages weights from HBM every sample), all weights
    and state stay in VMEM, ~10x faster per frame at batch 1024.

    cond: cond_a (B,3Na), cond_b (B,3Nb), lpc (B,16); target (B,nsamples);
    preload/n_active/force_from (B,) int32 (steps i < preload[b] or
    i >= force_from[b] follow the target). variant: 'base' or 'flat'
    (flattened sampling tree, bit-identical).
    Returns (new_state, (B, nsamples))."""
    flat = variant == "flat"
    B = cond["cond_a"].shape[0]
    Bp = max(8, -(-B // 8) * 8) if B <= MAX_BATCH_TILE \
        else -(-B // MAX_BATCH_TILE) * MAX_BATCH_TILE
    if Bp != B:
        # pad only what the caller actually passed: None-ness is a STATIC
        # property that elides the corresponding in-kernel machinery below
        opt = {"target": target, "preload": preload, "n_active": n_active,
               "force_from": force_from}
        pads = _pad_batch(
            {"state": state, "cond": cond,
             **{k: v for k, v in opt.items() if v is not None}},
            B, Bp)
        new_state, pcm = synth_samples_pallas(
            tables, pads["state"], pads["cond"], cfg, nsamples,
            target=pads.get("target"), preload=pads.get("preload"),
            n_active=pads.get("n_active"),
            force_from=pads.get("force_from"),
            interpret=interpret, variant=variant)
        return jax.tree.map(lambda x: x[:B], new_state), pcm[:B]

    dfc = tables["dual_fc"]
    logit_tbl = jnp.stack([jnp.asarray(SAMPLING_LOGIT_TABLE),
                           jnp.asarray(ULAW2LIN_TABLE)])
    na, nb = cfg.gru_a_units, cfg.gru_b_units
    # STATIC machinery flags: which teacher/active features the kernel
    # body must actually compute. The refs are always passed (fixed spec
    # count) but inert ones never touch the serialized sample chain —
    # free-run callers pay nothing for the teacher path, and the fused
    # PLC step (target + force_from only) skips the preload/n_active
    # compares and the 7-tensor freeze-select per step.
    use_target = target is not None
    use_n_active = n_active is not None
    use_force_from = force_from is not None
    use_preload = preload is not None or (use_target and not use_force_from)
    if target is None:
        target = jnp.zeros((B, nsamples))
        if preload is None:
            preload = jnp.zeros((B,), jnp.int32)
    elif preload is None and force_from is None:
        preload = jnp.full((B,), nsamples, jnp.int32)
    elif preload is None:
        preload = jnp.zeros((B,), jnp.int32)
    if n_active is None:
        n_active = jnp.full((B,), nsamples, jnp.int32)
    if force_from is None:
        force_from = jnp.full((B,), nsamples, jnp.int32)

    bt = min(B, MAX_BATCH_TILE)
    if B == bt:
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [full] * (29 if flat else 26)
        out_specs = tuple([full] * 7)
        grid = None
    else:
        grid = (B // bt,)

        def bspec(rows):
            return pl.BlockSpec((bt, rows), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        def wspec(shape):
            return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        in_specs = [
            bspec(3 * na), bspec(3 * nb), bspec(LPC_ORDER),
            wspec((256, 3 * na)), wspec((256, 3 * na)), wspec((256, 3 * na)),
            wspec((na, 3 * na)), wspec((1, 3 * na)), wspec((na, 3 * nb)),
            wspec((nb, 3 * nb)), wspec((1, 3 * nb)),
            wspec((nb, 256)), wspec((nb, 256)), wspec((2, 256)),
            wspec((2, 256)), wspec((2, 256)),
        ] + ([wspec((256, 256)), wspec((8, 256)), wspec((2, 256))]
             if flat else []) + [
            pl.BlockSpec((nsamples, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            bspec(1), bspec(1), bspec(1),
            bspec(na), bspec(nb), bspec(LPC_ORDER), bspec(1), bspec(1),
            bspec(4),
        ]
        out_specs = (
            bspec(na), bspec(nb), bspec(LPC_ORDER), bspec(1), bspec(1),
            bspec(4),
            pl.BlockSpec((nsamples, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
    out_shapes = (
        jax.ShapeDtypeStruct((B, na), jnp.float32),
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
        jax.ShapeDtypeStruct((B, LPC_ORDER), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 4), jnp.uint32),
        jax.ShapeDtypeStruct((nsamples, B), jnp.float32),
    )
    kernel = functools.partial(
        _tf_frame_kernel_flat if flat else _tf_frame_kernel,
        nsamples=nsamples, preemph=cfg.preemph,
        use_target=use_target, use_preload=use_preload,
        use_n_active=use_n_active, use_force_from=use_force_from)
    if flat:
        dfc_args = (dfc["w"][0], dfc["w"][1], dfc["b"], dfc["factor"],
                    logit_tbl, jnp.asarray(_FLAT_SCORE_W),
                    jnp.asarray(_FLAT_LVL), jnp.asarray(_FLAT_TARGET_LEAF))
    else:
        dfc_args = (dfc["w"][0], dfc["w"][1], dfc["b"], dfc["factor"],
                    logit_tbl)
    call_kwargs = dict(out_shape=out_shapes, in_specs=in_specs,
                       out_specs=out_specs, interpret=interpret,
                       compiler_params=_compiler_params())
    if grid is not None:
        call_kwargs["grid"] = grid
    outs = pl.pallas_call(
        kernel,
        **call_kwargs,
    )(cond["cond_a"], cond["cond_b"], cond["lpc"],
      tables["tbl_sig"], tables["tbl_pred"], tables["tbl_exc"],
      tables["wr_a"], tables["br_a"][None, :], tables["wi_b"],
      tables["wr_b"], tables["br_b"][None, :],
      *dfc_args,
      target.T, preload[:, None].astype(jnp.int32),
      n_active[:, None].astype(jnp.int32),
      force_from[:, None].astype(jnp.int32),
      state["gru_a"], state["gru_b"], state["last_sig"],
      state["last_exc"][:, None].astype(jnp.int32),
      state["deemph"][:, None], state["rng"])
    gru_a, gru_b, last_sig, exc, deemph, rng, pcm = outs
    new_state = {"gru_a": gru_a, "gru_b": gru_b, "last_sig": last_sig,
                 "last_exc": exc[:, 0], "deemph": deemph[:, 0], "rng": rng}
    return new_state, pcm.T


# VMEM budget: weights ~5.5 MB + per-tile activations. Tiles serialize at
# near-fixed latency, so the largest tile that compiles sets RT/chip.
# Round-4 sweep on v5e (B=1024, flat variant, under the raised VMEM
# limit): tile 256 -> 2609x, 384 -> 2462x (1024 pads to 1152), 512 ->
# 2839x (best; 2884x at B=2048), 1024 single-launch -> 2792x. 512 is the
# default; override for experiments via LPCNET_PALLAS_TILE (multiple of 8;
# tile 512 was a VMEM-overflow compile failure under Mosaic's default
# 16 MB scoped-VMEM guardrail — see _VMEM_LIMIT_MB above).
MAX_BATCH_TILE = int(os.environ.get("LPCNET_PALLAS_TILE", "512"))


def synthesize_frame_pallas(tables: Dict[str, Any],
                            state: Dict[str, jax.Array],
                            cond_a: jax.Array, cond_b: jax.Array,
                            lpc: jax.Array, cfg,
                            interpret: bool = False,
                            table_dtype=jnp.float32,
                            variant: str = "base"):
    """Synthesize one frame (B, 160) with the fused kernel.

    cond_a: (B, 3Na), cond_b: (B, 3Nb), lpc: (B, 16). Batches above
    MAX_BATCH_TILE run as a grid of stream tiles; the weight blocks have a
    constant index map so they stay VMEM-resident across tiles.
    variant: 'opt' (fused embed/dual-FC matmuls + pipelined thresholds,
    bit-identical output), 'flat' (flattened sampling tree: batched
    threshold lookup + all-leaf scoring instead of the 8-step serialized
    walk, bit-identical output), or 'base'.
    Returns (new_state, pcm (B, 160))."""
    B = cond_a.shape[0]
    fs = cfg.frame_size
    dfc = tables["dual_fc"]
    logit_tbl = jnp.stack([jnp.asarray(SAMPLING_LOGIT_TABLE),
                           jnp.asarray(ULAW2LIN_TABLE)])
    opt = variant in ("opt", "fuse")
    flat = variant == "flat"

    bt = min(B, MAX_BATCH_TILE)
    assert B % bt == 0, f"batch {B} must be a multiple of {bt}"
    n_weights = 10 if opt else (16 if flat else 13)
    if B == bt:
        # single tile: full-array blocks, no grid pipeline copies (fastest)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [full] * (9 + n_weights)
        out_specs = tuple([full] * 7)
        grid = None
    else:
        grid = (B // bt,)

    def bspec(rows):
        # per-stream tensor: tile the leading (batch) axis
        return pl.BlockSpec((bt, rows), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def wspec(shape):
        # weight tensor: same block for every tile
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    na, nb = cfg.gru_a_units, cfg.gru_b_units
    if grid is not None:
        if opt:
            weight_specs = [
                wspec((768, 3 * na)),
                wspec((na, 3 * na)), wspec((1, 3 * na)),
                wspec((na, 3 * nb)), wspec((nb, 3 * nb)),
                wspec((1, 3 * nb)),
                wspec((nb, 512)), wspec((1, 512)), wspec((2, 256)),
                wspec((2, 256)),
            ]
        else:
            weight_specs = [
                wspec((256, 3 * na)), wspec((256, 3 * na)),
                wspec((256, 3 * na)),
                wspec((na, 3 * na)), wspec((1, 3 * na)),
                wspec((na, 3 * nb)), wspec((nb, 3 * nb)),
                wspec((1, 3 * nb)),
                wspec((nb, 256)), wspec((nb, 256)), wspec((2, 256)),
                wspec((2, 256)), wspec((2, 256)),
            ]
            if flat:
                weight_specs += [wspec((256, 256)), wspec((8, 256)),
                                 wspec((2, 256))]
        in_specs = (
            [bspec(3 * na), bspec(3 * nb), bspec(LPC_ORDER)]
            + weight_specs
            + [bspec(na), bspec(nb), bspec(LPC_ORDER), bspec(1), bspec(1),
               bspec(4)])
        out_specs = (
            bspec(na), bspec(nb), bspec(LPC_ORDER), bspec(1), bspec(1),
            bspec(4),
            pl.BlockSpec((fs, bt), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        )
    out_shapes = (
        jax.ShapeDtypeStruct((B, na), jnp.float32),
        jax.ShapeDtypeStruct((B, nb), jnp.float32),
        jax.ShapeDtypeStruct((B, LPC_ORDER), jnp.float32),
        jax.ShapeDtypeStruct((B, 1), jnp.int32),
        jax.ShapeDtypeStruct((B, 1), jnp.float32),
        jax.ShapeDtypeStruct((B, 4), jnp.uint32),
        jax.ShapeDtypeStruct((fs, B), jnp.float32),
    )
    if opt:
        kernel = functools.partial(_frame_kernel_opt, nsamples=fs,
                                   preemph=cfg.preemph, wdtype=table_dtype,
                                   pipeline_thr=variant == "opt")
        tbl_cat = jnp.concatenate(
            [tables["tbl_sig"], tables["tbl_pred"], tables["tbl_exc"]],
            axis=0).astype(table_dtype)
        weight_args = (
            tbl_cat, tables["wr_a"], tables["br_a"][None, :],
            tables["wi_b"], tables["wr_b"], tables["br_b"][None, :],
            jnp.concatenate([dfc["w"][0], dfc["w"][1]], axis=1),
            jnp.concatenate([dfc["b"][0], dfc["b"][1]])[None, :],
            dfc["factor"], logit_tbl)
    else:
        kfn = _frame_kernel_flat if flat else _frame_kernel
        kernel = functools.partial(kfn, nsamples=fs,
                                   preemph=cfg.preemph, wdtype=table_dtype)
        weight_args = (
            tables["tbl_sig"].astype(table_dtype),
            tables["tbl_pred"].astype(table_dtype),
            tables["tbl_exc"].astype(table_dtype),
            tables["wr_a"], tables["br_a"][None, :], tables["wi_b"],
            tables["wr_b"], tables["br_b"][None, :],
            dfc["w"][0], dfc["w"][1], dfc["b"], dfc["factor"], logit_tbl)
        if flat:
            weight_args = weight_args + (
                jnp.asarray(_FLAT_SCORE_W), jnp.asarray(_FLAT_LVL),
                jnp.asarray(_FLAT_TARGET_LEAF))
    call_kwargs = dict(out_shape=out_shapes, in_specs=in_specs,
                       out_specs=out_specs, interpret=interpret,
                       compiler_params=_compiler_params())
    if grid is not None:
        call_kwargs["grid"] = grid
    outs = pl.pallas_call(
        kernel,
        **call_kwargs,
    )(cond_a, cond_b, lpc, *weight_args,
      state["gru_a"], state["gru_b"], state["last_sig"],
      state["last_exc"][:, None].astype(jnp.int32),
      state["deemph"][:, None], state["rng"])
    gru_a, gru_b, last_sig, exc, deemph, rng, pcm = outs
    new_state = {"gru_a": gru_a, "gru_b": gru_b, "last_sig": last_sig,
                 "last_exc": exc[:, 0], "deemph": deemph[:, 0], "rng": rng}
    return new_state, pcm.T


def _pad_batch(tree, B: int, Bp: int):
    """Zero-pad every leaf's leading (stream) axis from B to Bp."""
    if B == Bp:
        return tree
    return jax.tree.map(
        lambda x: jnp.concatenate(
            [x, jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)], axis=0), tree)


def synthesize_frames_pallas(tables, state, conds, cfg,
                             interpret: bool = False,
                             table_dtype=jnp.float32,
                             variant: str = "base"):
    """Multi-frame synthesis: lax.scan over frames, fused kernel per frame.
    (A single-launch grid=(tiles, frames) variant with VMEM-carried state
    measured ~10% SLOWER on v5e than scanning launches — XLA overlaps the
    next frame's host/cond work with the running kernel; kept the scan.)
    conds as in sample_scan.synthesize_frames. Returns (state, (B, T*fs))."""
    B, T = conds["cond_a"].shape[:2]
    fs = cfg.frame_size
    # Mosaic layout inference rejects single-stream (B=1) vectors, and the
    # grid path needs B to divide evenly into tiles: pad the stream axis to
    # a multiple of 8 (one sublane) and slice the padding back off.
    Bp = max(8, -(-B // 8) * 8) if B <= MAX_BATCH_TILE \
        else -(-B // MAX_BATCH_TILE) * MAX_BATCH_TILE
    if Bp != B:
        state = _pad_batch(state, B, Bp)
        conds = _pad_batch(conds, B, Bp)
        new_state, pcm = synthesize_frames_pallas(
            tables, state, conds, cfg, interpret=interpret,
            table_dtype=table_dtype, variant=variant)
        return (jax.tree.map(lambda x: x[:B], new_state), pcm[:B])
    tables = dict(tables,
                  tbl_sig=tables["tbl_sig"].astype(table_dtype),
                  tbl_pred=tables["tbl_pred"].astype(table_dtype),
                  tbl_exc=tables["tbl_exc"].astype(table_dtype))

    def frame_body(st, inp):
        ca, cb, lp = inp
        st, pcm = synthesize_frame_pallas(tables, st, ca, cb, lp, cfg,
                                          interpret=interpret,
                                          table_dtype=table_dtype,
                                          variant=variant)
        return st, pcm

    state, pcm = jax.lax.scan(
        frame_body, state,
        (conds["cond_a"].transpose(1, 0, 2),
         conds["cond_b"].transpose(1, 0, 2),
         conds["lpc"].transpose(1, 0, 2)))
    return state, pcm.transpose(1, 0, 2).reshape(B, T * fs)
