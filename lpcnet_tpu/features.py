"""Feature extraction / codec analysis front-end (reference src/lpcnet_enc.c).

TPU-native staging: a chunk of T frames for B streams is processed as
  1. streaming pre-emphasis                 (lpcnet_enc.c:872-880)
  2. framing + window + FFT + band energies (frame_analysis, :488-496)
     -> log/floor/follower chain -> DCT cepstrum, c0 -= 4   (:512-522)
  3. LPC from cepstrum (freq.c:310-320) -> features[22:38)  (:523-524)
  4. LPC residual ("excitation") via per-frame FIR          (:527-537)
  5. normalized pitch cross-correlation per half-frame, computed as an
     FFT correlation over 256 lags + 3x sinc-interpolated max (:539-570)
  6. octave-penalized Viterbi pitch track: lax.scan over subframes with a
     224-wide path state                                    (:604-643)
  7. per-superframe weighted regression -> pitch/corr features (:650-697)

All per-frame math is parallel over (B, T); only the Viterbi recursion and
the streaming filters carry state. Everything jits to one XLA program.
"""
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import (FRAME_SIZE, LPC_ORDER, NB_BANDS, NB_TOTAL_FEATURES,
                        OVERLAP_SIZE, PITCH_MAX_PERIOD, PITCH_MIN_PERIOD,
                        PREEMPHASIS, TRAINING_OFFSET, WINDOW_SIZE)
from .ops import dsp

_NSTATES = PITCH_MAX_PERIOD - PITCH_MIN_PERIOD          # 224
_HALF = FRAME_SIZE // 2                                  # 80
_SEG = PITCH_MAX_PERIOD + _HALF                          # 336 corr segment
_NFFT = 512
# 3x sinc interpolation kernel (lpcnet_enc.c:557)
_INTERP = np.array([0.026184, -0.098339, 0.369938, 0.837891, -0.184969,
                    0.070242, -0.020947], dtype=np.float32)


def _sliding_frames(x: jax.Array, n: int, hop: int, width: int) -> jax.Array:
    """(B, S) -> (B, n, width) overlapped frames at stride `hop`, as
    reshape + ceil(width/hop) block slices instead of an integer-indexed
    gather (TPU lowers gathers to the scalar core at ~1 element/cycle;
    reshape/slice/concat are vector copies). Frame starts are hop-aligned
    by construction, so frame i is blocks [i, i+nblk) of the hop-blocked
    signal, truncated to `width`."""
    B, S = x.shape
    nblk = -(-width // hop)
    need = (n - 1 + nblk) * hop
    if S < need:
        x = jnp.pad(x, ((0, 0), (0, need - S)))
    blocks = x[:, :need].reshape(B, n - 1 + nblk, hop)
    out = jnp.concatenate([blocks[:, i:i + n] for i in range(nblk)],
                          axis=-1)
    return out[..., :width]


def init_state(batch: int) -> Dict[str, jax.Array]:
    """Fresh analysis state (lpcnet_encoder_init, lpcnet_enc.c:471-475)."""
    return {
        "analysis_mem": jnp.zeros((batch, OVERLAP_SIZE), jnp.float32),
        "mem_preemph": jnp.zeros((batch,), jnp.float32),
        "aligned_hist": jnp.zeros((batch, LPC_ORDER), jnp.float32),
        "pitch_filt": jnp.zeros((batch,), jnp.float32),
        "exc_hist": jnp.zeros((batch, PITCH_MAX_PERIOD), jnp.float32),
        "path": jnp.zeros((batch, _NSTATES), jnp.float32),
        "path_all": jnp.zeros((batch,), jnp.float32),
        "best_i": jnp.zeros((batch,), jnp.int32),
        "vq_mem": jnp.zeros((batch, NB_BANDS), jnp.float32),
    }


def log_follower(Ly: jax.Array) -> jax.Array:
    """Per-band log energy with floor + decay follower
    (lpcnet_enc.c:512-520). Ly: (..., 18) raw log10(1e-2 + E)."""
    outs = []
    logMax = jnp.full(Ly.shape[:-1], -2.0, jnp.float32)
    follow = jnp.full(Ly.shape[:-1], -2.0, jnp.float32)
    for i in range(NB_BANDS):
        v = jnp.maximum(logMax - 8.0, jnp.maximum(follow - 2.5, Ly[..., i]))
        logMax = jnp.maximum(logMax, v)
        follow = jnp.maximum(follow - 2.5, v)
        outs.append(v)
    return jnp.stack(outs, axis=-1)


def cepstrum_from_frames(windows: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(B, T, 320) windowed-input frames -> (cepstrum (B,T,18), bandE)."""
    xw = dsp.apply_window(windows)
    X = dsp.forward_transform(xw)
    Ex = dsp.compute_band_energy(X)
    Ly = log_follower(jnp.log10(1e-2 + Ex))
    ceps = dsp.dct(Ly)
    ceps = ceps.at[..., 0].add(-4.0)
    return ceps, Ex


def lpc_residual(aligned: jax.Array, lpc: jax.Array, hist: jax.Array,
                 pitch_filt: jax.Array):
    """LPC inverse filter + 1-tap smoothing (lpcnet_enc.c:527-537).

    aligned: (B, T, 160) per-frame aligned input; lpc: (B, T, 16);
    hist: (B, 16) previous aligned samples (most recent first);
    pitch_filt: (B,) previous raw sum. Returns (exc (B,T,160), new_hist,
    new_pitch_filt). exc[s] = sum[s] + .7*sum[s-1] with
    sum[s] = aligned[s] + sum_j lpc[j]*aligned[s-1-j].
    """
    B, T, fs = aligned.shape
    flat = aligned.reshape(B, T * fs)
    # prepend history (hist[0] is the most recent past sample)
    past = hist[:, ::-1]
    xp = jnp.concatenate([past, flat], axis=-1)  # (B, 16 + S)
    # lag matrix: lag j+1 -> aligned[s-1-j]
    lags = jnp.stack([xp[:, LPC_ORDER - 1 - j:LPC_ORDER - 1 - j + T * fs]
                      for j in range(LPC_ORDER)], axis=-1)  # (B, S, 16)
    lags = lags.reshape(B, T, fs, LPC_ORDER)
    s = aligned + jnp.einsum("btsj,btj->bts", lags, lpc)
    s_flat = s.reshape(B, T * fs)
    s_prev = jnp.concatenate([pitch_filt[:, None], s_flat[:, :-1]], axis=-1)
    exc = s_flat + 0.7 * s_prev
    new_hist = flat[:, -LPC_ORDER:][:, ::-1]
    return exc.reshape(B, T, fs), new_hist, s_flat


def pitch_xcorr(exc_stream: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalized pitch correlation per half-frame (lpcnet_enc.c:539-552).

    exc_stream: (B, 256 + T*160) excitation incl. 256-sample history.
    Returns xc (B, 2T, 256) normalized correlations and frame_weight
    (B, 2T) = per-subframe energy ener0 (pre-normalization).
    """
    B = exc_stream.shape[0]
    S = exc_stream.shape[1] - PITCH_MAX_PERIOD
    nsub = S // _HALF
    # segments y: (B, nsub, 336) = lags 0..255 + the 80 current samples
    seg = _sliding_frames(exc_stream, nsub, _HALF, _SEG)  # (B, nsub, 336)
    x = seg[..., PITCH_MAX_PERIOD:]              # (B, nsub, 80) current
    # FFT cross-correlation: xcorr[i] = sum_m x[m] * seg[i + m]
    Fy = jnp.fft.rfft(seg, n=_NFFT, axis=-1)
    xpad = x  # correlate: conj(fft(x)) * fft(seg)
    Fx = jnp.fft.rfft(xpad, n=_NFFT, axis=-1)
    corr = jnp.fft.irfft(Fy * jnp.conj(Fx), n=_NFFT, axis=-1)[
        ..., :PITCH_MAX_PERIOD].astype(jnp.float32)
    ener0 = jnp.sum(x * x, axis=-1)              # (B, nsub)
    y2 = seg * seg
    c = jnp.cumsum(y2, axis=-1)
    # ener1[i] = sum_{j=i}^{i+79} y^2 = c[i+79] - c[i-1]
    hi = c[..., _HALF - 1:_HALF - 1 + PITCH_MAX_PERIOD]
    lo = jnp.concatenate([jnp.zeros_like(c[..., :1]),
                          c[..., :PITCH_MAX_PERIOD - 1]], axis=-1)
    ener1 = hi - lo
    xc = 2.0 * corr / (1.0 + ener0[..., None] + ener1)
    # 3x sinc-interpolated max (lpcnet_enc.c:553-570), lags 4..251
    k = jnp.asarray(_INTERP)
    pad = jnp.pad(xc, ((0, 0), (0, 0), (3, 3)))
    val1 = jax.lax.conv_general_dilated(
        pad.reshape(-1, 1, pad.shape[-1]), k[::-1].reshape(1, 1, 7),
        (1,), "VALID", dimension_numbers=("NCT", "OIT", "NCT")
    ).reshape(xc.shape)
    val2 = jax.lax.conv_general_dilated(
        pad.reshape(-1, 1, pad.shape[-1]), k.reshape(1, 1, 7),
        (1,), "VALID", dimension_numbers=("NCT", "OIT", "NCT")
    ).reshape(xc.shape)
    interp = jnp.maximum(xc, jnp.maximum(val1, val2))
    lagidx = jnp.arange(PITCH_MAX_PERIOD)
    keep = (lagidx >= 4) & (lagidx < PITCH_MAX_PERIOD - 4)
    xc = jnp.where(keep, interp, xc)
    return xc, ener0


def _halving_penalty(xc: jax.Array) -> jax.Array:
    """Penalize lags whose half-lag correlates nearly as well
    (lpcnet_enc.c:607-610). xc: (..., 256).

    The half-lag reads are repeat-of-slice patterns, written as such: TPU
    lowers integer-indexed gathers to the scalar core (~1 element/cycle),
    which made this the feature pass's hottest op; slices+repeat are
    vector copies. h0 = 128+i//2, h1 = 129+i//2, h2 = 127+(i+1)//2."""
    n = PITCH_MAX_PERIOD - 2 * PITCH_MIN_PERIOD          # 192
    half = n // 2 + 1                                    # 97
    v0 = jnp.repeat(xc[..., 128:128 + half], 2, axis=-1)[..., :n]
    v1 = jnp.repeat(xc[..., 129:129 + half], 2, axis=-1)[..., :n]
    v2 = jnp.repeat(xc[..., 127:127 + half], 2, axis=-1)[..., 1:n + 1]
    xch = jnp.maximum(jnp.maximum(v0, v1), v2)
    cond = xc[..., :n] < xch * 1.1
    penalized = jnp.where(cond, xc[..., :n] * 0.8, xc[..., :n])
    return jnp.concatenate([penalized, xc[..., n:]], axis=-1)


def viterbi_scan(state: Dict[str, jax.Array], xc: jax.Array, fw: jax.Array):
    """Pitch-track forward pass over subframes (lpcnet_enc.c:604-635).

    xc: (B, nsub, 256) already weight-normalized per superframe;
    fw: (B, nsub) normalized weights. Carries (path, path_all, best_i) in
    `state`. Returns (new_state, backptr (B, nsub, 224), best_i_seq
    (B, nsub), path trace not kept).
    """
    B, nsub, _ = xc.shape

    def step(carry, inp):
        path, path_all, best_prev = carry
        xcs, w = inp  # (B, 256), (B,)
        xcs = _halving_penalty(xcs)
        floor = path_all - 6.0
        # candidates j in -4..4: path[i+j] - .02 j^2. path[i+j] is a
        # SHIFTED SLICE of a -inf-padded path, not a gather (TPU gathers
        # run on the scalar core and dominated the whole feature pass);
        # out-of-range positions read the -inf padding, matching the old
        # `valid` mask.
        padded = jnp.pad(path, ((0, 0), (4, 4)),
                         constant_values=-jnp.inf)
        cands = [jnp.broadcast_to(floor[:, None], (B, _NSTATES))]
        ptrs = [jnp.broadcast_to(best_prev[:, None], (B, _NSTATES))]
        for j in range(-4, 5):
            cands.append(padded[:, j + 4:j + 4 + _NSTATES] - 0.02 * j * j)
            ptrs.append(jnp.broadcast_to(
                jnp.asarray(np.clip(np.arange(_NSTATES) + j, 0,
                                    _NSTATES - 1))[None, :], (B, _NSTATES)))
        cands = jnp.stack(cands, axis=0)   # (10, B, 224)
        ptrs = jnp.stack(ptrs, axis=0)
        # C scans floor first then j ascending, updating on strictly-greater:
        # equivalent to first-occurrence argmax in this stacking order.
        sel = jnp.argmax(cands, axis=0)
        max_prev = jnp.max(cands, axis=0)
        # select ptr rows by one-hot sum (VPU) instead of take_along_axis
        onehot = (jax.lax.broadcasted_iota(jnp.int32, cands.shape, 0)
                  == sel[None]).astype(jnp.int32)
        bp = jnp.sum(ptrs * onehot, axis=0)
        new_path = max_prev + w[:, None] * xcs[:, :_NSTATES]
        best = jnp.argmax(new_path, axis=-1).astype(jnp.int32)
        mall = jnp.max(new_path, axis=-1)
        new_path = new_path - mall[:, None]
        # xcs is persisted: the C applies the halving penalty in place and
        # the backward pass reads the penalized values (lpcnet_enc.c:641)
        return (new_path, mall, best), (bp.astype(jnp.int32), best, xcs,
                                        new_path, mall)

    carry = (state["path"], state["path_all"], state["best_i"])
    (path, path_all, best_i), (bps, bests, xcp, paths, malls) = jax.lax.scan(
        step, carry, (xc.transpose(1, 0, 2), fw.transpose(1, 0)))
    new_state = dict(state)
    new_state.update(path=path, path_all=path_all, best_i=best_i)
    return (new_state, bps.transpose(1, 0, 2), bests.transpose(1, 0),
            xcp.transpose(1, 0, 2), paths, malls)


def _superframe_pitch(bps, bests, xc, fw, quantize: bool):
    """Backward pass + weighted pitch regression for ONE superframe
    (8 subframes) (lpcnet_enc.c:636-697).

    bps: (B, 8, 224), bests: (B, 8), xc: (B, 8, 256), fw: (B, 8).
    Returns dict of per-superframe values.
    """
    B = bps.shape[0]
    bi = bests[:, 7]
    best = [None] * 8
    corr = jnp.zeros((B,), jnp.float32)
    for sub in range(7, -1, -1):
        best[sub] = PITCH_MAX_PERIOD - bi
        corr = corr + fw[:, sub] * jnp.take_along_axis(
            xc[:, sub], bi[:, None], axis=-1)[:, 0]
        bi = jnp.take_along_axis(bps[:, sub], bi[:, None], axis=-1)[:, 0]
    best = jnp.stack(best, axis=1).astype(jnp.float32)  # (B, 8)
    frame_corr = corr / 8.0
    if quantize:
        frame_corr = jnp.maximum(frame_corr, 0.0)
    # weighted linear regression, x-coordinates 2..9 (lpcnet_enc.c:650-657)
    xcoord = jnp.arange(2.0, 10.0, dtype=jnp.float32)
    w = fw
    sw = jnp.sum(w, axis=1)
    sx = jnp.sum(w * xcoord, axis=1)
    sxx = jnp.sum(w * xcoord * xcoord, axis=1)
    sxy = jnp.sum(w * xcoord * best, axis=1)
    sy = jnp.sum(w * best, axis=1)
    best_a = (sw * sxy - sx * sy) / (sw * sxx - sx * sx)
    voiced = frame_corr >= 0.3
    mean_pitch = sy / sw
    max_a = mean_pitch / 32.0
    best_a = jnp.where(voiced, jnp.clip(best_a, -max_a, max_a), 0.0)
    corr_id = jnp.where(
        voiced, jnp.floor((frame_corr - 0.3) / 0.175),
        jnp.floor(frame_corr / 0.075)).astype(jnp.int32)
    if quantize:
        frame_corr = jnp.where(voiced, 0.3875 + 0.175 * corr_id,
                               0.0375 + 0.075 * corr_id)
    best_b = (sy - best_a * sx) / sw
    center_pitch = best_b + 5.5 * best_a
    main_pitch = jnp.floor(
        0.5 + 21.0 * 1.442695041 * jnp.log(center_pitch / PITCH_MIN_PERIOD))
    main_pitch = jnp.clip(main_pitch, 0, 63).astype(jnp.int32)
    modulation = jnp.floor(0.5 + 16 * 7 * best_a / center_pitch)
    modulation = jnp.clip(modulation, -3, 3).astype(jnp.int32)
    return {"best": best, "frame_corr": frame_corr, "voiced": voiced,
            "corr_id": corr_id, "main_pitch": main_pitch,
            "modulation": modulation}


def pitch_features(sp: Dict[str, jax.Array], quantize: bool):
    """Per-frame pitch/corr features for the 4 frames of a superframe
    (lpcnet_enc.c:685-697). Returns (B, 4, 2)."""
    subs = jnp.arange(4)
    if quantize:
        p = jnp.power(2.0, sp["main_pitch"].astype(jnp.float32) / 21.0) \
            * PITCH_MIN_PERIOD
        p = p[:, None] * (1.0 + sp["modulation"].astype(jnp.float32)[:, None]
                          / 16.0 / 7.0 * (2 * subs - 3))
        p = jnp.clip(p, 33.0, 255.0)
        f18 = 0.02 * (p - 100.0)
    else:
        pairsum = sp["best"][:, 0::2] + sp["best"][:, 1::2]  # (B, 4)
        f18 = 0.01 * (jnp.clip(pairsum, 66, 510) - 200.0)
    f19 = jnp.broadcast_to((sp["frame_corr"] - 0.5)[:, None], f18.shape)
    return jnp.stack([f18, f19], axis=-1)


def _single_frame_pitch(bps, bests, xcp, fw):
    """Backward pass + features for ONE frame's 2 subframes
    (process_single_frame, lpcnet_enc.c:814-870).

    bps: (B, 2, 224), bests: (B, 2), xcp: (B, 2, 256), fw: (B, 2).
    Returns (B, 2) [pitch_feat, corr_feat]. The per-subframe index reads
    are one-hot reduces (VPU), not take_along_axis (scalar-core gather)."""
    bi = bests[:, 1]
    best = [None, None]
    corr = jnp.zeros(bi.shape, jnp.float32)
    for sub in (1, 0):
        best[sub] = (PITCH_MAX_PERIOD - bi).astype(jnp.float32)
        oh_xc = jnp.arange(xcp.shape[-1])[None, :] == bi[:, None]
        corr = corr + fw[:, sub] * jnp.sum(
            jnp.where(oh_xc, xcp[:, sub], 0.0), axis=-1)
        oh_bp = jnp.arange(bps.shape[-1])[None, :] == bi[:, None]
        bi = jnp.sum(jnp.where(oh_bp, bps[:, sub], 0), axis=-1)
    frame_corr = corr / 2.0
    pairsum = best[0] + best[1]
    f18 = 0.01 * (jnp.clip(pairsum, 66, 510) - 200.0)
    return jnp.stack([f18, frame_corr - 0.5], axis=-1)


def compute_features(state: Dict[str, jax.Array], pcm: jax.Array,
                     quantize_pitch: bool = False, mode: str = "superframe",
                     return_mid: bool = False):
    """Extract features for T frames, batched over streams.

    pcm: (B, T*160) int16-range float. Returns (new_state, features
    (B, T, 36), aux list of superframe pitch dicts for the codec).

    mode="superframe" (T % 4 == 0): pitch via 8-subframe Viterbi +
    regression, equivalent to lpcnet_compute_features (lpcnet_enc.c:895-909).
    mode="single": per-frame 2-subframe pitch (process_single_frame,
    lpcnet_enc.c:814-870) — the streaming variant used by the PLC.

    return_mid (mode="single", T >= 2): additionally return the extractor
    state as it stands after the FIRST frame only — (new_state, feats,
    aux, mid_state). A T-frame call is exactly equivalent to T serial
    1-frame calls (every stage is either framewise or a scan over
    subframes), so mid_state equals the state a 1-frame call would have
    produced; the fused PLC step uses this to advance on the previous
    output and analyze the current input in ONE pass.
    """
    B, S = pcm.shape
    T = S // FRAME_SIZE
    if mode == "superframe":
        assert T % 4 == 0, "chunk must be whole superframes (4 frames)"
    if return_mid:
        assert mode == "single" and T >= 2

    # 1. pre-emphasis
    xp, new_mem = _preemph(pcm, state["mem_preemph"])

    # 2-3. window -> cepstrum -> LPC
    full = jnp.concatenate([state["analysis_mem"], xp], axis=-1)
    windows = _sliding_frames(full, T, FRAME_SIZE, WINDOW_SIZE)  # (B,T,320)
    ceps, _ = cepstrum_from_frames(windows)
    lpc, _ = dsp.lpc_from_cepstrum(ceps)

    # 4. aligned signal (delayed by TRAINING_OFFSET) and LPC residual
    aligned_full = full[:, OVERLAP_SIZE - TRAINING_OFFSET:
                        OVERLAP_SIZE - TRAINING_OFFSET + S]
    aligned = aligned_full.reshape(B, T, FRAME_SIZE)
    exc, new_hist, s_flat = lpc_residual(
        aligned, lpc, state["aligned_hist"], state["pitch_filt"])
    new_filt = s_flat[:, -1]

    # 5. pitch correlation
    exc_stream = jnp.concatenate(
        [state["exc_hist"], exc.reshape(B, S)], axis=-1)
    xc, ener0 = pitch_xcorr(exc_stream)         # (B, 2T, 256), (B, 2T)

    # weight normalization: per superframe (lpcnet_enc.c:602-603) or per
    # frame (lpcnet_enc.c:822-823)
    group = 8 if mode == "superframe" else 2
    ngrp = (2 * T) // group
    fw = ener0.reshape(B, ngrp, group)
    fw = fw * (group / (1e-15 + jnp.sum(fw, axis=-1, keepdims=True)))
    fw = fw.reshape(B, 2 * T)

    # 6. Viterbi over all subframes
    new_state = dict(state)
    new_state.update(analysis_mem=xp[:, -OVERLAP_SIZE:], mem_preemph=new_mem,
                     aligned_hist=new_hist, pitch_filt=new_filt,
                     exc_hist=exc_stream[:, -PITCH_MAX_PERIOD:])
    vstate, bps, bests, xcp, vpaths, vmalls = viterbi_scan(new_state, xc, fw)
    new_state.update(path=vstate["path"], path_all=vstate["path_all"],
                     best_i=vstate["best_i"])

    # 7. backward pass + pitch features
    feats = jnp.zeros((B, T, NB_TOTAL_FEATURES), jnp.float32)
    feats = feats.at[..., :NB_BANDS].set(ceps)
    feats = feats.at[..., NB_BANDS + 2:].set(lpc)
    sps = []
    if mode == "superframe":
        for g in range(T // 4):
            sl = slice(8 * g, 8 * (g + 1))
            sp = _superframe_pitch(bps[:, sl], bests[:, sl], xcp[:, sl],
                                   fw[:, sl], quantize_pitch)
            pf = pitch_features(sp, quantize_pitch)   # (B, 4, 2)
            feats = jax.lax.dynamic_update_slice(
                feats, pf, (0, 4 * g, NB_BANDS))
            sps.append(sp)
    else:
        pfs = []
        for t in range(T):
            sl = slice(2 * t, 2 * (t + 1))
            pfs.append(_single_frame_pitch(bps[:, sl], bests[:, sl],
                                           xcp[:, sl], fw[:, sl]))
        feats = feats.at[..., NB_BANDS:NB_BANDS + 2].set(
            jnp.stack(pfs, axis=1))
    new_state["vq_mem"] = feats[:, T - 1, :NB_BANDS]
    if return_mid:
        # state after the FIRST frame: every component is a prefix slice
        # of the streaming tensors; the Viterbi carry is the scan's state
        # after subframe 1 (subframes are 2 per frame in single mode)
        fs = FRAME_SIZE
        mid_state = dict(state)
        mid_state.update(
            analysis_mem=jnp.concatenate(
                [state["analysis_mem"], xp[:, :fs]],
                axis=-1)[:, -OVERLAP_SIZE:],
            mem_preemph=-PREEMPHASIS * pcm[:, fs - 1],
            aligned_hist=aligned_full[:, fs - LPC_ORDER:fs][:, ::-1],
            pitch_filt=s_flat[:, fs - 1],
            exc_hist=exc_stream[:, fs:fs + PITCH_MAX_PERIOD],
            path=vpaths[1], path_all=vmalls[1],
            best_i=bests[:, 1],
            vq_mem=feats[:, 0, :NB_BANDS])
        return new_state, feats, sps, mid_state
    return new_state, feats, sps


def _preemph(x: jax.Array, mem: jax.Array):
    """y[i] = x[i] - coef*x[i-1] with carried memory (lpcnet_enc.c:872-880).
    The C stores mem = -coef*x[i], added to the next sample."""
    y, new_last = dsp.preemphasis(x, jnp.zeros_like(mem), PREEMPHASIS)
    # dsp.preemphasis subtracts coef*prev with prev[0]=0; fold in carried mem
    y = y.at[..., 0].add(mem)
    return y, -PREEMPHASIS * x[..., -1]
