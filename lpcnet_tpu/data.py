"""Training-data pipeline: the dump_data(-train) equivalent + batch loader.

Pipeline per utterance stream (reference src/dump_data.c:110-306):
  1. augmentation (native C++: random biquads, gain ramps, pre-emphasis,
     dither) + per-sample mu-law noise draws        [host, streaming]
  2. feature extraction                             [JAX, batched]
  3. (sig_in, sig_out) pair construction with noised-excitation feedback
     through the LPC predictor (native C++)         [host, sequential]
  4. chunking into training windows: 15 frames of PCM (2400 samples) with
     19 feature frames of conv context (dataloader.py:17-70)

A pure-NumPy fallback covers steps 1 and 3 when the native library is
unavailable (slower; used in tests).
"""
import ctypes
import sys
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from . import features as F
from .constants import FRAME_SIZE, LPC_ORDER, NB_TOTAL_FEATURES, \
    TRAINING_OFFSET


def augment(pcm: np.ndarray, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Augment one stream of samples (multiple of 160). Returns
    (augmented float32 samples, per-sample mu-law noise int32)."""
    from .utils import native
    n = len(pcm) // FRAME_SIZE * FRAME_SIZE
    # explicit copy: the native code augments in place
    x = np.array(pcm[:n], dtype=np.float32, copy=True)
    noise = np.zeros(n, dtype=np.int32)
    lib = native.get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable; build native/ first")
    st = lib.dp_augment_create(ctypes.c_uint64(seed))
    try:
        lib.dp_augment_frames(
            st, x.ctypes.data_as(ctypes.c_void_p),
            noise.ctypes.data_as(ctypes.c_void_p), n // FRAME_SIZE)
    finally:
        lib.dp_augment_destroy(st)
    return x, noise


def build_pairs(pcm: np.ndarray, lpc: np.ndarray, noise: np.ndarray
                ) -> np.ndarray:
    """(sig_in, sig_out) pair construction (write_audio, dump_data.c:84-108).
    pcm: (S,) int16; lpc: (T, 16) float32; noise: (S,) int32.
    Returns (S, 2) int16 [sig_in, sig_out]."""
    from .utils import native
    S = len(pcm)
    T = S // FRAME_SIZE
    lib = native.get_lib()
    out = np.zeros(2 * S, dtype=np.int16)
    if lib is not None:
        sig_mem = np.zeros(LPC_ORDER, dtype=np.float32)
        exc_mem = np.zeros(1, dtype=np.int32)
        lib.dp_build_pairs(
            np.ascontiguousarray(pcm, np.int16).ctypes.data_as(
                ctypes.c_void_p),
            np.ascontiguousarray(lpc, np.float32).ctypes.data_as(
                ctypes.c_void_p),
            np.ascontiguousarray(noise, np.int32).ctypes.data_as(
                ctypes.c_void_p),
            T, sig_mem.ctypes.data_as(ctypes.c_void_p),
            exc_mem.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p))
        return out.reshape(S, 2)
    # NumPy fallback (sequential, for tests)
    import jax.numpy as jnp
    from .ops.mulaw import lin2ulaw, ulaw2lin
    u2l_table = np.asarray(ulaw2lin(jnp.arange(256)))
    sig_mem = np.zeros(LPC_ORDER, np.float32)
    res = np.zeros((S, 2), np.int16)
    for k in range(T):
        A = lpc[k]
        for i in range(FRAME_SIZE):
            s = k * FRAME_SIZE + i
            p = -float(A @ sig_mem)
            e = int(np.asarray(lin2ulaw(jnp.float32(pcm[s] - p))))
            res[s, 0] = np.int16(np.clip(np.floor(0.5 + sig_mem[0]),
                                         -32767, 32767))
            res[s, 1] = pcm[s]
            e = int(np.clip(e + noise[s], 0, 255))
            sig_mem[1:] = sig_mem[:-1]
            sig_mem[0] = p + u2l_table[e]
    return res


_FEATURE_STEP_CACHE: Dict[object, object] = {}


def _feature_step_fn(quantize: bool, mode: str = "superframe"):
    """Module-cached jitted feature step (shared with the CLI tools): a
    fresh jax.jit(lambda) per call would miss jax's compile cache and
    recompile on EVERY augmentation pass / CLI chunk (minutes x passes
    over a remote-TPU transport)."""
    key = ("feat", quantize, mode)
    if key not in _FEATURE_STEP_CACHE:
        import jax
        _FEATURE_STEP_CACHE[key] = jax.jit(
            lambda s, p: F.compute_features(s, p, quantize_pitch=quantize,
                                            mode=mode))
    return _FEATURE_STEP_CACHE[key]


def prepare_training_data(pcm: np.ndarray, seed: int = 0,
                          batch_streams: int = 8,
                          include_burg: bool = False,
                          quantize_codebooks=None):
    """Full pipeline: raw int16 speech -> (features (T, 36), data (S, 2)).

    Applies augmentation, extracts features (batched in JAX), shifts the
    PCM by TRAINING_OFFSET so features are centered on frames
    (dump_data.c:273-274), and builds pairs.

    include_burg: also return per-frame Burg cepstra (T, 36) of the
    pre-preemphasis signal (dump_data.c:266-270, the -btrain mode);
    features then interleave as [burg36 | feat36] for PLC training.

    quantize_codebooks: codec codebook dict — quantize features through
    the 1.6 kb/s codec before writing/pair-building (the -qtrain mode,
    dump_data.c:154-157 + process_superframe quantize=1), so models
    train on exactly what the decoder will condition on."""
    import jax.numpy as jnp
    x, noise = augment(pcm, seed)
    S = len(x)
    T = S // FRAME_SIZE // 4 * 4
    S = T * FRAME_SIZE
    x, noise = x[:S], noise[:S]
    # deemphasize once (the augmenter pre-emphasized like dump_data.c:271;
    # compute_features applies its own pre-emphasis), then extract features
    # in bounded chunks: compute_features Python-unrolls its per-superframe
    # pitch loop, so one whole-corpus call would build a graph with T/4
    # unrolled iterations
    import jax

    from .ops import dsp
    state = F.init_state(1)
    xj = jnp.asarray(x[None])
    z, _ = dsp.deemphasis_scan(xj, jnp.zeros(1))
    chunk = 256
    feat_parts = []
    quant = quantize_codebooks is not None
    step_fn = _feature_step_fn(quant)
    if quant:
        from .codec import codec
        # single-slot cache: evict stale entries so dead codebook pytrees
        # are not pinned on device for the process lifetime
        key = ("enc", id(quantize_codebooks))
        if key not in _FEATURE_STEP_CACHE:
            for k in [k for k in _FEATURE_STEP_CACHE
                      if isinstance(k, tuple) and k[0] == "enc"]:
                del _FEATURE_STEP_CACHE[k]
            _FEATURE_STEP_CACHE[key] = jax.jit(
                lambda f4, m, sp: codec.encode_superframe(
                    quantize_codebooks, f4, m, sp))
        enc_fn = _FEATURE_STEP_CACHE[key]
        vq_mem = jnp.zeros((1, 18))
    for t0 in range(0, T, chunk):
        t1 = min(T, t0 + chunk)
        state, f, sps = step_fn(state,
                                z[:, t0 * FRAME_SIZE:t1 * FRAME_SIZE])
        if quant:
            for g in range((t1 - t0) // 4):
                _, fq, vq_mem = enc_fn(f[:, 4 * g:4 * (g + 1)], vq_mem,
                                       sps[g])
                f = jax.lax.dynamic_update_slice(f, fq, (0, 4 * g, 0))
        feat_parts.append(np.asarray(f[0]))
    feats = np.concatenate(feat_parts)
    # PCM delayed by TRAINING_OFFSET (dump_data.c:273-274)
    pcm_del = np.zeros(S, np.float32)
    pcm_del[TRAINING_OFFSET:] = x[:S - TRAINING_OFFSET]
    pcm16 = np.clip(np.floor(0.5 + pcm_del), -32767, 32767).astype(np.int16)
    data = build_pairs(pcm16, feats[:, 18 + 2:18 + 2 + LPC_ORDER]
                       .astype(np.float32), noise)
    if include_burg:
        import jax

        from .ops import burg as burg_ops
        frames = z[0, :T * FRAME_SIZE].reshape(T, FRAME_SIZE)
        burg36 = np.asarray(
            jax.jit(burg_ops.burg_cepstral_analysis)(frames))
        return feats, data, burg36
    return feats, data


def _resample_linear(x: np.ndarray, speed: float) -> np.ndarray:
    """Linear-interpolation resampling (speed > 1 = faster/higher pitch).
    Cheap speaker/pitch diversification for corpus building — the one
    augmentation axis the reference recipe (random biquads/gains/noise,
    dump_data.c:245-257) does not cover."""
    n = int(len(x) / speed)
    idx = np.arange(n, dtype=np.float64) * speed
    i0 = idx.astype(np.int64)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = (idx - i0).astype(np.float32)
    return ((1.0 - frac) * x[i0] + frac * x[i1]).astype(np.float32)


def prepare_training_data_batch(pcm: np.ndarray, seeds,
                                speed_aug: bool = False):
    """Multi-pass corpus builder: run N augmentation passes as N PARALLEL
    feature-extraction streams (one batched jit per chunk instead of N
    sequential single-stream pipelines — the TPU-efficient path for the
    reference's 10M-frame multi-pass recipe, dump_data.c:245-257).

    pcm: raw int16-range samples; seeds: per-pass augmentation seeds;
    speed_aug: also draw a per-pass resampling factor in [0.7, 1.4]
    (pitch/speaker diversity). Returns (features (N*T, 36),
    data (N*T*160, 2)) with passes concatenated in seed order."""
    import jax.numpy as jnp

    from .ops import dsp
    seeds = list(seeds)
    N = len(seeds)
    xs, noises = [], []
    for seed in seeds:
        base = pcm
        if speed_aug:
            speed = np.random.RandomState(seed ^ 0x5EED).uniform(0.7, 1.4)
            base = _resample_linear(np.asarray(pcm, np.float32), speed)
        x, noise = augment(base, seed)
        xs.append(x)
        noises.append(noise)
    # common length: whole superframes of the shortest pass. Longer
    # (slow-speed) passes keep a seeded random window, not always their
    # head, so the source tail is still seen across the corpus; report
    # batch utilization so the cap is never silent.
    if speed_aug:
        # STATIC batch length = the worst-case (speed 1.4) pass length,
        # not this batch's minimum: a per-batch T changes every jitted
        # shape, and corpus building becomes XLA-recompile-bound
        # (measured: 99.5 of 111 s per 50-pass batch was compilation).
        # uniform(0.7, 1.4) < 1.4, so every resampled pass has
        # len >= int(len(pcm)/1.4) and the fixed window always fits.
        T = int(len(pcm) / 1.4) // FRAME_SIZE // 4 * 4
    else:
        T = min(len(x) for x in xs) // FRAME_SIZE // 4 * 4
    S = T * FRAME_SIZE
    offs = [np.random.RandomState(seed ^ 0x0FF5E7)
            .randint(0, (len(x) - S) // FRAME_SIZE + 1) * FRAME_SIZE
            for seed, x in zip(seeds, xs)]
    X = np.stack([x[o:o + S] for o, x in zip(offs, xs)])  # (N, S)
    noises = [n[o:o + S] for o, n in zip(offs, noises)]
    gen = sum(len(x) for x in xs)
    if N > 1 and S * N < 0.95 * gen:
        print("  [batch] keeping %.0f%% of generated samples "
              "(shortest pass sets the batch length; longer passes "
              "contribute random windows)" % (100.0 * S * N / gen),
              file=sys.stderr)

    state = F.init_state(N)
    z, _ = dsp.deemphasis_scan(jnp.asarray(X), jnp.zeros(N))
    chunk = 256
    feat_parts = []
    step_fn = _feature_step_fn(False)
    for t0 in range(0, T, chunk):
        t1 = min(T, t0 + chunk)
        state, f, _ = step_fn(state, z[:, t0 * FRAME_SIZE:t1 * FRAME_SIZE])
        feat_parts.append(np.asarray(f))
    feats = np.concatenate(feat_parts, axis=1)          # (N, T, 36)

    all_feats, all_data = [], []
    for i in range(N):
        pcm_del = np.zeros(S, np.float32)
        pcm_del[TRAINING_OFFSET:] = X[i, :S - TRAINING_OFFSET]
        pcm16 = np.clip(np.floor(0.5 + pcm_del), -32767, 32767) \
            .astype(np.int16)
        data = build_pairs(pcm16, feats[i, :, 18 + 2:18 + 2 + LPC_ORDER]
                           .astype(np.float32), noises[i])
        all_feats.append(feats[i])
        all_data.append(data)
    return (np.concatenate(all_feats).astype(np.float32),
            np.concatenate(all_data))


def window_batches(features: np.ndarray, data: np.ndarray,
                   batch_size: int = 128, frames_per_chunk: int = 15,
                   lookahead: int = 2, rng: Optional[np.random.RandomState]
                   = None) -> Iterator[Dict[str, np.ndarray]]:
    """Chunk into training windows (train_lpcnet.py:262-292 +
    dataloader.py:17-70): 15 output frames / 2400 samples per chunk with 4
    extra feature frames of conv context; LPC targets shifted by lookahead.
    Yields dict batches for training.lpcnet_task.forward."""
    T = features.shape[0]
    S = data.shape[0]
    ctx = frames_per_chunk + 4
    nch = min((T - 4) // frames_per_chunk, S // (frames_per_chunk
                                                 * FRAME_SIZE))
    rng = rng or np.random.RandomState(0)
    chunks = []
    for c in range(nch):
        f0 = c * frames_per_chunk
        if f0 + ctx > T:
            break
        s0 = c * frames_per_chunk * FRAME_SIZE
        s1 = s0 + frames_per_chunk * FRAME_SIZE
        feats = features[f0:f0 + ctx]
        lpc0 = 4 - lookahead + f0
        lpc = features[lpc0:lpc0 + frames_per_chunk, 18 + 2:18 + 2 + 16]
        chunks.append({
            "sig_in": data[s0:s1, 0].astype(np.float32),
            "sig_out": data[s0:s1, 1].astype(np.float32),
            "features": feats[:, :20].astype(np.float32),
            "periods": np.clip(np.floor(
                0.1 + 50.0 * feats[:, 18] + 100.0), 33, 255).astype(np.int32),
            "lpc": lpc.astype(np.float32),
        })
    order = rng.permutation(len(chunks))
    for b0 in range(0, len(chunks) - batch_size + 1, batch_size):
        sel = order[b0:b0 + batch_size]
        yield {k: np.stack([chunks[i][k] for i in sel]) for k in chunks[0]}
