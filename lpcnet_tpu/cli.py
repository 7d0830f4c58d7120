"""Command-line tools: the TPU-native equivalents of the reference's CLIs.

Reference program           -> subcommand here
  lpcnet_demo -features        features      (src/lpcnet_demo.c:189-201)
  lpcnet_demo -synthesis       synthesis     (src/lpcnet_demo.c:202-219)
  lpcnet_demo -encode          encode        (src/lpcnet_demo.c:163-175)
  lpcnet_demo -decode          decode        (src/lpcnet_demo.c:176-188)
  lpcnet_demo -plc/-plc_file   plc           (src/lpcnet_demo.c:220-249)
  dump_data -train/-test       dump-data     (src/dump_data.c:110-306)
  dump_weights_blob            dump-weights-blob (src/write_lpcnet_weights.c)
  ceps_vq_train                vq-train      (src/ceps_vq_train.c:433)
  train_lpcnet.py              train-lpcnet  (training_tf2/train_lpcnet.py)
  train_plc.py                 train-plc     (training_tf2/train_plc.py)
  train_rdovae.py              train-rdovae  (training_tf2/train_rdovae.py)
  encode_rdovae.py             rdovae-encode (training_tf2/encode_rdovae.py)
  decode_rdovae.py             rdovae-decode (training_tf2/decode_rdovae.py)
  fec_encoder.py               fec-encode    (training_tf2/fec_encoder.py)
  test_plc.py                  plc-test      (training_tf2/test_plc.py)

All audio is 16-bit little-endian PCM at 16 kHz (headerless, like the
reference; .wav accepted via the stdlib reader). Feature files are float32
frames of 36 (NB_TOTAL_FEATURES). Model weights are DNNw-blob checkpoints
(utils/weights_io.py); omit --weights and the shipped speech-trained
checkpoints (examples/) load by default — the counterpart of the
reference's download_model.sh flow — with a loud warning + seed-0 random
fallback when the artifacts are absent.
"""
import argparse
import glob
import json
import os
import sys
import time
from typing import Any, Dict, Optional

import numpy as np

from .constants import (DRED_COND_SIZE, FRAME_SIZE, LPCNET_COMPRESSED_SIZE,
                        LPCNET_PACKET_SAMPLES, NB_BANDS, NB_FEATURES,
                        NB_TOTAL_FEATURES)

CHUNK_FRAMES = 64          # streaming chunk for feature/synthesis tools


# --------------------------------------------------------------------- I/O

def read_pcm(path: str) -> np.ndarray:
    """Read headerless s16le (or .wav) as float32 samples."""
    if path.endswith(".wav"):
        import wave
        with wave.open(path, "rb") as w:
            assert w.getsampwidth() == 2, "expect 16-bit wav"
            assert w.getnchannels() == 1, "expect mono"
            data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return data.astype(np.float32)
    return np.fromfile(path, np.int16).astype(np.float32)


def write_pcm(path: str, pcm: np.ndarray) -> None:
    np.clip(np.asarray(pcm), -32767, 32767).astype(np.int16).tofile(path)


def read_features(path: str, width: int = NB_TOTAL_FEATURES) -> np.ndarray:
    x = np.fromfile(path, np.float32)
    assert x.size % width == 0, (
        f"{path}: {x.size} floats is not a multiple of {width}")
    return x.reshape(-1, width)


def load_model_params(path: Optional[str], init_fn, rng_seed: int = 0):
    """Load a params checkpoint (plain or training blob); random init if
    path is None."""
    import jax
    from .utils import checkpoint, weights_io
    if path is None:
        return init_fn(jax.random.PRNGKey(rng_seed))
    raw = weights_io.read_blob(path)
    if "__train_manifest__" in raw:
        params, _, _, _ = checkpoint.load_training(path)
        return params
    return weights_io.load_params(path)


_EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                             "examples")
DEFAULT_LPCNET = os.path.join(_EXAMPLES_DIR, "speech_lpcnet_params.bin")
DEFAULT_PLC = os.path.join(_EXAMPLES_DIR, "speech_plc_params.bin")
DEFAULT_DRED = os.path.join(_EXAMPLES_DIR, "speech_dred_params.bin")


def _default_weights(path: Optional[str], default_path: str,
                     what: str) -> Optional[str]:
    """Resolve omitted --weights to the shipped trained checkpoint (the
    reference's download_model.sh equivalent); warn loudly when falling
    back to random init."""
    if path is not None:
        return path
    if os.path.exists(default_path):
        return default_path
    print(f"warning: no trained {what} checkpoint found "
          f"({default_path} missing) - using seed-0 RANDOM weights; "
          "output will be noise. Pass --weights.", file=sys.stderr)
    return None


def load_lpcnet_model(path: Optional[str], default_cfg=None,
                      allow_default: bool = True):
    """LPCNet params + config; .h5 files come from the reference Keras
    trainer (utils/import_keras.py), everything else is a DNNw blob.
    Omitted path resolves to the shipped speech checkpoint."""
    from .models import lpcnet
    cfg = default_cfg or lpcnet.LPCNetConfig()
    if allow_default:
        path = _default_weights(path, DEFAULT_LPCNET, "LPCNet")
    if path and path.endswith(".h5"):
        from .utils import import_keras
        return import_keras.import_lpcnet_h5(path)
    return load_model_params(path, lambda k: lpcnet.init_params(k, cfg)), cfg


def load_dred_model(path: Optional[str]):
    """RDO-VAE params + config; omitted path resolves to the shipped DRED
    checkpoint (the reference's download_model.sh covers DRED weights too).
    .pth/.pt files are reference torch trainer checkpoints
    (torch/rdovae/train_rdovae.py:179-215) and a directory is a wexchange
    numpy export (export_rdovae_weights.py:258-293) — both import via
    utils/import_torch. For our own blobs the cond geometry is inferred
    from stored kernel shapes so cond-256 (deployable, torch trainer
    default) and cond-1024 (TF trainer default) load without flags."""
    from .models import rdovae as rv
    path = _default_weights(path, DEFAULT_DRED, "DRED RDO-VAE")
    if path and (path.endswith(".pth") or path.endswith(".pt")):
        from .utils import import_torch
        return import_torch.import_rdovae_torch(path)
    if path and os.path.isdir(path):
        from .utils import import_torch
        return import_torch.import_rdovae_numpy_dir(path)
    params = load_model_params(path, rv.init_params, rng_seed=2)
    enc = params["enc"]
    cfg = rv.RDOVAEConfig(
        cond_size=int(np.shape(enc["gru2"]["wr"])[0]),
        cond_size2=int(np.shape(enc["dense1"]["w"])[1]))
    return params, cfg


def _jnp():
    import jax.numpy as jnp
    return jnp


def _jit_features(quantize_pitch: bool, mode: str):
    """Jitted compute_features step for the streaming CLIs (shared
    module-level cache in data.py — eager per-op dispatch takes minutes
    per chunk over a remote-TPU transport)."""
    from .data import _feature_step_fn
    return _feature_step_fn(quantize_pitch, mode)


def _pad_to_chunks(pcm: np.ndarray, frames: int,
                   chunk_frames: int = CHUNK_FRAMES) -> np.ndarray:
    """Zero-pad a sample stream so every feature-extraction call sees the
    SAME jit shape (chunk_frames frames). Shape-varying trailing chunks
    compile to different XLA fusions whose ~1-ulp feature wobble flips
    near-tie VQ choices — fixed shapes make the streaming tools
    chunk-invariant (byte-identical to a single-call encode)."""
    total = -(-frames // chunk_frames) * chunk_frames * FRAME_SIZE
    out = np.zeros(total, np.float32)
    out[:frames * FRAME_SIZE] = pcm[:frames * FRAME_SIZE]
    return out


# --------------------------------------------------------------- features

def cmd_features(args) -> int:
    """PCM -> float32 feature frames (lpcnet_demo -features)."""
    import jax.numpy as jnp
    from . import features as F
    pcm = read_pcm(args.input)
    T = len(pcm) // FRAME_SIZE // 4 * 4
    pcm = _pad_to_chunks(pcm, T)
    state = F.init_state(1)
    out = []
    step = CHUNK_FRAMES
    step_fn = _jit_features(args.quantize_pitch, "superframe")
    for t0 in range(0, len(pcm) // FRAME_SIZE, step):
        x = jnp.asarray(pcm[None, t0 * FRAME_SIZE:(t0 + step) * FRAME_SIZE])
        state, feats, _ = step_fn(state, x)
        out.append(np.asarray(feats[0]))
    allf = np.concatenate(out, axis=0)[:T].astype(np.float32)
    allf.tofile(args.output)
    print(f"wrote {allf.shape[0]} frames x {allf.shape[1]} -> {args.output}")
    return 0


# --------------------------------------------------------------- synthesis

def cmd_synthesis(args) -> int:
    """Feature frames -> PCM (lpcnet_demo -synthesis)."""
    import jax
    import jax.numpy as jnp
    from .models import lpcnet
    from .vocoder import Synthesizer
    feats = read_features(args.input)
    params, cfg = load_lpcnet_model(args.weights)
    voc = Synthesizer(cfg, params=params, backend=args.backend)
    if args.temperature and (args.streaming or voc.backend == "pallas"):
        print("error: --temperature needs the batched scan backend "
              "(pass --backend scan, no --streaming)", file=sys.stderr)
        return 1
    if args.streaming:
        state = voc.reset_streaming(1)
        synth = voc.synthesize_streaming
    elif args.temperature:
        state = voc.reset(1)
        synth = voc.synthesize_temperature
    else:
        state = voc.reset(1)
        synth = voc.synthesize
    T = feats.shape[0]
    outs = []
    t_synth = 0.0
    for t0 in range(0, T, CHUNK_FRAMES):
        f = jnp.asarray(feats[None, t0:t0 + CHUNK_FRAMES])
        t = time.perf_counter()
        state, pcm = synth(state, f)
        pcm = jax.block_until_ready(pcm)
        t_synth += time.perf_counter() - t
        outs.append(np.asarray(pcm[0]))
    pcm = np.concatenate(outs)
    write_pcm(args.output, pcm)
    rt = (T * FRAME_SIZE / 16000.0) / max(t_synth, 1e-9)
    print(f"wrote {len(pcm)} samples -> {args.output} "
          f"({rt:.2f}x realtime single-stream incl. dispatch)")
    return 0


# ------------------------------------------------------------------ codec

DEFAULT_CODEBOOKS = os.path.join(os.path.dirname(__file__), os.pardir,
                                 "examples", "codec_codebooks.bin")


def _load_codebooks(path: Optional[str]):
    """Codec codebooks: --codebooks path, else the shipped trained set
    (examples/codec_codebooks.bin — the equivalent of the reference's
    downloaded ceps_codebooks.c), else random placeholders with a LOUD
    warning (quantization through random codebooks is meaningless)."""
    import jax
    from .codec import codec
    from .utils import weights_io
    if path is None:
        if os.path.exists(DEFAULT_CODEBOOKS):
            path = DEFAULT_CODEBOOKS
        else:
            print("warning: no trained codec codebooks found "
                  f"({DEFAULT_CODEBOOKS} missing) - using RANDOM "
                  "placeholders; quantized output will be garbage. "
                  "Train with `vq-train` or pass --codebooks.",
                  file=sys.stderr)
            return codec.default_codebooks(jax.random.PRNGKey(0))
    return {k: _jnp().asarray(v) for k, v in
            weights_io.load_params(path).items()}


def cmd_encode(args) -> int:
    """PCM -> 8-byte packets per 40 ms (lpcnet_demo -encode)."""
    import jax
    import jax.numpy as jnp
    from . import features as F
    from .codec import codec
    pcm = read_pcm(args.input)
    n_sf = len(pcm) // LPCNET_PACKET_SAMPLES
    # fixed-shape chunks -> chunk-invariant packets (see _pad_to_chunks)
    pcm = _pad_to_chunks(pcm, n_sf * 4)
    cbs = _load_codebooks(args.codebooks)
    state = F.init_state(1)
    vq_mem = jnp.zeros((1, NB_BANDS))
    bufs = []
    group = CHUNK_FRAMES // 4
    # whole-chunk scanned encode: byte-identical to per-superframe calls
    # (tests/test_codec.py::TestScannedCodec), one dispatch per chunk
    enc_sfs = jax.jit(lambda f, m, sp: codec.encode_superframes(
        cbs, f, m, sp))
    step_fn = _jit_features(True, "superframe")
    for g0 in range(0, n_sf, group):
        x = jnp.asarray(pcm[None, g0 * LPCNET_PACKET_SAMPLES:
                            (g0 + group) * LPCNET_PACKET_SAMPLES])
        state, feats, sps = step_fn(state, x)
        chunk_bufs, _, vq_mem = enc_sfs(feats, vq_mem, sps)
        n_keep = min(group, n_sf - g0)
        bufs.append(np.asarray(chunk_bufs[0, :n_keep], np.uint8))
    blob = np.concatenate(bufs).reshape(-1)
    blob.tofile(args.output)
    print(f"wrote {n_sf} packets ({blob.size} bytes, 1.6 kb/s) "
          f"-> {args.output}")
    return 0


def cmd_decode(args) -> int:
    """8-byte packets -> PCM (lpcnet_demo -decode = decode_packet + 4x
    synthesize, src/lpcnet.c:310-319)."""
    import jax
    import jax.numpy as jnp
    from .codec import codec
    from .models import lpcnet
    from .vocoder import Synthesizer
    raw = np.fromfile(args.input, np.uint8)
    n_sf = raw.size // LPCNET_COMPRESSED_SIZE
    if n_sf == 0:
        print(f"error: {args.input}: no complete "
              f"{LPCNET_COMPRESSED_SIZE}-byte packets "
              f"({raw.size} bytes)", file=sys.stderr)
        return 1
    if raw.size % LPCNET_COMPRESSED_SIZE:
        print(f"warning: {args.input}: trailing "
              f"{raw.size % LPCNET_COMPRESSED_SIZE} bytes ignored",
              file=sys.stderr)
    raw = raw[:n_sf * LPCNET_COMPRESSED_SIZE].reshape(
        n_sf, LPCNET_COMPRESSED_SIZE)
    cbs = _load_codebooks(args.codebooks)
    params, cfg = load_lpcnet_model(args.weights)
    voc = Synthesizer(cfg, params=params, backend=args.backend)
    state = voc.reset(1)
    # decode the whole packet stream in one scanned call, then synthesize
    # in fixed-shape chunks (fewer conv-boundary effects than the old
    # per-packet calls, and one dispatch per chunk instead of per 40 ms)
    feats, _ = jax.jit(lambda b, m: codec.decode_packets(cbs, b, m))(
        jnp.asarray(raw[None]), jnp.zeros((1, NB_BANDS)))
    T = int(feats.shape[1])
    # full 64-frame chunks + one natural-length tail (T is a multiple of
    # 4): zero-padding the tail would both bleed pad activations into the
    # last frames' conv conditioning and waste AR sampling on discarded
    # frames
    outs = []
    for t0 in range(0, T, CHUNK_FRAMES):
        t1 = min(T, t0 + CHUNK_FRAMES)
        state, pcm = voc.synthesize(state, feats[:, t0:t1])
        outs.append(np.asarray(pcm[0]))
    pcm = np.concatenate(outs)
    write_pcm(args.output, pcm)
    print(f"wrote {len(pcm)} samples -> {args.output}")
    return 0


# -------------------------------------------------------------------- PLC

def _read_loss_flags(spec: str, n_packets: int, seed: int = 0) -> np.ndarray:
    """Loss flags, one per 20-ms packet, 1 = lost. spec is a percentage
    (random losses) or a trace file (lpcnet_demo.c:231-243)."""
    try:
        pct = float(spec)
        rs = np.random.RandomState(seed)
        return (rs.uniform(0, 100, n_packets) < pct).astype(np.int32)
    except ValueError:
        pass
    flags = np.loadtxt(spec, dtype=np.int64).reshape(-1)
    if len(flags) >= n_packets:
        return flags[:n_packets].astype(np.int32)
    # a short trace keeps its last value after EOF, matching the
    # reference's fscanf loop (lpcnet_demo.c:236: loss is left unchanged
    # when fscanf stops reading)
    pad = np.full(n_packets - len(flags), flags[-1] if len(flags) else 0,
                  np.int64)
    return np.concatenate([flags, pad]).astype(np.int32)


def cmd_plc(args) -> int:
    """Concealment over a PCM stream with a loss pattern
    (lpcnet_demo -plc_file, src/lpcnet_demo.c:220-249)."""
    import jax.numpy as jnp
    from .models import lpcnet, plc as plc_model
    from .plc import (NonCausalPLCEngine, PLCEngine, PLCOptions,
                      StrictCausalPLCEngine)
    pcm = read_pcm(args.input)
    n_fr = len(pcm) // FRAME_SIZE // 2 * 2
    pcm = pcm[:n_fr * FRAME_SIZE]
    flags = _read_loss_flags(args.loss, n_fr // 2, args.seed)
    noncausal = "noncausal" in args.options or "non_causal" in args.options
    lp, cfg = load_lpcnet_model(
        args.weights, lpcnet.LPCNetConfig(lookahead=0 if noncausal else 2))
    plc_w = _default_weights(args.plc_weights, DEFAULT_PLC, "PLC")
    if plc_w and plc_w.endswith(".h5"):
        from .utils import import_keras
        pp, _ = import_keras.import_plc_h5(plc_w)
    else:
        pp = load_model_params(plc_w, plc_model.init_params, rng_seed=1)
    if noncausal:
        engine = NonCausalPLCEngine(
            lp, pp, cfg,
            options=PLCOptions(remove_dc="dc" in args.options))
    elif args.options == "strict":
        engine = StrictCausalPLCEngine(lp, pp, cfg)
    else:
        engine = PLCEngine(lp, pp, cfg,
                           options=PLCOptions(
                               remove_dc="dc" in args.options))
    state = engine.init_state(1)
    outs = []
    for f in range(n_fr):
        lost = jnp.asarray([bool(flags[f // 2])])
        fr = jnp.asarray(pcm[None, f * FRAME_SIZE:(f + 1) * FRAME_SIZE])
        state, out = engine.step(state, fr, lost)
        outs.append(np.asarray(out[0]))
    if noncausal:
        # sample-align output with input: drop the 80-sample engine delay
        # and flush the delay line with one extra conceal step, matching
        # the reference demo (lpcnet_demo.c:226 skip=extra=80, :245-248)
        from .constants import TRAINING_OFFSET
        zeros = jnp.zeros((1, FRAME_SIZE))
        _, out = engine.step(state, zeros, jnp.asarray([True]))
        outs.append(np.asarray(out[0, :TRAINING_OFFSET]))
        outs[0] = outs[0][TRAINING_OFFSET:]
    write_pcm(args.output, np.concatenate(outs))
    print(f"processed {n_fr} frames, {int(flags.sum())} lost packets "
          f"-> {args.output}")
    return 0


def cmd_plc_test(args) -> int:
    """Offline PLC-network test: feature file with a received column ->
    reconstructed features, out = feat*received + (1-received)*pred.

    Reference polarity (training_tf2/test_plc.py:104-117): the trailing
    column is 1 where the frame was RECEIVED (despite being named `lost`
    there — it multiplies the kept features)."""
    import jax.numpy as jnp
    from .models import plc as plc_model
    width = 2 * NB_BANDS + NB_FEATURES + 1     # burg36 + feat20 + received
    data = read_features(args.input, width)
    pp = load_model_params(args.weights, plc_model.init_params, rng_seed=1)
    cfg = plc_model.PLCConfig()
    received = data[:, -1:]
    inp = jnp.asarray(np.concatenate(
        [data[:, :-1] * received, received], axis=-1)[None])
    pred = np.asarray(plc_model.forward_sequence(pp, inp, cfg)[0])
    feat = data[:, 2 * NB_BANDS:-1]
    out = feat * received + pred * (1 - received)
    out.astype(np.float32).tofile(args.output)
    print(f"wrote {out.shape[0]} reconstructed frames -> {args.output}")
    return 0


def cmd_addlpc(args) -> int:
    """Recompute the LPC tail of a feature file from its cepstra
    (lpcnet_demo -addlpc, src/lpcnet_demo.c:250-259)."""
    import jax
    import jax.numpy as jnp
    from .ops import dsp
    feats = read_features(args.input)
    lpc, _ = jax.jit(dsp.lpc_from_cepstrum)(jnp.asarray(feats[:, :NB_BANDS]))
    feats[:, NB_BANDS + 2:] = np.asarray(lpc)
    feats.astype(np.float32).tofile(args.output)
    print(f"rewrote LPC for {feats.shape[0]} frames -> {args.output}")
    return 0


# -------------------------------------------------------------- dump-data

def _hp_biquad(x: np.ndarray) -> np.ndarray:
    """DC-blocking high-pass applied to all dump_data input
    (dump_data.c:114-115,258: b={-2,1}, a={-1.99599,.996}, float64 accum).
    Native (C++) when available; the Python fallback is per-sample and
    only acceptable for short test files."""
    import ctypes

    from .utils import native
    lib = native.get_lib()
    x = np.ascontiguousarray(x, np.float32)
    if lib is not None:
        y = np.empty_like(x)
        lib.dp_hp_biquad(y.ctypes.data_as(ctypes.c_void_p),
                         x.ctypes.data_as(ctypes.c_void_p), len(x))
        return y
    b = (-2.0, 1.0)
    a = (-1.99599, 0.99600)
    y = np.empty_like(x, np.float32)
    m0 = m1 = 0.0
    for i in range(len(x)):
        xi = float(x[i])
        yi = np.float32(xi + m0)
        m0 = m1 + np.float32(b[0] * xi - a[0] * yi)
        m1 = np.float32(b[1] * xi - a[1] * yi)
        y[i] = yi
    return y


def cmd_dump_data(args) -> int:
    """Training/test data prep (src/dump_data.c:110-306).
    train  = augmentation + features + (sig_in, sig_out) pairs
    test   = clean features only
    btrain = train + per-frame Burg cepstra interleaved [burg36|feat36]
             (the -btrain PLC training format, dump_data.c:145-150,266-270)
    btest  = clean [burg36|feat36] frames, no augmentation
    qtrain/qtest = train/test with features quantized through the codec
             (dump_data.c:154-161), so models train on decoder-side
             conditioning; pass --codebooks for trained codebooks

    input may be a DIRECTORY of voices (tools/make_voices.py output): the
    train/btrain modes then iterate every TRAINING voice from its
    manifest.json (held-out voices are excluded), running --passes
    augmentation passes per voice — the multi-speaker corpus path."""
    import jax
    import jax.numpy as jnp
    from . import data as D
    from . import features as F
    from .ops import burg as burg_ops
    sources = None
    if os.path.isdir(args.input):
        assert args.mode in ("train", "btrain"), \
            "directory input is for the train/btrain corpus modes"
        man_path = os.path.join(args.input, "manifest.json")
        if os.path.exists(man_path):
            with open(man_path) as f:
                names = json.load(f)["train"]
        else:
            names = sorted(os.path.basename(p) for p in
                           glob.glob(os.path.join(args.input, "*.s16")))
        sources = [(n, read_pcm(os.path.join(args.input, n)))
                   for n in names]
        print(f"corpus input: {len(sources)} training voices "
              f"x {args.passes} passes", flush=True)
        pcm = sources[0][1]
    else:
        pcm = read_pcm(args.input)
    cbs = _load_codebooks(args.codebooks) \
        if args.mode in ("qtrain", "qtest") else None
    if args.mode in ("test", "btest", "qtest"):
        from .codec import codec
        pcm = _hp_biquad(pcm)
        T = len(pcm) // FRAME_SIZE // 4 * 4
        # fixed-shape chunks -> chunk-count-invariant features
        pcm = _pad_to_chunks(pcm, T)
        state = F.init_state(1)
        outs = []
        if cbs is not None:
            enc_fn = jax.jit(lambda f4, m, sp: codec.encode_superframe(
                cbs, f4, m, sp))
            vq_mem = jnp.zeros((1, NB_BANDS))
        # test/btest mirror dump_data -test, which runs the per-frame
        # pitch path (process_single_frame, dump_data.c:283); qtest runs
        # the superframe quantize path (process_superframe, :288)
        mode = "single" if cbs is None else "superframe"
        step_fn = _jit_features(cbs is not None, mode)
        for t0 in range(0, len(pcm) // FRAME_SIZE, CHUNK_FRAMES):
            t1 = t0 + CHUNK_FRAMES
            x = jnp.asarray(pcm[None, t0 * FRAME_SIZE:t1 * FRAME_SIZE])
            state, feats, sps = step_fn(state, x)
            if cbs is not None:
                for g in range(min(CHUNK_FRAMES, T - t0) // 4):
                    _, fq, vq_mem = enc_fn(feats[:, 4 * g:4 * (g + 1)],
                                           vq_mem, sps[g])
                    feats = jax.lax.dynamic_update_slice(
                        feats, fq, (0, 4 * g, 0))
            f = np.asarray(feats[0])
            if args.mode == "btest":
                import jax
                frames = np.asarray(pcm[t0 * FRAME_SIZE:t1 * FRAME_SIZE],
                                    np.float32).reshape(-1, FRAME_SIZE)
                # jit: Burg is a 16-step unrolled update chain; eager
                # dispatch of its hundreds of small ops takes minutes
                b36 = np.asarray(jax.jit(burg_ops.burg_cepstral_analysis)(
                    jnp.asarray(frames)))
                f = np.concatenate([b36, f], axis=-1)
            outs.append(f)
        allf = np.concatenate(outs)[:T].astype(np.float32)
        allf.tofile(args.features)
        print(f"wrote {T} x {allf.shape[1]} feature frames "
              f"-> {args.features}")
        return 0
    assert args.data, "train modes need an output data.s16 path"
    if args.mode == "train" and args.batch_passes > 1:
        # corpus path: run passes as parallel batched feature streams
        # (prepare_training_data_batch); optional speed augmentation.
        # Multi-voice input loops voices in the outer dimension with a
        # per-voice seed offset so no two (voice, pass) pairs share
        # augmentation filters.
        srcs = sources or [(os.path.basename(args.input), pcm)]
        with open(args.features, "wb") as ff, open(args.data, "wb") as fd:
            total = 0
            for vi, (vname, vpcm) in enumerate(srcs):
                vseed = args.seed + 100003 * vi
                for p0 in range(0, args.passes, args.batch_passes):
                    seeds = range(vseed + p0,
                                  vseed + min(args.passes,
                                              p0 + args.batch_passes))
                    feats, data = D.prepare_training_data_batch(
                        vpcm, seeds, speed_aug=args.speed_aug)
                    feats.tofile(ff)
                    data.astype(np.int16).tofile(fd)
                    total += feats.shape[0]
                    print(f"  {vname} pass "
                          f"{p0 + len(list(seeds))}/{args.passes}: "
                          f"{total} frames", flush=True)
        print(f"wrote {total} x {NB_TOTAL_FEATURES} frames "
              f"({args.passes} passes x {len(srcs)} sources) -> "
              f"{args.features}, {args.data}")
        return 0
    # multiple passes with different augmentation filters
    # (dump_data.c:245-257, README.md:110)
    srcs = sources or [(os.path.basename(args.input), pcm)]
    total = 0
    width = None
    with open(args.features, "wb") as ff, open(args.data, "wb") as fd:
        for vi, (vname, vpcm) in enumerate(srcs):
            vseed = args.seed + 100003 * vi
            for p in range(args.passes):
                if args.mode == "btrain":
                    feats, data, burg36 = D.prepare_training_data(
                        vpcm, seed=vseed + p, include_burg=True)
                    feats = np.concatenate([burg36, feats], axis=-1)
                else:
                    feats, data = D.prepare_training_data(
                        vpcm, seed=vseed + p, quantize_codebooks=cbs)
                feats.astype(np.float32).tofile(ff)
                data.astype(np.int16).tofile(fd)
                total += feats.shape[0]
                width = feats.shape[1]
    print(f"wrote {total} x {width} frames "
          f"({args.passes} passes x {len(srcs)} sources) -> "
          f"{args.features}, {args.data}")
    return 0


# ------------------------------------------------------------- weight blob

def cmd_dump_weights_blob(args) -> int:
    """Bundle model checkpoints into one DNNw blob, one family prefix each
    (dump_weights_blob, src/write_lpcnet_weights.c:69-77)."""
    from .utils import weights_io
    arrays: Dict[str, np.ndarray] = {}
    for spec in args.models:
        prefix, path = spec.split("=", 1)
        params = load_model_params(path, None)
        flat = weights_io._flatten(params, prefix + "/")
        for i, (name, a) in enumerate(sorted(flat.items())):
            arrays[f"{prefix[:1]}{i:04d}"] = (
                a.astype(np.float32) if a.dtype == np.float64 else a)
    weights_io.write_blob(args.output, arrays)
    print(f"wrote {len(arrays)} arrays -> {args.output}")
    return 0


# --------------------------------------------------------------- vq-train

def cmd_vq_train(args) -> int:
    """Train codec codebooks from a feature file
    (src/ceps_vq_train.c:433-619 equivalent, on-TPU k-means)."""
    import jax
    from .codec import vq_train
    from .utils import weights_io
    feats = read_features(args.input)
    cbs = vq_train.train_codec_codebooks(
        jax.random.PRNGKey(args.seed), _jnp().asarray(feats),
        iters=args.iters, final_iters=args.final_iters)
    weights_io.save_params(args.output,
                           {k: np.asarray(v) for k, v in cbs.items()})
    print(f"trained codebooks on {feats.shape[0]} frames -> {args.output}")
    return 0


# ---------------------------------------------------------------- training

def _train_common(sub):
    sub.add_argument("--epochs", type=int, default=4)
    sub.add_argument("--batch-size", type=int, default=32)
    sub.add_argument("--lr", type=float, default=1e-3)
    sub.add_argument("--seed", type=int, default=0)
    sub.add_argument("--resume", default=None,
                     help="checkpoint to resume from (params+opt+step)")
    sub.add_argument("--steps-per-epoch", type=int, default=0,
                     help="cap steps per epoch (0 = all data)")


def _ckpt_path(outdir: str, epoch: int) -> str:
    os.makedirs(outdir, exist_ok=True)
    return os.path.join(outdir, f"ckpt_{epoch:03d}.bin")


def _log_metrics(outdir: str, record: dict) -> None:
    """Structured per-epoch metrics (<outdir>/metrics.jsonl) — the
    observability layer the reference delegates to TensorBoard callbacks
    (SURVEY.md section 5)."""
    import json
    import time as _time
    os.makedirs(outdir, exist_ok=True)
    record = dict(record, time=round(_time.time(), 3))
    with open(os.path.join(outdir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")


def cmd_train_lpcnet(args) -> int:
    """LPCNet trainer (training_tf2/train_lpcnet.py): teacher-forced CE,
    sparsify/quantize schedules, per-epoch checkpoints, resume."""
    import jax
    import jax.numpy as jnp
    from . import data as D
    from .models import lpcnet
    from .training import lpcnet_task, sparsify
    from .utils import checkpoint

    feats = read_features(args.features)
    raw = np.fromfile(args.data, np.int16)
    data = raw.reshape(-1, 2)
    cfg = lpcnet.LPCNetConfig(e2e=args.e2e, lpc_gamma=args.gamma)
    opt = lpcnet_task.make_optimizer(lr=args.lr, decay=args.decay,
                                     b1=args.beta1, b2=args.beta2)
    if args.resume:
        tpl = opt.init(lpcnet.init_params(jax.random.PRNGKey(0), cfg))
        params, opt_state, step, meta0 = checkpoint.load_training(
            args.resume, tpl)
        epoch0 = int(meta0.get("epoch", -1)) + 1
    elif args.retrain:
        params = load_model_params(args.retrain, None)
        opt_state, step, epoch0 = opt.init(params), 0, 0
    else:
        params = lpcnet.init_params(jax.random.PRNGKey(args.seed), cfg)
        opt_state, step, epoch0 = opt.init(params), 0, 0
    # schedules: from-scratch vs quantize-finetune (train_lpcnet.py:303-317)
    if args.quantize:
        t0, t1, iv = 10000, 30000, 100
    else:
        t0, t1, iv = 2000, 40000, 400
    if args.sparsify_start is not None:
        t0 = args.sparsify_start
    if args.sparsify_end is not None:
        t1 = args.sparsify_end
    scfg = sparsify.SparsifyConfig(t_start=t0, t_end=t1, interval=iv,
                                   quantize=args.quantize,
                                   density=tuple(args.density),
                                   grub_density=tuple(args.grub_density))
    rng = jax.random.PRNGKey(args.seed + 1)
    for ep in range(args.epochs):
        epoch = epoch0 + ep
        t0 = time.perf_counter()
        n, tot = 0, 0.0
        for batch in D.window_batches(
                feats, data, batch_size=args.batch_size,
                rng=np.random.RandomState(args.seed + epoch)):
            rng, k = jax.random.split(rng)
            jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
            params, opt_state, metrics = lpcnet_task.train_step(
                params, opt_state, jb, k, cfg, opt)
            params = sparsify.apply(params, jnp.int32(step), scfg,
                                    cfg.gru_a_units)
            step += 1
            n += 1
            tot += float(metrics["loss"])
            if args.steps_per_epoch and n >= args.steps_per_epoch:
                break
        ck = _ckpt_path(args.outdir, epoch)
        checkpoint.save_training(ck, params, opt_state, step,
                                 {"epoch": epoch, "cfg": "lpcnet"})
        _log_metrics(args.outdir, {"task": "lpcnet", "epoch": epoch,
                                   "step": step, "steps": n,
                                   "loss": round(tot / max(1, n), 6),
                                   "wall_s": round(time.perf_counter() - t0,
                                                   2)})
        print(f"epoch {epoch}: {n} steps, loss {tot / max(1, n):.4f}, "
              f"{time.perf_counter() - t0:.1f}s -> {ck}")
    return 0


def cmd_train_plc(args) -> int:
    """PLC trainer (training_tf2/train_plc.py): masked L1 losses over
    simulated loss traces."""
    import jax
    import jax.numpy as jnp
    from .models import plc as plc_model
    from .training import plc_task
    from .utils import checkpoint

    width = 2 * NB_BANDS + NB_FEATURES           # 56
    btrain_w = 2 * NB_BANDS + NB_TOTAL_FEATURES  # 72
    raw = np.fromfile(args.features, np.float32)
    div72, div56 = raw.size % btrain_w == 0, raw.size % width == 0
    fmt = args.feature_width
    if fmt == "auto":
        if div72 and div56:
            print(f"error: {args.features}: size {raw.size} is divisible "
                  f"by both 72 (btrain) and 56 — pass --feature-width",
                  file=sys.stderr)
            return 1
        fmt = "72" if div72 else "56"
    if fmt == "72":
        # dump-data btrain layout [burg36|feat36]: keep burg36 + feat20
        # (train_plc.py:246-260)
        feats = raw.reshape(-1, btrain_w)[:, :width]
    else:
        feats = raw.reshape(-1, width)
    if args.loss_traces:
        traces = np.loadtxt(args.loss_traces, dtype=np.int64).reshape(-1)
    else:
        traces = (np.random.RandomState(args.seed)
                  .uniform(size=200000) > 0.2).astype(np.int64)
    cfg = plc_model.PLCConfig()
    opt = plc_task.make_optimizer(lr=args.lr)
    if args.resume:
        tpl = opt.init(plc_model.init_params(jax.random.PRNGKey(0), cfg))
        params, opt_state, step, meta0 = checkpoint.load_training(
            args.resume, tpl)
        epoch0 = int(meta0.get("epoch", -1)) + 1
    else:
        params = plc_model.init_params(jax.random.PRNGKey(args.seed), cfg)
        opt_state, step, epoch0 = opt.init(params), 0, 0
    T = args.seq_len
    nseq = feats.shape[0] // T
    feats = feats[:nseq * T].reshape(nseq, T, width)
    rng = jax.random.PRNGKey(args.seed + 1)
    for ep in range(args.epochs):
        epoch = epoch0 + ep
        order = np.random.RandomState(args.seed + epoch).permutation(nseq)
        n, tot = 0, 0.0
        for b0 in range(0, nseq - args.batch_size + 1, args.batch_size):
            sel = order[b0:b0 + args.batch_size]
            rng, k1, k2 = jax.random.split(rng, 3)
            # loss simulation from traces with random offset
            # (plc_loader.py:56-75)
            off = np.random.RandomState(step).randint(
                0, max(1, len(traces) - T), size=len(sel))
            lost = np.stack([traces[o:o + T] for o in off])
            batch = plc_task.make_batch(
                k1, jnp.asarray(feats[sel]), jnp.asarray(lost))
            params, opt_state, metrics = plc_task.train_step(
                params, opt_state, batch, cfg, opt)
            step += 1
            n += 1
            tot += float(metrics["loss"])
            if args.steps_per_epoch and n >= args.steps_per_epoch:
                break
        ck = _ckpt_path(args.outdir, epoch)
        checkpoint.save_training(ck, params, opt_state, step,
                                 {"epoch": epoch, "cfg": "plc"})
        _log_metrics(args.outdir, {"task": "plc", "epoch": epoch,
                                   "step": step, "steps": n,
                                   "loss": round(tot / max(1, n), 6)})
        print(f"epoch {epoch}: {n} steps, loss {tot / max(1, n):.4f} "
              f"-> {ck}")
    return 0


def cmd_train_rdovae(args) -> int:
    """RDO-VAE trainer (training_tf2/train_rdovae.py): lambda-conditioned
    rate-distortion training."""
    import jax
    import jax.numpy as jnp
    from .models import rdovae as rv
    from .training import rdovae_task
    from .utils import checkpoint

    feats = read_features(args.features)[:, :NB_FEATURES]
    cfg = rv.RDOVAEConfig(cond_size=args.cond_size,
                          cond_size2=args.cond_size2)
    opt = rdovae_task.make_optimizer(lr=args.lr)
    if args.resume:
        tpl = opt.init(rv.init_params(jax.random.PRNGKey(0), cfg))
        params, opt_state, step, meta0 = checkpoint.load_training(
            args.resume, tpl)
        epoch0 = int(meta0.get("epoch", -1)) + 1
    else:
        params = rv.init_params(jax.random.PRNGKey(args.seed), cfg)
        if args.rate_init:
            # RD-ordered per-level scales (see rv.rate_aware_quant_init):
            # the zero init needs many epochs before the 16 lambda levels
            # quantize differently; this starts them on the uniform-
            # quantizer optimum scale(q) ∝ sqrt(lambda(q))
            params = rv.rate_aware_quant_init(params, cfg)
        opt_state, step, epoch0 = opt.init(params), 0, 0
    T = args.seq_len
    nseq = feats.shape[0] // T
    feats = feats[:nseq * T].reshape(nseq, T, NB_FEATURES)
    rng = jax.random.PRNGKey(args.seed + 1)
    for ep in range(args.epochs):
        epoch = epoch0 + ep
        order = np.random.RandomState(args.seed + epoch).permutation(nseq)
        n, tot = 0, 0.0
        for b0 in range(0, nseq - args.batch_size + 1, args.batch_size):
            sel = order[b0:b0 + args.batch_size]
            rng, k1, k2 = jax.random.split(rng, 3)
            qid, lam = rdovae_task.sample_lambda(k1, len(sel), T // 2)
            params, opt_state, metrics = rdovae_task.train_step(
                params, opt_state, jnp.asarray(feats[sel]), qid, lam, k2,
                cfg, opt)
            step += 1
            n += 1
            tot += float(metrics["loss"])
            if args.steps_per_epoch and n >= args.steps_per_epoch:
                break
        ck = _ckpt_path(args.outdir, epoch)
        checkpoint.save_training(ck, params, opt_state, step,
                                 {"epoch": epoch, "cfg": "rdovae",
                                  "cond_size": cfg.cond_size,
                                  "cond_size2": cfg.cond_size2})
        _log_metrics(args.outdir, {"task": "rdovae", "epoch": epoch,
                                   "step": step, "steps": n,
                                   "loss": round(tot / max(1, n), 6)})
        print(f"epoch {epoch}: {n} steps, loss {tot / max(1, n):.4f} "
              f"-> {ck}")
    return 0


# ------------------------------------------------------------ DRED tools

def cmd_rdovae_encode(args) -> int:
    """Features -> quantized latents file (encode_rdovae.py equivalent).
    Output: int16 symbols (S, 80) + float32 states (S, 24) side file."""
    import jax
    from .dred import DREDCodec
    from .models import rdovae as rv
    feats = read_features(args.input)[:, :NB_FEATURES]
    T = feats.shape[0] // 4 * 4
    params, rcfg = load_dred_model(args.weights)
    dc = DREDCodec(params, cfg=rcfg)
    jnp = _jnp()
    zd, sd = dc.encode(jnp.asarray(feats[None, :T]))
    qp = rv.quant_params(params, jnp.full((zd.shape[1],), args.quant,
                                          jnp.int32), dc.cfg)
    ze = zd[0] * qp["scale"]
    sym = np.asarray(jnp.round(rv.apply_dead_zone(ze, qp["dead_zone"])),
                     np.int16)
    sym.tofile(args.output)
    np.asarray(sd[0], np.float32).tofile(args.output + ".state")
    print(f"wrote {sym.shape[0]} latent dframes -> {args.output}")
    return 0


def cmd_rdovae_decode(args) -> int:
    """Quantized latents -> features file (decode_rdovae.py equivalent)."""
    from .dred import DREDCodec
    from .models import rdovae as rv
    jnp = _jnp()
    sym = np.fromfile(args.input, np.int16).reshape(-1, 80)
    states = np.fromfile(args.input + ".state", np.float32).reshape(-1, 24)
    params, rcfg = load_dred_model(args.weights)
    dc = DREDCodec(params, cfg=rcfg)
    qid = jnp.full((sym.shape[0],), args.quant, jnp.int32)
    qp = rv.quant_params(params, qid, dc.cfg)
    z = jnp.asarray(sym, jnp.float32) / qp["scale"]
    feats = rv.decode(params, z[None], jnp.asarray(states[None, 0]), dc.cfg)
    out = np.zeros((feats.shape[1], NB_TOTAL_FEATURES), np.float32)
    out[:, :NB_FEATURES] = np.asarray(feats[0])
    out.tofile(args.output)
    print(f"wrote {out.shape[0]} feature frames -> {args.output}")
    return 0


def cmd_fec_encode(args) -> int:
    """End-to-end DRED FEC pipeline: audio -> features -> latents ->
    age-ramped quantized redundancy packets -> .fec file
    (training_tf2/fec_encoder.py)."""
    import jax
    from . import features as F
    from .dred import DREDCodec, DREDConfig, quant_id_ramp
    from .models import rdovae as rv
    from .utils import fec_packets
    jnp = _jnp()
    pcm = read_pcm(args.input)
    T = len(pcm) // FRAME_SIZE // 4 * 4
    pcm = _pad_to_chunks(pcm, T)
    state = F.init_state(1)
    outs = []
    step_fn = _jit_features(False, "superframe")
    for t0 in range(0, len(pcm) // FRAME_SIZE, CHUNK_FRAMES):
        t1 = t0 + CHUNK_FRAMES
        x = jnp.asarray(pcm[None, t0 * FRAME_SIZE:t1 * FRAME_SIZE])
        state, feats, _ = step_fn(state, x)
        outs.append(np.asarray(feats[0]))
    feats = np.concatenate(outs)[:T, :NB_FEATURES]
    params, rcfg = load_dred_model(args.weights)
    dcfg = DREDConfig(num_dframes=args.num_redundancy)
    dc = DREDCodec(params, cfg=rcfg, dred_cfg=dcfg)
    zd, sd = dc.encode(jnp.asarray(feats[None]))
    S = zd.shape[1]
    packets, rates = [], []
    for s in range(dcfg.num_dframes, S + 1, args.packets_per_fec):
        sym, qid = dc.quantize_payload(zd[:, :s])
        state0 = sd[:, s - dcfg.num_dframes]
        rec = dc.decode(sym, qid, state0)           # (1, n*4, 20)
        fr = np.zeros((rec.shape[1], NB_TOTAL_FEATURES), np.float32)
        fr[:, :NB_FEATURES] = np.asarray(rec[0])
        rate = float(np.abs(np.asarray(sym)).sum())  # proxy bits
        packets.append(fr)
        rates.append(int(min(32767, rate)))
    fec_packets.write_fec_packets(args.output, packets, rates)
    print(f"wrote {len(packets)} FEC packets "
          f"({dcfg.num_dframes} dframes each) -> {args.output}")
    return 0


# ------------------------------------------------------------------ main

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lpcnet_tpu",
        description="TPU-native LPCNet framework tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("features", help="PCM -> feature frames")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--quantize-pitch", action="store_true")
    s.set_defaults(fn=cmd_features)

    s = sub.add_parser("synthesis", help="feature frames -> PCM")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--weights", default=None)
    s.add_argument("--backend", default="auto",
                   choices=["auto", "scan", "pallas"])
    s.add_argument("--streaming", action="store_true",
                   help="reference-exact causal mode (C-matched warm-up "
                        "silence, conv delay lines; scan backend)")
    s.add_argument("--temperature", action="store_true",
                   help="voiced-frame sharpening + 0.002 pdf floor "
                        "(training_tf2/test_lpcnet.py sampling; scan "
                        "backend)")
    s.set_defaults(fn=cmd_synthesis)

    s = sub.add_parser("encode", help="PCM -> 1.6 kb/s packets")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--codebooks", default=None)
    s.set_defaults(fn=cmd_encode)

    s = sub.add_parser("decode", help="1.6 kb/s packets -> PCM")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--codebooks", default=None)
    s.add_argument("--weights", default=None)
    s.add_argument("--backend", default="auto",
                   choices=["auto", "scan", "pallas"])
    s.set_defaults(fn=cmd_decode)

    s = sub.add_parser("plc", help="conceal lost packets in a PCM stream")
    s.add_argument("loss", help="loss percentage or trace file "
                                "(one 0/1 per 20-ms packet, 1 = lost)")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--options", default="causal",
                   choices=["causal", "causal_dc", "noncausal",
                            "noncausal_dc", "strict"],
                   help="the reference demo's 4 PLC methods "
                        "(lpcnet_demo.c:120-127) plus `strict` = "
                        "bit-exact-class replica of the C causal engine "
                        "(PLC_SKIP_UPDATES + 80-sample split conceal)")
    s.add_argument("--weights", default=None)
    s.add_argument("--plc-weights", default=None)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_plc)

    s = sub.add_parser("plc-test", help="offline PLC net feature test")
    s.add_argument("input", help="f32 frames [burg36|feat20|received], "
                                 "last column 1 = frame received")
    s.add_argument("output")
    s.add_argument("--weights", default=None)
    s.set_defaults(fn=cmd_plc_test)

    s = sub.add_parser("dump-data", help="training/test data prep")
    s.add_argument("mode", choices=["train", "test", "btrain", "btest",
                                    "qtrain", "qtest"])
    s.add_argument("input")
    s.add_argument("features")
    s.add_argument("data", nargs="?", default=None)
    s.add_argument("--passes", type=int, default=1)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--codebooks", default=None,
                   help="trained codec codebooks for qtrain/qtest")
    s.add_argument("--batch-passes", type=int, default=1,
                   help="train mode: run this many augmentation passes as "
                        "parallel batched feature streams (corpus building)")
    s.add_argument("--speed-aug", action="store_true",
                   help="train mode with --batch-passes: per-pass random "
                        "resampling in [0.7, 1.4] for pitch diversity")
    s.set_defaults(fn=cmd_dump_data)

    s = sub.add_parser("addlpc",
                       help="recompute LPC tail of a feature file")
    s.add_argument("input")
    s.add_argument("output")
    s.set_defaults(fn=cmd_addlpc)

    s = sub.add_parser("dump-weights-blob",
                       help="bundle checkpoints into one DNNw blob")
    s.add_argument("output")
    s.add_argument("models", nargs="+",
                   help="prefix=checkpoint.bin (e.g. lpcnet=ck.bin)")
    s.set_defaults(fn=cmd_dump_weights_blob)

    s = sub.add_parser("vq-train", help="train codec VQ codebooks")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--iters", type=int, default=4,
                   help="Lloyd passes per codebook split (the C recipe's "
                        "4, ceps_vq_train.c:361)")
    s.add_argument("--final-iters", type=int, default=20,
                   help="polish passes at full size (the C's 20)")
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=cmd_vq_train)

    s = sub.add_parser("train-lpcnet", help="train the vocoder")
    s.add_argument("features")
    s.add_argument("data")
    s.add_argument("outdir")
    _train_common(s)
    s.add_argument("--decay", type=float, default=5e-5)
    s.add_argument("--beta1", type=float, default=0.5,
                   help="Adam beta_1 (reference train_lpcnet.py:229)")
    s.add_argument("--beta2", type=float, default=0.8)
    s.add_argument("--e2e", action="store_true")
    s.add_argument("--gamma", type=float, default=1.0)
    s.add_argument("--quantize", action="store_true",
                   help="int8 quantize-finetune schedule")
    s.add_argument("--retrain", default=None,
                   help="params checkpoint to warm-start from")
    s.add_argument("--density", type=float, nargs=3,
                   default=[0.05, 0.05, 0.2])
    s.add_argument("--grub-density", type=float, nargs=3,
                   default=[1.0, 1.0, 1.0])
    s.add_argument("--sparsify-start", type=int, default=None,
                   help="override the sparsify schedule's start batch "
                        "(defaults: 2000 from-scratch / 10000 quantize)")
    s.add_argument("--sparsify-end", type=int, default=None,
                   help="override the sparsify schedule's end batch "
                        "(defaults: 40000 / 30000)")
    s.set_defaults(fn=cmd_train_lpcnet)

    s = sub.add_parser("train-plc", help="train the PLC predictor")
    s.add_argument("features", help="f32 frames [burg36|feat20]")
    s.add_argument("outdir")
    _train_common(s)
    s.add_argument("--loss-traces", default=None,
                   help="text file of 0/1 flags (1 = received)")
    s.add_argument("--seq-len", type=int, default=1000)
    s.add_argument("--feature-width", default="auto",
                   choices=["auto", "56", "72"],
                   help="56 = [burg36|feat20], 72 = dump-data btrain "
                        "[burg36|feat36]; auto errors when ambiguous")
    s.set_defaults(fn=cmd_train_plc)

    s = sub.add_parser("train-rdovae", help="train the DRED RDO-VAE")
    s.add_argument("features")
    s.add_argument("outdir")
    _train_common(s)
    s.add_argument("--seq-len", type=int, default=400)
    s.add_argument("--cond-size", type=int, default=DRED_COND_SIZE,
                   help="GRU width (1024 = TF trainer default; 256 = the "
                        "torch trainer's deployable geometry)")
    s.add_argument("--cond-size2", type=int, default=256)
    s.add_argument("--rate-init", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="start the 16 quantizer levels on the RD-optimal "
                        "scale(q) ∝ sqrt(lambda(q)) instead of the "
                        "reference's all-equal zero init (models/rdovae."
                        "py::rate_aware_quant_init)")
    s.set_defaults(fn=cmd_train_rdovae)

    s = sub.add_parser("rdovae-encode", help="features -> latents")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--weights", default=None)
    s.add_argument("--quant", type=int, default=15)
    s.set_defaults(fn=cmd_rdovae_encode)

    s = sub.add_parser("rdovae-decode", help="latents -> features")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--weights", default=None)
    s.add_argument("--quant", type=int, default=15)
    s.set_defaults(fn=cmd_rdovae_decode)

    s = sub.add_parser("fec-encode", help="audio -> DRED .fec redundancy")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--weights", default=None)
    s.add_argument("--num-redundancy", type=int, default=16)
    s.add_argument("--packets-per-fec", type=int, default=1)
    s.set_defaults(fn=cmd_fec_encode)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (FileNotFoundError, IsADirectoryError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    except (AssertionError, ValueError, KeyError) as e:
        if os.environ.get("LPCNET_CLI_DEBUG"):
            raise
        print(f"error: {e} (set LPCNET_CLI_DEBUG=1 for a traceback)",
              file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
