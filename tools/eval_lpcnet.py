"""Synthesis-quality evaluation of an LPCNet checkpoint on clean speech.

Reports the three numbers used in examples/README.md, against a
random-init baseline:
  - pitch-lag autocorrelation at the conditioned period per frame
    (periodicity at the right pitch; random init measures ~0.0)
  - log-spectral correlation vs the source audio
  - output RMS vs source RMS (random init clips near full scale)

Usage: python tools/eval_lpcnet.py ckpt.bin [speech.s16] [backend]
(backend: scan | pallas | auto; pallas is ~50x faster for long
evaluation utterances on TPU and stays in the same ±1-rounding class)
"""
import sys

import numpy as np


def synth_stats(params, cfg, feats, ref_pcm, nframes, backend="scan"):
    import jax.numpy as jnp  # noqa: F401  (jax initialized by caller)
    from lpcnet_tpu.vocoder import Synthesizer
    voc = Synthesizer(cfg, params=params, backend=backend)
    state = voc.reset(1)
    _, out = voc.synthesize(state, feats)
    x = np.asarray(out[0])
    ref = ref_pcm[:len(x)]
    periods = np.clip(
        np.floor(0.1 + 50 * np.asarray(feats[0, :, 18]) + 100),
        33, 255).astype(int)
    acs, sps = [], []
    for t in range(2, nframes - 2):
        seg = x[t * 160:(t + 1) * 160 + 256]
        lag = periods[t]
        if len(seg) > lag + 160 and seg[:160].std() > 1:
            a = np.corrcoef(seg[:160], seg[lag:lag + 160])[0, 1]
            if np.isfinite(a):
                acs.append(a)
        rseg = ref[t * 160:(t + 1) * 160]
        if rseg.std() > 1 and seg[:160].std() > 1:
            ls = np.log10(
                1e3 + np.abs(np.fft.rfft(seg[:160] * np.hanning(160))) ** 2)
            lr = np.log10(
                1e3 + np.abs(np.fft.rfft(rseg * np.hanning(160))) ** 2)
            sps.append(np.corrcoef(ls, lr)[0, 1])
    return float(np.mean(acs)), float(np.mean(sps)), float(x.std())


def main():
    import jax
    import jax.numpy as jnp
    from lpcnet_tpu import features as F
    from lpcnet_tpu.cli import load_model_params
    from lpcnet_tpu.models import lpcnet

    ckpt = sys.argv[1]
    speech = sys.argv[2] if len(sys.argv) > 2 else "tests/golden/speech.s16"
    backend = sys.argv[3] if len(sys.argv) > 3 else "scan"
    pcm = np.fromfile(speech, np.int16).astype(np.float32)
    T = len(pcm) // 160 // 4 * 4
    st = F.init_state(1)
    # fixed 256-frame chunks: compute_features unrolls per-superframe
    # pitch work, so one whole-utterance call builds an enormous graph
    step = jax.jit(F.compute_features)
    parts = []
    CH = 256
    Tp = -(-T // CH) * CH
    x = np.zeros((1, Tp * 160), np.float32)
    x[0, :T * 160] = pcm[:T * 160]
    for t0 in range(0, Tp, CH):
        st, f, _ = step(st, jnp.asarray(x[:, t0 * 160:(t0 + CH) * 160]))
        parts.append(np.asarray(f))
    feats = jnp.asarray(np.concatenate(parts, axis=1)[:, :T])

    cfg = lpcnet.LPCNetConfig()
    params = load_model_params(ckpt, lambda k: lpcnet.init_params(k, cfg))
    for name, p in (
            (f"trained ({ckpt})", params),
            ("random init", lpcnet.init_params(jax.random.PRNGKey(0), cfg))):
        ac, sp, rms = synth_stats(p, cfg, feats, pcm, T, backend=backend)
        print(f"{name}: pitch-lag autocorr {ac:+.3f}  "
              f"log-spec corr {sp:.3f}  rms {rms:.0f} "
              f"(ref rms {pcm[:T * 160].std():.0f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
