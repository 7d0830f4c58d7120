"""Synthetic multi-VOICE speech corpus generator (formant synthesis).

Round-3 ablations showed corpus DIVERSITY, not size, is the binding
quality constraint for the shipped artifacts: the environment has one
2-second single-speaker sample (tests/golden/speech.s16), and augmenting
it harder (speed resampling [0.7, 1.4]) measurably HURT codebook quality
(examples/README.md). This tool manufactures diversity instead: N
distinct "voices" via classic source-filter (Klatt-style cascade formant)
synthesis — per-voice fundamental range, vocal-tract length (formant
scale), breathiness, speaking rate and per-utterance prosody — producing
speech-like material whose features exercise the same ranges real speech
does (f0 62..480 Hz inside the pitch tracker's 33..255-sample lag range,
18-band cepstra with vowel-like formant structure, voiced/unvoiced
alternation, silences).

This replaces the corpus the reference expects its users to provide
(README.md:104-110 points at multi-hour speech corpora; download_model.sh
ships models trained on them) — nothing here is derived from reference
code; the vowel formant targets are textbook Peterson–Barney values.

Usage:
    python tools/make_voices.py out_dir --voices 14 --holdout 2 \
        --seconds 90 --seed 0

Writes out_dir/voice_NN.s16 (16 kHz mono int16) per voice plus
out_dir/manifest.json describing the split (the last --holdout voices are
the held-out evaluation set, never to be used for training).
"""
import argparse
import json
import os
import sys

import numpy as np
from scipy.signal import lfilter

FS = 16000
HOP = 160                      # 10-ms parameter update hop

# Peterson–Barney-style vowel formant targets (Hz), male reference tract;
# scaled per voice by tract_scale.
VOWELS = {
    "a":  (730, 1090, 2440),
    "ae": (660, 1720, 2410),
    "e":  (530, 1840, 2480),
    "i":  (270, 2290, 3010),
    "o":  (570,  840, 2410),
    "u":  (300,  870, 2240),
    "er": (490, 1350, 1690),
    "uh": (520, 1190, 2390),
}
VOWEL_LIST = list(VOWELS.values())
BW = (80.0, 100.0, 140.0, 180.0)    # formant bandwidths
F4 = 3600.0


def make_voice(seed: int) -> dict:
    """Draw one voice's parameter set."""
    rng = np.random.RandomState(seed)
    # log-uniform f0 over male..child ranges
    f0 = float(np.exp(rng.uniform(np.log(85.0), np.log(310.0))))
    # shorter tracts (higher formants) loosely correlate with higher f0
    tract = float(rng.uniform(0.85, 1.15) * (f0 / 150.0) ** 0.10)
    return {
        "f0_base": f0,
        "f0_sd": float(rng.uniform(0.08, 0.22)),        # lognormal accent sd
        "tract_scale": tract,
        "breathiness": float(rng.uniform(0.01, 0.10)),
        "rate": float(rng.uniform(3.0, 6.5)),           # syllables / s
        "jitter": float(rng.uniform(0.004, 0.02)),      # per-period f0 noise
        "tilt_lp": float(rng.uniform(0.7, 0.93)),       # source tilt pole
        "pause_p": float(rng.uniform(0.10, 0.22)),
        "fric_p": float(rng.uniform(0.10, 0.22)),
    }


def _resonator_coeffs(f, bw):
    """Klatt-style two-pole resonator: unity gain at DC (b0 = 1+a1+a2),
    so a CASCADE passes the source spectrum and each formant adds its
    resonance peak on top — the classic cascade-synthesizer convention."""
    r = np.exp(-np.pi * bw / FS)
    th = 2.0 * np.pi * np.clip(f, 60.0, 7600.0) / FS
    a1 = -2.0 * r * np.cos(th)
    a2 = r * r
    b0 = 1.0 + a1 + a2
    return b0, a1, a2


def synth_voice(voice: dict, seconds: float, seed: int) -> np.ndarray:
    """Synthesize one voice: returns int16-range float32 samples."""
    rng = np.random.RandomState(seed ^ 0xBEEF)
    nhop = int(seconds * FS) // HOP
    n = nhop * HOP

    # ---------------- per-hop parameter tracks from a syllable process
    f0_t = np.zeros(nhop)
    voiced_t = np.zeros(nhop)
    noise_t = np.zeros(nhop)
    formants_t = np.zeros((nhop, 3))
    amp_t = np.zeros(nhop)
    fricf_t = np.full(nhop, 3500.0)

    t = 0
    phrase_left = 0
    f0_phrase = voice["f0_base"]
    cur_vowel = np.array(VOWEL_LIST[rng.randint(len(VOWEL_LIST))],
                         float)
    while t < nhop:
        if phrase_left <= 0:                 # new phrase: f0 reset + decline
            phrase_left = rng.randint(150, 450)          # 1.5-4.5 s
            f0_phrase = voice["f0_base"] * np.exp(
                rng.normal(0.0, voice["f0_sd"]))
        u = rng.rand()
        if u < voice["pause_p"]:
            dur = rng.randint(10, 45)                    # 100-450 ms pause
            t2 = min(nhop, t + dur)
            # tracks stay zero (silence)
        elif u < voice["pause_p"] + voice["fric_p"]:
            dur = rng.randint(6, 16)                     # 60-160 ms fricative
            t2 = min(nhop, t + dur)
            noise_t[t:t2] = rng.uniform(0.15, 0.5)
            fricf_t[t:t2] = rng.uniform(2200.0, 6200.0)
            amp_t[t:t2] = rng.uniform(0.4, 0.9)
        else:                                            # voiced syllable
            dur = max(6, int(100.0 / voice["rate"]
                             * rng.uniform(0.6, 1.5)))
            t2 = min(nhop, t + dur)
            tgt = np.array(VOWEL_LIST[rng.randint(len(VOWEL_LIST))],
                           float) * voice["tract_scale"]
            # accent contour: rise-fall in log f0, phrase declination
            x = np.linspace(0.0, 1.0, t2 - t)
            acc = rng.uniform(-0.15, 0.3) * np.sin(np.pi * x)
            decl = -0.10 * (t - (t - phrase_left)) / 450.0
            f0_t[t:t2] = f0_phrase * np.exp(acc + decl) \
                * np.exp(rng.normal(0.0, 0.01))
            voiced_t[t:t2] = 1.0
            # formant glide from the previous vowel into this one
            g = np.minimum(1.0, x * rng.uniform(1.5, 4.0))[:, None]
            formants_t[t:t2] = (1.0 - g) * cur_vowel[None, :] + g * tgt
            cur_vowel = tgt
            amp_t[t:t2] = rng.uniform(0.5, 1.0) * np.minimum(
                1.0, np.minimum(x, 1.0 - x) * 6.0 + 0.35)
            noise_t[t:t2] = voice["breathiness"]
        phrase_left -= (t2 - t)
        t = t2

    # smooth every track over ~30 ms so hops never step discontinuously
    k = np.ones(3) / 3.0
    def smooth(a):
        if a.ndim == 1:
            return np.convolve(a, k, mode="same")
        return np.stack([np.convolve(a[:, i], k, mode="same")
                         for i in range(a.shape[1])], axis=1)
    f0_t, voiced_t, noise_t, amp_t = map(smooth,
                                         (f0_t, voiced_t, noise_t, amp_t))
    formants_t = smooth(formants_t)

    # ---------------- sample-rate synthesis, hop by hop
    out = np.zeros(n, np.float32)
    phase = 0.0
    tilt_state = 0.0
    zi = [np.zeros(2) for _ in range(4)]      # cascade resonator states
    zfric = np.zeros(2)
    last_out = 0.0
    asp = rng.randn(n).astype(np.float64) * 0.5
    for h in range(nhop):
        s0 = h * HOP
        f0 = max(f0_t[h], 1.0)
        # glottal phase for the hop (vectorized accumulator + jitter)
        inc = f0 / FS * (1.0 + voice["jitter"] * rng.randn())
        ph = phase + np.cumsum(np.full(HOP, inc))
        phase = float(ph[-1] % 1.0)
        phf = ph % 1.0
        # Rosenberg-style glottal pulse: rise sin^2 (0..0.45), sharp fall
        rise = np.sin(np.pi * phf / 0.45 / 2.0) ** 2
        fall = np.cos(np.pi * (phf - 0.45) / 0.24 / 2.0)
        g = np.where(phf < 0.45, rise, np.where(phf < 0.69, fall, 0.0))
        # differentiated flow (radiation folded into the source)
        gd = np.diff(np.concatenate([[tilt_state], g]))
        tilt_state = g[-1]
        v = voiced_t[h]
        exc = v * gd * 12.0 + asp[s0:s0 + HOP] * (
            noise_t[h] + 0.03 * v)
        # spectral tilt one-pole lowpass (voice quality)
        b_t = [1.0 - voice["tilt_lp"] * 0.5]
        exc = lfilter(b_t, [1.0, -voice["tilt_lp"] * v * 0.6], exc)
        # cascade formant resonators F1..F3 + fixed F4
        fr = list(formants_t[h]) + [F4 * voice["tract_scale"]]
        y = exc
        for i in range(4):
            b0, a1, a2 = _resonator_coeffs(
                fr[i] if v > 0.01 else fricf_t[h] * (0.6 + 0.25 * i),
                BW[i])
            y, zi[i] = lfilter([b0], [1.0, a1, a2], y, zi=zi[i])
        out[s0:s0 + HOP] = y
    # gentle highpass to kill DC drift
    out = lfilter([1.0, -1.0], [1.0, -0.995], out.astype(np.float64))
    # energy shaping: the resonator cascade's broadband gain varies wildly
    # with vowel/f0 alignment, so impose the prosodic amplitude contour
    # directly — per-hop gain toward amp_t * 2800 rms, smoothed over 3
    # hops so levels never step discontinuously
    frames = out[:n].reshape(nhop, HOP)
    cur = np.sqrt((frames * frames).mean(axis=1) + 1e-6)
    target = amp_t * 2800.0
    gain = np.where(target > 20.0, target / np.maximum(cur, 1e-2), 0.0)
    gain = np.convolve(gain, np.ones(3) / 3.0, mode="same")
    out = (frames * gain[:, None]).reshape(-1)
    return np.clip(out, -30000, 30000).astype(np.float32)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out_dir")
    ap.add_argument("--voices", type=int, default=14,
                    help="training voices")
    ap.add_argument("--holdout", type=int, default=2,
                    help="additional held-out voices (never train on them)")
    ap.add_argument("--seconds", type=float, default=90.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = {"fs": FS, "seconds": args.seconds, "train": [], "holdout": [],
                "voices": {}}
    total = args.voices + args.holdout
    for v in range(total):
        voice = make_voice(args.seed * 1000 + v)
        pcm = synth_voice(voice, args.seconds, args.seed * 1000 + v)
        name = f"voice_{v:02d}.s16"
        pcm.astype(np.int16).tofile(os.path.join(args.out_dir, name))
        key = "train" if v < args.voices else "holdout"
        manifest[key].append(name)
        manifest["voices"][name] = voice
        print(f"{name}: f0 {voice['f0_base']:.0f} Hz, tract x"
              f"{voice['tract_scale']:.2f}, rate {voice['rate']:.1f} syl/s"
              f" [{key}]", file=sys.stderr)
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(os.path.join(args.out_dir, "manifest.json"))


if __name__ == "__main__":
    main()
