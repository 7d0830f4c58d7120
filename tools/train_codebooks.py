"""Train + evaluate the shipped codec codebooks (examples/codec_codebooks.bin).

Reproduces the reference's codebook production flow (download_model.sh
fetches ceps_codebooks.c trained by src/ceps_vq_train.c on a speech corpus)
on this framework: an augmented feature corpus is built from the in-repo
speech sample (tests/golden/speech.s16, 2 s) via the dump_data-style
augmentation pipeline (random biquads / gains / noise per pass,
native/data_prep.cpp), codebooks are trained with codec/vq_train.py on
TPU, and codec quality is measured on held-out material.

Usage:
    python tools/train_codebooks.py [--passes 500] [--out examples/codec_codebooks.bin]

Evaluation (printed + stored next to the artifact as JSON):
  * stage RMS: cepstrum RMS error after VQ stages 1/2/3 (the numbers
    ceps_vq_train.c prints at :497,513,529) on held-out features
  * end-to-end codec distortion: encode/decode round trip, RMS over the
    18-dim cepstra of all 4 frames vs the unquantized features
  * same metrics with the round-1 random placeholder codebooks, to show
    the margin
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = os.path.join(REPO, "tests", "golden", "speech.s16")


def build_corpus(pcm: np.ndarray, passes: int, seed0: int,
                 batch: int = 16) -> np.ndarray:
    """Features of `passes` differently-augmented copies of pcm,
    batch-extracted on device. Returns (passes*T, 36)."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu import data as D
    from lpcnet_tpu import features as F
    from lpcnet_tpu.constants import FRAME_SIZE
    from lpcnet_tpu.ops import dsp

    S = len(pcm) // (4 * FRAME_SIZE) * (4 * FRAME_SIZE)
    T = S // FRAME_SIZE

    @jax.jit
    def feats_of(x):
        z, _ = dsp.deemphasis_scan(x, jnp.zeros(x.shape[0]))
        st = F.init_state(x.shape[0])
        _, f, _ = F.compute_features(st, z)
        return f

    out = []
    for b0 in range(0, passes, batch):
        xs = []
        for p in range(b0, min(passes, b0 + batch)):
            x, _ = D.augment(pcm[:S], seed=seed0 + p)
            xs.append(x[:S])
        while len(xs) < batch:            # keep one jit shape
            xs.append(np.zeros(S, np.float32))
        f = np.asarray(feats_of(jnp.asarray(np.stack(xs))))
        n_real = min(passes, b0 + batch) - b0
        out.append(f[:n_real].reshape(-1, f.shape[-1]))
        print(f"  corpus: {min(passes, b0 + batch)}/{passes} passes",
              flush=True)
    return np.concatenate(out)


def stage_rms(feats: np.ndarray, cbs) -> dict:
    """Cepstrum RMS error after each VQ stage (ceps_vq_train.c prints
    these at :497,:513,:529; divides by the FULL ndim=18)."""
    import jax.numpy as jnp

    from lpcnet_tpu.codec.vq_train import _assign_chunked
    x = jnp.asarray(feats[:, 1:18])
    out = {}
    r = x
    for i, key in enumerate(("cb1", "cb2", "cb3"), 1):
        cb = jnp.asarray(cbs[key])
        r = r - cb[_assign_chunked(r, cb)]
        out[f"stage{i}_rms"] = float(jnp.sqrt(jnp.mean(
            jnp.sum(r * r, -1) / 18.0)))
    return out


def codec_rms(pcm: np.ndarray, cbs) -> float:
    """End-to-end codec distortion: encode/decode round trip on audio,
    RMS over all 4 frames' 18-dim cepstra vs unquantized features."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu import features as F
    from lpcnet_tpu.codec import codec
    from lpcnet_tpu.constants import NB_BANDS

    n_sf = len(pcm) // 640
    st = F.init_state(1)
    st, feats, sps = F.compute_features(
        st, jnp.asarray(pcm[None, :n_sf * 640].astype(np.float32)),
        quantize_pitch=True)
    cbs = {k: jnp.asarray(v) for k, v in cbs.items()}
    vq_mem = jnp.zeros((1, NB_BANDS))
    dec_mem = jnp.zeros((1, NB_BANDS))
    err, n = 0.0, 0
    enc = jax.jit(lambda f, m, sp: codec.encode_superframe(cbs, f, m, sp))
    dec = jax.jit(lambda b, m: codec.decode_packet(cbs, b, m))
    for g in range(n_sf):
        raw4 = feats[:, 4 * g:4 * (g + 1)]
        buf, _, vq_mem = enc(raw4, vq_mem, sps[g])
        rec4, dec_mem = dec(buf, dec_mem)
        d = np.asarray(rec4[0, :, :NB_BANDS] - raw4[0, :, :NB_BANDS])
        err += float((d * d).sum())
        n += 4 * NB_BANDS
    return float(np.sqrt(err / n))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=500)
    ap.add_argument("--features", default=None,
                    help="prebuilt 36-dim feature corpus (.f32, e.g. from "
                         "dump-data train) to train on instead of building "
                         "--passes augmentation passes here")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--final-iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(
        REPO, "examples", "codec_codebooks.bin"))
    args = ap.parse_args()

    import jax

    from lpcnet_tpu.codec import codec, vq_train
    from lpcnet_tpu.utils import weights_io

    pcm = np.fromfile(GOLDEN, np.int16).astype(np.float32)

    t0 = time.time()
    if args.features:
        train_feats = np.fromfile(args.features, np.float32).reshape(-1, 36)
        print(f"loaded corpus: {args.features} ({len(train_feats)} frames)")
    else:
        print(f"building corpus: {args.passes} augmentation passes ...")
        train_feats = build_corpus(pcm, args.passes, seed0=args.seed)
    # held-out: clean (unaugmented) pass + 8 unseen augmentation seeds
    held = build_corpus(pcm, 8, seed0=args.seed + 100003)
    print(f"corpus: train {train_feats.shape}, held-out {held.shape} "
          f"({time.time() - t0:.0f}s)")

    t0 = time.time()
    import jax.numpy as jnp
    cbs = vq_train.train_codec_codebooks(
        jax.random.PRNGKey(args.seed), jnp.asarray(train_feats),
        iters=args.iters, final_iters=args.final_iters)
    cbs = {k: np.asarray(v) for k, v in cbs.items()}
    print(f"trained in {time.time() - t0:.0f}s")

    report = {"passes": (args.features or args.passes),
              "train_frames": int(len(train_feats)),
              "held_frames": int(len(held))}
    report.update({f"held_{k}": v for k, v in stage_rms(held, cbs).items()})
    report["held_codec_rms"] = codec_rms(pcm, cbs)
    rand = {k: np.asarray(v) for k, v in codec.default_codebooks(
        jax.random.PRNGKey(0)).items()}
    report.update(
        {f"rand_{k}": v for k, v in stage_rms(held, rand).items()})
    report["rand_codec_rms"] = codec_rms(pcm, rand)

    weights_io.save_params(args.out, cbs)
    with open(args.out + ".json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
