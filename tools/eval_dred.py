"""Rate-distortion evaluation of a trained DRED RDO-VAE checkpoint.

For each lambda quantization level, encode held-out features, hard-quantize
the latents through the trained per-level quantizers, decode, and report:
  - feature RMS (cepstra+pitch+corr, 20 dims) of the round trip
  - sq_rate_metric bits/dframe of the rounded symbols (the entropy-model
    rate estimate the reference trains against, rdovae.py:190-207)
against a random-init baseline. Evaluates ALL 16 levels by default, on
every given source (e.g. the synthetic-voice holdout AND the real-speech
sample). Writes the full table as JSON (the artifact sidecar) and prints
it.

Usage: python tools/eval_dred.py ckpt.bin out.json \
           --source holdout=hold.f32 --source speech=sp.f32 \
           [--levels 0 .. 15] [--holdout-frames 4000]
"""
import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("out_json")
    ap.add_argument("--source", action="append", required=True,
                    help="name=features.f32 (repeatable)")
    ap.add_argument("--levels", type=int, nargs="+",
                    default=list(range(16)))
    ap.add_argument("--holdout-frames", type=int, default=4000,
                    help="use the TAIL this many frames of each source")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.cli import load_dred_model, read_features
    from lpcnet_tpu.constants import NB_FEATURES
    from lpcnet_tpu.models import rdovae as rv

    params, cfg = load_dred_model(args.ckpt)
    rnd = rv.init_params(jax.random.PRNGKey(99), cfg)

    def roundtrip(p, feats, level):
        z, state = rv.encode(p, feats, cfg)
        zd = z[:, 1::2]                            # dframe rate
        sd = rv.pvq_quantize(state[:, 1::2], cfg.pvq_k)
        qid = jnp.full(zd.shape[:2], level, jnp.int32)
        qp = rv.quant_params(p, qid, cfg)
        ze = zd * qp["scale"]
        dze = rv.apply_dead_zone(ze, qp["dead_zone"])
        sym = jnp.round(dze)
        bits = float(rv.sq_rate_metric(dze, qp["hard"]))
        zq = sym / qp["scale"]
        out = rv.decode(p, zq, sd[:, 0], cfg)
        n = min(out.shape[1], feats.shape[1])
        rms = float(jnp.sqrt(jnp.mean(
            (out[:, :n] - feats[:, :n]) ** 2)))
        return rms, bits

    table = {"cond_size": cfg.cond_size, "cond_size2": cfg.cond_size2,
             "holdout_frames": args.holdout_frames, "sources": {}}
    for spec in args.source:
        name, path = spec.split("=", 1)
        feats = read_features(path)[:, :NB_FEATURES]
        T = min(args.holdout_frames, feats.shape[0]) // 8 * 8
        fj = jnp.asarray(feats[-T:][None])         # tail = holdout
        levels = {}
        for lv in args.levels:
            rms, bits = roundtrip(params, fj, lv)
            rrms, rbits = roundtrip(rnd, fj, lv)
            levels[str(lv)] = {
                "rms": round(rms, 4), "bits_per_dframe": round(bits, 1),
                "rand_rms": round(rrms, 4),
                "rand_bits_per_dframe": round(rbits, 1)}
            print(f"{name} q{lv}: rms {rms:.4f} @ {bits:.1f} bits/dframe "
                  f"(random init: {rrms:.4f} @ {rbits:.1f})")
        b = [levels[str(lv)]["bits_per_dframe"] for lv in args.levels]
        levels["rate_span"] = round(max(b) / max(min(b), 1e-9), 2)
        table["sources"][name] = {"frames": int(T), "levels": levels}
    with open(args.out_json, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out_json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
