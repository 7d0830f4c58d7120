"""Benchmark: batched LPCNet synthesis throughput on one TPU chip.

Metric: real-time factor per chip = audio-seconds synthesized per wall-clock
second, across all concurrent streams. The reference C runs ~1x real time on
a CPU core (README.md:33, ~3 GFLOPS); BASELINE.md's driver target is >=300x
per chip. Prints one JSON line.

Env overrides: LPCNET_BENCH_BATCH (streams), LPCNET_BENCH_FRAMES (per call),
LPCNET_BENCH_ITERS, LPCNET_BENCH_DEVICES=all (shard streams across every
visible device and report aggregate RT + per-device scaling efficiency),
LPCNET_PROFILE_DIR (write a jax.profiler trace).
"""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.constants import NB_TOTAL_FEATURES
    from lpcnet_tpu.models import lpcnet
    from lpcnet_tpu.vocoder import Synthesizer

    batch = int(os.environ.get("LPCNET_BENCH_BATCH", "1024"))
    frames = int(os.environ.get("LPCNET_BENCH_FRAMES", "50"))
    iters = int(os.environ.get("LPCNET_BENCH_ITERS", "5"))
    backend = os.environ.get("LPCNET_BENCH_BACKEND", "auto")

    multi = os.environ.get("LPCNET_BENCH_DEVICES", "") == "all"
    profile_dir = os.environ.get("LPCNET_PROFILE_DIR")

    voc = Synthesizer(lpcnet.LPCNetConfig(), backend=backend)
    if multi:
        from lpcnet_tpu.parallel import mesh as pmesh
        n_dev = len(jax.devices())
        batch = batch * n_dev        # weak scaling: same per-chip load
        state, synth_fn = pmesh.shard_synthesis(voc, batch)
    else:
        state = voc.reset(batch, per_stream_rng=True)
        synth_fn = voc.synthesize

    rs = np.random.RandomState(0)
    feats = np.zeros((batch, frames, NB_TOTAL_FEATURES), np.float32)
    feats[..., :18] = rs.randn(batch, frames, 18) * 0.3
    feats[..., 18] = rs.uniform(-1, 1, (batch, frames))
    feats[..., 19] = rs.uniform(0, 1, (batch, frames))
    feats = jnp.asarray(feats)

    # compile + warmup
    state, pcm = synth_fn(state, feats)
    jax.block_until_ready(pcm)

    from lpcnet_tpu.utils import profiling
    with profiling.trace(profile_dir):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, pcm = synth_fn(state, feats)
        jax.block_until_ready(pcm)
        dt = time.perf_counter() - t0

    audio_seconds = iters * batch * frames * voc.cfg.frame_size / 16000.0
    rt_factor = audio_seconds / dt
    result = {
        "metric": "synthesis_rt_factor_per_chip",
        "value": round(rt_factor, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rt_factor / 1.0, 2),
    }
    if multi:
        n_dev = len(jax.devices())
        per_device = rt_factor / n_dev
        # the >=300x target is per chip: compare per-device, not aggregate
        result.update(metric="synthesis_rt_factor_total", devices=n_dev,
                      per_device=round(per_device, 2),
                      vs_baseline=round(per_device, 2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
