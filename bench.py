"""Benchmark: batched LPCNet pipeline throughput on one TPU chip.

Headline metric (always printed, LAST, one JSON line): real-time factor
per chip for synthesis = audio-seconds synthesized per wall-clock second
across all concurrent streams. The reference C runs ~1x real time on a
CPU core (README.md:33, ~3 GFLOPS); BASELINE.md's driver target is >=300x
per chip.

Per-stage benchmarks (printed by default, one JSON line per stage,
before the headline; LPCNET_BENCH_STAGES=none skips them): features,
encode, decode, plc_step, dred_encode, dred_decode, train_step — each
reported as a real-time factor (audio seconds processed per second) or
steps/s for training, plus an MFU estimate for the synthesis sample
kernel.

Env overrides: LPCNET_BENCH_BATCH (streams), LPCNET_BENCH_FRAMES (per
call), LPCNET_BENCH_ITERS, LPCNET_BENCH_DEVICES=all (shard streams across
every visible device and report aggregate RT + per-device scaling
efficiency), LPCNET_BENCH_REAL_FEATURES=1 (synthesize from real speech
features instead of random), LPCNET_PROFILE_DIR (jax.profiler trace).
"""
import json
import os
import time

import numpy as np

FRAME_SIZE = 160
GOLDEN_SPEECH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "golden", "speech.s16")


def _timeit(fn, iters):
    import jax
    jax.block_until_ready(fn())          # compile + warmup
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _speech_features(batch, frames):
    """Real-speech features tiled to the bench batch."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu import features as F
    pcm = np.fromfile(GOLDEN_SPEECH, np.int16).astype(np.float32)
    # superframe mode needs whole superframes (T % 4 == 0)
    T = min(frames, len(pcm) // FRAME_SIZE) // 4 * 4
    st = F.init_state(1)
    _, feats, _ = jax.jit(F.compute_features)(
        st, jnp.asarray(pcm[None, :T * FRAME_SIZE]))
    reps = (frames + T - 1) // T
    out = jnp.tile(feats, (batch, reps, 1))[:, :frames]
    return out


def _random_features(batch, frames):
    import jax.numpy as jnp

    from lpcnet_tpu.constants import NB_TOTAL_FEATURES
    rs = np.random.RandomState(0)
    feats = np.zeros((batch, frames, NB_TOTAL_FEATURES), np.float32)
    feats[..., :18] = rs.randn(batch, frames, 18) * 0.3
    feats[..., 18] = rs.uniform(-1, 1, (batch, frames))
    feats[..., 19] = rs.uniform(0, 1, (batch, frames))
    return jnp.asarray(feats)


def _rt(result_name, audio_seconds, dt, extra=None):
    rt = audio_seconds / dt
    d = {"metric": result_name, "value": round(rt, 2), "unit": "x_realtime",
         "vs_baseline": round(rt, 2)}
    if extra:
        d.update(extra)
    return d


# --------------------------------------------------------------- stages

def bench_features(batch=128, frames=64, iters=5):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu import features as F
    rs = np.random.RandomState(1)
    pcm = jnp.asarray(rs.randn(batch, frames * FRAME_SIZE)
                      .astype(np.float32) * 3000)
    state = F.init_state(batch)
    fn = jax.jit(lambda s, x: F.compute_features(s, x))
    dt = _timeit(lambda: fn(state, pcm)[1], iters)
    return _rt("features_rt_factor", batch * frames * FRAME_SIZE / 16000.0,
               dt, {"batch": batch})


def bench_codec(batch=128, n_sf=16, iters=5):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu import features as F
    from lpcnet_tpu.codec import codec
    from lpcnet_tpu.constants import NB_BANDS
    from lpcnet_tpu.utils import weights_io
    from lpcnet_tpu.cli import DEFAULT_CODEBOOKS
    if os.path.exists(DEFAULT_CODEBOOKS):
        cbs = {k: jnp.asarray(v) for k, v in
               weights_io.load_params(DEFAULT_CODEBOOKS).items()}
    else:
        cbs = codec.default_codebooks(jax.random.PRNGKey(0))
    rs = np.random.RandomState(2)
    pcm = jnp.asarray(rs.randn(batch, n_sf * 4 * FRAME_SIZE)
                      .astype(np.float32) * 3000)
    state = F.init_state(batch)
    state, feats, sps = jax.jit(
        lambda s, x: F.compute_features(s, x, quantize_pitch=True))(state,
                                                                    pcm)
    vq_mem = jnp.zeros((batch, NB_BANDS))
    sp_stack = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *sps)
    enc = jax.jit(lambda f, m, sp: codec.encode_superframes(cbs, f, m, sp))
    dt_enc = _timeit(lambda: enc(feats, vq_mem, sp_stack)[0], iters)
    bufs = enc(feats, vq_mem, sp_stack)[0]
    dec = jax.jit(lambda b, m: codec.decode_packets(cbs, b, m))
    dt_dec = _timeit(
        lambda: dec(bufs, jnp.zeros((batch, NB_BANDS)))[0], iters)
    audio = batch * n_sf * 4 * FRAME_SIZE / 16000.0
    return [_rt("encode_rt_factor", audio, dt_enc, {"batch": batch}),
            _rt("decode_feat_rt_factor", audio, dt_dec, {"batch": batch})]


def bench_plc(batch=1024, frames=8, iters=3):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet, plc as pm
    from lpcnet_tpu.plc import PLCEngine
    cfg = lpcnet.LPCNetConfig()
    eng = PLCEngine(lpcnet.init_params(jax.random.PRNGKey(0), cfg),
                    pm.init_params(jax.random.PRNGKey(1)), cfg)
    state = eng.init_state(batch)
    rs = np.random.RandomState(3)
    pcm = jnp.asarray(rs.randn(batch, frames * FRAME_SIZE)
                      .astype(np.float32) * 3000)
    lost = jnp.asarray(rs.uniform(size=(batch, frames)) < 0.2)

    dt = _timeit(lambda: eng.run(state, pcm, lost)[1], iters)
    return _rt("plc_step_rt_factor", batch * frames * FRAME_SIZE / 16000.0,
               dt, {"batch": batch})


def bench_dred(batch=64, frames=64, iters=5):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.dred import DREDCodec
    from lpcnet_tpu.models import rdovae as rv
    params = rv.init_params(jax.random.PRNGKey(2), rv.RDOVAEConfig())
    dc = DREDCodec(params)
    rs = np.random.RandomState(4)
    feats = jnp.asarray(rs.randn(batch, frames, 20).astype(np.float32) * .3)
    enc = jax.jit(dc.encode)
    dt_enc = _timeit(lambda: enc(feats)[0], iters)
    zd, sd = enc(feats)
    sym, qid = dc.quantize_payload(zd)
    dec = jax.jit(lambda s, q, st: dc.decode(s, q, st))
    dt_dec = _timeit(lambda: dec(sym, qid, sd[:, 0]), iters)
    audio = batch * frames * FRAME_SIZE / 16000.0
    return [_rt("dred_encode_rt_factor", audio, dt_enc, {"batch": batch}),
            _rt("dred_decode_rt_factor", audio, dt_dec, {"batch": batch})]


def bench_train(batch=64, iters=5):
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet
    from lpcnet_tpu.training import lpcnet_task
    cfg = lpcnet.LPCNetConfig()
    params = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
    opt = lpcnet_task.make_optimizer()
    opt_state = opt.init(params)
    rs = np.random.RandomState(5)
    T = 15
    batch_d = {
        "sig_in": jnp.asarray(rs.randn(batch, T * FRAME_SIZE)
                              .astype(np.float32) * 3000),
        "sig_out": jnp.asarray(rs.randn(batch, T * FRAME_SIZE)
                               .astype(np.float32) * 3000),
        "features": jnp.asarray(rs.randn(batch, T + 4, 20)
                                .astype(np.float32) * .3),
        "periods": jnp.asarray(rs.randint(33, 255, (batch, T + 4)),
                               jnp.int32),
        "lpc": jnp.asarray(rs.randn(batch, T, 16).astype(np.float32) * .1),
    }
    rng = jax.random.PRNGKey(9)

    def run():
        p, o, m = lpcnet_task.train_step(params, opt_state, batch_d, rng,
                                         cfg, opt)
        return m["loss"]

    dt = _timeit(run, iters)
    samples_s = batch * T * FRAME_SIZE / dt
    return {"metric": "train_step_samples_per_s",
            "value": round(samples_s, 0), "unit": "samples/s",
            "vs_baseline": round(1.0 / dt, 3), "batch": batch,
            "steps_per_s": round(1.0 / dt, 3)}


def bench_synthesis():
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet
    from lpcnet_tpu.vocoder import Synthesizer

    batch = int(os.environ.get("LPCNET_BENCH_BATCH", "1024"))
    frames = int(os.environ.get("LPCNET_BENCH_FRAMES", "50"))
    iters = int(os.environ.get("LPCNET_BENCH_ITERS", "5"))
    backend = os.environ.get("LPCNET_BENCH_BACKEND", "auto")
    multi = os.environ.get("LPCNET_BENCH_DEVICES", "") == "all"
    profile_dir = os.environ.get("LPCNET_PROFILE_DIR")
    real_feats = os.environ.get("LPCNET_BENCH_REAL_FEATURES", "") == "1"

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    if not profile_dir and on_tpu and not multi:
        # always trace the timed loop on TPU so the utilization lines
        # below are measured from THIS run's trace, not a stale one
        import tempfile
        profile_dir = tempfile.mkdtemp(prefix="lpcnet_bench_trace_")

    voc = Synthesizer(lpcnet.LPCNetConfig(), backend=backend)
    if multi:
        from lpcnet_tpu.parallel import mesh as pmesh
        n_dev = len(jax.devices())
        batch = batch * n_dev        # weak scaling: same per-chip load
        state, synth_fn = pmesh.shard_synthesis(voc, batch)
    else:
        state = voc.reset(batch, per_stream_rng=True)
        synth_fn = voc.synthesize

    feats = (_speech_features(batch, frames) if real_feats
             else _random_features(batch, frames))

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
    if real_feats:
        result["features"] = "speech"
    if multi:
        n_dev = len(jax.devices())
        per_device = rt_factor / n_dev
        # the >=300x target is per chip: compare per-device, not aggregate
        result.update(metric="synthesis_rt_factor_total", devices=n_dev,
                      per_device=round(per_device, 2),
                      vs_baseline=round(per_device, 2))
    util = None
    if profile_dir:
        from lpcnet_tpu.utils import profiling
        util = profiling.parse_trace_utilization(profile_dir)
    return result, rt_factor, util


def model_flops_estimate(rt_factor):
    """DERIVED sanity line (back-computed from the RT factor, not a
    measurement): model-only FLOPs — the arithmetic the C engine performs
    per sample (GRU-A recurrent 384x1152 dominates, nnet.c:410-448) —
    delivered per second across all streams, as a fraction of the v5e
    bf16 peak. Excludes the TPU kernel's one-hot embedding matmuls and
    the flat tree scorer, so it UNDERSTATES the kernel's arithmetic; the
    measured counterparts are sample_kernel_duty_cycle (trace) and
    kernel_arithmetic_tflops (counted kernel ops / trace-measured busy
    time)."""
    cfg_flops = 2 * (384 * 1152 + 384 * 48 + 16 * 48 + 2 * 16 * 256)
    model_flops = cfg_flops * rt_factor * 16000.0
    peak = 197e12
    return {"metric": "model_flops_estimate", "value":
            round(model_flops / 1e12, 3), "unit": "model_tflops_derived",
            "vs_baseline": round(100.0 * model_flops / peak, 3),
            "percent_bf16_peak": round(100.0 * model_flops / peak, 3)}


def kernel_utilization_lines(rt_factor, util):
    """TRACE-MEASURED utilization of the fused sample kernel (VERDICT r4
    item 8): duty cycle = fraction of the timed window the Mosaic kernel
    occupied the TPU core (top-level device-op occupancy from the
    profiler trace), and achieved arithmetic = the kernel's COUNTED
    per-sample ops (one-hot embed matmuls 3x256x1152 + GRU-A 384x1152 +
    GRU-B + dual-FC + flat scorer 256x256, sample_pallas.py) divided by
    the trace-measured kernel-busy time."""
    if not util:
        return []
    lines = [{"metric": "sample_kernel_duty_cycle",
              "value": round(100.0 * util["duty_cycle"], 2),
              "unit": "percent_wall_measured",
              "vs_baseline": round(100.0 * util["duty_cycle"], 2),
              "busy_us_by_class": util["busy_us_by_class"]}]
    kernel_flops_per_samplestream = 2 * (3 * 256 * 1152 + 384 * 1152
                                         + 384 * 48 + 16 * 48 + 16 * 512
                                         + 256 * 256)
    achieved = (kernel_flops_per_samplestream * rt_factor * 16000.0
                / max(util["duty_cycle"], 1e-6))
    peak = 197e12
    lines.append({"metric": "kernel_arithmetic_tflops",
                  "value": round(achieved / 1e12, 2),
                  "unit": "tflops_counted_over_measured_busy",
                  "vs_baseline": round(100.0 * achieved / peak, 2),
                  "percent_bf16_peak": round(100.0 * achieved / peak, 2),
                  "note": "dense-equivalent count; one-hot matmuls "
                          "counted at full density"})
    return lines


def bench_latency(iters=200):
    """Single-stream (B=1) and small-batch (B=8) per-frame synthesis
    latency vs the reference's defining operating point: ONE stream
    synthesized inside the 10-ms frame budget on a CPU core
    (/root/reference/README.md:33). Reports per-frame wall latency in ms
    for one 160-sample frame per call (the streaming contract,
    lpcnet_synthesize include/lpcnet.h:188), both kernel backends.
    vs_baseline = 10 ms / latency (x headroom inside the budget)."""
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.models import lpcnet
    from lpcnet_tpu.vocoder import Synthesizer

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    out = []
    rs = np.random.RandomState(7)
    for backend in (("pallas", "scan") if on_tpu else ("scan",)):
        voc = Synthesizer(lpcnet.LPCNetConfig(), backend=backend)
        for batch in (1, 8):
            feats = np.zeros((batch, 1, 36), np.float32)
            feats[..., :18] = rs.randn(batch, 1, 18) * 0.3
            feats[..., 18] = 0.2
            feats[..., 19] = 0.5
            feats = jnp.asarray(feats)
            state = voc.reset(batch, per_stream_rng=True)
            state, pcm = voc.synthesize(state, feats)   # compile
            jax.block_until_ready(pcm)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, pcm = voc.synthesize(state, feats)
            jax.block_until_ready(pcm)
            ms = (time.perf_counter() - t0) / iters * 1000.0
            out.append({
                "metric": f"frame_latency_b{batch}_{backend}_ms",
                "value": round(ms, 3), "unit": "ms_per_10ms_frame",
                "vs_baseline": round(10.0 / ms, 2), "batch": batch,
                "real_time": bool(ms < 10.0)})
    return out


def bench_verify():
    """On-device verification of the compiled Pallas kernels vs their
    oracles (lpcnet_tpu/verify.py). Raises on any gate failure — a
    Mosaic miscompile at the shipped config is a release blocker."""
    from lpcnet_tpu import verify
    report = verify.verify_on_device()
    return verify.summary_line(report)


def main(argv=None):
    import sys
    argv = sys.argv[1:] if argv is None else argv
    if "--verify" in argv:
        print(json.dumps(bench_verify()))
        return
    # Per-stage lines print by default so every recorded bench run is
    # self-evidencing (set LPCNET_BENCH_STAGES=none to skip them; they cost
    # seconds). The synthesis headline stays the LAST line for the parser.
    stages = os.environ.get("LPCNET_BENCH_STAGES", "all") != "none"
    if stages:
        for r in ([bench_features()] + bench_codec() + [bench_plc()]
                  + bench_dred() + [bench_train()] + bench_latency()):
            print(json.dumps(r), flush=True)
    # compiled-kernel verification runs by default on TPU (skip with
    # LPCNET_BENCH_VERIFY=0): every recorded bench is also a correctness
    # proof of the exact compiled path it timed
    import jax
    if (os.environ.get("LPCNET_BENCH_VERIFY", "1") != "0"
            and jax.devices()[0].platform in ("tpu", "axon")):
        print(json.dumps(bench_verify()), flush=True)
    result, rt, util = bench_synthesis()
    if stages:
        print(json.dumps(model_flops_estimate(rt)), flush=True)
        for line in kernel_utilization_lines(rt, util):
            print(json.dumps(line), flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
