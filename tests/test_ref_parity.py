"""File-level golden parity vs the ACTUAL reference C feature extractor.

tests/golden/ref_feats.f32 was produced by the reference's own dump_data
binary (`./dump_data -test speech.s16 ref_feats.f32`), built from
/root/reference sources with model-data stubs AND the +-0.5 input dither
line stripped (tools/build_ref_dump_data.sh — the reference seeds that
dither from the PID, dump_data.c:142,272, making its output
nondeterministic; without it the binary is run-to-run deterministic and
the parity contract can be asserted at the SURVEY Phase 1 ~1e-5 class).

Measured on the golden speech file: pitch EXACT (integer path identical),
cepstra mean |diff| 2.1e-6 / max 2.0e-5, corr mean 9.0e-7, LPC mean
7.4e-7 — residuals are kiss_fft vs XLA rfft float rounding only.

Alignment note (documented divergence): the reference's read loop
processes each frame one iteration late — it assigns `x = tmp` (the
PREVIOUS fread) before reading the next frame (dump_data.c:215-216), and
tmp starts zero-filled (dump_data.c:129). So ref_feats[0] is the all-zeros
warm-up frame and ref_feats[i+1] corresponds to our features[i].
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import ref_build_skip

from lpcnet_tpu.constants import NB_TOTAL_FEATURES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    ref = np.fromfile(os.path.join(GOLDEN, "ref_feats.f32"),
                      np.float32).reshape(-1, NB_TOTAL_FEATURES)
    out = tmp_path_factory.mktemp("parity") / "our.f32"
    from lpcnet_tpu import cli
    rc = cli.main(["dump-data", "test",
                   os.path.join(GOLDEN, "speech.s16"), str(out)])
    assert rc == 0
    ours = np.fromfile(out, np.float32).reshape(-1, NB_TOTAL_FEATURES)
    n = min(len(ref) - 1, len(ours))
    return ref[1:1 + n], ours[:n]     # shift: ref[i+1] == ours[i]


class TestReferenceFeatureParity:
    def test_cepstra(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, :18] - ours[:, :18])
        assert d.mean() < 1e-5, d.mean()      # measured 2.1e-6
        assert d.max() < 1e-4, d.max()        # measured 2.0e-5

    def test_pitch_period_exact(self, pair):
        ref, ours = pair
        # integer pitch path: bit-identical on the golden file
        d = np.abs(ref[:, 18] - ours[:, 18])
        assert (d == 0).all(), (d != 0).sum()  # measured exactly 1.0

    def test_pitch_corr(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 19] - ours[:, 19])
        assert d.mean() < 1e-5, d.mean()      # measured 9.0e-7

    def test_lpc(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 20:] - ours[:, 20:])
        assert d.mean() < 1e-5, d.mean()      # measured 7.4e-7

    def test_warmup_frame_is_silence(self):
        ref = np.fromfile(os.path.join(GOLDEN, "ref_feats.f32"),
                          np.float32).reshape(-1, NB_TOTAL_FEATURES)
        # the reference's frame 0 comes from an all-zero buffer: c0 ~ -12
        assert ref[0, 0] < -8


class TestReferenceSingleFrameParity:
    """True frame-at-a-time streaming contract: the reference's PUBLIC
    lpcnet_compute_single_frame_features (include/lpcnet.h:146,
    lpcnet_enc.c:911-933) driven one 10-ms frame per call, vs our
    compute_features(mode='single') driven with T=1 per call.

    Measured on the golden speech file: pitch EXACT (integer path),
    cepstra mean 2.9e-7 / max 4.8e-6, corr mean 2.8e-7, LPC mean 6.3e-7."""

    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu import features as F
        tmp = tmp_path_factory.mktemp("singleframe")
        build = subprocess.run(
            ["bash", "tools/ref_feat/build.sh", "/root/reference",
             str(tmp)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        speech = os.path.join(GOLDEN, "speech.s16")
        r = subprocess.run([bin_path, speech, str(tmp / "ref.f32")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.f32",
                          np.float32).reshape(-1, NB_TOTAL_FEATURES)

        pcm = np.fromfile(speech, np.int16).astype(np.float32)
        T = len(pcm) // 160
        st = F.init_state(1)
        step = jax.jit(lambda s, x: F.compute_features(s, x, mode="single"))
        outs = []
        for t in range(T):
            st, f, _ = step(st, jnp.asarray(pcm[None, 160 * t:160 * (t + 1)]))
            outs.append(np.asarray(f[0, 0]))
        ours = np.stack(outs)
        n = min(len(ref), len(ours))
        return ref[:n], ours[:n]

    def test_cepstra(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, :18] - ours[:, :18])
        assert d.mean() < 1e-5, d.mean()      # measured 2.9e-7
        assert d.max() < 1e-4, d.max()        # measured 4.8e-6

    def test_pitch_period_exact(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 18] - ours[:, 18])
        assert (d == 0).all(), (d != 0).sum()  # measured exact

    def test_pitch_corr(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 19] - ours[:, 19])
        assert d.mean() < 1e-5, d.mean()      # measured 2.8e-7

    def test_lpc(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 20:] - ours[:, 20:])
        assert d.mean() < 1e-5, d.mean()      # measured 6.3e-7


class TestReferenceWaveformParity:
    """Waveform match vs the ACTUAL reference C synthesis engine
    (lpcnet.c + nnet.c, float path), with weights exported by
    utils/export_ref and matched KISS99 ("LPCNet" seed). Residual
    differences are +-1 rounding flips at floor(.5+x) boundaries from
    float-association order; the sample paths are otherwise identical."""

    @pytest.fixture(scope="class")
    def waveforms(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu import features as F
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import export_ref
        from lpcnet_tpu.vocoder import Synthesizer
        tmp = tmp_path_factory.mktemp("refsynth")
        build = subprocess.run(
            ["bash", "tools/ref_synth/build.sh", "/root/reference",
             str(tmp)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"reference build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]

        cfg = lpcnet.LPCNetConfig(approx=True)
        params = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        blob = tmp / "w.bin"
        export_ref.export_lpcnet_blob(
            jax.tree.map(np.asarray, params), cfg, str(blob))

        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16).astype(np.float32)
        T = min(80, len(pcm) // 160 // 4 * 4)
        st = F.init_state(1)
        st, feats, _ = F.compute_features(st, jnp.asarray(pcm[None,
                                                              :T * 160]))
        np.asarray(feats[0], np.float32).tofile(tmp / "f.f32")
        r = subprocess.run([bin_path, str(blob), str(tmp / "f.f32"),
                            str(tmp / "ref.pcm")], capture_output=True,
                           text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.pcm", np.int16)

        voc = Synthesizer(cfg, params=params, backend="scan")
        sstate = voc.reset_streaming(1)
        _, ours = voc.synthesize_streaming(sstate, feats)
        ours = np.asarray(ours[0]).astype(np.int16)
        n = min(len(ref), len(ours))
        return ref[:n].astype(int), ours[:n].astype(int)

    def test_exact_prefix(self, waveforms):
        ref, ours = waveforms
        d = np.abs(ref - ours)
        first = int(np.argmax(d > 0)) if (d > 0).any() else len(d)
        assert first >= 300, f"diverged at sample {first}"

    def test_exact_fraction(self, waveforms):
        ref, ours = waveforms
        frac = float((np.asarray(ref) == np.asarray(ours)).mean())
        assert frac > 0.95, frac              # measured 0.971

    def test_mean_error_is_subsample(self, waveforms):
        # with the portable (-U__SSE2__) reference build the residual is
        # pure +-1 rounding: mean|diff| ~0.03 on 16-bit samples
        ref, ours = waveforms
        d = np.abs(np.asarray(ref) - np.asarray(ours))
        assert d.mean() < 0.2, d.mean()       # measured 0.03

    def test_waveform_correlation(self, waveforms):
        ref, ours = waveforms
        corr = float(np.corrcoef(ref, ours)[0, 1])
        assert corr > 0.99999, corr           # measured 1.00000

    def test_differences_are_rounding_scale(self, waveforms):
        ref, ours = waveforms
        d = np.abs(np.asarray(ref) - np.asarray(ours))
        # the median nonzero difference is the +-1 rounding flip
        nz = d[d > 0]
        if nz.size:
            assert np.median(nz) <= 2, np.median(nz)


class TestPLCNetParity:
    """compute_plc_pred parity (lpcnet_plc.c:135-145): the reference
    nnet.c layer compute vs models/plc.py over 100 recurrent steps —
    measured max|diff| 1.6e-7 (1-ulp class)."""

    def test_predictions_match(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu.models import plc as pm
        from lpcnet_tpu.utils import export_ref
        build = subprocess.run(
            ["bash", "tools/ref_plc/build.sh", "/root/reference",
             str(tmp_path)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        params = pm.init_params(jax.random.PRNGKey(1))
        export_ref.export_plc_blob(
            jax.tree.map(np.asarray, params), str(tmp_path / "w.bin"))
        rs = np.random.RandomState(7)
        T = 100
        x = (rs.randn(T, 57) * 0.3).astype(np.float32)
        x[:, 56] = (rs.uniform(size=T) > 0.2)
        x.tofile(tmp_path / "in.f32")
        r = subprocess.run([bin_path, str(tmp_path / "w.bin"),
                            str(tmp_path / "in.f32"),
                            str(tmp_path / "out.f32")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp_path / "out.f32", np.float32).reshape(-1, 20)

        cfg = pm.PLCConfig(approx=True)
        st = pm.init_net_state(1, cfg)
        step = jax.jit(lambda s, xx: pm.step(params, s, xx, cfg))
        outs = []
        for t in range(T):
            st, o = step(st, jnp.asarray(x[None, t]))
            outs.append(np.asarray(o[0]))
        d = np.abs(ref - np.stack(outs))
        assert d.max() < 2e-6, d.max()    # measured 1.6e-7


class TestPLCEngineBehavior:
    """Full C PLC engine (lpcnet_plc.c causal, built by
    tools/ref_plc/build_engine.sh) vs our batched PLCEngine on the same
    loss trace and combined weight blob.

    Pass-through behavior matches the C sample-exactly. Concealed and
    blend frames differ by design (documented in plc.py: the C's
    PLC_SKIP_UPDATES skips per-sample AR resync on good frames and
    splits concealment 80/80 across old/new conditions; we always
    teacher-force and conceal the full frame) — with random weights the
    divergent AR states produce different, equally-valid concealment
    audio."""

    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu.models import lpcnet, plc as pm
        from lpcnet_tpu.plc import PLCEngine
        from lpcnet_tpu.utils import export_ref
        tmp = tmp_path_factory.mktemp("refplcengine")
        build = subprocess.run(
            ["bash", "tools/ref_plc/build_engine.sh", "/root/reference",
             str(tmp)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]

        cfg = lpcnet.LPCNetConfig(approx=True)
        lp = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        pp = pm.init_params(jax.random.PRNGKey(1))
        arrays = export_ref.export_lpcnet_arrays(
            jax.tree.map(np.asarray, lp), cfg)
        arrays.update(export_ref.export_plc_arrays(
            jax.tree.map(np.asarray, pp)))
        export_ref._write_blob(arrays, str(tmp / "w.bin"))

        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16)[:16 * 160]
        pcm.tofile(tmp / "in.pcm")
        flags = [0, 0, 0, 0, 1, 0, 0, 0]     # packet 4 -> frames 8,9 lost
        (tmp / "err.txt").write_text("\n".join(map(str, flags)))
        r = subprocess.run(
            [bin_path, "causal", str(tmp / "w.bin"), str(tmp / "err.txt"),
             str(tmp / "in.pcm"), str(tmp / "ref.pcm")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.pcm", np.int16).astype(int)

        engine = PLCEngine(lp, pp, cfg)
        state = engine.init_state(1)
        outs = []
        x = pcm.astype(np.float32)
        for t in range(16):
            lost = jnp.asarray([bool(flags[t // 2])])
            fr = jnp.asarray(x[None, t * 160:(t + 1) * 160])
            state, o = engine.step(state, fr, lost)
            outs.append(np.asarray(o[0]))
        ours = np.concatenate(outs).astype(int)
        return ref, ours, pcm.astype(int)

    def test_passthrough_frames_match_c_exactly(self, run):
        ref, ours, pcm = run
        good = list(range(0, 8)) + list(range(11, 16))
        for t in good:
            sl = slice(t * 160, (t + 1) * 160)
            np.testing.assert_array_equal(ref[sl], ours[sl],
                                          err_msg=f"frame {t}")
            np.testing.assert_array_equal(ref[sl], pcm[sl],
                                          err_msg=f"frame {t} vs input")

    def test_concealment_is_synthesized_in_both(self, run):
        ref, ours, pcm = run
        for t in (8, 9):
            sl = slice(t * 160, (t + 1) * 160)
            assert np.abs(ref[sl] - pcm[sl]).mean() > 100   # C concealed
            assert np.abs(ours[sl] - pcm[sl]).mean() > 100  # we concealed

    def test_blend_second_half_is_input(self, run):
        ref, ours, pcm = run
        sl = slice(10 * 160 + 80, 11 * 160)
        np.testing.assert_array_equal(ref[sl], pcm[sl])
        np.testing.assert_array_equal(ours[sl], pcm[sl])


class TestStrictPLCEngineParity:
    """StrictCausalPLCEngine (plc.py) vs the SAME compiled C engine:
    the strict mode reproduces the C's default semantics exactly
    (PLC_SKIP_UPDATES frozen sample state + delay-buffer catch-up,
    80-sample split conceal, blend cross-fade from a snapshot), so
    CONCEALED and BLEND frames land in the bit-exact class too — measured
    99.3% of all samples identical, max |diff| 1 (the +-1 floor(.5+x)
    rounding-flip class of the synthesis parity), corr 1.0000."""

    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu.models import lpcnet, plc as pm
        from lpcnet_tpu.plc import StrictCausalPLCEngine
        from lpcnet_tpu.utils import export_ref
        tmp = tmp_path_factory.mktemp("refplcstrict")
        build = subprocess.run(
            ["bash", "tools/ref_plc/build_engine.sh", "/root/reference",
             str(tmp)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]

        cfg = lpcnet.LPCNetConfig(approx=True)
        lp = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        pp = pm.init_params(jax.random.PRNGKey(1))
        arrays = export_ref.export_lpcnet_arrays(
            jax.tree.map(np.asarray, lp), cfg)
        arrays.update(export_ref.export_plc_arrays(
            jax.tree.map(np.asarray, pp)))
        export_ref._write_blob(arrays, str(tmp / "w.bin"))

        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16)[:24 * 160]
        pcm.tofile(tmp / "in.pcm")
        # one isolated loss + one double loss: exercises conceal,
        # repeated conceal, blend, and catch-up resync
        flags = [0, 0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 0]
        (tmp / "err.txt").write_text("\n".join(map(str, flags)))
        r = subprocess.run(
            [bin_path, "causal", str(tmp / "w.bin"), str(tmp / "err.txt"),
             str(tmp / "in.pcm"), str(tmp / "ref.pcm")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.pcm", np.int16).astype(int)

        engine = StrictCausalPLCEngine(lp, pp, cfg)
        state = engine.init_state(1)
        outs = []
        x = pcm.astype(np.float32)
        for t in range(24):
            lost = jnp.asarray([bool(flags[t // 2])])
            state, o = engine.step(
                state, jnp.asarray(x[None, t * 160:(t + 1) * 160]), lost)
            outs.append(np.asarray(o[0]))
        ours = np.concatenate(outs).astype(int)
        return ref, ours, flags

    def test_good_frames_bit_exact(self, run):
        ref, ours, flags = run
        for t in range(24):
            if not flags[t // 2]:
                sl = slice(t * 160, (t + 1) * 160)
                d = np.abs(ref[sl] - ours[sl])
                # blend frames may carry +-1 cross-fade rounding flips
                assert d.max() <= 1, (t, d.max())
                assert (d == 0).mean() > 0.95, (t, (d == 0).mean())

    def test_concealed_frames_bit_exact_class(self, run):
        ref, ours, flags = run
        for t in range(24):
            if flags[t // 2]:
                sl = slice(t * 160, (t + 1) * 160)
                d = np.abs(ref[sl] - ours[sl])
                assert d.max() <= 2, (t, d.max())
                assert (d == 0).mean() > 0.9, (t, (d == 0).mean())

    def test_overall_bit_exact_fraction(self, run):
        ref, ours, _ = run
        assert (ref == ours).mean() > 0.98, (ref == ours).mean()


class TestNonCausalPLCEngineParity:
    """NonCausalPLCEngine (both plain and remove_dc) vs the compiled C
    reference built with FEATURES_DELAY=0 (build_engine.sh noncausal),
    outputs demo-aligned (skip/extra 80, lpcnet_demo.c:226,245-248).

    Measured: ALL good frames (including post-loss blend recovery with its
    time-reversed cross-fade) bit-identical; concealed frames 98%+ exact
    with max |diff| 1. In dc mode the C's `pcm[i] += dc` re-add overflows
    int16 and wraps where we clip — compared wrap-aware, concealed frames
    are the same +-1 class (measured maxd 1, 99.4% exact)."""

    @pytest.fixture(scope="class", params=["noncausal", "noncausal_dc"])
    def run(self, request, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu.models import lpcnet, plc as pm
        from lpcnet_tpu.plc import NonCausalPLCEngine, PLCOptions
        from lpcnet_tpu.utils import export_ref
        mode = request.param
        tmp = tmp_path_factory.mktemp(f"refplc_{mode}")
        build = subprocess.run(
            ["bash", "tools/ref_plc/build_engine.sh", "/root/reference",
             str(tmp), "noncausal"], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]

        cfg = lpcnet.LPCNetConfig(approx=True, lookahead=0)
        lp = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        pp = pm.init_params(jax.random.PRNGKey(1))
        arrays = export_ref.export_lpcnet_arrays(
            jax.tree.map(np.asarray, lp), cfg)
        arrays.update(export_ref.export_plc_arrays(
            jax.tree.map(np.asarray, pp)))
        export_ref._write_blob(arrays, str(tmp / "w.bin"))

        # +300 DC offset exercises the dc tracking path
        pcm = (np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                           np.int16)[:16 * 160] + 300).clip(
            -32767, 32767).astype(np.int16)
        pcm.tofile(tmp / "in.pcm")
        flags = [0, 0, 0, 1, 0, 0, 0, 0]
        (tmp / "err.txt").write_text("\n".join(map(str, flags)))
        r = subprocess.run(
            [bin_path, mode, str(tmp / "w.bin"), str(tmp / "err.txt"),
             str(tmp / "in.pcm"), str(tmp / "ref.pcm")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.pcm", np.int16).astype(int)

        engine = NonCausalPLCEngine(
            lp, pp, cfg,
            options=PLCOptions(remove_dc=mode.endswith("dc")))
        state = engine.init_state(1)
        x = pcm.astype(np.float32)
        outs = []
        for t in range(16):
            lost = jnp.asarray([bool(flags[t // 2])])
            state, o = engine.step(
                state, jnp.asarray(x[None, t * 160:(t + 1) * 160]), lost)
            outs.append(np.asarray(o[0]))
        # demo alignment: drop the 80-sample delay, flush one conceal
        state, o = engine.step(state, jnp.zeros((1, 160)),
                               jnp.asarray([True]))
        outs.append(np.asarray(o[0, :80]))
        ours = np.concatenate(outs)[80:].astype(int)
        n = min(len(ref), len(ours))
        return ref[:n], ours[:n], flags

    @staticmethod
    def _wrap_diff(a, b):
        d = np.abs(a - b)
        return np.minimum(d, 65536 - d)   # C re-add wraps int16; we clip

    def test_good_frames_bit_exact(self, run):
        ref, ours, flags = run
        for t in range(len(ref) // 160):
            if t < 16 and not flags[t // 2]:
                sl = slice(t * 160, (t + 1) * 160)
                np.testing.assert_array_equal(ref[sl], ours[sl],
                                              err_msg=f"frame {t}")

    def test_concealed_frames_bit_exact_class(self, run):
        ref, ours, flags = run
        for t in range(len(ref) // 160):
            if t < 16 and flags[t // 2]:
                sl = slice(t * 160, (t + 1) * 160)
                d = self._wrap_diff(ref[sl], ours[sl])
                assert d.max() <= 2, (t, d.max())
                assert (d == 0).mean() > 0.85, (t, (d == 0).mean())

    def test_overall(self, run):
        ref, ours, _ = run
        d = self._wrap_diff(ref, ours)
        assert (d == 0).mean() > 0.98, (d == 0).mean()


class TestDotProdWaveformParity:
    """The reference's DEPLOYED quantized arithmetic (int8 DOT_PROD,
    vec.h:198-340) vs kernels/sample_dotprod — BOTH flavors (signed
    portable C, and unsigned+SU-bias as on AVX2/NEON), full sample-rate
    engine: quantized GRU-A/GRU-B, tree sampler, KISS99, mu-law, deemph.

    The reference side is tools/ref_dotprod/tail_main.c: the tail loop
    (lpcnet.c:235-271 + run_sample_network lpcnet.c:146-167) driven by the
    reference's own nnet.c/vec.h/kiss99.c with per-frame conditions
    INJECTED from a file. Injection is what makes the strict class
    reachable: through the full binary, ulp-level float-association
    differences in the frame network get amplified by the activation
    quantizer's floor(.5+127x) boundaries into trajectory forks (measured
    ~85% sample-identical, corr 0.992 — see TestInt8Deployment); with both
    engines consuming bit-identical conditions the quantized sample
    network itself is provably exact.

    Measured: 100.0% bit-identical over 12800 samples (80 frames of golden
    speech conditions), BOTH flavors, maxd 0."""

    @pytest.fixture(scope="class", params=["signed", "su"])
    def waveforms(self, request, tmp_path_factory):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu import features as F
        from lpcnet_tpu.kernels import sample_dotprod as sd
        from lpcnet_tpu.kernels import sample_scan
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import export_ref
        su = request.param == "su"
        tmp = tmp_path_factory.mktemp(f"dotprod_{request.param}")
        build = subprocess.run(
            ["bash", "tools/ref_dotprod/build.sh", "/root/reference",
             str(tmp), "su" if su else ""], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]   # ref_tail

        cfg = lpcnet.LPCNetConfig(approx=True)
        params = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        arrays = export_ref.export_lpcnet_arrays(
            jax.tree.map(np.asarray, params), cfg, quantize=True)
        arrays = dict(arrays)
        # our cond_b already includes bi_b (frame_conditions adds it);
        # zero the blob's input-half GRU-B bias so the C's
        # `bias + condition` (compute_gruB nnet.c:348-353) consumes the
        # injected value exactly once
        nb3 = 3 * cfg.gru_b_units
        gb = arrays["gru_b_bias"].copy()
        gb[:nb3] = 0
        arrays["gru_b_bias"] = gb
        if su:
            # su builds read subias on the input half; recompute for the
            # zeroed bias: subias' = 0 - sum(AQin)/128 (exact in f32)
            wi_b = np.asarray(params["gru_b"]["wi"],
                              np.float32)[:cfg.gru_a_units]
            aq = np.clip(np.round(wi_b * 128.0), -128, 127)
            gs = arrays["gru_b_subias"].copy()
            gs[:nb3] = -(aq.sum(axis=0) / 128.0)
            arrays["gru_b_subias"] = gs
        export_ref._write_blob(arrays, str(tmp / "wq.bin"))

        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16).astype(np.float32)
        T = min(80, len(pcm) // 160 // 4 * 4)
        st = F.init_state(1)
        st, feats, _ = F.compute_features(st,
                                          jnp.asarray(pcm[None, :T * 160]))
        tables = lpcnet.precompute_sample_tables(params, cfg)
        conds = lpcnet.frame_conditions(params, feats, cfg, tables)
        ca = np.asarray(conds["cond_a"][0], np.float32)
        cb = np.asarray(conds["cond_b"][0], np.float32)
        lp = np.asarray(conds["lpc"][0], np.float32)
        with open(tmp / "conds.f32", "wb") as f:
            for t in range(T):
                ca[t].tofile(f)
                cb[t].tofile(f)
                lp[t].tofile(f)
        r = subprocess.run([bin_path, str(tmp / "wq.bin"),
                            str(tmp / "conds.f32"), str(tmp / "ref.pcm")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp / "ref.pcm", np.int16).astype(int)

        # both engines must consume bit-identical folded embedding tables:
        # numpy (export) and XLA fold E @ W with different associations
        tables = dict(tables)
        tables["tbl_sig"] = jnp.asarray(arrays["gru_a_embed_sig_weights"])
        tables["tbl_pred"] = jnp.asarray(arrays["gru_a_embed_pred_weights"])
        tables["tbl_exc"] = jnp.asarray(arrays["gru_a_embed_exc_weights"])
        q = sd.quantize_tables(tables, cfg, su_bias=su)
        state = sample_scan.init_state(1, cfg)
        state, ours = jax.jit(
            lambda s, c: sd.synthesize_frames_dotprod(tables, q, s, c, cfg)
        )(state, conds)
        ours = np.asarray(ours[0]).astype(int)
        n = min(len(ref), len(ours))
        return ref[:n], ours[:n]

    def test_bit_identical(self, waveforms):
        ref, ours = waveforms
        d = np.abs(ref - ours)
        assert d.max() == 0, \
            (d.max(), float((d == 0).mean()), int(np.argmax(d > 0)))


class TestInt8Deployment:
    """Stock reference builds default to the int8 DOT_PROD path
    (vec.h:48-49) and reject float-only weight blobs (gru_init size checks
    expect qweight records). export_lpcnet_blob(quantize=True) emits the
    int8 flavor (scale-128 qweights in the 8x4 traversal order + SU-bias
    compensation, mirroring dump_lpcnet.py:137-192). Measured with the
    speech checkpoint: the DOT_PROD binary loads the blob and synthesizes
    at pitch-lag autocorr +0.88 (float build: +0.90).

    This test is deliberately distributional: through the FULL binary the
    frame network's float-association ulps (XLA matmuls vs sgemv_accum16)
    get amplified by the activation quantizer into AR trajectory forks
    (measured 85% sample-identical, corr 0.995, backend='dotprod' vs the
    stock binary). The strict +-0 proof of the quantized sample engine
    itself is TestDotProdWaveformParity above (injected conditions,
    measured 100.0% bit-identical, both flavors)."""

    def test_stock_build_loads_and_synthesizes(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu import features as F
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import export_ref, weights_io
        build = subprocess.run(
            ["bash", "tools/ref_synth/build.sh", "/root/reference",
             str(tmp_path), "dotprod"], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        params = weights_io.load_params(os.path.join(
            os.path.dirname(__file__), os.pardir, "examples",
            "speech_lpcnet_params.bin"))
        cfg = lpcnet.LPCNetConfig()
        export_ref.export_lpcnet_blob(params, cfg,
                                      str(tmp_path / "wq.bin"),
                                      quantize=True)
        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16).astype(np.float32)
        T = 40
        st = F.init_state(1)
        st, feats, _ = F.compute_features(st,
                                          jnp.asarray(pcm[None, :T * 160]))
        np.asarray(feats[0], np.float32).tofile(tmp_path / "f.f32")
        r = subprocess.run([bin_path, str(tmp_path / "wq.bin"),
                            str(tmp_path / "f.f32"),
                            str(tmp_path / "out.pcm")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr    # blob accepted, not rejected
        out = np.fromfile(tmp_path / "out.pcm", np.int16).astype(float)
        periods = np.clip(np.floor(
            0.1 + 50 * np.asarray(feats[0, :, 18]) + 100), 33, 255
        ).astype(int)
        acs = []
        for t in range(4, T - 2):
            seg = out[t * 160:(t + 1) * 160 + 256]
            lag = periods[t]
            if len(seg) > lag + 160 and seg[:160].std() > 1:
                a = np.corrcoef(seg[:160], seg[lag:lag + 160])[0, 1]
                if np.isfinite(a):
                    acs.append(a)
        assert np.mean(acs) > 0.5, np.mean(acs)   # measured +0.88
        assert 500 < out.std() < 15000, out.std()

    def test_stock_plc_engine_loads_quantized_blob(self, tmp_path):
        """Same for the PLC engine: a DOTPROD=1 build loads the quantized
        combined LPCNet+PLC blob, passes good frames through exactly, and
        conceals with sane energy."""
        import jax
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import export_ref, weights_io
        env = dict(os.environ, DOTPROD="1")
        build = subprocess.run(
            ["bash", "tools/ref_plc/build_engine.sh", "/root/reference",
             str(tmp_path)], capture_output=True, text=True, env=env)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        ex = os.path.join(os.path.dirname(__file__), os.pardir, "examples")
        lp = weights_io.load_params(
            os.path.join(ex, "speech_lpcnet_params.bin"))
        pp = weights_io.load_params(
            os.path.join(ex, "speech_plc_params.bin"))
        cfg = lpcnet.LPCNetConfig()
        arrays = export_ref.export_lpcnet_arrays(lp, cfg, quantize=True)
        arrays.update(export_ref.export_plc_arrays(pp, quantize=True))
        export_ref._write_blob(arrays, str(tmp_path / "wq.bin"))
        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16)[:16 * 160]
        pcm.tofile(tmp_path / "in.pcm")
        (tmp_path / "err.txt").write_text("0\n0\n0\n0\n1\n0\n0\n0\n")
        r = subprocess.run(
            [bin_path, "causal", str(tmp_path / "wq.bin"),
             str(tmp_path / "err.txt"), str(tmp_path / "in.pcm"),
             str(tmp_path / "out.pcm")], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        out = np.fromfile(tmp_path / "out.pcm", np.int16)
        np.testing.assert_array_equal(out[:8 * 160],
                                      pcm.astype(out.dtype)[:8 * 160])
        con = out[8 * 160:10 * 160].astype(float)
        assert np.isfinite(con).all() and 100 < con.std() < 20000


class TestE2EWaveformParity:
    """END2END (rc2lpc) model variant vs the reference C built with the
    e2e flavor (build.sh '... e2e'): measured 99.3% bit-identical
    samples. rc2lpc pole positions amplify rounding flips slightly more
    than the cepstral-LPC path, hence the looser correlation bound."""

    def test_e2e_matches(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu import features as F
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import export_ref
        from lpcnet_tpu.vocoder import Synthesizer
        build = subprocess.run(
            ["bash", "tools/ref_synth/build.sh", "/root/reference",
             str(tmp_path), "e2e"], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        cfg = lpcnet.LPCNetConfig(approx=True, e2e=True)
        params = lpcnet.init_params(jax.random.PRNGKey(3), cfg)
        export_ref.export_lpcnet_blob(
            jax.tree.map(np.asarray, params), cfg, str(tmp_path / "w.bin"))
        pcm = np.fromfile(os.path.join(GOLDEN, "speech.s16"),
                          np.int16).astype(np.float32)
        T = min(60, len(pcm) // 160 // 4 * 4)
        st = F.init_state(1)
        st, feats, _ = F.compute_features(
            st, jnp.asarray(pcm[None, :T * 160]))
        np.asarray(feats[0], np.float32).tofile(tmp_path / "f.f32")
        r = subprocess.run([bin_path, str(tmp_path / "w.bin"),
                            str(tmp_path / "f.f32"),
                            str(tmp_path / "ref.pcm")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref = np.fromfile(tmp_path / "ref.pcm", np.int16).astype(int)
        voc = Synthesizer(cfg, params=params, backend="scan")
        sstate = voc.reset_streaming(1)
        _, ours = voc.synthesize_streaming(sstate, feats)
        ours = np.asarray(ours[0]).astype(int)
        n = min(len(ref), len(ours))
        d = np.abs(ref[:n] - ours[:n])
        assert (d == 0).mean() > 0.9
        assert float(np.corrcoef(ref[:n], ours[:n])[0, 1]) > 0.99


class TestBuildScriptsFailLoud:
    """A broken reference build must exit non-zero, or ref_build_skip
    (tests/conftest.py) never fires and LPCNET_REQUIRE_REF=1 cannot catch
    toolchain regressions."""

    @pytest.mark.parametrize("script", [
        "tools/ref_synth/build.sh", "tools/ref_codec/build.sh",
        "tools/ref_plc/build.sh", "tools/ref_plc/build_engine.sh",
        "tools/ref_dred/build.sh", "tools/ref_fec/build.sh",
        "tools/ref_dotprod/build.sh",
    ])
    def test_bad_reference_fails(self, script, tmp_path):
        r = subprocess.run(["bash", script, "/nonexistent-reference",
                            str(tmp_path)], capture_output=True, text=True,
                           cwd="/root/repo")
        assert r.returncode != 0, (script, r.stdout[-400:], r.stderr[-400:])
