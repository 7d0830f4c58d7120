"""Cross-check the batched lax.scan synthesis against an independent scalar
NumPy simulator that follows the reference C semantics step by step
(lpcnet_synthesize_tail_impl lpcnet.c:235-271, run_sample_network
lpcnet.c:146-167, compute_sparse_gru/compute_gruB nnet.c:326-448,
sample_mdense nnet.c:163-214).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.constants import LPC_ORDER, NB_TOTAL_FEATURES
from lpcnet_tpu.kernels import sample_scan
from lpcnet_tpu.models import layers, lpcnet
from lpcnet_tpu.ops import kiss99 as k99
from lpcnet_tpu.ops.mulaw import lin2ulaw, ulaw2lin
from lpcnet_tpu.ops.tables import SAMPLING_LOGIT_TABLE
from lpcnet_tpu.vocoder import Synthesizer

CFG = lpcnet.LPCNetConfig()


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x, dtype=np.float64)).astype(np.float32)


def _lin2ulaw_np(x):
    return int(np.asarray(lin2ulaw(jnp.float32(x))))


def _ulaw2lin_np(u):
    return float(np.asarray(ulaw2lin(jnp.int32(u))))


class NumpyTwin:
    """Scalar single-stream synthesis following the C control flow."""

    def __init__(self, tables, cfg):
        self.t = {k: (_np(v) if not isinstance(v, dict)
                      else {k2: _np(v2) for k2, v2 in v.items()})
                  for k, v in tables.items()}
        self.cfg = cfg
        self.gru_a = np.zeros(cfg.gru_a_units, np.float32)
        self.gru_b = np.zeros(cfg.gru_b_units, np.float32)
        self.last_sig = np.zeros(LPC_ORDER, np.float32)
        self.last_exc = 128
        self.deemph = 0.0
        self.rng = k99.default_seed()

    def _rand(self):
        self.rng, r = k99._next_np(self.rng)
        return int(r)

    def _gru(self, h, zrh, wr, br):
        n = h.shape[0]
        recur = h @ wr + br
        z = _sigmoid(zrh[:n] + recur[:n])
        r = _sigmoid(zrh[n:2 * n] + recur[n:2 * n])
        hc = np.tanh(zrh[2 * n:] + r * recur[2 * n:]).astype(np.float32)
        return z * h + (1 - z) * hc

    def step(self, cond_a, cond_b, lpc):
        t = self.t
        pred = -float(self.last_sig @ lpc)
        lsu = _lin2ulaw_np(self.last_sig[0])
        pu = _lin2ulaw_np(pred)
        zrh_a = cond_a + t["tbl_sig"][lsu] + t["tbl_pred"][pu] \
            + t["tbl_exc"][self.last_exc]
        self.gru_a = self._gru(self.gru_a, zrh_a, t["wr_a"], t["br_a"])
        zrh_b = cond_b + self.gru_a @ t["wi_b"]
        self.gru_b = self._gru(self.gru_b, zrh_b, t["wr_b"], t["br_b"])
        dfc = t["dual_fc"]
        y = np.einsum("i,cio->co", self.gru_b, dfc["w"]) + dfc["b"]
        logits = (np.tanh(y) * dfc["factor"]).sum(axis=0)
        # thresholds: 2 draws -> 8 bytes (nnet.c:178-184)
        thr = []
        for _ in range(2):
            r = self._rand()
            for kbyte in range(4):
                thr.append(SAMPLING_LOGIT_TABLE[(r >> (8 * kbyte)) & 0xFF])
        val = 0
        for b in range(8):
            i = (1 << b) | val
            bit = 1 if thr[b] < logits[i] else 0
            val = (val << 1) | bit
        exc = val
        pcm = pred + _ulaw2lin_np(exc)
        self.last_sig = np.concatenate([[pcm], self.last_sig[:-1]]).astype(np.float32)
        self.last_exc = exc
        out = pcm + self.cfg.preemph * self.deemph
        self.deemph = out
        out = min(max(out, -32767.0), 32767.0)
        return np.floor(0.5 + out)


@pytest.fixture(scope="module")
def voc():
    return Synthesizer(CFG, rng=jax.random.PRNGKey(42))


@pytest.fixture(scope="module")
def features():
    rs = np.random.RandomState(7)
    T = 4
    f = np.zeros((2, T, NB_TOTAL_FEATURES), np.float32)
    f[:, :, :18] = rs.randn(2, T, 18) * 0.3
    f[:, :, 18] = rs.uniform(-1, 1, (2, T))   # pitch period feature
    f[:, :, 19] = rs.uniform(0, 1, (2, T))    # pitch corr
    return f


class TestScanVsNumpyTwin:
    def test_waveform_match(self, voc, features):
        state = voc.reset(batch=2)
        new_state, pcm = voc.synthesize(state, jnp.asarray(features))
        pcm = np.asarray(pcm)

        conds = jax.tree.map(np.asarray, voc.conditions(jnp.asarray(features)))
        for b in range(2):
            twin = NumpyTwin(voc.tables, CFG)
            out = []
            for t in range(features.shape[1]):
                for _ in range(CFG.frame_size):
                    out.append(twin.step(conds["cond_a"][b, t],
                                         conds["cond_b"][b, t],
                                         conds["lpc"][b, t]))
            out = np.array(out, np.float32)
            # excitation decisions are discrete; both paths must take the
            # same branch at every sample -> exact waveform equality
            np.testing.assert_allclose(pcm[b], out, rtol=0, atol=1.0)
            assert (pcm[b] != out).mean() < 0.02

    def test_same_seed_streams_identical(self, voc, features):
        f = jnp.asarray(np.repeat(features[:1], 4, axis=0))
        state = voc.reset(batch=4)
        _, pcm = voc.synthesize(state, f)
        pcm = np.asarray(pcm)
        for b in range(1, 4):
            np.testing.assert_array_equal(pcm[0], pcm[b])

    def test_deterministic(self, voc, features):
        state = voc.reset(batch=2)
        _, p1 = voc.synthesize(state, jnp.asarray(features))
        state = voc.reset(batch=2)
        _, p2 = voc.synthesize(state, jnp.asarray(features))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_teacher_forcing_reproduces_target(self, voc, features):
        B, T = features.shape[:2]
        rs = np.random.RandomState(3)
        target = np.round(rs.randn(B, T * CFG.frame_size) * 1000).astype(np.float32)
        preload = np.full((B, T), CFG.frame_size, np.int32)
        state = voc.reset(batch=B)
        _, pcm = voc.synthesize_teacher(state, jnp.asarray(features),
                                        jnp.asarray(target),
                                        jnp.asarray(preload))
        np.testing.assert_array_equal(np.asarray(pcm), target)

    def test_output_in_int16_range(self, voc, features):
        state = voc.reset(batch=2)
        _, pcm = voc.synthesize(state, jnp.asarray(features))
        pcm = np.asarray(pcm)
        assert pcm.min() >= -32767 and pcm.max() <= 32767
        assert np.all(pcm == np.round(pcm))


class TestTemperatureSampling:
    """Temperature/PDF-floor mode (training_tf2/test_lpcnet.py:131-138):
    sharpening must reduce sampling noise on voiced (high-corr) frames and
    leave unvoiced (corr <= 1/3 => exponent 0, floor only) mostly alone."""

    def _synth(self, corr_feat, temperature):
        voc = Synthesizer(CFG, params=lpcnet.init_params(
            jax.random.PRNGKey(5), CFG), backend="scan")
        rs = np.random.RandomState(6)
        feats = np.zeros((4, 12, NB_TOTAL_FEATURES), np.float32)
        feats[..., :18] = rs.randn(4, 12, 18) * 0.3
        feats[..., 18] = 0.2
        feats[..., 19] = corr_feat
        state = voc.reset(4, per_stream_rng=True)
        fn = voc.synthesize_temperature if temperature else voc.synthesize
        _, pcm = fn(state, jnp.asarray(feats))
        return np.asarray(pcm)

    def test_voiced_sharpening_reduces_noise(self):
        base = self._synth(0.5, False)    # corr feat 0.5 -> exponent 1.0
        temp = self._synth(0.5, True)
        assert not np.array_equal(base, temp)
        jitter = lambda x: float(np.mean(np.diff(x, axis=-1) ** 2))
        assert jitter(temp) < jitter(base), (jitter(temp), jitter(base))

    def test_output_valid(self):
        temp = self._synth(0.0, True)
        assert np.isfinite(temp).all()
        assert temp.min() >= -32767 and temp.max() <= 32767


class TestConvStreamingEquivalence:
    def test_conv_step_matches_same_padding(self):
        rng = jax.random.PRNGKey(1)
        p = layers.conv1d_init(rng, 8, 16, 3)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 8))
        full = layers.conv1d_same_apply(p, x, "tanh")
        # streaming: output at step t = same-padded output at t-1 (delay 1)
        mem = jnp.zeros((2, 2, 8))
        outs = []
        for t in range(6):
            y, mem = layers.conv1d_step(p, mem, x[:, t], "tanh")
            outs.append(y)
        stream = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(stream[:, 1:]),
                                   np.asarray(full[:, :-1]), rtol=1e-5,
                                   atol=1e-6)


class TestDemoCheckpoint:
    """The committed end-to-end-trained demo checkpoint must load and
    synthesize pitch-periodic audio (examples/README.md)."""

    def test_demo_checkpoint_synthesis(self):
        import os
        import jax
        import numpy as np
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.utils import weights_io
        from lpcnet_tpu.vocoder import Synthesizer
        path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "demo_lpcnet_params.bin")
        params = weights_io.load_params(path)
        cfg = lpcnet.LPCNetConfig()
        voc = Synthesizer(cfg, params=jax.tree.map(jnp.asarray, params),
                          backend="scan")
        T = 12
        feats = np.zeros((1, T, 36), np.float32)
        feats[..., 0] = 1.5                       # energetic
        feats[:, :, 18] = 0.02 * (16000 / 140 - 100)   # pitch ~140 Hz
        feats[:, :, 19] = 0.4                     # voiced
        state = voc.reset(1)
        state, pcm = voc.synthesize(state, jnp.asarray(feats))
        y = np.asarray(pcm[0])[4 * 160:]
        lag = int(16000 / 140)
        ac = float(np.corrcoef(y[:-lag], y[lag:])[0, 1])
        assert ac > 0.1, ac                      # periodic at the cond pitch
        assert 20 < np.sqrt((y ** 2).mean()) < 20000


class TestSpeechCheckpoints:
    """The committed REAL-SPEECH-trained checkpoints (examples/README.md):
    the vocoder must synthesize strongly pitch-periodic audio from real
    speech features, and the PLC net must beat the predict-zero baseline
    on lost frames."""

    def test_speech_vocoder(self):
        import os
        from lpcnet_tpu import features as F
        from lpcnet_tpu.utils import weights_io
        path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "speech_lpcnet_params.bin")
        params = jax.tree.map(jnp.asarray, weights_io.load_params(path))
        voc = Synthesizer(CFG, params=params, backend="scan")
        pcm = np.fromfile(os.path.join(os.path.dirname(__file__), "golden",
                                       "speech.s16"),
                          np.int16).astype(np.float32)
        T = 60
        st = F.init_state(1)
        st, feats, _ = jax.jit(F.compute_features)(
            st, jnp.asarray(pcm[None, :T * 160]))
        state = voc.reset(1)
        _, out = voc.synthesize(state, feats)
        x = np.asarray(out[0])
        periods = np.clip(np.floor(
            0.1 + 50 * np.asarray(feats[0, :, 18]) + 100), 33, 255
        ).astype(int)
        acs = []
        for t in range(4, T - 2):
            seg = x[t * 160:(t + 1) * 160 + 256]
            lag = periods[t]
            if len(seg) > lag + 160 and seg[:160].std() > 1:
                a = np.corrcoef(seg[:160], seg[lag:lag + 160])[0, 1]
                if np.isfinite(a):
                    acs.append(a)
        assert np.mean(acs) > 0.5, np.mean(acs)   # measured +0.90
        rms = x.std()
        assert 500 < rms < 15000, rms             # measured 3234

    def test_sq_checkpoint_sparse_int8_and_synthesizes(self):
        """The deployment-grade checkpoint: GRU-A at the reference's gate
        densities, all GRU weights on the int8/128 grid, and synthesis
        quality at least the dense model's level (measured +0.96)."""
        import os
        from lpcnet_tpu import features as F
        from lpcnet_tpu.utils import weights_io
        path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "speech_lpcnet_sq_params.bin")
        params = weights_io.load_params(path)
        wr = np.asarray(params["gru_a"]["wr"])
        n = wr.shape[0]
        dens = [(np.abs(wr[:, k * n:(k + 1) * n]) > 0).mean()
                for k in range(3)]
        assert dens[0] < 0.08 and dens[1] < 0.08 and dens[2] < 0.25, dens
        snap = np.abs(wr * 128 - np.round(wr * 128))
        assert snap.max() < 1e-3, snap.max()      # fully on the int8 grid
        # training quantizes GRU-A recurrent + GRU-B INPUT (the reference's
        # Sparsify/SparsifyGRUB scope); GRU-B recurrent is rounded at
        # export time only (dump_lpcnet.py:183)
        wib = np.asarray(params["gru_b"]["wi"])
        assert np.abs(wib * 128 - np.round(wib * 128)).max() < 1e-3
        params = jax.tree.map(jnp.asarray, params)
        voc = Synthesizer(CFG, params=params, backend="scan")
        pcm = np.fromfile(os.path.join(os.path.dirname(__file__), "golden",
                                       "speech.s16"),
                          np.int16).astype(np.float32)
        T = 40
        st = F.init_state(1)
        st, feats, _ = jax.jit(F.compute_features)(
            st, jnp.asarray(pcm[None, :T * 160]))
        state = voc.reset(1)
        _, out = voc.synthesize(state, feats)
        x = np.asarray(out[0])
        periods = np.clip(np.floor(
            0.1 + 50 * np.asarray(feats[0, :, 18]) + 100), 33, 255
        ).astype(int)
        acs = []
        for t in range(4, T - 2):
            seg = x[t * 160:(t + 1) * 160 + 256]
            lag = periods[t]
            if len(seg) > lag + 160 and seg[:160].std() > 1:
                a = np.corrcoef(seg[:160], seg[lag:lag + 160])[0, 1]
                if np.isfinite(a):
                    acs.append(a)
        assert np.mean(acs) > 0.5, np.mean(acs)

    def test_speech_plc_net(self):
        import os
        from lpcnet_tpu.models import plc as pm
        from lpcnet_tpu.ops import burg as burg_ops
        from lpcnet_tpu import features as F
        from lpcnet_tpu.utils import weights_io
        path = os.path.join(os.path.dirname(__file__), "..", "examples",
                            "speech_plc_params.bin")
        params = jax.tree.map(jnp.asarray, weights_io.load_params(path))
        pcm = np.fromfile(os.path.join(os.path.dirname(__file__), "golden",
                                       "speech.s16"),
                          np.int16).astype(np.float32)
        T = 80
        st = F.init_state(1)
        st, feats, _ = jax.jit(F.compute_features)(
            st, jnp.asarray(pcm[None, :T * 160]))
        frames = jnp.asarray(pcm[:T * 160].reshape(T, 160))
        burg36 = np.asarray(jax.jit(burg_ops.burg_cepstral_analysis)(frames))
        f56 = np.concatenate([burg36, np.asarray(feats[0, :, :20])], -1)
        rs = np.random.RandomState(7)
        lost = (rs.uniform(size=T) < 0.25).astype(np.float32)
        recv = 1 - lost
        cfg = pm.PLCConfig()
        inp = jnp.asarray(np.concatenate(
            [f56 * recv[:, None], recv[:, None]], -1)[None])
        pred = np.asarray(pm.forward_sequence(params, inp, cfg)[0])
        tgt = f56[:, 36:56]
        err = np.abs(pred - tgt)[lost > 0].mean()
        base = np.abs(tgt)[lost > 0].mean()
        assert err < 0.7 * base, (err, base)      # measured 0.42 vs 1.01


class TestTeacherAdvance:
    def test_matches_full_preload_synth(self):
        """teacher_advance must reproduce synth_samples' state under FULL
        preload BIT-EXACTLY (same float op order, same 2-draw/sample RNG
        consumption) — it is the fast path the PLC good-frame resync uses."""
        B, ns = 4, 160
        voc = Synthesizer(CFG, rng=jax.random.PRNGKey(3), backend="scan")
        rs = np.random.RandomState(5)
        feats = jnp.asarray(
            rs.randn(B, 1, NB_TOTAL_FEATURES).astype(np.float32) * 0.3)
        cond = {k: v[:, 0] for k, v in voc.conditions(feats).items()
                if k in ("cond_a", "cond_b", "lpc")}
        target = jnp.asarray(
            np.round(rs.randn(B, ns) * 3000).astype(np.float32))
        # warm the state so histories are non-trivial
        st0 = voc.reset(B, per_stream_rng=True)
        st0, _ = sample_scan.synth_samples(voc.tables, st0, cond, CFG, 37)

        ref_st, ref_out = sample_scan.synth_samples(
            voc.tables, st0, cond, CFG, ns, target=target,
            preload=jnp.full((B,), ns, jnp.int32))
        fast_st, fast_out = sample_scan.teacher_advance(
            voc.tables, st0, cond, CFG, target)
        np.testing.assert_array_equal(np.asarray(fast_out),
                                      np.asarray(target))
        for k in ref_st:
            r, f = np.asarray(ref_st[k]), np.asarray(fast_st[k])
            if k in ("gru_a", "gru_b"):
                np.testing.assert_allclose(f, r, atol=2e-6, err_msg=k)
            elif k in ("deemph", "last_sig"):
                # t - preemph*d and (t-pd)+pd: XLA fuses mul-add into an
                # FMA in one of the two graphs -> 1-ulp flips at +-32768
                # scale (the same class as pallas-vs-scan backend flips)
                np.testing.assert_allclose(f, r, rtol=1e-5, err_msg=k)
            else:
                # the mu-law excitation and RNG stream must match exactly
                np.testing.assert_array_equal(f, r, err_msg=k)
