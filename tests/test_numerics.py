"""Golden tests for the numerics substrate vs. reference C outputs.

Golden vectors in tests/golden/ were produced by compiling the reference's
numeric kernels (common.h mu-law, kiss99.c, vec.h activations, freq.c DSP)
with a standalone driver and dumping inputs/outputs. See SURVEY.md section 4.
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.ops import activations, dsp, kiss99, mulaw, tables
from lpcnet_tpu.constants import (FRAME_SIZE, FREQ_SIZE, LPC_ORDER, NB_BANDS,
                                  WINDOW_SIZE)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _read(name, dtype=np.float32):
    return np.fromfile(os.path.join(GOLDEN, name), dtype=dtype)


# ---------------------------------------------------------------- mu-law ---

class TestMulaw:
    def test_lin2ulaw_golden(self):
        d = _read("mulaw.bin")
        xs, want = d[:2001], d[2001:4002].astype(np.int32)
        got = np.asarray(mulaw.lin2ulaw(jnp.asarray(xs)))
        np.testing.assert_array_equal(got, want)

    def test_ulaw2lin_golden(self):
        # integer inputs ride ULAW2LIN_TABLE (the C's double-exp expression
        # rounded once) — bit-exact vs the golden C dump
        d = _read("mulaw.bin")
        want = d[4002:4258]
        got = np.asarray(mulaw.ulaw2lin(jnp.arange(256)))
        np.testing.assert_array_equal(got, want)

    def test_ulaw2lin_float_analytic_close(self):
        # float (non-integer) inputs use the f32 analytic form: ~4e-6 rel
        d = _read("mulaw.bin")
        want = d[4002:4258]
        got = np.asarray(mulaw.ulaw2lin(jnp.arange(256, dtype=jnp.float32)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-2)

    def test_zero_maps_to_128(self):
        assert int(mulaw.lin2ulaw(jnp.float32(0.0))) == 128

    def test_roundtrip_monotone(self):
        u = np.asarray(mulaw.lin2ulaw(jnp.linspace(-32768, 32767, 999)))
        assert np.all(np.diff(u) >= 0)


# ---------------------------------------------------------------- kiss99 ---

class TestKiss99:
    @staticmethod
    def _stream(seed, n=256):
        import jax

        def step(st, _):
            st, r = kiss99.kiss99_next(st)
            return st, r

        _, rs = jax.jit(lambda s: jax.lax.scan(step, s, None, length=n))(
            jnp.asarray(seed))
        return np.asarray(rs)

    def test_stream_golden(self):
        want = _read("kiss99.bin", np.uint32)[:256]
        np.testing.assert_array_equal(self._stream(kiss99.default_seed()), want)

    def test_stream_golden_seed2(self):
        want = _read("kiss99.bin", np.uint32)[256:]
        np.testing.assert_array_equal(
            self._stream(kiss99.seed_from_bytes(b"LPCNet\x01\x00\x00\x00")),
            want)

    def test_batched_lockstep(self):
        st = jnp.asarray(kiss99.batched_seed(4))
        st2, r = kiss99.kiss99_next(st)
        assert r.shape == (4,)
        assert len(set(np.asarray(r).tolist())) == 1  # same seed -> same draw
        stp = jnp.asarray(kiss99.batched_seed(4, per_stream=True))
        _, rp = kiss99.kiss99_next(stp)
        assert len(set(np.asarray(rp).tolist())) == 4


# ----------------------------------------------------------- activations ---

class TestActivations:
    def test_tanh_approx_golden(self):
        d = _read("act.bin")
        xs, want = d[:4001], d[4001:8002]
        got = np.asarray(activations.tanh_approx(jnp.asarray(xs)))
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_sigmoid_approx_golden(self):
        d = _read("act.bin")
        xs, want = d[:4001], d[8002:12003]
        got = np.asarray(activations.sigmoid_approx(jnp.asarray(xs)))
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-6)

    def test_lpcnet_exp_golden(self):
        d = _read("act.bin")
        xs, want = d[:4001], d[12003:16004]
        got = np.asarray(activations.lpcnet_exp(jnp.asarray(xs) * 0.1))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    def test_logit_table(self):
        # lpcnet.c:188-191
        want = -np.log((1 - (0.025 + 0.95 * np.arange(256) / 255.0))
                       / (0.025 + 0.95 * np.arange(256) / 255.0))
        np.testing.assert_allclose(tables.SAMPLING_LOGIT_TABLE, want, rtol=1e-6)


# ------------------------------------------------------------------- DSP ---

class TestDsp:
    @pytest.fixture(scope="class")
    def recs(self):
        d = _read("dsp.bin")
        rec = WINDOW_SIZE * 2 + FREQ_SIZE * 2 + NB_BANDS * 2 + LPC_ORDER + 1
        assert d.size % rec == 0
        out = []
        for k in range(d.size // rec):
            r = d[k * rec:(k + 1) * rec]
            o = {}
            i = 0
            o["x"] = r[i:i + WINDOW_SIZE]; i += WINDOW_SIZE
            o["xw"] = r[i:i + WINDOW_SIZE]; i += WINDOW_SIZE
            X = r[i:i + FREQ_SIZE * 2]; i += FREQ_SIZE * 2
            o["X"] = X[0::2] + 1j * X[1::2]
            o["bandE"] = r[i:i + NB_BANDS]; i += NB_BANDS
            o["ceps"] = r[i:i + NB_BANDS]; i += NB_BANDS
            o["lpc"] = r[i:i + LPC_ORDER]; i += LPC_ORDER
            o["err"] = r[i]
            out.append(o)
        return out

    def test_window(self, recs):
        for o in recs:
            got = np.asarray(dsp.apply_window(jnp.asarray(o["x"])))
            np.testing.assert_allclose(got, o["xw"], rtol=1e-6, atol=1e-4)

    def test_forward_transform(self, recs):
        for o in recs:
            got = np.asarray(dsp.forward_transform(jnp.asarray(o["xw"])))
            np.testing.assert_allclose(got, o["X"], rtol=1e-4, atol=2e-3)

    def test_band_energy(self, recs):
        for o in recs:
            got = np.asarray(dsp.compute_band_energy(jnp.asarray(o["X"])))
            np.testing.assert_allclose(got, o["bandE"], rtol=1e-4, atol=1e-4)

    def test_dct(self, recs):
        for o in recs:
            Ly = np.log10(1e-2 + o["bandE"])
            got = np.asarray(dsp.dct(jnp.asarray(Ly)))
            np.testing.assert_allclose(got, o["ceps"], rtol=1e-5, atol=1e-5)

    def test_lpc_from_cepstrum(self, recs):
        for o in recs:
            lpc, err = dsp.lpc_from_cepstrum(jnp.asarray(o["ceps"]))
            np.testing.assert_allclose(np.asarray(lpc), o["lpc"],
                                       rtol=1e-3, atol=2e-3)

    def test_batched_matches_single(self, recs):
        ceps = jnp.stack([jnp.asarray(o["ceps"]) for o in recs])
        lpc_b, _ = dsp.lpc_from_cepstrum(ceps)
        for k, o in enumerate(recs):
            lpc_s, _ = dsp.lpc_from_cepstrum(jnp.asarray(o["ceps"]))
            np.testing.assert_allclose(np.asarray(lpc_b[k]), np.asarray(lpc_s),
                                       rtol=1e-6, atol=1e-6)

    def test_idct_inverts_dct(self):
        x = np.random.RandomState(0).randn(5, NB_BANDS).astype(np.float32)
        got = np.asarray(dsp.idct(dsp.dct(jnp.asarray(x))))
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-5)

    def test_inverse_transform_roundtrip(self):
        x = np.random.RandomState(1).randn(WINDOW_SIZE).astype(np.float32)
        X = dsp.forward_transform(jnp.asarray(x))
        got = np.asarray(dsp.inverse_transform(X))
        np.testing.assert_allclose(got, x, rtol=1e-4, atol=1e-4)

    def test_preemphasis_streaming(self):
        x = np.random.RandomState(2).randn(2, 320).astype(np.float32)
        y_full, _ = dsp.preemphasis(jnp.asarray(x), jnp.zeros(2))
        y1, m = dsp.preemphasis(jnp.asarray(x[:, :160]), jnp.zeros(2))
        y2, _ = dsp.preemphasis(jnp.asarray(x[:, 160:]), m)
        np.testing.assert_allclose(np.asarray(y_full),
                                   np.concatenate([y1, y2], -1), rtol=1e-6)

    def test_deemphasis_inverts_preemphasis(self):
        x = np.random.RandomState(3).randn(3, 480).astype(np.float32)
        y, _ = dsp.preemphasis(jnp.asarray(x), jnp.zeros(3))
        z, _ = dsp.deemphasis_scan(y, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(z), x, rtol=1e-3, atol=1e-4)


class TestPadeFit:
    def test_fit_tool_converges(self):
        """tools/fit_pade.py (counterpart of training_tf2/pade.py): a short
        staged fit from the Taylor seed must already beat 2e-3 max error
        on the reference grid (the full run reaches ~2e-4, better than the
        reference's committed ~6e-4 constants)."""
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.fit_pade import fit
        coeffs, emax, emean = fit(steps_per_stage=300, verbose=False)
        assert emax < 2e-3, emax
        # the seed itself is the exact Pade expansion around 0: the fit
        # must stay in its vicinity (sanity against divergence)
        assert abs(coeffs["num"][0] - 945.0) < 50.0
