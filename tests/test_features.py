"""Golden test: feature extractor vs. reference C lpcnet_compute_features.

tests/golden/features.bin: 6 superframes of pseudo-speech (int16) followed
by the C-computed 36-dim features per frame (unquantized path).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu import features as F
from lpcnet_tpu.constants import NB_BANDS, NB_TOTAL_FEATURES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "features.bin")
NSF = 6
T = NSF * 4


@pytest.fixture(scope="module")
def golden():
    raw = np.fromfile(GOLDEN, dtype=np.uint8)
    pcm = np.frombuffer(raw[:NSF * 640 * 2].tobytes(), dtype=np.int16)
    feats = np.frombuffer(raw[NSF * 640 * 2:].tobytes(), dtype=np.float32)
    return pcm.astype(np.float32), feats.reshape(T, NB_TOTAL_FEATURES)


@pytest.fixture(scope="module")
def ours(golden):
    pcm, _ = golden
    state = F.init_state(1)
    state, feats, _ = jax.jit(
        lambda s, p: F.compute_features(s, p))(state, jnp.asarray(pcm[None]))
    return np.asarray(feats[0])


class TestFeatureParity:
    def test_cepstrum(self, golden, ours):
        _, want = golden
        np.testing.assert_allclose(ours[:, :NB_BANDS], want[:, :NB_BANDS],
                                   rtol=1e-3, atol=2e-3)

    def test_pitch_period_feature(self, golden, ours):
        _, want = golden
        # pitch feature is .01*(period_sum - 200): exact integer decisions
        np.testing.assert_allclose(ours[:, NB_BANDS], want[:, NB_BANDS],
                                   rtol=0, atol=1e-6)

    def test_pitch_corr_feature(self, golden, ours):
        _, want = golden
        np.testing.assert_allclose(ours[:, NB_BANDS + 1],
                                   want[:, NB_BANDS + 1], rtol=0, atol=1e-4)

    def test_lpc(self, golden, ours):
        _, want = golden
        np.testing.assert_allclose(ours[:, NB_BANDS + 2:],
                                   want[:, NB_BANDS + 2:], rtol=1e-2,
                                   atol=5e-3)

    def test_chunked_matches_full(self, golden):
        pcm, _ = golden
        state = F.init_state(1)
        _, full, _ = F.compute_features(state, jnp.asarray(pcm[None]))
        state = F.init_state(1)
        parts = []
        for k in range(NSF):
            state, f, _ = F.compute_features(
                state, jnp.asarray(pcm[None, k * 640:(k + 1) * 640]))
            parts.append(np.asarray(f))
        chunked = np.concatenate(parts, axis=1)
        np.testing.assert_allclose(chunked, np.asarray(full), rtol=1e-4,
                                   atol=1e-4)

    def test_batch_consistency(self, golden):
        pcm, _ = golden
        x = jnp.asarray(np.stack([pcm, pcm * 0.5]))
        state = F.init_state(2)
        _, f2, _ = F.compute_features(state, x)
        state = F.init_state(1)
        _, f1, _ = F.compute_features(state, x[:1])
        np.testing.assert_allclose(np.asarray(f2[0]), np.asarray(f1[0]),
                                   rtol=1e-5, atol=1e-5)


class TestReturnMid:
    def test_mid_state_equals_one_frame_call(self):
        """return_mid's mid state must be EXACTLY the state a 1-frame call
        produces, and the 2-frame features must match two serial 1-frame
        calls (the fused PLC step depends on both properties)."""
        rs = np.random.RandomState(7)
        B = 2
        f0 = jnp.asarray(rs.randn(B, 160).astype(np.float32) * 2000)
        f1 = jnp.asarray(rs.randn(B, 160).astype(np.float32) * 2000)
        st0 = F.init_state(B)
        # warm the state so histories are nontrivial
        st0, _, _ = F.compute_features(
            st0, jnp.asarray(rs.randn(B, 320).astype(np.float32) * 2000),
            mode="single")

        full_state, feats2, _, mid = F.compute_features(
            st0, jnp.concatenate([f0, f1], axis=-1), mode="single",
            return_mid=True)
        one_state, featsA, _ = F.compute_features(st0, f0, mode="single")
        two_state, featsB, _ = F.compute_features(one_state, f1,
                                                  mode="single")
        for k in one_state:
            np.testing.assert_allclose(
                np.asarray(mid[k]), np.asarray(one_state[k]), rtol=1e-6,
                atol=1e-6, err_msg=k)
        np.testing.assert_allclose(np.asarray(feats2[:, 0]),
                                   np.asarray(featsA[:, 0]),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(feats2[:, 1]),
                                   np.asarray(featsB[:, 0]),
                                   rtol=1e-5, atol=1e-5)
        for k in two_state:
            np.testing.assert_allclose(
                np.asarray(full_state[k]), np.asarray(two_state[k]),
                rtol=1e-5, atol=1e-5, err_msg=k)
