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
