"""Golden test: Burg cepstral analysis vs reference burg_cepstral_analysis."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.constants import FRAME_SIZE, NB_BANDS
from lpcnet_tpu.ops import burg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "burg.bin")


@pytest.fixture(scope="module")
def recs():
    d = np.fromfile(GOLDEN, dtype=np.float32)
    rec = FRAME_SIZE + 2 * NB_BANDS
    out = []
    for k in range(d.size // rec):
        r = d[k * rec:(k + 1) * rec]
        out.append((r[:FRAME_SIZE], r[FRAME_SIZE:]))
    return out


class TestBurg:
    def test_cepstral_analysis_golden(self, recs):
        x = jnp.asarray(np.stack([r[0] for r in recs]))
        got = np.asarray(jax.jit(burg.burg_cepstral_analysis)(x))
        want = np.stack([r[1] for r in recs])
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-3)

    def test_analysis_whitens_ar_signal(self):
        # burg on an AR(2) process should recover most of the variance
        rs = np.random.RandomState(0)
        e = rs.randn(4000).astype(np.float32)
        x = np.zeros(4000, np.float32)
        for i in range(2, 4000):
            x[i] = 1.3 * x[i - 1] - 0.6 * x[i - 2] + e[i]
        a, nrg = burg.burg_analysis(jnp.asarray(x[None, -79:]))
        a = np.asarray(a)[0]
        # residual energy far below signal energy
        assert float(nrg[0]) < 0.5 * float((x[-79:] ** 2).sum())
        assert abs(a[0] - 1.3) < 0.35 and abs(a[1] + 0.6) < 0.35

    def test_batched_matches_single(self, recs):
        x = jnp.asarray(np.stack([r[0] for r in recs]))
        full = np.asarray(burg.burg_cepstral_analysis(x))
        one = np.asarray(burg.burg_cepstral_analysis(x[1:2]))
        np.testing.assert_allclose(full[1:2], one, rtol=1e-5, atol=1e-5)
