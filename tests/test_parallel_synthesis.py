"""Stream-DP synthesis on a multi-device mesh (BASELINE.json config 5:
4096 concurrent streams data-parallel with per-host feature ingest —
validated here on the 8-device CPU mesh at reduced size)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.models import lpcnet as lm
from lpcnet_tpu.parallel import mesh as pmesh
from lpcnet_tpu.vocoder import Synthesizer

CFG = lm.LPCNetConfig(gru_a_units=64, gru_b_units=16, cond_size=32,
                      embed_sig_size=16, embed_pitch_size=8)


@pytest.fixture(scope="module")
def voc():
    return Synthesizer(CFG, backend="scan")


def _feats(batch, T, seed=0):
    rs = np.random.RandomState(seed)
    f = np.zeros((batch, T, 36), np.float32)
    f[..., :18] = rs.randn(batch, T, 18) * 0.3
    f[..., 18] = rs.uniform(-1, 1, (batch, T))
    f[..., 19] = rs.uniform(0, 1, (batch, T))
    return f


class TestShardedSynthesis:
    def test_runs_on_full_mesh(self, voc):
        n = len(jax.devices())
        assert n == 8, "conftest must provide 8 CPU devices"
        B, T = 4 * n, 2
        state, synth_fn = pmesh.shard_synthesis(voc, B)
        state, pcm = synth_fn(state, _feats(B, T))
        jax.block_until_ready(pcm)
        assert pcm.shape == (B, T * CFG.frame_size)
        # output really is sharded over the mesh
        shard_devs = {s.device for s in pcm.addressable_shards}
        assert len(shard_devs) == n

    def test_matches_single_device(self, voc):
        """Sharding must not change the waveform: per-stream RNG makes
        each stream's output a pure function of its own inputs."""
        n = len(jax.devices())
        B, T = 2 * n, 2
        feats = _feats(B, T, seed=1)
        state, synth_fn = pmesh.shard_synthesis(voc, B)
        _, pcm_dp = synth_fn(state, feats)

        state1 = voc.reset(B, per_stream_rng=True)
        _, pcm_1 = voc.synthesize(state1, jnp.asarray(feats))
        np.testing.assert_array_equal(np.asarray(pcm_dp), np.asarray(pcm_1))

    def test_batch_must_divide(self, voc):
        with pytest.raises(AssertionError, match="divide"):
            pmesh.shard_synthesis(voc, len(jax.devices()) + 1)


class TestFlagshipGeometry:
    def test_sharded_matches_single_device_flagship(self):
        """Sharded-equals-single-device at the FLAGSHIP geometry (default
        config, GRU-A 384) — the shrunken-geometry classes above keep the
        suite fast; this one proves the real model's sharding (one stream
        per device, one frame). At this size XLA tiles the per-shard
        matmuls differently than the single-device (8,·) forms, so the
        match is the +-1 floor(.5+x) rounding class rather than exact
        (measured: 99.4% identical, max |diff| 1, zero forks; the small
        geometry above happens to stay bit-exact)."""
        voc = Synthesizer(lm.LPCNetConfig(), backend="scan")
        n = len(jax.devices())
        B, T = n, 1
        feats = _feats(B, T, seed=2)
        state, synth_fn = pmesh.shard_synthesis(voc, B)
        _, pcm_dp = synth_fn(state, feats)
        state1 = voc.reset(B, per_stream_rng=True)
        _, pcm_1 = voc.synthesize(state1, jnp.asarray(feats))
        d = np.abs(np.asarray(pcm_dp) - np.asarray(pcm_1))
        assert d.max() <= 1, d.max()          # measured: 1.0
        assert (d == 0).mean() > 0.98, (d == 0).mean()  # measured 0.994
