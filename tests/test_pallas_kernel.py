"""Fused Pallas sampling kernel vs the lax.scan reference (interpret mode
on CPU; the real TPU path is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.constants import NB_TOTAL_FEATURES
from lpcnet_tpu.kernels import sample_pallas, sample_scan
from lpcnet_tpu.models import lpcnet as lm
from lpcnet_tpu.vocoder import Synthesizer

CFG = lm.LPCNetConfig()


@pytest.fixture(scope="module")
def setup():
    voc = Synthesizer(CFG, rng=jax.random.PRNGKey(11))
    rs = np.random.RandomState(5)
    B, T = 4, 2
    f = np.zeros((B, T, NB_TOTAL_FEATURES), np.float32)
    f[..., :18] = rs.randn(B, T, 18) * 0.3
    f[..., 18] = rs.uniform(-1, 1, (B, T))
    f[..., 19] = rs.uniform(0, 1, (B, T))
    conds = voc.conditions(jnp.asarray(f))
    return voc, conds


class TestPallasKernel:
    def test_matches_scan(self, setup):
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        state = voc.reset(B, per_stream_rng=True)
        st_scan, pcm_scan = sample_scan.synthesize_frames(
            voc.tables, state, conds, CFG)
        st_pal, pcm_pal = sample_pallas.synthesize_frames_pallas(
            voc.tables, state, conds, CFG, interpret=True)
        np.testing.assert_array_equal(np.asarray(pcm_pal),
                                      np.asarray(pcm_scan))
        for k in ("gru_a", "gru_b", "last_sig"):
            np.testing.assert_allclose(np.asarray(st_pal[k]),
                                       np.asarray(st_scan[k]), rtol=1e-5,
                                       atol=1e-5)
        np.testing.assert_array_equal(np.asarray(st_pal["last_exc"]),
                                      np.asarray(st_scan["last_exc"]))
        np.testing.assert_array_equal(np.asarray(st_pal["rng"]),
                                      np.asarray(st_scan["rng"]))

    def test_synth_samples_teacher_forcing_matches_scan(self, setup):
        """synth_samples_pallas (the PLC engines' primitive) vs the scan
        twin with target/preload/n_active — bit-exact class (+-1 flips at
        floor(.5+x) boundaries), state and RNG exact."""
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        cond = {k: conds[k][:, 0] for k in ("cond_a", "cond_b", "lpc")}
        state = voc.reset(B, per_stream_rng=True)
        rs = np.random.RandomState(3)
        target = jnp.asarray(
            np.round(rs.randn(B, 160) * 2000).astype(np.float32))
        preload = jnp.asarray(rs.randint(0, 161, B), jnp.int32)
        n_active = jnp.asarray(rs.randint(0, 161, B), jnp.int32)
        for kwargs in (dict(), dict(target=target, preload=preload),
                       dict(target=target, preload=preload,
                            n_active=n_active)):
            s1, p1 = sample_scan.synth_samples(voc.tables, state, cond,
                                               CFG, 160, **kwargs)
            s2, p2 = sample_pallas.synth_samples_pallas(
                voc.tables, state, cond, CFG, 160, interpret=True,
                **kwargs)
            d = np.abs(np.asarray(p1) - np.asarray(p2))
            assert d.max() <= 1 and (d == 0).mean() > 0.99, (
                kwargs.keys(), d.max())
            np.testing.assert_array_equal(np.asarray(s1["rng"]),
                                          np.asarray(s2["rng"]))

    @pytest.mark.parametrize("variant", ["fuse", "opt", "flat"])
    def test_variants_bit_identical(self, setup, variant):
        """The fused/pipelined restructurings (measured slower on v5e,
        kept for re-testing — see sample_pallas.py docstring) must stay
        bit-identical to the base kernel, RNG state included."""
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        state = voc.reset(B, per_stream_rng=True)
        st_b, pcm_b = sample_pallas.synthesize_frames_pallas(
            voc.tables, state, conds, CFG, interpret=True, variant="base")
        st_v, pcm_v = sample_pallas.synthesize_frames_pallas(
            voc.tables, state, conds, CFG, interpret=True, variant=variant)
        np.testing.assert_array_equal(np.asarray(pcm_v), np.asarray(pcm_b))
        np.testing.assert_array_equal(np.asarray(st_v["rng"]),
                                      np.asarray(st_b["rng"]))

    def test_synth_samples_flat_variant_bit_identical(self, setup):
        """The flat sampling tree in the PLC primitive (partially-forced
        passes) must be bit-identical to the base walk, RNG included."""
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        cond = {k: conds[k][:, 0] for k in ("cond_a", "cond_b", "lpc")}
        state = voc.reset(B, per_stream_rng=True)
        rs = np.random.RandomState(7)
        target = jnp.asarray(
            np.round(rs.randn(B, 160) * 2000).astype(np.float32))
        preload = jnp.asarray(rs.randint(0, 161, B), jnp.int32)
        n_active = jnp.asarray(rs.randint(0, 161, B), jnp.int32)
        for kwargs in (dict(), dict(target=target, preload=preload,
                                    n_active=n_active)):
            s1, p1 = sample_pallas.synth_samples_pallas(
                voc.tables, state, cond, CFG, 160, interpret=True,
                variant="base", **kwargs)
            s2, p2 = sample_pallas.synth_samples_pallas(
                voc.tables, state, cond, CFG, 160, interpret=True,
                variant="flat", **kwargs)
            np.testing.assert_array_equal(np.asarray(p2), np.asarray(p1))
            np.testing.assert_array_equal(np.asarray(s2["rng"]),
                                          np.asarray(s1["rng"]))
            np.testing.assert_array_equal(np.asarray(s2["last_exc"]),
                                          np.asarray(s1["last_exc"]))

    def test_tile_size_invariant(self, setup, monkeypatch):
        """Batch tiling (LPCNET_PALLAS_TILE) must not change output: the
        same 8-stream batch run as one 8-wide tile vs four 2-wide grid
        tiles is bit-identical, RNG state included."""
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        conds8 = jax.tree.map(lambda x: jnp.concatenate([x, x]), conds)
        state = voc.reset(2 * B, per_stream_rng=True)
        st_1, pcm_1 = sample_pallas.synthesize_frames_pallas(
            voc.tables, state, conds8, CFG, interpret=True)
        monkeypatch.setattr(sample_pallas, "MAX_BATCH_TILE", 2)
        st_t, pcm_t = sample_pallas.synthesize_frames_pallas(
            voc.tables, state, conds8, CFG, interpret=True)
        np.testing.assert_array_equal(np.asarray(pcm_t), np.asarray(pcm_1))
        np.testing.assert_array_equal(np.asarray(st_t["rng"]),
                                      np.asarray(st_1["rng"]))


class TestTeacherAdvancePallas:
    def test_matches_scan_teacher_advance(self, setup):
        """teacher_advance_pallas (GRU-advance kernel, interpret mode) vs
        sample_scan.teacher_advance — the fully-forced fast path the PLC
        engines dispatch to; state and RNG exact, GRUs at float tolerance."""
        voc, conds = setup
        B = conds["cond_a"].shape[0]
        cond = {k: conds[k][:, 0] for k in ("cond_a", "cond_b", "lpc")}
        state = voc.reset(B, per_stream_rng=True)
        # warm up with real sampling so every state entry is non-trivial
        state, _ = sample_scan.synth_samples(voc.tables, state, cond, CFG,
                                             23)
        rs = np.random.RandomState(7)
        target = jnp.asarray(
            np.round(rs.randn(B, 160) * 2500).astype(np.float32))
        st_scan, out_scan = sample_scan.teacher_advance(
            voc.tables, state, cond, CFG, target)
        st_pal, out_pal = sample_pallas.teacher_advance_pallas(
            voc.tables, state, cond, CFG, target, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_pal),
                                      np.asarray(out_scan))
        for k in ("gru_a", "gru_b"):
            np.testing.assert_allclose(np.asarray(st_pal[k]),
                                       np.asarray(st_scan[k]), atol=2e-6,
                                       err_msg=k)
        for k in ("last_sig", "last_exc", "deemph", "rng"):
            np.testing.assert_array_equal(np.asarray(st_pal[k]),
                                          np.asarray(st_scan[k]), err_msg=k)
