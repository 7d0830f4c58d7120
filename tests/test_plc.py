"""PLC tests: network step/sequence equivalence, engine behavior, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu import plc as plc_engine
from lpcnet_tpu.constants import FRAME_SIZE, NB_FEATURES
from lpcnet_tpu.models import lpcnet as lm
from lpcnet_tpu.models import plc as pm
from lpcnet_tpu.training import plc_task

CFG = lm.LPCNetConfig(gru_a_units=64, gru_b_units=16, cond_size=32,
                      embed_sig_size=16, embed_pitch_size=8)
PCFG = pm.PLCConfig(dense_size=32, gru_size=48)


@pytest.fixture(scope="module")
def engine():
    lp = lm.init_params(jax.random.PRNGKey(0), CFG)
    pp = pm.init_params(jax.random.PRNGKey(1), PCFG)
    return plc_engine.PLCEngine(lp, pp, CFG, PCFG)


def _speech(B, n, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n)
    x = 3000 * np.sin(2 * np.pi * 150 / 16000 * t)[None]
    return (x + 200 * rs.randn(B, n)).astype(np.float32)


class TestPLCNet:
    def test_step_matches_sequence(self):
        pp = pm.init_params(jax.random.PRNGKey(2), PCFG)
        rs = np.random.RandomState(3)
        xs = jnp.asarray(rs.randn(2, 5, pm.PLC_INPUT_SIZE).astype(np.float32))
        seq = np.asarray(pm.forward_sequence(pp, xs, PCFG))
        st = pm.init_net_state(2, PCFG)
        outs = []
        for t in range(5):
            st, o = pm.step(pp, st, xs[:, t], PCFG)
            outs.append(np.asarray(o))
        stepped = np.stack(outs, axis=1)
        # step() applies the inference-only corr boost; undo for comparison
        np.testing.assert_allclose(stepped[..., :19], seq[..., :19],
                                   rtol=1e-5, atol=1e-5)

    def test_corr_boost(self):
        pp = pm.init_params(jax.random.PRNGKey(2), PCFG)
        st = pm.init_net_state(1, PCFG)
        _, o = pm.step(pp, st, jnp.zeros((1, pm.PLC_INPUT_SIZE)), PCFG)
        assert float(o[0, 19]) <= 0.5


class TestPLCEngine:
    def test_all_good_passthrough(self, engine):
        B, T = 2, 6
        state = engine.init_state(B)
        pcm = _speech(B, T * FRAME_SIZE)
        outs = []
        for t in range(T):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            state, out = engine.step(state, fr, jnp.zeros((B,), bool))
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        np.testing.assert_allclose(got, pcm, rtol=0, atol=1e-3)

    def test_concealment_produces_audio(self, engine):
        B, T = 2, 8
        state = engine.init_state(B)
        pcm = _speech(B, T * FRAME_SIZE)
        lost_pattern = [0, 0, 0, 0, 1, 1, 0, 0]
        outs = []
        for t in range(T):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            lost = jnp.full((B,), bool(lost_pattern[t]))
            state, out = engine.step(state, fr, lost)
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        assert np.isfinite(got).all()
        # good frames before the loss are passed through
        np.testing.assert_allclose(got[:, 3 * FRAME_SIZE:4 * FRAME_SIZE],
                                   pcm[:, 3 * FRAME_SIZE:4 * FRAME_SIZE],
                                   atol=1e-3)
        assert int(state["loss_count"].max()) == 0  # reset after good frame

    def test_mixed_loss_patterns_per_stream(self, engine):
        B = 2
        state = engine.init_state(B)
        pcm = _speech(B, 4 * FRAME_SIZE)
        # stream 0 loses frame 2; stream 1 never loses
        for t in range(4):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            lost = jnp.asarray([t == 2, False])
            state, out = engine.step(state, fr, lost)
            out = np.asarray(out)
            # stream 1 must always pass through regardless of stream 0
            np.testing.assert_allclose(
                out[1], pcm[1, t * FRAME_SIZE:(t + 1) * FRAME_SIZE],
                atol=1e-3)

    def test_run_matches_step_loop(self, engine):
        """run() (one jitted scan over frames) must equal T step() calls."""
        import jax
        rs = np.random.RandomState(11)
        B, T = 2, 4
        pcm = rs.randn(B, T * 160).astype(np.float32) * 2000
        lost = rs.uniform(size=(B, T)) < 0.4
        s1 = engine.init_state(B)
        outs = []
        for t in range(T):
            s1, o = engine.step(s1, jnp.asarray(pcm[:, t * 160:
                                                    (t + 1) * 160]),
                                jnp.asarray(lost[:, t]))
            outs.append(np.asarray(o))
        ref = np.concatenate(outs, axis=-1)
        s2 = engine.init_state(B)
        s2, out = engine.run(s2, jnp.asarray(pcm), jnp.asarray(lost))
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)

    def test_fec_queue(self, engine):
        B = 2
        state = engine.init_state(B)
        feats = jnp.asarray(np.random.RandomState(5)
                            .randn(B, NB_FEATURES).astype(np.float32))
        state = engine.fec_add(state, feats)
        assert int(state["fec_fill"][0]) == 1
        pcm = _speech(B, FRAME_SIZE)
        # warm up a few good frames, then a loss consumes the FEC frame
        for _ in range(3):
            state, _ = engine.step(state, jnp.asarray(pcm),
                                   jnp.zeros((B,), bool))
        # good frames also discard queued FEC (lpcnet_plc.c:259-262)
        assert int(state["fec_read"][0]) >= 1
        state = engine.fec_clear(state)
        assert int(state["fec_fill"][0]) == 0


class TestStrictEngineFEC:
    def test_fec_frame_steers_concealment(self):
        """StrictCausalPLCEngine consumes queued FEC features on conceal
        (get_fec_or_pred, lpcnet_plc.c:147-166): with a distinctive FEC
        frame queued, the concealed audio differs from the no-FEC run and
        loss_count resets."""
        from lpcnet_tpu.models import lpcnet
        from lpcnet_tpu.plc import StrictCausalPLCEngine
        cfg = lpcnet.LPCNetConfig(approx=True)
        eng = StrictCausalPLCEngine(
            lpcnet.init_params(jax.random.PRNGKey(0), cfg),
            pm.init_params(jax.random.PRNGKey(1)), cfg)
        B = 1
        pcm = _speech(B, FRAME_SIZE)
        fec = jnp.full((B, NB_FEATURES), 0.8)

        def run(with_fec):
            st = eng.init_state(B)
            for _ in range(4):
                st, _ = eng.step(st, jnp.asarray(pcm),
                                 jnp.zeros((B,), bool))
            if with_fec:
                st = eng.fec_add(st, fec)
                # discard bookkeeping may have consumed earlier reads;
                # queue enough frames to survive the read position
                for _ in range(6):
                    st = eng.fec_add(st, fec)
            st, out = eng.step(st, jnp.zeros((B, FRAME_SIZE)),
                               jnp.ones((B,), bool))
            return st, np.asarray(out)

        st_f, out_f = run(True)
        st_n, out_n = run(False)
        assert not np.array_equal(out_f, out_n)
        # FEC satisfied the conceal -> loss_count reset (lpcnet_plc.c:322)
        assert int(st_f["loss_count"][0]) == 0
        assert int(st_n["loss_count"][0]) == 1


class TestPLCTraining:
    def test_loss_decreases(self):
        pp = pm.init_params(jax.random.PRNGKey(0), PCFG)
        opt = plc_task.make_optimizer(lr=3e-3)
        opt_state = opt.init(pp)
        rs = np.random.RandomState(0)
        feats = jnp.asarray(rs.randn(4, 16, 56).astype(np.float32) * 0.3)
        trace = jnp.asarray((rs.rand(4, 16) > 0.2).astype(np.float32))
        batch = plc_task.make_batch(jax.random.PRNGKey(1), feats, trace)
        first = None
        for i in range(10):
            pp, opt_state, m = plc_task.train_step(pp, opt_state, batch,
                                                   PCFG, opt)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first

    def test_lost_frames_hidden_from_input_and_supervised(self):
        """All-lost trace: inputs fully zeroed, and the loss mask is 1
        everywhere — concealment is supervised ON the lost frames (the
        reference's mask column is `1.0 - out_lost`, plc_loader.py:83)."""
        rs = np.random.RandomState(1)
        feats = jnp.asarray(rs.randn(2, 8, 56).astype(np.float32))
        trace = jnp.zeros((2, 8))
        batch = plc_task.make_batch(jax.random.PRNGKey(0), feats, trace)
        assert float(jnp.abs(batch["inputs"][..., :56]).max()) == 0.0
        assert float(batch["mask"].min()) == 1.0
        # all-received trace: nothing to conceal, mask all zero
        batch2 = plc_task.make_batch(jax.random.PRNGKey(0), feats,
                                     jnp.ones((2, 8)))
        assert float(batch2["mask"].max()) == 0.0


class TestNonCausalPLCEngine:
    @pytest.fixture(scope="class")
    def nc_engine(self):
        cfg = lm.LPCNetConfig(gru_a_units=64, gru_b_units=16, cond_size=32,
                              embed_sig_size=16, embed_pitch_size=8,
                              lookahead=0)
        lp = lm.init_params(jax.random.PRNGKey(0), cfg)
        pp = pm.init_params(jax.random.PRNGKey(1), PCFG)
        return plc_engine.NonCausalPLCEngine(lp, pp, cfg, PCFG)

    def test_requires_no_lookahead(self):
        lp = lm.init_params(jax.random.PRNGKey(0), CFG)
        pp = pm.init_params(jax.random.PRNGKey(1), PCFG)
        with pytest.raises(AssertionError):
            plc_engine.NonCausalPLCEngine(lp, pp, CFG, PCFG)

    def test_good_stream_is_delayed_passthrough(self, nc_engine):
        """With no losses, output equals the input delayed by 80 samples
        (the 5 ms lookahead, lpcnet_plc.c:441-444)."""
        B, T = 2, 6
        state = nc_engine.init_state(B)
        pcm = _speech(B, T * FRAME_SIZE)
        outs = []
        for t in range(T):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            state, out = nc_engine.step(state, fr, jnp.zeros((B,), bool))
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        off = 80
        np.testing.assert_allclose(got[:, off:], pcm[:, :-off], atol=1e-3)
        np.testing.assert_allclose(got[:, :off], 0.0, atol=1e-3)

    def test_concealment_and_recovery(self, nc_engine):
        B, T = 2, 8
        state = nc_engine.init_state(B)
        pcm = _speech(B, T * FRAME_SIZE)
        lost_pattern = [0, 0, 0, 1, 1, 0, 0, 0]
        outs = []
        for t in range(T):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            lost = jnp.full((B,), bool(lost_pattern[t]))
            state, out = nc_engine.step(state, fr, lost)
            outs.append(np.asarray(out))
        got = np.concatenate(outs, axis=1)
        assert np.isfinite(got).all()
        # frame 2's output (delayed frame-1 tail + frame-2 head) is clean
        np.testing.assert_allclose(
            got[:, 2 * FRAME_SIZE + 80:3 * FRAME_SIZE],
            pcm[:, 2 * FRAME_SIZE:3 * FRAME_SIZE - 80], atol=1e-3)
        # after recovery, passthrough resumes (delayed)
        np.testing.assert_allclose(
            got[:, 7 * FRAME_SIZE:], pcm[:, 7 * FRAME_SIZE - 80:-80],
            atol=1e-3)
        assert int(state["loss_count"].max()) == 0

    def test_per_stream_independence(self, nc_engine):
        B = 2
        state = nc_engine.init_state(B)
        pcm = _speech(B, 5 * FRAME_SIZE)
        for t in range(5):
            fr = jnp.asarray(pcm[:, t * FRAME_SIZE:(t + 1) * FRAME_SIZE])
            lost = jnp.asarray([t == 2, False])
            state, out = nc_engine.step(state, fr, lost)
            out = np.asarray(out)
            if t >= 1 and t not in (2, 3):
                np.testing.assert_allclose(
                    out[1, 80:],
                    pcm[1, t * FRAME_SIZE:(t + 1) * FRAME_SIZE - 80],
                    atol=1e-3)
