"""Training-path tests: losses, differentiable DSP, train step, dp mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu.models import lpcnet
from lpcnet_tpu.training import losses, lpcnet_task
from lpcnet_tpu.parallel import mesh as pmesh

CFG = lpcnet.LPCNetConfig(gru_a_units=64, gru_b_units=16, cond_size=32,
                          embed_sig_size=16, embed_pitch_size=8,
                          frame_size=40)


def _batch(B=4, T=3, rs=None):
    rs = rs or np.random.RandomState(0)
    S = T * CFG.frame_size
    # valid (minimum-phase) LPC: generate from reflection coeffs in (-1, 1)
    rc = np.tanh(rs.randn(B, T, 16)).astype(np.float32) * 0.6
    lpc = np.asarray(losses.rc2lpc(jnp.asarray(rc)))
    return {
        "sig_in": rs.randn(B, S).astype(np.float32) * 1000,
        "sig_out": rs.randn(B, S).astype(np.float32) * 1000,
        "features": rs.randn(B, T + 4, 20).astype(np.float32) * 0.3,
        "periods": rs.randint(33, 255, (B, T + 4)).astype(np.int32),
        "lpc": lpc,
    }


class TestLossPieces:
    def test_l2u_u2l_roundtrip(self):
        x = jnp.linspace(-30000, 30000, 101)
        np.testing.assert_allclose(np.asarray(losses.u2l(losses.l2u(x))),
                                   np.asarray(x), rtol=1e-3, atol=60)

    def test_l2u_matches_integer_mulaw(self):
        from lpcnet_tpu.ops.mulaw import lin2ulaw
        x = jnp.linspace(-30000, 30000, 101)
        cont = np.round(np.asarray(losses.l2u(x)))
        hard = np.asarray(lin2ulaw(x))
        assert (np.abs(cont - hard) <= 1).all()

    def test_tree_to_pdf_normalized(self):
        rs = np.random.RandomState(1)
        p = jax.nn.sigmoid(jnp.asarray(rs.randn(2, 5, 256), jnp.float32))
        pdf = losses.tree_to_pdf(p)
        np.testing.assert_allclose(np.asarray(pdf.sum(-1)), 1.0, rtol=1e-5)
        assert np.asarray(pdf).min() >= 0

    def test_tree_to_pdf_leaf_path(self):
        # pdf[j] must be the product of node probs along j's binary path
        rs = np.random.RandomState(2)
        p = jax.nn.sigmoid(jnp.asarray(rs.randn(1, 1, 256), jnp.float32))
        pdf = np.asarray(losses.tree_to_pdf(p))[0, 0]
        pn = np.asarray(p)[0, 0]
        for j in [0, 1, 77, 128, 255]:
            prob, val = 1.0, 0
            for b in range(8):
                bit = (j >> (7 - b)) & 1
                node = (1 << b) | val
                prob *= pn[node] if bit else 1 - pn[node]
                val = (val << 1) | bit
            np.testing.assert_allclose(pdf[j], prob, rtol=1e-5)

    def test_diff_pred_matches_scalar(self):
        rs = np.random.RandomState(3)
        x = rs.randn(1, 80).astype(np.float32)
        lpc = rs.randn(1, 2, 16).astype(np.float32) * 0.2
        got = np.asarray(losses.diff_pred(jnp.asarray(x), jnp.asarray(lpc),
                                          frame_size=40))
        xp = np.concatenate([np.zeros((1, 16), np.float32), x], axis=1)
        for s in [0, 1, 17, 39, 40, 79]:
            want = -sum(lpc[0, s // 40, i] * xp[0, 16 + s - i]
                        for i in range(16))
            np.testing.assert_allclose(got[0, s], want, rtol=2e-4, atol=1e-4)

    def test_rc_lpc_roundtrip(self):
        rs = np.random.RandomState(4)
        rc = jnp.asarray(np.tanh(rs.randn(3, 2, 16)) * 0.7, jnp.float32)
        lpc = losses.rc2lpc(rc)
        back = losses.lpc2rc(lpc)
        np.testing.assert_allclose(np.asarray(back), np.asarray(rc),
                                   rtol=1e-3, atol=1e-4)

    def test_rc2lpc_matches_inference_version(self):
        rs = np.random.RandomState(5)
        rc = jnp.asarray(np.tanh(rs.randn(2, 16)) * 0.7, jnp.float32)
        a = losses.rc2lpc(rc)
        b = lpcnet.rc2lpc(rc)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)


class TestTrainStep:
    def test_loss_decreases(self):
        params = lpcnet.init_params(jax.random.PRNGKey(0), CFG)
        opt = lpcnet_task.make_optimizer(lr=3e-3)
        opt_state = opt.init(params)
        batch = jax.tree.map(jnp.asarray, _batch())
        rng = jax.random.PRNGKey(1)
        first = None
        for i in range(8):
            params, opt_state, m = lpcnet_task.train_step(
                params, opt_state, batch, jax.random.fold_in(rng, i), CFG, opt)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first

    def test_weight_clip_constraint(self):
        params = lpcnet.init_params(jax.random.PRNGKey(0), CFG)
        big = jax.tree.map(lambda x: x * 10, params)
        clipped = lpcnet_task.weight_clip(big, c=0.992)
        wr = np.asarray(clipped["gru_a"]["wr"])
        pair = np.abs(wr[0::2]) + np.abs(wr[1::2])
        assert pair.max() <= 0.992 + 1e-5

    def test_e2e_mode_runs(self):
        cfg = lpcnet.LPCNetConfig(**{**CFG.__dict__, "e2e": True})
        params = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
        batch = jax.tree.map(jnp.asarray, _batch())
        loss, m = lpcnet_task.loss_fn(params, batch, cfg,
                                      jax.random.PRNGKey(2))
        assert np.isfinite(float(loss))


class TestMesh:
    def test_dryrun_multichip(self):
        pmesh.dryrun_training_step(8)

    def test_sharded_matches_single_device(self):
        params = lpcnet.init_params(jax.random.PRNGKey(0), CFG)
        batch = jax.tree.map(jnp.asarray, _batch(B=8))
        loss1, _ = lpcnet_task.loss_fn(params, batch, CFG, None, train=False)
        m = pmesh.make_mesh()
        pb = pmesh.shard_batch(batch, m)
        pp = jax.device_put(params, pmesh.replicated(m))
        loss2, _ = jax.jit(
            lambda p, b: lpcnet_task.loss_fn(p, b, CFG, None, train=False)
        )(pp, pb)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
