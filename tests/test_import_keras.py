"""Keras h5 import: layout mapping from the reference training stack
(training_tf2/lpcnet.py layer names / shapes) into our param pytrees."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from lpcnet_tpu.utils import import_keras

NA, NB, NC, ES, EP = 96, 16, 48, 32, 24


def _w(g, layer, weights):
    lg = g.create_group(layer).create_group(layer)
    for name, arr in weights.items():
        lg.create_dataset(f"{name}:0", data=arr.astype(np.float32))


def make_lpcnet_h5(path, seed=0):
    rs = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        _w(g, "embed_pitch", {"embeddings": rs.randn(256, EP)})
        _w(g, "feature_conv1", {"kernel": rs.randn(3, 20 + EP, NC),
                                "bias": rs.randn(NC)})
        _w(g, "feature_conv2", {"kernel": rs.randn(3, NC, NC),
                                "bias": rs.randn(NC)})
        _w(g, "feature_dense1", {"kernel": rs.randn(NC, NC),
                                 "bias": rs.randn(NC)})
        _w(g, "feature_dense2", {"kernel": rs.randn(NC, NC),
                                 "bias": rs.randn(NC)})
        _w(g, "embed_sig", {"embeddings": rs.randn(256, ES)})
        _w(g, "gru_a", {"kernel": rs.randn(3 * ES + NC, 3 * NA),
                        "recurrent_kernel": rs.randn(NA, 3 * NA),
                        "bias": rs.randn(2, 3 * NA)})
        _w(g, "gru_b", {"kernel": rs.randn(NA + NC, 3 * NB),
                        "recurrent_kernel": rs.randn(NB, 3 * NB),
                        "bias": rs.randn(2, 3 * NB)})
        _w(g, "dual_fc", {"kernel": rs.randn(256, NB, 2),
                          "bias": rs.randn(256, 2),
                          "factor": rs.randn(256, 2)})
        _w(g, "parameters", {"lpc_gamma": np.array([0.9]),
                             "flag_e2e": np.array([0.0]),
                             "lookahead": np.array([2.0])})


def make_plc_h5(path, seed=1):
    rs = np.random.RandomState(seed)
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        _w(g, "plc_dense1", {"kernel": rs.randn(57, 32),
                             "bias": rs.randn(32)})
        _w(g, "plc_gru1", {"kernel": rs.randn(32, 3 * 48),
                           "recurrent_kernel": rs.randn(48, 3 * 48),
                           "bias": rs.randn(2, 3 * 48)})
        _w(g, "plc_gru2", {"kernel": rs.randn(48, 3 * 48),
                           "recurrent_kernel": rs.randn(48, 3 * 48),
                           "bias": rs.randn(2, 3 * 48)})
        _w(g, "plc_out", {"kernel": rs.randn(48, 20),
                          "bias": rs.randn(20)})


class TestImportLPCNet:
    def test_shapes_and_config(self, tmp_path):
        p = tmp_path / "m.h5"
        make_lpcnet_h5(p)
        params, cfg = import_keras.import_lpcnet_h5(str(p))
        assert cfg.gru_a_units == NA and cfg.gru_b_units == NB
        assert cfg.cond_size == NC and cfg.embed_sig_size == ES
        assert cfg.lpc_gamma == pytest.approx(0.9)
        assert cfg.lookahead == 2 and not cfg.e2e
        assert params["gru_a"]["wi"].shape == (3 * ES + NC, 3 * NA)
        assert params["gru_a"]["bi"].shape == (3 * NA,)
        assert params["dual_fc"]["w"].shape == (2, NB, 256)
        assert params["dual_fc"]["b"].shape == (2, 256)

    def test_dual_fc_transpose_orientation(self, tmp_path):
        """kernel[u, i, c] must land at w[c, i, u] (mdense.py:46-49
        computes out[u, c] = sum_i x[i] k[u, i, c]; ours einsum
        bi,cio->bco)."""
        p = tmp_path / "m.h5"
        make_lpcnet_h5(p, seed=3)
        with h5py.File(p, "r+") as f:
            k = np.zeros((256, NB, 2), np.float32)
            k[7, 3, 1] = 42.0
            del f["model_weights/dual_fc/dual_fc/kernel:0"]
            f["model_weights/dual_fc/dual_fc"].create_dataset(
                "kernel:0", data=k)
        params, _ = import_keras.import_lpcnet_h5(str(p))
        assert params["dual_fc"]["w"][1, 3, 7] == 42.0
        assert params["dual_fc"]["w"].sum() == 42.0

    def test_synthesis_runs_with_imported_model(self, tmp_path):
        import jax.numpy as jnp
        from lpcnet_tpu.vocoder import Synthesizer
        p = tmp_path / "m.h5"
        make_lpcnet_h5(p)
        params, cfg = import_keras.import_lpcnet_h5(str(p))
        voc = Synthesizer(cfg, params=params, backend="scan")
        state = voc.reset(2)
        feats = jnp.zeros((2, 1, 36))
        state, pcm = voc.synthesize(state, feats)
        assert pcm.shape == (2, 160)
        assert bool(jnp.isfinite(pcm).all())

    def test_gru_bias_1d_fallback(self, tmp_path):
        p = tmp_path / "m.h5"
        make_lpcnet_h5(p)
        with h5py.File(p, "r+") as f:
            b = np.asarray(f["model_weights/gru_b/gru_b/bias:0"])[0]
            del f["model_weights/gru_b/gru_b/bias:0"]
            f["model_weights/gru_b/gru_b"].create_dataset("bias:0", data=b)
        params, _ = import_keras.import_lpcnet_h5(str(p))
        assert params["gru_b"]["br"].sum() == 0.0

    def test_missing_layer_error_names_it(self, tmp_path):
        p = tmp_path / "m.h5"
        make_lpcnet_h5(p)
        with h5py.File(p, "r+") as f:
            del f["model_weights/gru_a"]
        with pytest.raises(KeyError, match="gru_a"):
            import_keras.import_lpcnet_h5(str(p))


class TestImportPLC:
    def test_plc_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        from lpcnet_tpu.models import plc as pm
        p = tmp_path / "plc.h5"
        make_plc_h5(p)
        params, cfg = import_keras.import_plc_h5(str(p))
        assert cfg.gru_size == 48 and cfg.dense_size == 32
        st = pm.init_net_state(3, cfg)
        st, out = pm.step(params, st, jnp.zeros((3, 57)), cfg)
        assert out.shape == (3, 20)
