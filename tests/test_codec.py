"""Codec tests: bit packing, VQ searches, encode/decode round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpcnet_tpu import features as F
from lpcnet_tpu.codec import codec, packet, vq, vq_train
from lpcnet_tpu.constants import NB_BANDS


class TestPacket:
    def test_pack_unpack_roundtrip(self):
        rs = np.random.RandomState(0)
        fields = {name: jnp.asarray(
            rs.randint(0, 1 << width, (16,)).astype(np.int32))
            for name, width in packet.FIELDS}
        buf = packet.pack(fields)
        assert buf.shape == (16, 8) and buf.dtype == jnp.uint8
        out = packet.unpack(buf)
        for name, _ in packet.FIELDS:
            np.testing.assert_array_equal(np.asarray(out[name]),
                                          np.asarray(fields[name]))

    def test_bit_layout_msb_first(self):
        # c0=0x7F into the 7 MSBs -> first byte 0b1111111_0
        fields = {name: jnp.zeros((1,), jnp.int32)
                  for name, _ in packet.FIELDS}
        fields["c0"] = jnp.asarray([0x7F], jnp.int32)
        buf = np.asarray(packet.pack(fields))
        assert buf[0, 0] == 0xFE and buf[0, 1:].sum() == 0


class TestVq:
    def test_nearest_matches_bruteforce(self):
        rs = np.random.RandomState(1)
        cb = jnp.asarray(rs.randn(64, 17).astype(np.float32))
        x = jnp.asarray(rs.randn(5, 17).astype(np.float32))
        idx, dist = vq.vq_nearest(cb, x)
        d = ((np.asarray(x)[:, None] - np.asarray(cb)[None]) ** 2).sum(-1)
        np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))
        np.testing.assert_allclose(np.asarray(dist), d.min(-1), rtol=1e-4,
                                   atol=1e-4)

    def test_3stage_reduces_error(self):
        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(32, 17).astype(np.float32))
        cbs = codec.default_codebooks(jax.random.PRNGKey(0))
        entries, recon = vq.quantize_3stage_mbest(
            x, cbs["cb1"], cbs["cb2"], cbs["cb3"])
        assert entries.shape == (32, 3)
        assert np.asarray(entries).min() >= 0
        assert np.asarray(entries).max() < 1024
        # beam search must beat greedy single-stage
        _, d1 = vq.vq_nearest(cbs["cb1"], x)
        err3 = ((np.asarray(recon) - np.asarray(x)) ** 2).sum(-1)
        assert (err3 <= np.asarray(d1) + 1e-4).all()

    def test_3stage_beats_greedy(self):
        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(64, 17).astype(np.float32))
        cbs = codec.default_codebooks(jax.random.PRNGKey(1))
        _, recon = vq.quantize_3stage_mbest(
            x, cbs["cb1"], cbs["cb2"], cbs["cb3"])
        # greedy (survivors=1)
        _, recon_g = vq.quantize_3stage_mbest(
            x, cbs["cb1"], cbs["cb2"], cbs["cb3"], survivors=1)
        err_b = ((np.asarray(recon) - np.asarray(x)) ** 2).sum()
        err_g = ((np.asarray(recon_g) - np.asarray(x)) ** 2).sum()
        assert err_b <= err_g + 1e-4

    def test_quantize_diff_sign_and_predictor(self):
        rs = np.random.RandomState(4)
        cb = jnp.asarray(rs.randn(64, 18).astype(np.float32))
        left = jnp.asarray(rs.randn(3, 18).astype(np.float32))
        right = jnp.asarray(rs.randn(3, 18).astype(np.float32))
        # entry 6 uses predictor 6&3==2 (left); x = left - cb[6] is then
        # exactly representable with negative sign
        x = left - cb[6]
        entry, recon = vq.quantize_diff(x, left, right, cb, bits=6)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(x),
                                   rtol=1e-4, atol=1e-4)

    def test_double_interp_skips_forbidden(self):
        rs = np.random.RandomState(5)
        args = [jnp.asarray(rs.randn(50, 18).astype(np.float32))
                for _ in range(5)]
        best = np.asarray(vq.double_interp_search(*args))
        assert best.min() >= 0 and best.max() < 8


class TestCodecRoundtrip:
    @pytest.fixture(scope="class")
    def setup(self):
        rs = np.random.RandomState(7)
        T = 8
        pcm = (np.sin(2 * np.pi * 120 / 16000 *
                      np.arange(T * 160)) * 5000 +
               rs.randn(T * 160) * 300).astype(np.float32)
        state = F.init_state(2)
        x = jnp.asarray(np.stack([pcm, pcm * 0.7]))
        state, feats, sps = F.compute_features(state, x, quantize_pitch=True)
        cbs = codec.default_codebooks(jax.random.PRNGKey(3))
        return feats, sps, cbs

    def test_encode_decode_consistent(self, setup):
        feats, sps, cbs = setup
        vq_mem = jnp.zeros((2, NB_BANDS))
        dec_mem = jnp.zeros((2, NB_BANDS))
        for g in range(2):
            fsf = feats[:, 4 * g:4 * (g + 1)]
            buf, fq, vq_mem = codec.encode_superframe(cbs, fsf, vq_mem,
                                                      sps[g])
            dec, dec_mem = codec.decode_packet(cbs, buf, dec_mem)
            # decoder must reproduce the encoder's quantized cepstra+pitch
            np.testing.assert_allclose(
                np.asarray(dec[..., :NB_BANDS]),
                np.asarray(fq[..., :NB_BANDS]), rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                np.asarray(dec[..., NB_BANDS:NB_BANDS + 2]),
                np.asarray(fq[..., NB_BANDS:NB_BANDS + 2]),
                rtol=1e-4, atol=1e-4)

    def test_packet_size(self, setup):
        feats, sps, cbs = setup
        buf, _, _ = codec.encode_superframe(
            cbs, feats[:, :4], jnp.zeros((2, NB_BANDS)), sps[0])
        assert buf.shape == (2, 8)


class TestScannedCodec:
    def test_encode_superframes_matches_sequential(self, setup=None):
        """The scanned throughput encoder must produce the same packets
        and vq_mem chain as per-superframe encode_superframe calls."""
        import jax
        from lpcnet_tpu import features as F
        rs = np.random.RandomState(12)
        B, S = 2, 3
        pcm = jnp.asarray(rs.randn(B, S * 640).astype(np.float32) * 3000)
        st = F.init_state(B)
        st, feats, sps = F.compute_features(st, pcm, quantize_pitch=True)
        cbs = codec.default_codebooks(jax.random.PRNGKey(0))
        mem = jnp.zeros((B, 18))
        seq = []
        m = mem
        for g in range(S):
            buf, _, m = codec.encode_superframe(
                cbs, feats[:, 4 * g:4 * (g + 1)], m, sps[g])
            seq.append(np.asarray(buf))
        bufs, fq, m2 = codec.encode_superframes(cbs, feats, mem, sps)
        np.testing.assert_array_equal(np.asarray(bufs),
                                      np.stack(seq, axis=1))
        np.testing.assert_allclose(np.asarray(m2), np.asarray(m),
                                   atol=1e-6)
        # scanned decoder round-trips the same features
        dec_seq = []
        dm = jnp.zeros((B, 18))
        for g in range(S):
            f, dm = codec.decode_packet(cbs, bufs[:, g], dm)
            dec_seq.append(np.asarray(f))
        decf, _ = codec.decode_packets(cbs, bufs, jnp.zeros((B, 18)))
        np.testing.assert_allclose(
            np.asarray(decf),
            np.concatenate(dec_seq, axis=1), atol=1e-6)


class TestVqTrain:
    def test_kmeans_reduces_distortion(self):
        rs = np.random.RandomState(8)
        x = jnp.asarray(rs.randn(2000, 17).astype(np.float32))
        cb = vq_train.kmeans(jax.random.PRNGKey(0), x, 16, iters=5)
        a = vq_train._assign(x, cb)
        err = ((np.asarray(x) - np.asarray(cb)[np.asarray(a)]) ** 2).mean()
        base = np.asarray(x).var()
        assert err < 0.9 * base

    def test_train_codec_codebooks_shapes(self):
        rs = np.random.RandomState(9)
        feats = jnp.asarray(rs.randn(256, 36).astype(np.float32))
        cbs = vq_train.train_codec_codebooks(jax.random.PRNGKey(1), feats,
                                             iters=2)
        assert cbs["cb1"].shape == (1024, 17)
        assert cbs["diff4"].shape == (4096, 18)

    def test_kmeans_weighted_respects_weights(self):
        """vq_train_weighted equivalent (ceps_vq_train.c:406-431): with
        weight concentrated on dim 0, the trained codebook must quantize
        dim 0 much better than an unweighted one at equal size."""
        rs = np.random.RandomState(10)
        x = jnp.asarray(rs.randn(3000, 8).astype(np.float32))
        w_dim0 = np.ones((3000, 8), np.float32) * 0.01
        w_dim0[:, 0] = 100.0
        cb_w = vq_train.kmeans_weighted(jax.random.PRNGKey(0), x,
                                        jnp.asarray(w_dim0), 16,
                                        iters=3, final_iters=5)
        cb_u = vq_train.kmeans(jax.random.PRNGKey(0), x, 16, iters=3,
                               final_iters=5)
        def dim0_err(cb, weighted):
            if weighted:
                d = jnp.sum(w_dim0[:, None, :] * (x[:, None, :] - cb) ** 2,
                            -1)
                a = jnp.argmin(d, -1)
            else:
                a = vq_train._assign(x, cb)
            return float(((x[:, 0] - cb[a, 0]) ** 2).mean())
        assert dim0_err(cb_w, True) < 0.5 * dim0_err(cb_u, False)


class TestShippedCodebooks:
    """The committed artifact (examples/codec_codebooks.bin, trained by
    tools/train_codebooks.py on a 100k-frame augmented speech corpus)
    must beat random placeholders by a wide margin on clean speech."""

    def test_quality_on_clean_speech(self):
        import os
        from lpcnet_tpu import features as F
        from lpcnet_tpu.codec.vq_train import _assign_chunked
        from lpcnet_tpu.utils import weights_io
        path = os.path.join(os.path.dirname(__file__), os.pardir,
                            "examples", "codec_codebooks.bin")
        cbs = {k: jnp.asarray(v)
               for k, v in weights_io.load_params(path).items()}
        assert cbs["cb1"].shape == (1024, 17)
        pcm = np.fromfile(os.path.join(os.path.dirname(__file__), "golden",
                                       "speech.s16"), np.int16)
        st = F.init_state(1)
        _, feats, _ = F.compute_features(
            st, jnp.asarray(pcm[None, :160 * 160].astype(np.float32)))
        x = feats[0, :, 1:18]
        r = x
        for key in ("cb1", "cb2", "cb3"):
            r = r - cbs[key][_assign_chunked(r, cbs[key])]
        rms = float(jnp.sqrt(jnp.mean(jnp.sum(r * r, -1) / 18.0)))
        # measured 0.047 on held-out; random placeholders measure 0.55
        assert rms < 0.15, rms
