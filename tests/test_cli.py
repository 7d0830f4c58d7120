"""End-to-end CLI tests: every tool runs on tiny inputs (random-init
models). Mirrors the reference's manual workflows (README.md:119-131,
src/lpcnet_demo.c) as automated round trips."""
import os
import subprocess
import sys

import numpy as np
import pytest

from lpcnet_tpu import cli
from lpcnet_tpu.constants import (FRAME_SIZE, LPCNET_COMPRESSED_SIZE,
                                  NB_BANDS, NB_FEATURES, NB_TOTAL_FEATURES)


def make_pcm(path, n_frames=8, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n_frames * FRAME_SIZE)
    pcm = (4000 * np.sin(2 * np.pi * 125 / 16000 * t)
           + 200 * rs.randn(len(t))).astype(np.int16)
    pcm.tofile(path)
    return pcm


def run(args):
    rc = cli.main([str(a) for a in args])
    assert rc == 0


class TestAudioTools:
    def test_features_synthesis_roundtrip(self, tmp_path):
        pcm = make_pcm(tmp_path / "in.pcm")
        f32 = tmp_path / "f.f32"
        out = tmp_path / "out.pcm"
        run(["features", tmp_path / "in.pcm", f32])
        feats = np.fromfile(f32, np.float32).reshape(-1, NB_TOTAL_FEATURES)
        assert feats.shape[0] == 8
        assert np.isfinite(feats).all()
        run(["synthesis", f32, out, "--backend", "scan"])
        res = np.fromfile(out, np.int16)
        assert res.size == 8 * FRAME_SIZE

    def test_encode_decode(self, tmp_path):
        make_pcm(tmp_path / "in.pcm")
        bits = tmp_path / "c.bin"
        out = tmp_path / "out.pcm"
        run(["encode", tmp_path / "in.pcm", bits])
        assert os.path.getsize(bits) == 2 * LPCNET_COMPRESSED_SIZE  # 2 sf
        run(["decode", bits, out, "--backend", "scan"])
        assert np.fromfile(out, np.int16).size == 2 * 640

    def test_plc(self, tmp_path):
        make_pcm(tmp_path / "in.pcm")
        trace = tmp_path / "err.txt"
        trace.write_text("0\n0\n1\n0\n")
        out = tmp_path / "out.pcm"
        run(["plc", trace, tmp_path / "in.pcm", out])
        res = np.fromfile(out, np.int16)
        assert res.size == 8 * FRAME_SIZE

    @pytest.mark.parametrize("mode", ["noncausal_dc", "strict"])
    def test_plc_modes(self, tmp_path, mode):
        """The round-2 PLC methods are reachable through the CLI and
        output sample-aligned audio."""
        make_pcm(tmp_path / "in.pcm")
        trace = tmp_path / "err.txt"
        trace.write_text("0\n1\n")
        out = tmp_path / "out.pcm"
        run(["plc", trace, tmp_path / "in.pcm", out, "--options", mode])
        res = np.fromfile(out, np.int16)
        assert res.size == 8 * FRAME_SIZE
        # concealed region must carry sane energy, not clipped garbage
        con = res[2 * FRAME_SIZE:4 * FRAME_SIZE].astype(float)
        assert con.std() < 20000, con.std()

    def test_plc_test_tool(self, tmp_path):
        rs = np.random.RandomState(3)
        T = 12
        width = 2 * NB_BANDS + NB_FEATURES + 1
        data = rs.randn(T, width).astype(np.float32) * 0.1
        data[:, -1] = (rs.uniform(size=T) < 0.3)
        (tmp_path / "in.f32").write_bytes(data.tobytes())
        run(["plc-test", tmp_path / "in.f32", tmp_path / "out.f32"])
        out = np.fromfile(tmp_path / "out.f32", np.float32)
        assert out.size == T * NB_FEATURES and np.isfinite(out).all()


class TestDataAndTraining:
    def test_dump_data_test_mode(self, tmp_path):
        make_pcm(tmp_path / "in.pcm")
        run(["dump-data", "test", tmp_path / "in.pcm", tmp_path / "f.f32"])
        feats = np.fromfile(tmp_path / "f.f32", np.float32)
        assert feats.size == 8 * NB_TOTAL_FEATURES

    def test_dump_data_train_and_train_lpcnet(self, tmp_path):
        make_pcm(tmp_path / "in.pcm", n_frames=80)
        f32, s16 = tmp_path / "f.f32", tmp_path / "d.s16"
        run(["dump-data", "train", tmp_path / "in.pcm", f32, s16])
        data = np.fromfile(s16, np.int16).reshape(-1, 2)
        assert data.shape[0] == 80 * FRAME_SIZE
        outdir = tmp_path / "run"
        run(["train-lpcnet", f32, s16, outdir, "--epochs", "1",
             "--batch-size", "2", "--steps-per-epoch", "1"])
        ck = outdir / "ckpt_000.bin"
        assert ck.exists()
        # resume from the checkpoint
        run(["train-lpcnet", f32, s16, outdir, "--epochs", "1",
             "--batch-size", "2", "--steps-per-epoch", "1",
             "--resume", ck])

    def test_dump_data_btrain_feeds_train_plc(self, tmp_path):
        """-btrain layout [burg36|feat36] -> PLC trainer end-to-end
        (dump_data.c:145-150, train_plc.py:246-260)."""
        make_pcm(tmp_path / "in.pcm", n_frames=120)
        f32, s16 = tmp_path / "bf.f32", tmp_path / "bd.s16"
        run(["dump-data", "btrain", tmp_path / "in.pcm", f32, s16])
        feats = np.fromfile(f32, np.float32)
        assert feats.size == 120 * (2 * NB_BANDS + NB_TOTAL_FEATURES)
        run(["train-plc", f32, tmp_path / "run", "--epochs", "1",
             "--batch-size", "2", "--seq-len", "30",
             "--steps-per-epoch", "1"])
        assert (tmp_path / "run" / "ckpt_000.bin").exists()

    def test_dump_data_btest(self, tmp_path):
        make_pcm(tmp_path / "in.pcm")
        run(["dump-data", "btest", tmp_path / "in.pcm", tmp_path / "f.f32"])
        feats = np.fromfile(tmp_path / "f.f32", np.float32)
        assert feats.size == 8 * (2 * NB_BANDS + NB_TOTAL_FEATURES)
        assert np.isfinite(feats).all()

    def test_train_plc(self, tmp_path):
        rs = np.random.RandomState(5)
        width = 2 * NB_BANDS + NB_FEATURES
        feats = (rs.randn(4 * 50, width) * 0.1).astype(np.float32)
        (tmp_path / "f.f32").write_bytes(feats.tobytes())
        run(["train-plc", tmp_path / "f.f32", tmp_path / "run",
             "--epochs", "1", "--batch-size", "2", "--seq-len", "50",
             "--steps-per-epoch", "1"])
        assert (tmp_path / "run" / "ckpt_000.bin").exists()

    def test_train_rdovae(self, tmp_path):
        rs = np.random.RandomState(6)
        feats = (rs.randn(4 * 40, NB_TOTAL_FEATURES) * 0.1
                 ).astype(np.float32)
        (tmp_path / "f.f32").write_bytes(feats.tobytes())
        run(["train-rdovae", tmp_path / "f.f32", tmp_path / "run",
             "--epochs", "1", "--batch-size", "2", "--seq-len", "40",
             "--steps-per-epoch", "1"])
        assert (tmp_path / "run" / "ckpt_000.bin").exists()

    def test_vq_train(self, tmp_path):
        rs = np.random.RandomState(7)
        feats = (rs.randn(300, NB_TOTAL_FEATURES) * 0.5).astype(np.float32)
        (tmp_path / "f.f32").write_bytes(feats.tobytes())
        run(["vq-train", tmp_path / "f.f32", tmp_path / "cb.bin",
             "--iters", "1"])
        assert (tmp_path / "cb.bin").exists()


class TestDredTools:
    def test_rdovae_encode_decode(self, tmp_path):
        rs = np.random.RandomState(8)
        feats = (rs.randn(32, NB_TOTAL_FEATURES) * 0.1).astype(np.float32)
        (tmp_path / "f.f32").write_bytes(feats.tobytes())
        lat = tmp_path / "lat.bin"
        run(["rdovae-encode", tmp_path / "f.f32", lat])
        assert lat.exists() and (tmp_path / "lat.bin.state").exists()
        run(["rdovae-decode", lat, tmp_path / "out.f32"])
        out = np.fromfile(tmp_path / "out.f32", np.float32)
        assert out.size % NB_TOTAL_FEATURES == 0 and np.isfinite(out).all()

    def test_fec_encode(self, tmp_path):
        make_pcm(tmp_path / "in.pcm", n_frames=160)
        fec = tmp_path / "out.fec"
        run(["fec-encode", tmp_path / "in.pcm", fec,
             "--num-redundancy", "4"])
        from lpcnet_tpu.utils import fec_packets
        packets, rates = fec_packets.read_fec_packets(str(fec))
        assert len(packets) >= 1
        assert packets[0].shape == (16, NB_TOTAL_FEATURES)


class TestWeightsBlob:
    def test_dump_weights_blob(self, tmp_path):
        import jax
        from lpcnet_tpu.models import plc as plc_model
        from lpcnet_tpu.utils import weights_io
        params = plc_model.init_params(jax.random.PRNGKey(0))
        ck = tmp_path / "plc.bin"
        weights_io.save_params(str(ck), jax.tree.map(np.asarray, params))
        out = tmp_path / "blob.bin"
        run(["dump-weights-blob", out, f"plc={ck}"])
        blob = weights_io.read_blob(str(out))
        assert len(blob) > 3

    def test_dump_data_qtrain_qtest(self, tmp_path):
        """Quantized-feature data prep (-qtrain/-qtest,
        dump_data.c:154-161): features pass through the codec so models
        train on decoder-side conditioning."""
        make_pcm(tmp_path / "in.pcm", n_frames=8)
        run(["dump-data", "qtest", tmp_path / "in.pcm", tmp_path / "q.f32"])
        run(["dump-data", "test", tmp_path / "in.pcm", tmp_path / "u.f32"])
        q = np.fromfile(tmp_path / "q.f32", np.float32).reshape(-1, 36)
        u = np.fromfile(tmp_path / "u.f32", np.float32).reshape(-1, 36)
        assert q.shape == u.shape and np.isfinite(q).all()
        assert not np.allclose(q[:, :18], u[:, :18])   # quantized
        make_pcm(tmp_path / "tr.pcm", n_frames=40)
        run(["dump-data", "qtrain", tmp_path / "tr.pcm",
             tmp_path / "qf.f32", tmp_path / "qd.s16"])
        assert np.fromfile(tmp_path / "qd.s16", np.int16).size == 2 * 40 * 160

    def test_addlpc(self, tmp_path):
        make_pcm(tmp_path / "in.pcm")
        run(["features", tmp_path / "in.pcm", tmp_path / "f.f32"])
        run(["addlpc", tmp_path / "f.f32", tmp_path / "fl.f32"])
        a = np.fromfile(tmp_path / "f.f32", np.float32).reshape(-1, 36)
        b = np.fromfile(tmp_path / "fl.f32", np.float32).reshape(-1, 36)
        np.testing.assert_allclose(a[:, :20], b[:, :20])
        # recomputed LPC matches the extractor's own (same formula)
        np.testing.assert_allclose(a[:, 22:], b[:, 22:], atol=1e-5)
