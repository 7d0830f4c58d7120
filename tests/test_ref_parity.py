"""File-level golden parity vs the ACTUAL reference C feature extractor.

tests/golden/ref_feats.f32 was produced by the reference's own dump_data
binary (`./dump_data -test speech.s16 ref_feats.f32`), built from
/root/reference sources with model-data stubs (tools/build_ref_dump_data.sh
— the -test path never touches model weights).

Alignment note (documented divergence): the reference's read loop
processes each frame one iteration late — it assigns `x = tmp` (the
PREVIOUS fread) before reading the next frame (dump_data.c:215-216), and
tmp starts zero-filled (dump_data.c:129). So ref_feats[0] is the all-zeros
warm-up frame and ref_feats[i+1] corresponds to our features[i]. Residual
differences after shifting come from kiss_fft vs XLA rfft floats and the
reference's +-0.5 input dither (dump_data.c:272).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

from lpcnet_tpu.constants import NB_TOTAL_FEATURES

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    ref = np.fromfile(os.path.join(GOLDEN, "ref_feats.f32"),
                      np.float32).reshape(-1, NB_TOTAL_FEATURES)
    out = tmp_path_factory.mktemp("parity") / "our.f32"
    from lpcnet_tpu import cli
    rc = cli.main(["dump-data", "test",
                   os.path.join(GOLDEN, "speech.s16"), str(out)])
    assert rc == 0
    ours = np.fromfile(out, np.float32).reshape(-1, NB_TOTAL_FEATURES)
    n = min(len(ref) - 1, len(ours))
    return ref[1:1 + n], ours[:n]     # shift: ref[i+1] == ours[i]


class TestReferenceFeatureParity:
    def test_cepstra(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, :18] - ours[:, :18])
        assert d.mean() < 0.02, d.mean()
        assert d.max() < 0.6, d.max()     # dither-driven tail

    def test_pitch_period(self, pair):
        ref, ours = pair
        # feature 18 = 0.02*(period-100): mean within ~1 sample of period
        d = np.abs(ref[:, 18] - ours[:, 18])
        assert np.median(d) < 0.02, np.median(d)
        assert d.mean() < 0.1, d.mean()

    def test_pitch_corr(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 19] - ours[:, 19])
        assert d.mean() < 0.05, d.mean()

    def test_lpc(self, pair):
        ref, ours = pair
        d = np.abs(ref[:, 20:] - ours[:, 20:])
        assert d.mean() < 0.02, d.mean()

    def test_warmup_frame_is_silence(self):
        ref = np.fromfile(os.path.join(GOLDEN, "ref_feats.f32"),
                          np.float32).reshape(-1, NB_TOTAL_FEATURES)
        # the reference's frame 0 comes from an all-zero buffer: c0 ~ -12
        assert ref[0, 0] < -8
