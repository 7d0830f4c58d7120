""".fec interchange parity vs the ACTUAL reference C reader
(training_tf2/fec_packets.c:33-123, built by tools/ref_fec/build.sh).

utils/fec_packets.py claims binary compatibility with the reference .fec
container (int16 header + per-packet int16 rate + time-FLIPPED float32
subframes). This harness closes the proof: files written by our writer are
read back by the compiled reference get_fec_rate()/get_fec_frame() with
every rate equal and every subframe bit-identical, for both synthetic
packets and the end-to-end `fec-encode` CLI output.
"""
import os
import subprocess

import numpy as np
import pytest

from conftest import ref_build_skip

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def ref_reader(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("reffec")
    build = subprocess.run(
        ["bash", "tools/ref_fec/build.sh", "/root/reference", str(tmp)],
        capture_output=True, text=True)
    if build.returncode != 0:
        ref_build_skip(f"reference build failed: {build.stderr[-300:]}")
    return build.stdout.strip().splitlines()[-1]


def _c_read(reader, fec_path, out_path):
    r = subprocess.run([reader, fec_path, out_path],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    with open(out_path, "rb") as f:
        np_, sf, nf = np.frombuffer(f.read(12), np.int32)
        rates, packets = [], []
        for _ in range(np_):
            rates.append(int(np.frombuffer(f.read(4), np.int32)[0]))
            raw = np.frombuffer(f.read(4 * sf * nf), np.float32)
            packets.append(raw.reshape(sf, nf))
    return rates, packets


class TestFecInterchange:
    def test_writer_read_by_reference_c(self, ref_reader, tmp_path):
        from lpcnet_tpu.utils import fec_packets
        rng = np.random.RandomState(7)
        n, sf, nf = 5, 12, 20
        logical = [rng.randn(sf, nf).astype(np.float32) for _ in range(n)]
        rates = [64, 128, 256, 0, 512]
        fec = str(tmp_path / "ours.fec")
        fec_packets.write_fec_packets(fec, logical, rates)

        c_rates, c_packets = _c_read(ref_reader, fec,
                                     str(tmp_path / "c.bin"))
        assert c_rates == rates
        for p, cp in zip(logical, c_packets):
            # the C reader returns subframes in STORED (time-flipped) order:
            # stored subframe s == logical subframe sf-1-s
            np.testing.assert_array_equal(cp, p[::-1])

        # and our own reader round-trips the logical order
        back, back_rates = fec_packets.read_fec_packets(fec)
        assert back_rates == rates
        for p, b in zip(logical, back):
            np.testing.assert_array_equal(b, p)

    def test_cli_fec_encode_read_by_reference_c(self, ref_reader, tmp_path):
        """End-to-end: audio -> `fec-encode` .fec -> reference C reader."""
        from lpcnet_tpu import cli
        from lpcnet_tpu.utils import fec_packets
        fec = str(tmp_path / "app.fec")
        rc = cli.main(["fec-encode", os.path.join(GOLDEN, "speech.s16"),
                       fec, "--num-redundancy", "4"])
        assert rc == 0
        ours, our_rates = fec_packets.read_fec_packets(fec)
        c_rates, c_packets = _c_read(ref_reader, fec,
                                     str(tmp_path / "c.bin"))
        assert c_rates == our_rates and len(c_packets) == len(ours)
        for p, cp in zip(ours, c_packets):
            np.testing.assert_array_equal(cp, np.asarray(p)[::-1])
        assert np.isfinite(np.concatenate(c_packets)).all()
