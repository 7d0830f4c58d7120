"""FEC packet file I/O (.fec), binary-compatible with the reference format
(training_tf2/fec_packets.py:33-109 and the C reader fec_packets.c:33-123).

Layout: int16 header [version=1, header_size=14, num_packets, packet_size,
subframe_size, subframes_per_packet, num_features], then per packet an
int16 rate followed by time-FLIPPED float32 feature subframes.
"""
from typing import List, Optional, Tuple

import numpy as np

VERSION = 1
HEADER_SIZE = 14


def write_fec_packets(filename: str, packets: List[np.ndarray],
                      rates: Optional[List[int]] = None) -> None:
    num_packets = len(packets)
    subframes, num_features = packets[0].shape[-2:]
    subframe_size = num_features * 4
    packet_size = subframe_size * subframes + 2
    header = np.array([VERSION, HEADER_SIZE, num_packets, packet_size,
                       subframe_size, subframes, num_features], np.int16)
    with open(filename, "wb") as f:
        f.write(header.tobytes())
        for i, p in enumerate(packets):
            rate = 0 if rates is None else int(rates[i])
            f.write(np.int16(rate).tobytes())
            f.write(np.flip(np.asarray(p, np.float32), axis=-2).tobytes())


def read_fec_packets(filename: str) -> Tuple[List[np.ndarray], List[int]]:
    with open(filename, "rb") as f:
        header = np.frombuffer(f.read(14), dtype=np.int16)
        version, header_size, num_packets, packet_size, subframe_size, \
            subframes, num_features = (int(v) for v in header)
        assert version == VERSION and header_size == HEADER_SIZE
        packets, rates = [], []
        for _ in range(num_packets):
            rates.append(int(np.frombuffer(f.read(2), dtype=np.int16)[0]))
            raw = np.frombuffer(f.read(subframe_size * subframes),
                                dtype=np.float32)
            packets.append(np.flip(raw.reshape(subframes, num_features),
                                   axis=-2).copy())
    return packets, rates
