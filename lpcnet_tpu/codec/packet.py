"""64-bit packet pack/unpack for the 1.6 kb/s codec.

Bit layout (MSB-first, lpcnet_enc.c:724-733):
  c0_id+64:7 | main_pitch:6 | modulation:3 | corr_id:2 |
  vq_end0:10 | vq_end1:10 | vq_end2:10 | vq_mid:13 | interp_id:3
Total 64 bits = 8 bytes = LPCNET_COMPRESSED_SIZE.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

FIELDS = (("c0", 7), ("main_pitch", 6), ("modulation", 3), ("corr_id", 2),
          ("vq_end0", 10), ("vq_end1", 10), ("vq_end2", 10),
          ("vq_mid", 13), ("interp_id", 3))
assert sum(w for _, w in FIELDS) == 64


def pack(fields: Dict[str, jax.Array]) -> jax.Array:
    """fields: dict of (...,) int32 -> (..., 8) uint8, MSB-first."""
    bits = []
    for name, width in FIELDS:
        v = fields[name].astype(jnp.int32)
        for b in range(width - 1, -1, -1):
            bits.append((v >> b) & 1)
    bits = jnp.stack(bits, axis=-1)                     # (..., 64)
    bits = bits.reshape(bits.shape[:-1] + (8, 8))
    weights = jnp.asarray(1 << np.arange(7, -1, -1), jnp.int32)
    return jnp.sum(bits * weights, axis=-1).astype(jnp.uint8)


def unpack(buf: jax.Array) -> Dict[str, jax.Array]:
    """(..., 8) uint8 -> dict of (...,) int32 fields."""
    b = buf.astype(jnp.int32)
    bits = jnp.stack([(b >> k) & 1 for k in range(7, -1, -1)], axis=-1)
    bits = bits.reshape(bits.shape[:-2] + (64,))
    out = {}
    pos = 0
    for name, width in FIELDS:
        v = jnp.zeros(bits.shape[:-1], jnp.int32)
        for k in range(width):
            v = (v << 1) | bits[..., pos + k]
        out[name] = v
        pos += width
    return out
