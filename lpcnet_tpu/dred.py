"""DRED application layer: encode feature redundancy, decode on loss.

Mirrors the reference pipeline (training_tf2/fec_encoder.py:200-305 and the
C inference src/dred_rdovae.c): features are encoded to 50 Hz latents; a
redundancy payload for packet n carries the latents of the last
`num_dframes` 20-ms dframes, quantized with per-position quantizers that get
coarser with age (q_levels ramp), plus the PVQ-quantized decoder resume
state of the oldest dframe. On loss, the decoder reconstructs the feature
history from the latest received payload.
"""
import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import rdovae as rv


@dataclasses.dataclass(frozen=True)
class DREDConfig:
    num_dframes: int = 16          # redundancy span: 16 * 20 ms = 320 ms
    # lambda levels: HIGH q = HIGH lambda = LOW rate (the loss weights
    # distortion by 1/sqrt(lambda) and rate by sqrt(lambda),
    # rdovae.py:129-170) — so q3 is the FINE end and q15 the COARSE end.
    # The reference ramps q15 at the oldest redundancy position to q3 at
    # the newest (fec_encoder.py:200-209 applied over the per-packet
    # window at :242-243): older redundancy is coarser.
    q0: int = 3                    # newest dframe quant level (finest)
    q1: int = 15                   # oldest dframe quant level (coarsest)


def quant_id_ramp(cfg: DREDConfig) -> np.ndarray:
    """Per-position quantizer ids, newest -> oldest (fec_encoder.py:200-209:
    older redundancy is coarser; ids index the lambda embedding).

    Round-4 fix: this ramp previously ran q15 -> q3 newest -> oldest,
    giving the NEWEST dframe the coarsest level — invisible while the
    shipped checkpoint's levels were undertrained and interchangeable,
    wrong (and measurably so) now that the levels span a real
    rate-distortion range."""
    i = np.arange(cfg.num_dframes, dtype=np.float32)
    ramp = cfg.q0 + (cfg.q1 - cfg.q0) * i / max(1, cfg.num_dframes - 1)
    return np.round(ramp).astype(np.int32)


class DREDCodec:
    def __init__(self, params, cfg: rv.RDOVAEConfig = rv.RDOVAEConfig(),
                 dred_cfg: DREDConfig = DREDConfig()):
        self.params = params
        self.cfg = cfg
        self.dred = dred_cfg
        self._encode = jax.jit(self._encode_impl)
        self._decode = jax.jit(self._decode_impl)

    def _encode_impl(self, feats):
        """feats: (B, T, 20), T % 4 == 0. Returns per-dframe quantized
        symbols (B, T/4, 80) int32, per-dframe PVQ states (B, T/4, 24),
        and the dequantization scales used."""
        z, state = rv.encode(self.params, feats, self.cfg)
        # dframe rate = every 2nd pair step (offset 1 = end of dframe)
        zd = z[:, 1::2]
        sd = rv.pvq_quantize(state[:, 1::2], self.cfg.pvq_k)
        return zd, sd

    def encode(self, feats):
        return self._encode(feats)

    def quantize_payload(self, zd):
        """Quantize the last num_dframes latents with the age ramp.
        zd: (B, S, 80) with S >= num_dframes. Returns (symbols int32,
        quant ids used)."""
        n = self.dred.num_dframes
        qid = jnp.asarray(quant_id_ramp(self.dred))          # (n,) new->old
        tail = zd[:, -n:][:, ::-1]                           # newest first
        qp = rv.quant_params(self.params, qid, self.cfg)
        ze = tail * qp["scale"]
        dze = rv.apply_dead_zone(ze, qp["dead_zone"])
        sym = jnp.round(dze).astype(jnp.int32)
        return sym, qid

    def _decode_impl(self, sym, qid, state):
        """Reconstruct features from a redundancy payload.

        sym: (B, n, 80) newest-first symbols; qid: (n,) quant ids;
        state: (B, 24) resume state of the OLDEST dframe. Returns
        (B, n*4, 20) features, oldest-first (DRED_rdovae_decode_all,
        src/dred_rdovae.c:38-52)."""
        qp = rv.quant_params(self.params, qid, self.cfg)
        z = sym.astype(jnp.float32) / qp["scale"]
        z_old_first = z[:, ::-1]
        return rv.decode(self.params, z_old_first, state, self.cfg)

    def decode(self, sym, qid, state):
        return self._decode(sym, qid, state)
