"""1.6 kb/s codec: superframe encode/decode (8 bytes per 40 ms).

Encoder = the quantize branch of process_superframe (lpcnet_enc.c:702-737);
decoder = decode_packet (lpcnet_dec.c:81-155). Both are batched over
streams; all searches are MXU matmuls (see vq.py).

Codebooks are parameters (the reference ships generated ceps_codebooks.c,
trained by its offline tool src/ceps_vq_train.c — our equivalent trainer is
codec/vq_train.py).
"""
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import NB_BANDS, NB_TOTAL_FEATURES
from . import packet, vq


def default_codebooks(rng: jax.Array) -> Dict[str, jax.Array]:
    """Placeholder codebooks (scale matched to cepstral range). Real
    deployments train these with vq_train.train_codec_codebooks."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "cb1": 1.0 * jax.random.normal(k1, (1024, NB_BANDS - 1)),
        "cb2": 0.3 * jax.random.normal(k2, (1024, NB_BANDS - 1)),
        "cb3": 0.15 * jax.random.normal(k3, (1024, NB_BANDS - 1)),
        "diff4": 0.5 * jax.random.normal(k4, (4096, NB_BANDS)),
    }


def _quantize_frame3(codebooks, f: jax.Array):
    """vq_mem-INDEPENDENT half of the superframe encode: c0 scalar
    quantization (lpcnet_enc.c:704-706) + 3-stage M-best VQ on the frame-3
    cepstrum tail (:707). f: (N, 4, 36). Returns (f updated, c0_id,
    entries (N, 3))."""
    c0_id = jnp.clip(jnp.floor(0.5 + f[:, 3, 0] * 4.0), -64, 63
                     ).astype(jnp.int32)
    f = f.at[:, 3, 0].set(c0_id.astype(jnp.float32) / 4.0)
    entries, recon = vq.quantize_3stage_mbest(
        f[:, 3, 1:NB_BANDS], codebooks["cb1"], codebooks["cb2"],
        codebooks["cb3"])
    f = f.at[:, 3, 1:NB_BANDS].set(recon)
    return f, c0_id, entries


def _finish_encode(codebooks, f: jax.Array, vq_mem: jax.Array, sp,
                   c0_id: jax.Array, entries: jax.Array):
    """vq_mem-DEPENDENT half: predictive diff VQ on frame 1
    (lpcnet_enc.c:709), double interpolation of frames 0/2 (:710-711),
    LPC refresh (:714-717), bit packing (:724-733). All (N, ...)."""
    vq_mid, recon1 = vq.quantize_diff(
        f[:, 1, :NB_BANDS], vq_mem, f[:, 3, :NB_BANDS], codebooks["diff4"],
        bits=12, sign=True)
    f = f.at[:, 1, :NB_BANDS].set(recon1)
    interp_id = vq.double_interp_search(
        f[:, 0, :NB_BANDS], f[:, 1, :NB_BANDS], f[:, 2, :NB_BANDS],
        f[:, 3, :NB_BANDS], vq_mem)
    nf0, nf2 = vq.perform_double_interp(
        f[:, 0, :NB_BANDS], f[:, 1, :NB_BANDS], f[:, 2, :NB_BANDS],
        f[:, 3, :NB_BANDS], vq_mem, interp_id)
    f = f.at[:, 0, :NB_BANDS].set(nf0)
    f = f.at[:, 2, :NB_BANDS].set(nf2)
    from ..ops import dsp
    lpc, _ = dsp.lpc_from_cepstrum(f[..., :NB_BANDS])
    f = f.at[..., NB_BANDS + 2:].set(lpc)

    fields = {
        "c0": c0_id + 64,
        "main_pitch": sp["main_pitch"],
        "modulation": jnp.where(sp["voiced"], sp["modulation"] + 4, 0),
        "corr_id": sp["corr_id"],
        "vq_end0": entries[..., 0], "vq_end1": entries[..., 1],
        "vq_end2": entries[..., 2],
        "vq_mid": vq_mid, "interp_id": interp_id,
    }
    return packet.pack(fields), f, f[:, 3, :NB_BANDS]


def encode_superframe(codebooks, feats: jax.Array, vq_mem: jax.Array,
                      sp: Dict[str, jax.Array]):
    """Quantize one superframe and pack the packet.

    feats: (B, 4, 36) features computed with quantize_pitch=True;
    vq_mem: (B, 18) previous superframe's quantized frame-3 cepstrum;
    sp: superframe pitch dict from features.compute_features.
    Returns (buf (B, 8) uint8, quantized feats (B, 4, 36), new vq_mem).
    """
    f, c0_id, entries = _quantize_frame3(codebooks, feats)
    return _finish_encode(codebooks, f, vq_mem, sp, c0_id, entries)


def encode_superframes(codebooks, feats: jax.Array, vq_mem: jax.Array,
                       sps):
    """Encode S consecutive superframes in ONE jitted call with NO scan —
    the throughput path.

    The reference's serial state st->vq_mem (lpcnet_enc.c:708-712) looks
    like a cross-superframe dependency, but it is only the QUANTIZED
    frame-3 cepstrum — which depends on nothing but the current
    superframe's own features (frames 0-2 are quantized against vq_mem,
    but never feed it). So the heavy 3-stage M-best search runs for ALL
    superframes in one (B*S)-batched pass on the MXU, the vq_mem chain is
    a plain shift of its outputs, and the remaining diff-VQ/interp/LPC
    stage batches over B*S as well. Bit-identical to the sequential
    per-superframe path (asserted by tests/test_codec.py).

    feats: (B, 4*S, 36) with quantize_pitch=True features; sps: the list
    of S superframe-pitch dicts from features.compute_features (or the
    same already stacked with a leading S axis).
    Returns (bufs (B, S, 8) uint8, quantized feats (B, 4*S, 36),
    final vq_mem)."""
    B, T, Fdim = feats.shape
    S = T // 4
    if isinstance(sps, (list, tuple)):
        sps = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *sps)
    # (S, B, ...) pitch leaves -> (B*S, ...), superframe-major per stream
    sp_flat = jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, 1).reshape((B * S,) + x.shape[2:]),
        sps)
    flat = feats.reshape(B, S, 4, Fdim).reshape(B * S, 4, Fdim)
    flat, c0_id, entries = _quantize_frame3(codebooks, flat)
    q3 = flat[:, 3, :NB_BANDS].reshape(B, S, NB_BANDS)
    mems = jnp.concatenate([vq_mem[:, None], q3[:, :-1]], axis=1)
    buf, fq, _ = _finish_encode(codebooks, flat,
                                mems.reshape(B * S, NB_BANDS), sp_flat,
                                c0_id, entries)
    return (buf.reshape(B, S, 8), fq.reshape(B, T, Fdim), q3[:, -1])


def decode_packets(codebooks, bufs: jax.Array, vq_mem: jax.Array):
    """Decode S packets in ONE jitted scan: (B, S, 8) uint8 ->
    ((B, 4*S, 36) features, final vq_mem). Scan twin of decode_packet."""
    def body(mem, b):
        f, mem = decode_packet(codebooks, b, mem)
        return mem, f

    mem, fs = jax.lax.scan(body, vq_mem, bufs.transpose(1, 0, 2))
    S = bufs.shape[1]
    B = bufs.shape[0]
    return fs.transpose(1, 0, 2, 3).reshape(B, 4 * S, -1), mem


def decode_packet(codebooks, buf: jax.Array, vq_mem: jax.Array):
    """(B, 8) uint8 + (B, 18) vq_mem -> ((B, 4, 36) features, new vq_mem).

    Mirrors decode_packet (lpcnet_dec.c:81-155); the LPC tail is left zero —
    synthesis derives LPC from the cepstrum (run_frame_network,
    lpcnet.c:109-115)."""
    from ..constants import PITCH_MIN_PERIOD
    fld = packet.unpack(buf)
    B = buf.shape[0]
    f = jnp.zeros((B, 4, NB_TOTAL_FEATURES), jnp.float32)

    modulation = fld["modulation"] - 4
    voiced = modulation != -4
    modulation = jnp.where(voiced, modulation, 0)
    frame_corr = jnp.where(
        voiced, 0.3875 + 0.175 * fld["corr_id"].astype(jnp.float32),
        0.0375 + 0.075 * fld["corr_id"].astype(jnp.float32))
    subs = jnp.arange(4.0)
    p = jnp.power(2.0, fld["main_pitch"].astype(jnp.float32) / 21.0) \
        * PITCH_MIN_PERIOD
    p = p[:, None] * (1.0 + modulation.astype(jnp.float32)[:, None]
                      / 16.0 / 7.0 * (2 * subs - 3))
    p = jnp.clip(p, 33.0, 255.0)
    f = f.at[:, :, NB_BANDS].set(0.02 * (p - 100.0))
    f = f.at[:, :, NB_BANDS + 1].set((frame_corr - 0.5)[:, None])

    f = f.at[:, 3, 0].set((fld["c0"] - 64).astype(jnp.float32) / 4.0)
    tail = (codebooks["cb1"][fld["vq_end0"]]
            + codebooks["cb2"][fld["vq_end1"]]
            + codebooks["cb3"][fld["vq_end2"]])
    f = f.at[:, 3, 1:NB_BANDS].set(tail)

    vq_mid = fld["vq_mid"]
    sign = jnp.where(vq_mid >= 4096, -1.0, 1.0)
    idx = vq_mid % 4096
    diff = sign[:, None] * codebooks["diff4"][idx]
    pred_id = idx & 3
    preds = jnp.stack([0.5 * (vq_mem + f[:, 3, :NB_BANDS]),
                       0.5 * (vq_mem + f[:, 3, :NB_BANDS]),
                       vq_mem, f[:, 3, :NB_BANDS]], axis=1)  # (B, 4, 18)
    pred = jnp.take_along_axis(
        preds, pred_id[:, None, None].repeat(NB_BANDS, -1), axis=1)[:, 0]
    f = f.at[:, 1, :NB_BANDS].set(diff + pred)

    nf0, nf2 = vq.perform_double_interp(
        f[:, 0, :NB_BANDS], f[:, 1, :NB_BANDS], f[:, 2, :NB_BANDS],
        f[:, 3, :NB_BANDS], vq_mem, fld["interp_id"])
    f = f.at[:, 0, :NB_BANDS].set(nf0)
    f = f.at[:, 2, :NB_BANDS].set(nf2)
    return f, f[:, 3, :NB_BANDS]
