"""Vector quantizers for the 1.6 kb/s codec (reference src/lpcnet_enc.c).

All searches are batched argmin-over-distance matmuls: on TPU an exhaustive
(B, D) x (D, K) distance computation against a 1024..8192-entry codebook is
a single MXU matmul, so the reference's scalar loops (vq_quantize_mbest
lpcnet_enc.c:53-78, find_nearest_multi :243-280) become dense linear algebra.
Tie-breaking matches the C (strict-< updates == first-occurrence argmin).
"""
from typing import Tuple

import jax
import jax.numpy as jnp

from ..constants import FORBIDDEN_INTERP, MULTI_MASK, NB_BANDS

NB_BANDS_1 = NB_BANDS - 1


def _dists(x: jax.Array, cb: jax.Array) -> jax.Array:
    """Squared L2 distances: x (..., D) vs cb (K, D) -> (..., K)."""
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    c2 = jnp.sum(cb * cb, axis=-1)
    return x2 - 2.0 * (x @ cb.T) + c2


def vq_nearest(cb: jax.Array, x: jax.Array):
    """Nearest codeword (vq_quantize, lpcnet_enc.c:81-101)."""
    d = _dists(x, cb)
    idx = jnp.argmin(d, axis=-1)
    return idx, jnp.take_along_axis(d, idx[..., None], axis=-1)[..., 0]


def _topk_min(d: jax.Array, k: int):
    """k smallest (stable order) -> (dists, indices)."""
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def quantize_3stage_mbest(x: jax.Array, cb1, cb2, cb3, survivors: int = 5):
    """3-stage residual VQ with M-best beam search
    (quantize_3stage_mbest, lpcnet_enc.c:133-241).

    x: (..., 17). Returns (entries (..., 3) int32, reconstruction (..., 17)).
    The beam keeps `survivors` candidates ranked by cumulative residual
    distance after each stage.
    """
    d1 = _dists(x, cb1)
    _, i1 = _topk_min(d1, survivors)                      # (..., S)
    r1 = x[..., None, :] - cb1[i1]                        # (..., S, 17)
    d2 = _dists(r1, cb2)                                  # (..., S, K)
    d2s, i2 = _topk_min(d2, survivors)                    # (..., S, S)
    # flatten (k-major) and take global top-S, stable (matches C merge)
    flat_d = d2s.reshape(*d2s.shape[:-2], -1)
    _, sel = _topk_min(flat_d, survivors)
    k_sel = sel // survivors
    i1_sel = jnp.take_along_axis(i1, k_sel, axis=-1)
    i2_sel = jnp.take_along_axis(i2.reshape(*flat_d.shape), sel, axis=-1)
    r2 = x[..., None, :] - cb1[i1_sel] - cb2[i2_sel]
    d3 = _dists(r2, cb3)
    d3s, i3 = _topk_min(d3, survivors)
    flat_d3 = d3s.reshape(*d3s.shape[:-2], -1)
    _, sel3 = _topk_min(flat_d3, 1)
    k3 = (sel3 // survivors)[..., 0]
    e1 = jnp.take_along_axis(i1_sel, k3[..., None], axis=-1)[..., 0]
    e2 = jnp.take_along_axis(i2_sel, k3[..., None], axis=-1)[..., 0]
    e3 = jnp.take_along_axis(i3.reshape(*flat_d3.shape), sel3, axis=-1)[..., 0]
    recon = cb1[e1] + cb2[e2] + cb3[e3]
    entries = jnp.stack([e1, e2, e3], axis=-1).astype(jnp.int32)
    return entries, recon


def _interp_preds(left: jax.Array, right: jax.Array) -> jax.Array:
    """The 4 codec predictors (lpcnet_enc.c:294-296): [avg, avg, left,
    right], stacked on a new axis -2."""
    avg = 0.5 * (left + right)
    return jnp.stack([avg, avg, left, right], axis=-2)


def quantize_diff(x, left, right, cb, bits: int = 12, sign: bool = True):
    """Multi-predictor signed diff VQ (quantize_diff, lpcnet_enc.c:283-318).

    x/left/right: (..., 18); cb: (2^bits, 18), entry i predicts with
    predictor i & 3. Returns (entry (...,) int32 in [0, 2^(bits+sign)),
    reconstruction (..., 18)).
    """
    preds = _interp_preds(left, right)                    # (..., 4, 18)
    target = x[..., None, :] - preds                      # (..., 4, 18)
    pred_idx = jnp.arange(cb.shape[0]) & MULTI_MASK       # (K,)
    tpc = target[..., pred_idx, :]                        # (..., K, 18)
    dp = jnp.sum((tpc - cb) ** 2, axis=-1)                # (..., K)
    if sign:
        dn = jnp.sum((tpc + cb) ** 2, axis=-1)
        d = jnp.concatenate([dp, dn], axis=-1)
    else:
        d = dp
    entry = jnp.argmin(d, axis=-1).astype(jnp.int32)
    idx = entry % cb.shape[0]
    s = jnp.where(entry >= cb.shape[0], -1.0, 1.0)
    pred_sel = jnp.take_along_axis(
        preds, (idx & MULTI_MASK)[..., None, None].repeat(NB_BANDS, -1),
        axis=-2)[..., 0, :]
    recon = pred_sel + s[..., None] * cb[idx]
    return entry, recon


def interp_search(x, left, right):
    """Best of predictors 1..3 (interp_search, lpcnet_enc.c:320-340).
    Returns (best_pred-1 (...,) int32 in 0..2, dists (..., 3))."""
    preds = _interp_preds(left, right)[..., 1:, :]        # (..., 3, 18)
    d = jnp.sum((x[..., None, :NB_BANDS]
                 - preds[..., :NB_BANDS]) ** 2, axis=-1)
    return jnp.argmin(d, axis=-1).astype(jnp.int32), d


def double_interp_search(f0, f1, f2, f3, mem):
    """Joint interp choice for frames 0 and 2 (lpcnet_enc.c:379-400).
    All args (..., >=18) cepstra. Returns best_id (...,) int32 in [0, 8)
    (the FORBIDDEN_INTERP==7 combination is excluded and ids above it are
    shifted down)."""
    _, d0 = interp_search(f0, mem, f1)
    _, d1 = interp_search(f2, f1, f3)
    total = d0[..., :, None] + d1[..., None, :]           # (..., 3, 3)
    flat = total.reshape(*total.shape[:-2], 9)
    big = jnp.full_like(flat[..., 0], 1e15)
    masked = flat.at[..., FORBIDDEN_INTERP].set(big)
    best = jnp.argmin(masked, axis=-1).astype(jnp.int32)
    return best - (best >= FORBIDDEN_INTERP).astype(jnp.int32)


def single_interp(left, right, idx):
    """Replace a frame by predictor idx in {0: avg, 1: left, 2: right}
    (common.c single_interp:37-56)."""
    preds = jnp.stack([0.5 * (left + right), left, right], axis=-2)
    return jnp.take_along_axis(
        preds, idx[..., None, None].repeat(preds.shape[-1], -1),
        axis=-2)[..., 0, :]


def perform_double_interp(f0, f1, f2, f3, mem, best_id):
    """Reconstruct frames 0 and 2 from the interp id
    (common.c perform_double_interp:58-65). Returns (new_f0, new_f2)."""
    bid = best_id + (best_id >= FORBIDDEN_INTERP).astype(jnp.int32)
    id0 = bid // 3
    id1 = bid % 3
    return single_interp(mem, f1, id0), single_interp(f1, f3, id1)
