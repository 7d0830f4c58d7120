"""VQ codebook training on TPU — replaces the reference's offline C tool
(src/ceps_vq_train.c:338-431 vq_train/vq_train_multi).

Split-VQ k-means: start from one centroid, double the codebook by
perturbation, Lloyd-iterate. Assignment is one (N, D) x (D, K) distance
matmul per iteration — the MXU does in milliseconds what the C tool grinds
through in scalar loops.
"""
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _assign(x: jax.Array, cb: jax.Array) -> jax.Array:
    d = (jnp.sum(x * x, -1, keepdims=True) - 2 * x @ cb.T
         + jnp.sum(cb * cb, -1))
    return jnp.argmin(d, axis=-1)


def _update(x: jax.Array, assign: jax.Array, k: int) -> jax.Array:
    one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)      # (N, K)
    counts = one_hot.sum(0)                                  # (K,)
    sums = one_hot.T @ x                                     # (K, D)
    return sums / jnp.maximum(counts, 1.0)[:, None], counts


def kmeans(rng: jax.Array, x: jax.Array, k: int, iters: int = 12
           ) -> jax.Array:
    """Split-init k-means. x: (N, D) training vectors -> (k, D) codebook."""
    cb = jnp.mean(x, axis=0, keepdims=True)
    cur = 1
    while cur < k:
        rng, sub = jax.random.split(rng)
        noise = 0.02 * jax.random.normal(sub, cb.shape) * \
            jnp.std(x, axis=0)
        cb = jnp.concatenate([cb - noise, cb + noise], axis=0)
        cur *= 2
        for _ in range(iters):
            a = _assign(x, cb)
            new_cb, counts = _update(x, a, cur)
            # re-seed empty cells from random data points
            rng, sub = jax.random.split(rng)
            repl = x[jax.random.randint(sub, (cur,), 0, x.shape[0])]
            cb = jnp.where((counts > 0)[:, None], new_cb, repl)
    return cb[:k]


def kmeans_multi(rng: jax.Array, targets: jax.Array, k: int,
                 iters: int = 12) -> jax.Array:
    """Multi-predictor k-means (vq_train_multi semantics): entry i of the
    codebook quantizes the residual of predictor i & 3.

    targets: (N, 4, D) residuals against the 4 predictors. Each codeword is
    assigned to exactly one predictor by its index; training alternates
    assignment (over all (entry) choices incl. sign) and means."""
    N, P, D = targets.shape
    rng, sub = jax.random.split(rng)
    # init: per-predictor k-means of k//4 entries, interleaved by index
    cb = jnp.zeros((k, D), targets.dtype)
    for p in range(P):
        sub_cb = kmeans(jax.random.fold_in(sub, p),
                        targets[:, p, :], k // P, iters)
        cb = cb.at[p::P].set(sub_cb)
    # joint refinement with sign
    for _ in range(iters):
        pred_idx = jnp.arange(k) & (P - 1)
        tpc = targets[:, pred_idx, :]                       # (N, K, D)
        dp = jnp.sum((tpc - cb) ** 2, -1)
        dn = jnp.sum((tpc + cb) ** 2, -1)
        d = jnp.concatenate([dp, dn], -1)
        e = jnp.argmin(d, axis=-1)
        idx = e % k
        s = jnp.where(e >= k, -1.0, 1.0)
        signed_t = s[:, None] * jnp.take_along_axis(
            targets, (idx & (P - 1))[:, None, None].repeat(D, -1),
            axis=1)[:, 0]
        one_hot = jax.nn.one_hot(idx, k, dtype=targets.dtype)
        counts = one_hot.sum(0)
        cb = jnp.where((counts > 0)[:, None],
                       (one_hot.T @ signed_t)
                       / jnp.maximum(counts, 1.0)[:, None], cb)
    return cb


def train_codec_codebooks(rng: jax.Array, feats: jax.Array,
                          iters: int = 10) -> Dict[str, jax.Array]:
    """Train the full codec codebook set from a feature corpus.

    feats: (N, 36) feature frames (consecutive, N % 4 == 0), laid out as the
    encoder sees them. Trains cb1/2/3 on frame-3 cepstrum tails (3-stage
    residual) and diff4 on frame-1 prediction residuals, mirroring the data
    recipe of ceps_vq_train.c:433-619."""
    from ..constants import NB_BANDS
    f = feats[: feats.shape[0] // 4 * 4].reshape(-1, 4, feats.shape[-1])
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x3 = f[:, 3, 1:NB_BANDS]
    cb1 = kmeans(k1, x3, 1024, iters)
    r1 = x3 - cb1[_assign(x3, cb1)]
    cb2 = kmeans(k2, r1, 1024, iters)
    r2 = r1 - cb2[_assign(r1, cb2)]
    cb3 = kmeans(k3, r2, 1024, iters)
    # diff targets: frame 1 vs [avg, avg, left, right] of (prev f3, f3)
    left = jnp.roll(f[:, 3, :NB_BANDS], 1, axis=0)
    right = f[:, 3, :NB_BANDS]
    x1 = f[:, 1, :NB_BANDS]
    avg = 0.5 * (left + right)
    targets = jnp.stack([x1 - avg, x1 - avg, x1 - left, x1 - right], axis=1)
    diff4 = kmeans_multi(k4, targets, 4096, iters)
    return {"cb1": cb1, "cb2": cb2, "cb3": cb3, "diff4": diff4}
