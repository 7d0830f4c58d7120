"""VQ codebook training on TPU — replaces the reference's offline C tool
(src/ceps_vq_train.c).

Covers all three trainer variants:
  * vq_train        (ceps_vq_train.c:338-366)  -> kmeans
  * vq_train_multi  (ceps_vq_train.c:368-403)  -> kmeans_multi
  * vq_train_weighted (ceps_vq_train.c:406-431) -> kmeans_weighted

and the full data recipe of its main() (ceps_vq_train.c:433-619):
cb1/2/3 are a 3-stage residual cascade over EVERY frame's 17-dim cepstrum
tail (COEF == 0, so stage-1 targets are the raw cepstra), and diff4 is a
multi-predictor + sign codebook trained on 18-dim residuals of frame i+2
against the *quantized* anchors i and i+4 (matching the deployed geometry:
frame 1 predicted from vq_mem and frame 3, which are 4 frames apart).

Split-VQ k-means: start from one centroid, double the codebook by
perturbation, Lloyd-iterate (4 per split + 20 final, the C's counts).
Assignment is one (N, D) x (D, K) distance matmul per iteration — the MXU
does in milliseconds what the C tool grinds through in scalar loops.
Deliberate improvement over the C: empty cells are re-seeded from random
data points instead of dividing by a zero count.
"""
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

_ASSIGN_CHUNK = 8192   # bound N x K distance-matrix memory


def _assign(x: jax.Array, cb: jax.Array) -> jax.Array:
    d = (jnp.sum(x * x, -1, keepdims=True) - 2 * x @ cb.T
         + jnp.sum(cb * cb, -1))
    return jnp.argmin(d, axis=-1)


def _assign_chunked(x: jax.Array, cb: jax.Array) -> jax.Array:
    """_assign with the (N, K) distance matrix built in bounded chunks."""
    N = x.shape[0]
    if N * cb.shape[0] <= _ASSIGN_CHUNK * 16384:
        return _assign(x, cb)
    pad = (-N) % _ASSIGN_CHUNK
    xp = jnp.pad(x, ((0, pad), (0, 0))).reshape(
        -1, _ASSIGN_CHUNK, x.shape[-1])
    out = jax.lax.map(lambda c: _assign(c, cb), xp)
    return out.reshape(-1)[:N]


def _update(x: jax.Array, assign: jax.Array, k: int):
    sums = jax.ops.segment_sum(x, assign, num_segments=k)          # (K, D)
    counts = jax.ops.segment_sum(jnp.ones((x.shape[0],), x.dtype),
                                 assign, num_segments=k)           # (K,)
    return sums / jnp.maximum(counts, 1.0)[:, None], counts


def _reseed_empty(rng: jax.Array, cb: jax.Array, counts: jax.Array,
                  x: jax.Array) -> jax.Array:
    repl = x[jax.random.randint(rng, (cb.shape[0],), 0, x.shape[0])]
    return jnp.where((counts > 0)[:, None], cb, repl)


def kmeans(rng: jax.Array, x: jax.Array, k: int, iters: int = 4,
           final_iters: int = 20) -> jax.Array:
    """Split-init k-means (vq_train, ceps_vq_train.c:338-366).
    x: (N, D) training vectors -> (k, D) codebook. iters Lloyd passes per
    split (C: 4) + final_iters at full size (C: 20)."""
    cb = jnp.mean(x, axis=0, keepdims=True)
    cur = 1
    # x rides as a jit ARGUMENT, not a closure: closed-over corpora are
    # baked into the compile payload as literals, which overflows the
    # remote-compile transport at 1M-frame scale (HTTP 413)
    lloyd = jax.jit(_lloyd_pass, donate_argnums=0)
    x = jnp.asarray(x)
    while cur < k:
        rng, sub = jax.random.split(rng)
        noise = 0.02 * jax.random.normal(sub, cb.shape) * \
            jnp.std(x, axis=0)
        cb = jnp.concatenate([cb - noise, cb + noise], axis=0)
        cur *= 2
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            cb = lloyd(cb, sub, x)
    for _ in range(final_iters):
        rng, sub = jax.random.split(rng)
        cb = lloyd(cb, sub, x)
    return cb[:k]


def _lloyd_pass(cb, rng, x):
    a = _assign_chunked(x, cb)
    new_cb, counts = _update(x, a, cb.shape[0])
    return _reseed_empty(rng, new_cb, counts, x)


def kmeans_weighted(rng: jax.Array, x: jax.Array, w: jax.Array, k: int,
                    iters: int = 4, final_iters: int = 20) -> jax.Array:
    """Weighted split k-means (vq_train_weighted, ceps_vq_train.c:406-431).

    w: (N, D) per-vector per-dimension weights. Assignment minimizes
    sum_j w[n,j]*(x[n,j]-c[j])^2 (find_nearest_weighted, :92-108); the
    update is the sqrt(w)-weighted mean (update_weighted, :285-318).
    Init divergence (documented): the C grows the codebook one entry at a
    time (split1); we split-double like the unweighted trainer — same
    objective, better MXU shape."""
    def assign_w(xc, wc):
        # ||sqrt(w)*(x - c)||^2 = sum w x^2 - 2 (w x) . c + (w) . c^2,
        # with the (N, K) distance matrix built in bounded chunks like
        # _assign_chunked
        def chunk(args):
            xi, wi = args
            d = (jnp.sum(wi * xi * xi, -1, keepdims=True)
                 - 2 * (wi * xi) @ cb.T + wi @ (cb * cb).T)
            return jnp.argmin(d, axis=-1)

        N = xc.shape[0]
        if N * cb.shape[0] <= _ASSIGN_CHUNK * 16384:
            return chunk((xc, wc))
        pad = (-N) % _ASSIGN_CHUNK
        xp = jnp.pad(xc, ((0, pad), (0, 0))).reshape(
            -1, _ASSIGN_CHUNK, xc.shape[-1])
        wp = jnp.pad(wc, ((0, pad), (0, 0))).reshape(
            -1, _ASSIGN_CHUNK, wc.shape[-1])
        return jax.lax.map(chunk, (xp, wp)).reshape(-1)[:N]

    cb = jnp.sum(x * 1.0, axis=0, keepdims=True) / x.shape[0]
    cur = 1
    sw = jnp.sqrt(w)
    while cur < k:
        rng, sub = jax.random.split(rng)
        noise = 0.02 * jax.random.normal(sub, cb.shape) * \
            jnp.std(x, axis=0)
        cb = jnp.concatenate([cb - noise, cb + noise], axis=0)
        cur *= 2
        n_it = iters if cur < k else iters + final_iters
        for _ in range(n_it):
            a = assign_w(x, w)
            num = jax.ops.segment_sum(sw * x, a, num_segments=cur)
            den = jax.ops.segment_sum(sw, a, num_segments=cur)
            new_cb = num / jnp.maximum(den, 1e-9)
            rng, sub = jax.random.split(rng)
            cb = _reseed_empty(sub, new_cb,
                               jax.ops.segment_sum(
                                   jnp.ones((x.shape[0],)), a,
                                   num_segments=cur), x)
    return cb[:k]


def _assign_multi(targets: jax.Array, cb: jax.Array, sign: bool):
    """Assignment for the multi-predictor codebook (find_nearest_multi,
    ceps_vq_train.c:53-90): entry e quantizes the residual of predictor
    e & 3; with sign, -codebook entries are also candidates.

    targets: (N, 4, D); cb: (K, D) with K % 4 == 0.
    Returns (entry (N,) int32 in [0, K) , sgn (N,) +-1).
    Grouped per predictor so the distance work is 8 (N, K/4) matmuls
    instead of an (N, K, D) broadcast — bounded memory, MXU-shaped."""
    N, P, D = targets.shape
    K = cb.shape[0]

    def chunk_fn(tc):
        best_d = jnp.full((tc.shape[0],), 1e15)
        best_e = jnp.zeros((tc.shape[0],), jnp.int32)
        best_s = jnp.ones((tc.shape[0],))
        for p in range(P):
            cbp = cb[p::P]                                   # (K/P, D)
            t = tc[:, p, :]
            t2 = jnp.sum(t * t, -1, keepdims=True)
            c2 = jnp.sum(cbp * cbp, -1)
            dots = t @ cbp.T
            for s in (1.0, -1.0) if sign else (1.0,):
                d = t2 - 2 * s * dots + c2
                j = jnp.argmin(d, axis=-1)
                dj = jnp.take_along_axis(d, j[:, None], -1)[:, 0]
                upd = dj < best_d
                best_d = jnp.where(upd, dj, best_d)
                best_e = jnp.where(upd, (j * P + p).astype(jnp.int32),
                                   best_e)
                best_s = jnp.where(upd, s, best_s)
        return best_e, best_s

    pad = (-N) % _ASSIGN_CHUNK
    if pad or N > _ASSIGN_CHUNK:
        tp = jnp.pad(targets, ((0, pad), (0, 0), (0, 0))).reshape(
            -1, _ASSIGN_CHUNK, P, D)
        e, s = jax.lax.map(chunk_fn, tp)
        return e.reshape(-1)[:N], s.reshape(-1)[:N]
    return chunk_fn(targets)


def kmeans_multi(rng: jax.Array, targets: jax.Array, k: int,
                 iters: int = 4, final_iters: int = 20,
                 sign: bool = True) -> jax.Array:
    """Multi-predictor k-means (vq_train_multi, ceps_vq_train.c:368-403):
    entry e of the codebook quantizes the residual of predictor e & 3,
    optionally with a sign bit.

    targets: (N, 4, D) residuals against the 4 predictors. Matches the C
    structure: per-predictor mean init (+ jitter), 10 warm-up updates,
    split-double to k with `iters` updates per split, final polish."""
    N, P, D = targets.shape
    rng, sub = jax.random.split(rng)
    cb = jnp.mean(targets, axis=0) \
        + 0.01 * (jax.random.uniform(sub, (P, D)) - 0.5)     # (4, D)
    cur = P

    def upd(cb_, targets_, rng_):
        # targets_ is a jit argument (see kmeans: closed-over corpora
        # overflow the remote-compile payload at 1M-frame scale)
        e, s = _assign_multi(targets_, cb_, sign)
        pred = e % P
        t_sel = jnp.take_along_axis(
            targets_, pred[:, None, None].astype(jnp.int32)
            .repeat(D, -1), axis=1)[:, 0]
        signed_t = s[:, None] * t_sel
        sums = jax.ops.segment_sum(signed_t, e, num_segments=cb_.shape[0])
        counts = jax.ops.segment_sum(jnp.ones((N,)), e,
                                     num_segments=cb_.shape[0])
        new_cb = sums / jnp.maximum(counts, 1.0)[:, None]
        # re-seed empty cells with the residual of their own predictor
        rng_, sub_ = jax.random.split(rng_)
        ridx = jax.random.randint(sub_, (cb_.shape[0],), 0, N)
        repl = targets_[ridx, jnp.arange(cb_.shape[0]) % P]
        return jnp.where((counts > 0)[:, None], new_cb, repl)

    upd_j = jax.jit(upd, donate_argnums=0)
    targets = jnp.asarray(targets)
    for _ in range(10):
        rng, sub = jax.random.split(rng)
        cb = upd_j(cb, targets, sub)
    while cur < k:
        rng, sub = jax.random.split(rng)
        noise = 0.02 * jax.random.normal(sub, cb.shape) * \
            jnp.std(targets.reshape(-1, D), axis=0)
        cb = jnp.concatenate([cb - noise, cb + noise], axis=0)
        cur *= 2
        for _ in range(iters):
            rng, sub = jax.random.split(rng)
            cb = upd_j(cb, targets, sub)
    for _ in range(final_iters):
        rng, sub = jax.random.split(rng)
        cb = upd_j(cb, targets, sub)
    return cb[:k]


def train_codec_codebooks(rng: jax.Array, feats: jax.Array,
                          iters: int = 4, final_iters: int = 20
                          ) -> Dict[str, jax.Array]:
    """Train the full codec codebook set from a feature corpus, following
    the data recipe of ceps_vq_train.c main() (:433-619).

    feats: (N, >=18) consecutive feature frames (only the first 18 cepstral
    columns are used). Every frame is a stage-1 target (COEF == 0,
    :476-481); diff4 targets are built from the *quantized* 3-stage
    reconstructions (qdata, :490-538), matching what the decoder's
    predictors will actually see."""
    from ..constants import NB_BANDS
    data = feats[:, :NB_BANDS]
    x = data[:, 1:]                                    # (N, 17)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    cb1 = kmeans(k1, x, 1024, iters, final_iters)
    r1 = x - cb1[_assign_chunked(x, cb1)]
    cb2 = kmeans(k2, r1, 1024, iters, final_iters)
    r2 = r1 - cb2[_assign_chunked(r1, cb2)]
    cb3 = kmeans(k3, r2, 1024, iters, final_iters)
    r3 = r2 - cb3[_assign_chunked(r2, cb3)]
    # qdata: c0 kept raw, tail = 3-stage reconstruction (:495-530)
    qdata = jnp.concatenate([data[:, :1], x - r3], axis=-1)
    # diff4 targets: frame i+2 vs quantized anchors i / i+4 (:533-546)
    N = data.shape[0]
    tgt = data[2:N - 2]                                 # frame i+2
    left = qdata[: N - 4]
    right = qdata[4:]
    avg = 0.5 * (left + right)
    targets = jnp.stack([tgt - avg, tgt - avg, tgt - left, tgt - right],
                        axis=1)                         # (N-4, 4, 18)
    diff4 = kmeans_multi(k4, targets, 4096, iters, final_iters, sign=True)
    return {"cb1": cb1, "cb2": cb2, "cb3": cb3, "diff4": diff4}
