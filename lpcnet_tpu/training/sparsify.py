"""Progressive block sparsification + int8 quantization of GRU weights.

Functional equivalents of the reference's Keras callbacks
(training_tf2/lpcnet.py:110-256):
  * Sparsify: GRU-A recurrent kernel pruned per gate to target densities
    with 4x8 block magnitude selection, the diagonal always kept, density
    annealed with a cubic schedule between t_start and t_end batches.
  * SparsifyGRUB: the same 4x8 block pruning on the first grua_units rows
    of GRU-B's input kernel (the columns fed by GRU-A's state).
  * Progressive hard quantization to int8/128: weights whose residual to
    round(128 w)/128 is below an annealed threshold snap to the grid.

All jittable; apply after the optimizer update, like the reference applies
them on_batch_end.
"""
import dataclasses
import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SparsifyConfig:
    # from-scratch schedule (train_lpcnet.py:303-317)
    t_start: int = 2000
    t_end: int = 40000
    interval: int = 400
    density: Tuple[float, float, float] = (0.05, 0.05, 0.2)  # z, r, h gates
    grub_density: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    quantize: bool = False


def _cubic_density(final_density, batch, t_start, t_end):
    r = 1.0 - (batch - t_start) / (t_end - t_start)
    r = jnp.clip(r, 0.0, 1.0)
    return 1.0 - (1.0 - final_density) * (1.0 - r * r * r)


def _block_mask(A: jax.Array, density, keep_diag: bool) -> jax.Array:
    """4x8 block magnitude mask for one gate's kernel (lpcnet.py:145-160).

    A: (N_in, N_out). The reference transposes to (out, in) and blocks as
    (out/4, 4, in/8, 8); we mask in the same orientation. Returns a 0/1
    mask of A's shape."""
    At = A.T                                      # (out, in)
    out_n, in_n = At.shape
    L = At.reshape(out_n // 4, 4, in_n // 8, 8)
    S = jnp.sum(L * L, axis=(1, 3))               # (out/4, in/8)
    flat = jnp.sort(S.reshape(-1))
    nblocks = S.size
    k = jnp.clip(jnp.round(nblocks * (1.0 - density)).astype(jnp.int32),
                 0, nblocks - 1)
    thresh = flat[k]
    mask = (S >= thresh).astype(A.dtype)
    mask = jnp.repeat(jnp.repeat(mask, 4, axis=0), 8, axis=1)
    if keep_diag:
        mask = jnp.minimum(1.0, mask + jnp.eye(out_n, in_n, dtype=A.dtype))
    return mask.T                                  # back to (in, out)


def sparsify_gru_a(wr: jax.Array, batch: jax.Array, cfg: SparsifyConfig):
    """Prune GRU-A's recurrent kernel (N, 3N) per gate (lpcnet.py:110-181).
    Pruning only fires on schedule; between firings weights pass through."""
    n = wr.shape[0]
    active = cfg.quantize | ((batch > cfg.t_start)
                             & (((batch - cfg.t_start) % cfg.interval) == 0)) \
        | (batch >= cfg.t_end)

    def prune(w):
        outs = []
        for k, fd in enumerate(cfg.density):
            A = w[:, k * n:(k + 1) * n]
            if cfg.quantize:
                d = jnp.float32(fd)
            else:
                d = _cubic_density(fd, batch, cfg.t_start, cfg.t_end)
            # the reference excludes the diagonal from scoring then re-adds
            A_nodiag = A - jnp.diag(jnp.diag(A))
            mask = _block_mask(A_nodiag, d, keep_diag=True)
            outs.append(A * mask)
        return jnp.concatenate(outs, axis=1)

    return jnp.where(active, prune(wr), wr)


def sparsify_gru_b_input(wi: jax.Array, grua_units: int, batch: jax.Array,
                         cfg: SparsifyConfig):
    """Prune the GRU-A-fed rows of GRU-B's input kernel (in, 3N)
    (SparsifyGRUB, lpcnet.py:184-256)."""
    nb3 = wi.shape[1]
    n = nb3 // 3
    active = cfg.quantize | ((batch > cfg.t_start)
                             & (((batch - cfg.t_start) % cfg.interval) == 0)) \
        | (batch >= cfg.t_end)

    def prune(w):
        top = w[:grua_units]
        rest = w[grua_units:]
        outs = []
        for k, fd in enumerate(cfg.grub_density):
            A = top[:, k * n:(k + 1) * n]
            if cfg.quantize:
                d = jnp.float32(fd)
            else:
                d = _cubic_density(fd, batch, cfg.t_start, cfg.t_end)
            mask = _block_mask(A, d, keep_diag=False)
            outs.append(A * mask)
        return jnp.concatenate([jnp.concatenate(outs, axis=1), rest], axis=0)

    return jnp.where(active, prune(wi), wi)


def progressive_quantize(w: jax.Array, batch: jax.Array, t_start: int,
                         t_end: int) -> jax.Array:
    """Snap weights near the int8/128 grid (lpcnet.py:162-178). The snap
    threshold anneals 0 -> 0.5 over [t_start, t_end]."""
    thr = jnp.where(batch < t_end,
                    0.5 * (batch - t_start) / (t_end - t_start), 0.5)
    thr = jnp.clip(thr, 0.0, 0.5)
    q = jnp.round(w * 128.0)
    res = w * 128.0 - q
    snap = (jnp.abs(res) <= thr).astype(w.dtype)
    return snap * q / 128.0 + (1 - snap) * w


def apply(params: Dict, batch: jax.Array, cfg: SparsifyConfig,
          grua_units: int):
    """Post-update hook: sparsify GRU-A recurrent + GRU-B input kernels,
    optionally with progressive quantization."""
    out = dict(params)
    ga = dict(params["gru_a"])
    gb = dict(params["gru_b"])
    ga["wr"] = sparsify_gru_a(params["gru_a"]["wr"], batch, cfg)
    gb["wi"] = sparsify_gru_b_input(params["gru_b"]["wi"], grua_units,
                                    batch, cfg)
    if cfg.quantize:
        fire = ((batch > cfg.t_start)
                & (((batch - cfg.t_start) % cfg.interval) == 0)) \
            | (batch >= cfg.t_end)
        ga["wr"] = jnp.where(
            fire, progressive_quantize(ga["wr"], batch, cfg.t_start,
                                       cfg.t_end), ga["wr"])
        gb["wi"] = jnp.where(
            fire, progressive_quantize(gb["wi"], batch, cfg.t_start,
                                       cfg.t_end), gb["wi"])
    out["gru_a"], out["gru_b"] = ga, gb
    return out


def measure_density(w: jax.Array) -> float:
    """Fraction of nonzero weights (diagnostic)."""
    return float(jnp.mean((w != 0).astype(jnp.float32)))
