"""Burg LPC analysis (SILK float method) and the Burg cepstrum used by PLC.

Re-design of reference src/burg.c:98-245 (silk_burg_analysis) and
src/freq.c:156-199 (compute_burg_cepstrum / burg_cepstral_analysis) as
batched, jittable JAX. The order recursion (16 steps) is unrolled; every
step is masked vector math over the coefficient axis, vectorized over
arbitrary leading batch dims. The reference computes in double; we use
float32 (validated ~1e-3 against the C goldens) since the result only feeds
log-band energies.

LPCNet always calls this with a single subframe (nb_subfr=1,
subfr_length=79, D=16, minInvGain=1e-3) — freq.c:170.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import LPC_ORDER, NB_BANDS, PREEMPHASIS, WINDOW_SIZE
from . import dsp

_COND_FAC = 1e-5  # FIND_LPC_COND_FAC (burg.c:40)


def burg_analysis(x: jax.Array, min_inv_gain: float = 1e-3,
                  order: int = LPC_ORDER) -> Tuple[jax.Array, jax.Array]:
    """Single-subframe Burg analysis. x: (..., L). Returns (A (..., order)
    prediction coefficients, residual energy (...,))."""
    x = x.astype(jnp.float32)
    L = x.shape[-1]
    D = order
    batch = x.shape[:-1]

    C0 = jnp.sum(x * x, axis=-1)
    # C_first_row[n-1] = <x[0:L-n], x[n:L]>
    C_first = jnp.stack(
        [jnp.sum(x[..., :L - n] * x[..., n:], axis=-1)
         for n in range(1, D + 1)], axis=-1)
    C_last = C_first

    CAf0 = C0 + _COND_FAC * C0 + 1e-9
    CAf = jnp.concatenate([CAf0[..., None],
                           jnp.zeros(batch + (D,), jnp.float32)], axis=-1)
    CAb = CAf
    Af = jnp.zeros(batch + (D,), jnp.float32)
    inv_gain = jnp.ones(batch, jnp.float32)
    reached = jnp.zeros(batch, bool)

    karr = jnp.arange(D)

    for n in range(D):
        # tmp1 = x[n] + sum_{k<n} Af[k]*x[n-k-1]
        # tmp2 = x[L-n-1] + sum_{k<n} Af[k]*x[L-n+k]
        if n > 0:
            xf = x[..., n - 1::-1][..., :n]          # x[n-k-1], k=0..n-1
            xb = x[..., L - n:L - n + n]             # x[L-n+k]
            tmp1 = x[..., n] + jnp.sum(Af[..., :n] * xf, axis=-1)
            tmp2 = x[..., L - n - 1] + jnp.sum(Af[..., :n] * xb, axis=-1)
            # C row downdates for k < n
            cf_upd = x[..., n:n + 1] * xf
            cb_upd = x[..., L - n - 1:L - n] * xb
            C_first = C_first.at[..., :n].add(-cf_upd)
            C_last = C_last.at[..., :n].add(-cb_upd)
        else:
            tmp1 = x[..., n]
            tmp2 = x[..., L - n - 1]
        # CAf[k] -= tmp1 * x[n-k] for k<=n ; CAb[k] -= tmp2 * x[L-n+k-1]
        xnk = x[..., n::-1][..., :n + 1]             # x[n-k], k=0..n
        xbk = x[..., L - n - 1:L - n + n]            # x[L-n+k-1], k=0..n
        CAf = CAf.at[..., :n + 1].add(-tmp1[..., None] * xnk)
        CAb = CAb.at[..., :n + 1].add(-tmp2[..., None] * xbk)
        # next-row terms
        t1 = C_first[..., n]
        t2 = C_last[..., n]
        if n > 0:
            t1 = t1 + jnp.sum(C_last[..., n - 1::-1][..., :n]
                              * Af[..., :n], axis=-1)
            t2 = t2 + jnp.sum(C_first[..., n - 1::-1][..., :n]
                              * Af[..., :n], axis=-1)
        CAf = CAf.at[..., n + 1].set(t1)
        CAb = CAb.at[..., n + 1].set(t2)

        num = CAb[..., n + 1]
        nrg_b = CAb[..., 0]
        nrg_f = CAf[..., 0]
        if n > 0:
            num = num + jnp.sum(CAb[..., n:0:-1][..., :n] * Af[..., :n],
                                axis=-1)
            nrg_b = nrg_b + jnp.sum(CAb[..., 1:n + 1] * Af[..., :n], axis=-1)
            nrg_f = nrg_f + jnp.sum(CAf[..., 1:n + 1] * Af[..., :n], axis=-1)
        rc = -2.0 * num / (nrg_f + nrg_b)

        # max-prediction-gain guard (burg.c:179-192)
        tmp_g = inv_gain * (1.0 - rc * rc)
        hit = tmp_g <= min_inv_gain
        rc_adj = jnp.sqrt(jnp.maximum(1.0 - min_inv_gain / inv_gain, 0.0))
        rc_adj = jnp.where(num > 0, -rc_adj, rc_adj)
        rc = jnp.where(hit, rc_adj, rc)
        new_inv_gain = jnp.where(hit, min_inv_gain, tmp_g)

        # AR update (symmetric, uses pre-update values)
        half = (n + 1) >> 1
        if half > 0:
            a_f = Af[..., :half]
            a_b = Af[..., n - half:n][..., ::-1]     # Af[n-k-1]
            new_f = a_f + rc[..., None] * a_b
            new_b = a_b + rc[..., None] * a_f
            Af_n = Af.at[..., :half].set(new_f)
            Af_n = Af_n.at[..., n - half:n].set(new_b[..., ::-1])
        else:
            Af_n = Af
        Af_n = Af_n.at[..., n].set(rc)
        # freeze everything once max gain was reached in an earlier step
        Af = jnp.where(reached[..., None], Af, Af_n)
        inv_gain = jnp.where(reached, inv_gain, new_inv_gain)

        # CAf/CAb cross update over indices 0..n+1 (burg.c:212-216); reads
        # use pre-update values (the C's in-place order never aliases)
        upd = ~(reached | hit)
        caf_s = CAf[..., :n + 2]
        cab_s = CAb[..., :n + 2]
        CAf_n = CAf.at[..., :n + 2].set(caf_s + rc[..., None]
                                        * cab_s[..., ::-1])
        CAb_n = CAb.at[..., :n + 2].set(cab_s + rc[..., None]
                                        * caf_s[..., ::-1])
        CAf = jnp.where(upd[..., None], CAf_n, CAf)
        CAb = jnp.where(upd[..., None], CAb_n, CAb)
        reached = reached | hit

    # residual energy (burg.c:219-241)
    nrg_hit = (C0 - jnp.sum(x[..., :D] * x[..., :D], axis=-1)) * inv_gain
    nrg_nohit = CAf[..., 0] + jnp.sum(CAf[..., 1:] * Af, axis=-1) \
        - _COND_FAC * C0 * (1.0 + jnp.sum(Af * Af, axis=-1))
    nrg = jnp.where(reached, nrg_hit, nrg_nohit)
    return -Af, nrg


def burg_cepstrum(pcm: jax.Array) -> jax.Array:
    """Burg cepstrum of one half-frame (compute_burg_cepstrum,
    freq.c:156-186). pcm: (..., 80). Returns (..., 18)."""
    L = pcm.shape[-1]
    order = LPC_ORDER
    xin = pcm[..., 1:] - PREEMPHASIS * pcm[..., :-1]     # (..., L-1)
    lpc, g = burg_analysis(xin, 1e-3, order)
    g = g / (L - 2 * (order - 1))
    # inverse filter spectrum: impulse [1, -lpc*0.995^(i+1), 0...]
    bw = 0.995 ** np.arange(1, order + 1, dtype=np.float32)
    imp = jnp.concatenate(
        [jnp.ones(pcm.shape[:-1] + (1,), jnp.float32), -lpc * bw,
         jnp.zeros(pcm.shape[:-1] + (WINDOW_SIZE - order - 1,), jnp.float32)],
        axis=-1)
    X = dsp.forward_transform(imp)
    E = dsp.compute_band_energy_inverse(X)
    E = E * (0.45 * g[..., None] * (1.0 / WINDOW_SIZE ** 3))
    from ..features import log_follower
    Ly = log_follower(jnp.log10(1e-2 + E))
    ceps = dsp.dct(Ly)
    return ceps.at[..., 0].add(-4.0)


def burg_cepstral_analysis(pcm: jax.Array) -> jax.Array:
    """Sum/difference Burg cepstra of the two half-frames
    (burg_cepstral_analysis, freq.c:188-199). pcm: (..., 160) ->
    (..., 36) [.5*(c0+c1) | (c0-c1)]."""
    c0 = burg_cepstrum(pcm[..., :80])
    c1 = burg_cepstrum(pcm[..., 80:160])
    return jnp.concatenate([0.5 * (c0 + c1), c0 - c1], axis=-1)
