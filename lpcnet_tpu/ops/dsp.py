"""Spectral DSP: windowing, band energies, DCT cepstrum, LPC.

TPU-native re-design of reference src/freq.c. Scalar loops become matmuls:
band energy folding and gain interpolation are a single (160, 18) matrix
(tables.BAND_INTERP) applied on the MXU; the DCT-II is an 18x18 matmul; the
FFT is jnp.fft.rfft (XLA), normalized to match the reference kiss_fft scaling
(opus_fft scales by 1/nfft on the forward transform).

All functions are batched over arbitrary leading dims and jittable.
"""
import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (FREQ_SIZE, LPC_ORDER, NB_BANDS, OVERLAP_SIZE,
                         WINDOW_SIZE)
from .tables import (BAND_EDGE_SCALE, BAND_INTERP, COMPENSATION, DCT_TABLE,
                     HALF_WINDOW)

_DCT_SCALE = np.float32(np.sqrt(2.0 / NB_BANDS))
_NBINS = BAND_INTERP.shape[0]  # 160 interpolated FFT bins


def apply_window(x: jax.Array) -> jax.Array:
    """Vorbis window on both edges (freq.c:322-328). x: (..., WINDOW_SIZE)."""
    hw = jnp.asarray(HALF_WINDOW)
    w = jnp.concatenate([hw, hw[::-1]])  # rises then falls; OVERLAP==FRAME here
    return x * w


def forward_transform(x: jax.Array) -> jax.Array:
    """Windowless FFT wrapper (freq.c:242-254): rfft scaled by 1/WINDOW_SIZE.

    x: (..., WINDOW_SIZE) -> complex64 (..., FREQ_SIZE).
    """
    return jnp.fft.rfft(x.astype(jnp.float32), n=WINDOW_SIZE, axis=-1) / WINDOW_SIZE


def inverse_transform(X: jax.Array) -> jax.Array:
    """Inverse FFT wrapper (freq.c:256-273): returns WINDOW_SIZE * irfft(X).

    The reference runs a forward FFT on a conjugate-extended spectrum and
    reads the result reversed with an N scale; algebraically that is exactly
    N * irfft. X: (..., FREQ_SIZE) complex -> (..., WINDOW_SIZE) float.
    """
    return WINDOW_SIZE * jnp.fft.irfft(X, n=WINDOW_SIZE, axis=-1).astype(jnp.float32)


def compute_band_energy(X: jax.Array) -> jax.Array:
    """18 triangular band energies (freq.c:131-154). X: (..., FREQ_SIZE) complex."""
    p = (X.real * X.real + X.imag * X.imag)[..., :_NBINS]
    e = p.astype(jnp.float32) @ jnp.asarray(BAND_INTERP)
    return e * jnp.asarray(BAND_EDGE_SCALE)


def compute_band_energy_inverse(X: jax.Array) -> jax.Array:
    """Band energies of 1/(|X|^2 + 1e-9) (freq.c:60-84), used by Burg."""
    p = (X.real * X.real + X.imag * X.imag)[..., :_NBINS]
    inv = 1.0 / (p.astype(jnp.float32) + jnp.float32(1e-9))
    e = inv @ jnp.asarray(BAND_INTERP)
    return e * jnp.asarray(BAND_EDGE_SCALE)


def interp_band_gain(bandE: jax.Array) -> jax.Array:
    """Spread 18 band values to 161 bins (freq.c:202-215). Last bin = 0."""
    g = bandE.astype(jnp.float32) @ jnp.asarray(BAND_INTERP).T
    pad = [(0, 0)] * (g.ndim - 1) + [(0, FREQ_SIZE - _NBINS)]
    return jnp.pad(g, pad)


def dct(x: jax.Array) -> jax.Array:
    """DCT-II, 18-point, orthonormal-ish (freq.c:218-228). x: (..., 18)."""
    return (x.astype(jnp.float32) @ jnp.asarray(DCT_TABLE)) * _DCT_SCALE


def idct(x: jax.Array) -> jax.Array:
    """Inverse DCT (freq.c:230-240)."""
    return (x.astype(jnp.float32) @ jnp.asarray(DCT_TABLE).T) * _DCT_SCALE


def levinson(ac: jax.Array):
    """Levinson-Durbin, order LPC_ORDER (lpcn_lpc, freq.c:86-127).

    ac: (..., LPC_ORDER+1) autocorrelation. Returns (lpc, rc, error) with
    lpc/rc (..., LPC_ORDER). Replicates the reference's early-exit at 30 dB
    prediction gain (error < .001*ac[0]) via a `done` mask, and the ac[0]==0
    guard. Fixed 16-iteration lax.scan -> fully unrolled/batched by XLA.
    """
    ac = ac.astype(jnp.float32)
    batch_shape = ac.shape[:-1]
    p = LPC_ORDER
    lpc = jnp.zeros(batch_shape + (p,), jnp.float32)
    rc = jnp.zeros(batch_shape + (p,), jnp.float32)
    error = ac[..., 0]
    done = error == 0  # never updates if ac[0]==0

    # Unrolled with static slices only (dynamic gathers in a scan were the
    # dominant cost of the whole conditioning pipeline on TPU). Round 4:
    # prefix `.at[]` writes lower to dynamic-update-slice (~2.5 us of
    # scalar-path dispatch each on TPU); the same arithmetic as full-width
    # masked selects fuses to one elementwise op per update, and all
    # reversed prefix reads are static slices of one full reverse.
    iota = jnp.arange(p)
    acr = ac[..., ::-1]                        # acr[j] = ac[p-j] (width p+1)
    for i in range(p):
        if i > 0:
            # rr = sum_{j<i} lpc[j] * ac[i-j] + ac[i+1]
            rr = jnp.sum(lpc[..., :i] * acr[..., p - i:p], axis=-1) \
                + ac[..., i + 1]
        else:
            rr = ac[..., 1]
        safe_err = jnp.where(error == 0, jnp.float32(1.0), error)
        r = -rr / safe_err
        # symmetric AR update lpc[k] += r*lpc[i-1-k] for all k<i; the
        # middle element of odd i overlaps with an identical value
        # (freq.c:111-118 write order)
        if i > 0:
            lpcr = lpc[..., ::-1]              # lpcr[p-1-k] = lpc[k]
            partner = lpcr[..., p - i:p]       # lpc[i-1-k], k=0..i-1
            partner = jnp.concatenate(
                [partner, jnp.zeros(partner.shape[:-1] + (p - i,),
                                    partner.dtype)], axis=-1)
            new_lpc = jnp.where(iota < i, lpc + r[..., None] * partner, lpc)
        else:
            new_lpc = lpc
        new_lpc = jnp.where(iota == i, r[..., None], new_lpc)
        new_rc = jnp.where(iota == i, r[..., None], rc)
        new_err = error - r * r * error
        nd = ~done
        lpc = jnp.where(nd[..., None], new_lpc, lpc)
        rc = jnp.where(nd[..., None], new_rc, rc)
        error = jnp.where(nd, new_err, error)
        # break AFTER the update when error < .001*ac[0] (freq.c:121-123)
        done = done | (error < 0.001 * ac[..., 0])
    return lpc, rc, error


def lpc_from_bands(Ex: jax.Array):
    """Band energies -> LPC via autocorrelation (freq.c:275-297).

    Ex: (..., NB_BANDS). Returns (lpc, error)."""
    Xr = interp_band_gain(Ex)
    x_auto = inverse_transform(Xr.astype(jnp.complex64))
    ac = x_auto[..., :LPC_ORDER + 1]
    # -40 dB noise floor; the reference writes 320/12/38. with C integer
    # division: 320/12 == 26, so the floor constant is 26/38 (freq.c:292).
    floor_c = jnp.float32(26.0 / 38.0)
    ac0 = ac[..., 0] + ac[..., 0] * jnp.float32(1e-4) + floor_c
    lag = (1.0 - 6e-5 * np.arange(1, LPC_ORDER + 1, dtype=np.float32) ** 2)
    ac = jnp.concatenate([ac0[..., None], ac[..., 1:] * jnp.asarray(lag)], axis=-1)
    lpc, _, err = levinson(ac)
    return lpc, err


def lpc_from_cepstrum(cepstrum: jax.Array):
    """18 cepstral coeffs -> 16 LPC (freq.c:310-320). cepstrum: (..., >=18)."""
    tmp = cepstrum[..., :NB_BANDS].astype(jnp.float32)
    tmp = tmp.at[..., 0].add(4.0)
    Ex = idct(tmp)
    Ex = jnp.power(jnp.float32(10.0), Ex) * jnp.asarray(COMPENSATION)
    return lpc_from_bands(Ex)


def lpc_weighting(lpc: jax.Array, gamma: float) -> jax.Array:
    """Bandwidth expansion lpc[i] *= gamma^(i+1) (freq.c:299-308)."""
    g = gamma ** np.arange(1, LPC_ORDER + 1, dtype=np.float32)
    return lpc * jnp.asarray(g)


def preemphasis(x: jax.Array, mem: jax.Array, coef: float = 0.85):
    """y[i] = x[i] - coef*x[i-1], streaming (lpcnet_enc.c:872-880).

    x: (..., N), mem: (...,) previous input sample. Returns (y, new_mem)."""
    x = x.astype(jnp.float32)
    prev = jnp.concatenate([mem[..., None], x[..., :-1]], axis=-1)
    return x - coef * prev, x[..., -1]


def deemphasis_scan(e: jax.Array, mem: jax.Array, coef: float = 0.85):
    """Streaming de-emphasis y[i] = e[i] + coef*y[i-1] via first-order scan.

    Implemented with associative_scan so it parallelizes along time on TPU.
    e: (..., N) with time last, mem: (...,). Returns (y, new_mem)."""
    e = e.astype(jnp.float32)
    n = e.shape[-1]
    coefs = jnp.full(e.shape, jnp.float32(coef))
    # y[i] = coef*y[i-1] + u[i] with u[0] = e[0] + coef*mem
    u = e.at[..., 0].add(coef * mem)

    def op(a, b):
        # pairs (A, B): y = A*y_prev + B
        return a[0] * b[0], b[0] * a[1] + b[1]

    A, B = jax.lax.associative_scan(op, (coefs, u), axis=-1)
    y = B  # y relative to y[-1]=0 because mem was folded into u[0]
    del A, n
    return y, y[..., -1]
