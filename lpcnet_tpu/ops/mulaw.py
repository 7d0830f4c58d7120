"""Mu-law companding, bit-exact with the reference C semantics.

The reference (src/common.h:18-58) does NOT use textbook mu-law: lin2ulaw goes
through `log2_approx`, a float-bit-trick base-2 log with a cubic polynomial on
the mantissa. We replicate that trick exactly (float32 bitcast + int arithmetic)
so quantization decisions match the C bit-for-bit; this is what makes a matched
mu-law sample path achievable.

All functions are elementwise, jittable, and shape-polymorphic.
"""
import jax
import jax.numpy as jnp
import numpy as np

LOG256 = 5.5451774445


def _c_ulaw2lin_table() -> np.ndarray:
    """The C ulaw2lin (src/common.h:37-45) evaluated for every integer
    mu-law index with its exact promotion semantics: the expression
    `s*scale_1*(exp(u/128.*LOG256)-1)` runs in DOUBLE (the double literal
    `128.` promotes everything after the float `s*scale_1` product) and
    rounds to float once on return. Excitation indices are always
    integers, so this 256-entry table IS the C function, bit-for-bit."""
    scale_1 = np.float32(np.float32(32768.0) / np.float32(255.0))
    log256 = np.float64(np.float32(5.5451774445))
    u = np.arange(256, dtype=np.float64) - 128.0
    s = np.where(u >= 0, np.float32(1.0), np.float32(-1.0))
    su = np.float64((s * scale_1).astype(np.float32))
    val = su * (np.exp(np.abs(u) / 128.0 * log256) - 1.0)
    return val.astype(np.float32)


ULAW2LIN_TABLE = _c_ulaw2lin_table()


def log2_approx(x: jax.Array) -> jax.Array:
    """Bit-trick base-2 log (reference src/common.h:18-33). x must be > 0."""
    x = x.astype(jnp.float32)
    xi = jax.lax.bitcast_convert_type(x, jnp.int32)
    integer = (xi >> 23) - 127
    xi = xi - (integer << 23)
    f = jax.lax.bitcast_convert_type(xi, jnp.float32)
    frac = f - jnp.float32(1.5)
    poly = jnp.float32(-0.41445418) + frac * (
        jnp.float32(0.95909232)
        + frac * (jnp.float32(-0.33951290) + frac * jnp.float32(0.16541097))
    )
    return (1 + integer).astype(jnp.float32) + poly


def log_approx(x: jax.Array) -> jax.Array:
    """Natural log via log2_approx (src/common.h:35)."""
    return jnp.float32(0.69315) * log2_approx(x)


def lin2ulaw(x: jax.Array) -> jax.Array:
    """Linear float sample -> mu-law index in [0, 255] (int32).

    Mirrors src/common.h:47-58 exactly, including the approximate log and the
    floor(.5 + u) rounding.
    """
    x = x.astype(jnp.float32)
    scale = jnp.float32(255.0 / 32768.0)
    s = jnp.where(x >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    ax = jnp.abs(x)
    u = s * (jnp.float32(128.0) * log_approx(jnp.float32(1.0) + scale * ax)
             / jnp.float32(LOG256))
    u = jnp.float32(128.0) + u
    u = jnp.clip(u, 0.0, 255.0)
    return jnp.floor(jnp.float32(0.5) + u).astype(jnp.int32)


def ulaw2lin(u: jax.Array) -> jax.Array:
    """Mu-law index -> linear float (src/common.h:37-45).

    Integer inputs (the kernels' excitation indices) go through
    ULAW2LIN_TABLE and are bit-exact with the C's double-exp evaluation;
    float inputs use the float32 analytic form (~4e-6 relative of the C)."""
    u = jnp.asarray(u)
    if jnp.issubdtype(u.dtype, jnp.integer):
        return jnp.take(jnp.asarray(ULAW2LIN_TABLE),
                        jnp.clip(u, 0, 255), axis=0)
    u = u.astype(jnp.float32)
    scale_1 = jnp.float32(32768.0 / 255.0)
    u = u - jnp.float32(128.0)
    s = jnp.where(u >= 0, jnp.float32(1.0), jnp.float32(-1.0))
    u = jnp.abs(u)
    return s * scale_1 * (jnp.exp(u / jnp.float32(128.0) * jnp.float32(LOG256))
                          - jnp.float32(1.0))
