"""Activation functions, with both exact-JAX and reference-approximation forms.

The reference C inference never evaluates a true tanh/sigmoid/exp: it uses a
201-entry table with a 2nd-order correction (src/vec.h:82-104) and a float
bit-trick exp2 (src/vec.h:62-80). We provide those approximations (for
parity-mode inference that tracks the C waveform) alongside the exact jnp
versions (for training and default inference - on TPU the exact transcendentals
run on the VPU at full rate, so the approximation buys nothing).
"""
import jax
import jax.numpy as jnp

from .tables import TANSIG_TABLE


def tanh_approx(x: jax.Array) -> jax.Array:
    """Table-driven tanh (src/vec.h:82-99). Elementwise, jittable."""
    x = x.astype(jnp.float32)
    sign = jnp.where(x < 0, jnp.float32(-1.0), jnp.float32(1.0))
    ax = jnp.abs(x)
    i = jnp.floor(jnp.float32(0.5) + jnp.float32(25.0) * ax).astype(jnp.int32)
    i = jnp.clip(i, 0, 200)
    dx = ax - jnp.float32(0.04) * i.astype(jnp.float32)
    y = jnp.asarray(TANSIG_TABLE)[i]
    dy = jnp.float32(1.0) - y * y
    y = y + dx * dy * (jnp.float32(1.0) - y * dx)
    return sign * y


def sigmoid_approx(x: jax.Array) -> jax.Array:
    """.5 + .5*tanh_approx(.5*x) (src/vec.h:101-104)."""
    return jnp.float32(0.5) + jnp.float32(0.5) * tanh_approx(jnp.float32(0.5) * x)


def lpcnet_exp2(x: jax.Array) -> jax.Array:
    """Bit-trick 2^x (src/vec.h:62-79)."""
    x = x.astype(jnp.float32)
    integer = jnp.floor(x)
    frac = x - integer
    poly = jnp.float32(0.99992522) + frac * (
        jnp.float32(0.69583354)
        + frac * (jnp.float32(0.22606716) + jnp.float32(0.078024523) * frac))
    pi = jax.lax.bitcast_convert_type(poly, jnp.int32)
    pi = (pi + (integer.astype(jnp.int32) << 23)) & jnp.int32(0x7FFFFFFF)
    res = jax.lax.bitcast_convert_type(pi, jnp.float32)
    return jnp.where(integer < -50, jnp.float32(0.0), res)


def lpcnet_exp(x: jax.Array) -> jax.Array:
    """e^x via exp2 (src/vec.h:80)."""
    return lpcnet_exp2(x * jnp.float32(1.44269504))


# Exact versions: default compute path on TPU.
tanh_exact = jnp.tanh
sigmoid_exact = jax.nn.sigmoid


def get(name: str, approx: bool):
    """Look up an activation by reference name."""
    if name == "tanh":
        return tanh_approx if approx else tanh_exact
    if name == "sigmoid":
        return sigmoid_approx if approx else sigmoid_exact
    if name == "relu":
        return jax.nn.relu
    if name == "linear":
        return lambda x: x
    if name == "swish":
        if approx:
            return lambda x: x * sigmoid_approx(x)
        return jax.nn.silu
    raise ValueError(f"unknown activation {name!r}")
