"""PLC feature-prediction network (reference training_tf2/lpcnet_plc.py:94-181,
C engine compute_plc_pred src/lpcnet_plc.c:135-145).

Topology: Dense(128, tanh) -> GRU(256) -> GRU(256) -> Dense(20, linear).
Input per frame: [burg cepstra (36) | features (20) | lost flag (1)] = 57.
The lost flag encodes {1: good frame with Burg, 0: lost, -1: good via FEC
without Burg} (plc_loader.py:56-89, lpcnet_plc.c:153-166).
"""
import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..constants import NB_BANDS, NB_FEATURES, PLC_DENSE_SIZE, PLC_GRU_SIZE
from . import layers

PLC_INPUT_SIZE = 2 * NB_BANDS + NB_FEATURES + 1  # 57


@dataclasses.dataclass(frozen=True)
class PLCConfig:
    dense_size: int = PLC_DENSE_SIZE
    gru_size: int = PLC_GRU_SIZE
    nb_features: int = NB_FEATURES
    approx: bool = False


def init_params(rng: jax.Array, cfg: PLCConfig = PLCConfig()):
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    return {
        "dense1": layers.dense_init(k1, PLC_INPUT_SIZE, cfg.dense_size),
        "gru1": layers.gru_init(k2, cfg.dense_size, cfg.gru_size),
        "gru2": layers.gru_init(k3, cfg.gru_size, cfg.gru_size),
        "out": layers.dense_init(k4, cfg.gru_size, cfg.nb_features),
    }


def init_net_state(batch: int, cfg: PLCConfig = PLCConfig()):
    return {
        "gru1": jnp.zeros((batch, cfg.gru_size), jnp.float32),
        "gru2": jnp.zeros((batch, cfg.gru_size), jnp.float32),
    }


def step(params, net_state, x, cfg: PLCConfig = PLCConfig()):
    """One prediction step (compute_plc_pred, lpcnet_plc.c:135-145).

    x: (B, 57). Returns (new_net_state, predicted features (B, 20)) with
    the reference's correlation boost out[19] = min(.5, out[19]+.1)."""
    ap = cfg.approx
    h = layers.dense_apply(params["dense1"], x, "tanh", ap)
    g1 = layers.gru_apply(params["gru1"], net_state["gru1"], h, "tanh", ap)
    g2 = layers.gru_apply(params["gru2"], net_state["gru2"], g1, "tanh", ap)
    out = layers.dense_apply(params["out"], g2, "linear", ap)
    out = out.at[..., 19].set(jnp.minimum(0.5, out[..., 19] + 0.1))
    return {"gru1": g1, "gru2": g2}, out


def forward_sequence(params, xs, cfg: PLCConfig = PLCConfig(),
                     net_state=None):
    """Training-time forward over (B, T, 57) -> (B, T, 20) WITHOUT the
    inference-only correlation boost (matches the Keras training graph,
    lpcnet_plc.py:94-181)."""
    ap = cfg.approx
    B = xs.shape[0]
    if net_state is None:
        net_state = init_net_state(B, cfg)
    h = layers.dense_apply(params["dense1"], xs, "tanh", ap)

    def run_gru(p, h0, zin):
        zrh = zin @ p["wi"] + p["bi"]

        def stp(hh, z):
            from ..ops import activations
            n = hh.shape[-1]
            recur = hh @ p["wr"] + p["br"]
            sig = activations.get("sigmoid", ap)
            act = activations.get("tanh", ap)
            zz = sig(z[..., :n] + recur[..., :n])
            rr = sig(z[..., n:2 * n] + recur[..., n:2 * n])
            hc = act(z[..., 2 * n:] + rr * recur[..., 2 * n:])
            hh = zz * hh + (1 - zz) * hc
            return hh, hh

        _, hs = jax.lax.scan(stp, h0, zrh.transpose(1, 0, 2))
        return hs.transpose(1, 0, 2)

    g1 = run_gru(params["gru1"], net_state["gru1"], h)
    g2 = run_gru(params["gru2"], net_state["gru2"], g1)
    return layers.dense_apply(params["out"], g2, "linear", ap)
