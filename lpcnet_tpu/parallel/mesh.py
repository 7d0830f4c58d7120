"""Device mesh + sharding helpers.

The LPCNet family is small (couple of MB of weights): the right parallelism
is pure stream/data parallelism — replicate params, shard the stream batch
(SURVEY.md section 2.4). The reference's only distribution machinery is
tf.distribute.MultiWorkerMirroredStrategy (train_lpcnet.py:230-232); the
TPU-native equivalent is a 1-D "dp" mesh with jit-inserted gradient psums
over ICI.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "dp") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard leading (stream/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: str = "dp"):
    """Place every leaf with its leading axis split over the mesh."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_synthesis(voc, batch: int, mesh: Optional[Mesh] = None,
                    axis_name: str = "dp"):
    """Stream-data-parallel synthesis setup (BASELINE.json config 5:
    thousands of concurrent streams sharded across chips, features
    ingested per host).

    Returns (state, synth_fn) where state's stream axis is sharded over
    the mesh and synth_fn(state, features) runs the jitted DP synthesis —
    features may be host numpy; they are device_put with the same stream
    sharding (the per-host ingest boundary). Weights are replicated; XLA
    inserts no collectives in the forward path (streams are independent),
    so scaling is communication-free by construction.
    """
    mesh = mesh or make_mesh()
    n = mesh.devices.size
    assert batch % n == 0, f"batch {batch} must divide over {n} devices"
    sh = batch_sharding(mesh, axis_name)
    state = voc.reset(batch, per_stream_rng=True)
    state = jax.tree.map(lambda x: jax.device_put(x, sh), state)

    def synth_fn(state, features):
        features = jax.device_put(jnp.asarray(features), sh)
        return voc.synthesize(state, features)

    return state, synth_fn


def dryrun_training_step(n_devices: int) -> None:
    """Build an n_devices mesh, jit the FULL LPCNet training step at the
    FLAGSHIP LPCNetConfig (gru_a 384 / dual-FC 256 / frame 160) with real
    dp shardings, and run one step on a tiny batch. Used by the driver to
    validate the multi-chip path without hardware."""
    import optax

    from ..models import lpcnet
    from ..training import lpcnet_task

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = make_mesh(devices)

    cfg = lpcnet.LPCNetConfig()
    params = lpcnet.init_params(jax.random.PRNGKey(0), cfg)
    opt = lpcnet_task.make_optimizer()
    opt_state = opt.init(params)

    B, T = 2 * n_devices, 3
    S = T * cfg.frame_size
    rs = np.random.RandomState(0)
    batch = {
        "sig_in": rs.randn(B, S).astype(np.float32) * 1000,
        "sig_out": rs.randn(B, S).astype(np.float32) * 1000,
        "features": rs.randn(B, T + 4, 20).astype(np.float32) * 0.3,
        "periods": rs.randint(33, 255, (B, T + 4)).astype(np.int32),
        "lpc": rs.randn(B, T, 16).astype(np.float32) * 0.1,
    }

    rep = replicated(mesh)
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)
    batch = shard_batch(batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(1), rep)

    params, opt_state, metrics = lpcnet_task.train_step(
        params, opt_state, batch, rng, cfg, opt)
    jax.block_until_ready(params)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss


def dryrun_inference_stream_dp(n_devices: int) -> None:
    """Jit stream-DP synthesis (shard_synthesis — the BASELINE scale-out
    config) at the flagship LPCNetConfig over an n_devices mesh, run one
    2-frame chunk, and assert the output stays batch-sharded across all
    devices (no implicit gather)."""
    from ..constants import NB_TOTAL_FEATURES
    from ..vocoder import Synthesizer

    devices = jax.devices()[:n_devices]
    mesh = make_mesh(devices)
    voc = Synthesizer(backend="scan")     # portable; pallas is TPU-only
    B, T = 2 * n_devices, 2
    state, synth_fn = shard_synthesis(voc, B, mesh)
    feats = np.random.RandomState(0).randn(
        B, T, NB_TOTAL_FEATURES).astype(np.float32) * 0.1
    state, pcm = synth_fn(state, feats)
    jax.block_until_ready(pcm)
    assert pcm.shape == (B, T * voc.cfg.frame_size), pcm.shape
    assert len(pcm.sharding.device_set) == n_devices, pcm.sharding
    shard_rows = sorted(s.data.shape[0] for s in pcm.addressable_shards)
    assert shard_rows == [B // n_devices] * n_devices, shard_rows
    assert np.isfinite(np.asarray(pcm)).all()
