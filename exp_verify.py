"""Experiment: compiled Mosaic kernels vs sample_scan oracle on real TPU."""
import os
import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices())

from lpcnet_tpu.constants import NB_TOTAL_FEATURES
from lpcnet_tpu.kernels import sample_pallas, sample_scan
from lpcnet_tpu.models import lpcnet as lm
from lpcnet_tpu.vocoder import Synthesizer

CFG = lm.LPCNetConfig()
voc = Synthesizer(CFG, rng=jax.random.PRNGKey(11), backend="pallas")

B, T = 1024, 4
rs = np.random.RandomState(5)
f = np.zeros((B, T, NB_TOTAL_FEATURES), np.float32)
f[..., :18] = rs.randn(B, T, 18) * 0.3
f[..., 18] = rs.uniform(-1, 1, (B, T))
f[..., 19] = rs.uniform(0, 1, (B, T))
conds = voc.conditions(jnp.asarray(f))
state = voc.reset(B, per_stream_rng=True)

# scan oracle at full f32 matmul precision
with jax.default_matmul_precision("float32"):
    st_scan, pcm_scan = jax.jit(
        lambda s, c: sample_scan.synthesize_frames(voc.tables, s, c, CFG)
    )(state, conds)
    jax.block_until_ready(pcm_scan)

for variant in ("flat", "base"):
    st_pal, pcm_pal = jax.jit(
        lambda s, c: sample_pallas.synthesize_frames_pallas(
            voc.tables, s, c, CFG, variant=variant))(state, conds)
    jax.block_until_ready(pcm_pal)
    d = np.abs(np.asarray(pcm_pal) - np.asarray(pcm_scan))
    rng_eq = np.array_equal(np.asarray(st_pal["rng"]),
                            np.asarray(st_scan["rng"]))
    exc_eq = (np.asarray(st_pal["last_exc"])
              == np.asarray(st_scan["last_exc"])).mean()
    ga = np.abs(np.asarray(st_pal["gru_a"]) - np.asarray(st_scan["gru_a"]))
    print(f"variant={variant}: pcm max|d|={d.max()} exact_frac="
          f"{(d == 0).mean():.6f} rng_eq={rng_eq} exc_eq={exc_eq:.6f} "
          f"gru_a max={ga.max():.3e}")

# scan at DEFAULT precision for comparison
st2, pcm2 = jax.jit(
    lambda s, c: sample_scan.synthesize_frames(voc.tables, s, c, CFG)
)(state, conds)
d2 = np.abs(np.asarray(pcm2) - np.asarray(pcm_scan))
print(f"scan default-prec vs f32-prec: max|d|={d2.max()} "
      f"exact={(d2 == 0).mean():.6f}")
