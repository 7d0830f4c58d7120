"""Experiment 2: tighter on-device oracles for the compiled kernels."""
import numpy as np
import jax
import jax.numpy as jnp

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
cond1 = {k: conds[k][:, 0] for k in ("cond_a", "cond_b", "lpc")}

# --- A. compiled vs INTERPRET (same op sequence, Mosaic vs XLA lowering)
st_c, pcm_c = jax.jit(lambda s, c: sample_pallas.synthesize_frames_pallas(
    voc.tables, s, c, CFG, variant="flat"))(state, conds)
st_i, pcm_i = jax.jit(lambda s, c: sample_pallas.synthesize_frames_pallas(
    voc.tables, s, c, CFG, variant="flat", interpret=True))(state, conds)
d = np.abs(np.asarray(pcm_c) - np.asarray(pcm_i))
print(f"A compiled-vs-interpret: max={d.max()} exact={(d == 0).mean():.6f} "
      f"rng_eq={np.array_equal(np.asarray(st_c['rng']), np.asarray(st_i['rng']))}")

# --- B. teacher-forced full frame: output==target, states at float tol
tgt = jnp.asarray(np.round(rs.randn(B, 160) * 2500).astype(np.float32))
pl_full = jnp.full((B,), 160, jnp.int32)
with jax.default_matmul_precision("float32"):
    s1, p1 = jax.jit(lambda s: sample_scan.synth_samples(
        voc.tables, s, cond1, CFG, 160, target=tgt, preload=pl_full))(state)
s2, p2 = jax.jit(lambda s: sample_pallas.synth_samples_pallas(
    voc.tables, s, cond1, CFG, 160, target=tgt, preload=pl_full,
    variant="flat"))(state)
print("B teacher-forced: pcm_eq=",
      np.array_equal(np.asarray(p1), np.asarray(p2)),
      "gru_a max=", float(np.abs(np.asarray(s1['gru_a']) -
                                 np.asarray(s2['gru_a'])).max()),
      "gru_b max=", float(np.abs(np.asarray(s1['gru_b']) -
                                 np.asarray(s2['gru_b'])).max()),
      "exc_eq=", float((np.asarray(s1['last_exc'])
                        == np.asarray(s2['last_exc'])).mean()),
      "rng_eq=", np.array_equal(np.asarray(s1['rng']), np.asarray(s2['rng'])))

# --- C. per-frame lockstep: resync state each frame, measure per-frame agreement
st_s = state
st_p = state
fracs = []
for t in range(T):
    c1 = {k: conds[k][:, t] for k in ("cond_a", "cond_b", "lpc")}
    with jax.default_matmul_precision("float32"):
        st_s2, ps = jax.jit(lambda s: sample_scan.synth_samples(
            voc.tables, s, c1, CFG, 160))(st_s)
    st_p2, pp = jax.jit(lambda s: sample_pallas.synth_samples_pallas(
        voc.tables, s, c1, CFG, 160, variant="flat"))(st_s)  # SAME start state
    d = np.abs(np.asarray(ps) - np.asarray(pp))
    fracs.append(float((d == 0).mean()))
    st_s = st_s2
print("C per-frame lockstep exact fracs:", [f"{x:.5f}" for x in fracs])

# --- D. teacher_advance compiled vs scan
state_w, _ = jax.jit(lambda s: sample_scan.synth_samples(
    voc.tables, s, cond1, CFG, 23))(state)
with jax.default_matmul_precision("float32"):
    sa, _ = jax.jit(lambda s: sample_scan.teacher_advance(
        voc.tables, s, cond1, CFG, tgt))(state_w)
sb, _ = jax.jit(lambda s: sample_pallas.teacher_advance_pallas(
    voc.tables, s, cond1, CFG, tgt))(state_w)
print("D teacher_advance: gru_a max=",
      float(np.abs(np.asarray(sa['gru_a']) - np.asarray(sb['gru_a'])).max()),
      "rng_eq=", np.array_equal(np.asarray(sa['rng']), np.asarray(sb['rng'])),
      "last_sig_eq=", np.array_equal(np.asarray(sa['last_sig']),
                                     np.asarray(sb['last_sig'])))

# --- E. free-run corr between compiled pallas and f32 scan
with jax.default_matmul_precision("float32"):
    st_f, pcm_f = jax.jit(lambda s, c: sample_scan.synthesize_frames(
        voc.tables, s, c, CFG))(state, conds)
a = np.asarray(pcm_c).ravel()
b = np.asarray(pcm_f).ravel()
print("E free-run corr compiled-vs-scan:", float(np.corrcoef(a, b)[0, 1]),
      "mean|d|=", float(np.abs(a - b).mean()))
