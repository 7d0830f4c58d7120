"""Concealment-quality evaluation of a PLC checkpoint on clean features.

Measures what the PLC net is for: how close its predicted features are to
the TRUE features of frames it never saw. Simulates packet losses on a
clean [burg36|feat36] stream (dump-data btest format; 20-ms packets = 2
frames per loss decision, lpcnet_demo.c:235), feeds the net the masked
stream exactly as the training loader does (plc_loader.py:56-89 — inputs
zeroed where lost, received flag), and reports mean L1 over the 20
predicted features ON LOST FRAMES against two baselines:
  - predict-zero (emit the feature mean / silence prior)
  - a random-init net

Usage: python tools/eval_plc.py ckpt.bin btest.f32 [loss_rate=0.25] [seed]
"""
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lpcnet_tpu.cli import load_model_params, read_features
    from lpcnet_tpu.constants import NB_BANDS, NB_FEATURES, \
        NB_TOTAL_FEATURES
    from lpcnet_tpu.models import plc as plc_model

    ckpt = sys.argv[1]
    feat_path = sys.argv[2]
    loss_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    width = 2 * NB_BANDS + NB_TOTAL_FEATURES          # 72 (btest)
    raw = np.fromfile(feat_path, np.float32)
    assert raw.size % width == 0, "expected dump-data btest 72-wide frames"
    data = raw.reshape(-1, width)
    burg = data[:, :2 * NB_BANDS]
    feat = data[:, 2 * NB_BANDS:2 * NB_BANDS + NB_FEATURES]
    clean = np.concatenate([burg, feat], axis=-1)     # (T, 56)
    T = len(clean)

    rs = np.random.RandomState(seed)
    # 20-ms packets: one loss flag per 2 frames
    pkt = (rs.uniform(size=(T + 1) // 2) >= loss_rate).astype(np.float32)
    received = np.repeat(pkt, 2)[:T]
    if received.min() > 0:                            # ensure some losses
        received[T // 2:T // 2 + 2] = 0.0

    rec = received[None, :, None]
    inputs = np.concatenate([clean[None] * rec, rec], axis=-1)  # (1,T,57)
    lost = received < 0.5

    cfg = plc_model.PLCConfig()
    params = load_model_params(ckpt, plc_model.init_params, rng_seed=1)
    rnd = plc_model.init_params(jax.random.PRNGKey(7))

    fwd = jax.jit(lambda p, x: plc_model.forward_sequence(p, x, cfg))
    results = {}
    for name, p in (("trained", params), ("random init", rnd)):
        pred = np.asarray(fwd(p, jnp.asarray(inputs))[0])
        results[name] = float(np.abs(pred[lost] - feat[lost]).mean())
    zero = float(np.abs(feat[lost]).mean())
    print(f"lost frames: {int(lost.sum())}/{T} at rate {loss_rate}")
    print(f"feature L1 on lost frames: trained {results['trained']:.3f}  "
          f"predict-zero {zero:.3f}  random-init "
          f"{results['random init']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
