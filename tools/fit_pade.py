"""Fit the Pade (rational) tanh approximation coefficients.

Counterpart of the reference coefficient-derivation tool
(training_tf2/pade.py:1-107): the C inference kernels approximate tanh as

    tanh(x) ~= clip(x * (a0 + a1 x^2 + a2 x^4) / (b0 + b1 x^2 + b2 x^4), +-1)

(the AVX/NEON tanh_approx polynomials, src/vec_avx.h:552-616) and the
reference derives (a, b) with a staged Keras fit: plain MSE first, then
losses that weight the MAX squared error progressively harder
(pade.py my_loss1..3). This tool reproduces that derivation natively in
JAX/optax — full-grid batches, the same [945,105,1]/[945,420,15] Taylor
seed (the exact Pade [5/4] expansion of tanh), and the same
mean->max loss schedule — and writes the fitted coefficients as JSON.

Usage:
    python tools/fit_pade.py [--out pade_tanh.json] [--steps 20000]

Prints per-stage max/mean |error| on the fit grid; the reference's
committed constants reach ~6e-4 max error on [-10, 10].
"""
import argparse
import json
import sys

import numpy as np


def fit(steps_per_stage: int = 20000, lr: float = 0.05, verbose: bool = True):
    import jax
    import jax.numpy as jnp
    import optax

    x = jnp.asarray(np.arange(-10.0, 10.0, 0.01, dtype=np.float32))
    y = jnp.tanh(x)
    x2 = x * x
    basis = jnp.stack([jnp.ones_like(x2), x2, x2 * x2], axis=-1)  # (N, 3)

    # Taylor-series Pade [5/4] seed, as in pade.py num_init/den_init
    params = {"num": jnp.asarray([945.0, 105.0, 1.0]),
              "den": jnp.asarray([945.0, 420.0, 15.0])}

    def predict(p):
        num = basis @ p["num"]
        den = basis @ p["den"]
        return jnp.clip(x * num / den, -1.0, 1.0)

    def loss_fn(p, mean_w, max_w):
        e2 = jnp.square(predict(p) - y)
        return mean_w * jnp.mean(e2) + max_w * jnp.max(e2)

    # the reference's schedule: pure MSE, then 1/0.1/0.01 mean weight with
    # unit max weight, each at a lower learning rate (pade.py:100-113)
    stages = [(1.0, 0.0, lr), (1.0, 1.0, 1e-3), (0.1, 1.0, 1e-4),
              (0.01, 1.0, 1e-5)]
    for mean_w, max_w, slr in stages:
        opt = optax.adam(slr, b1=0.9, b2=0.9)
        opt_state = opt.init(params)

        @jax.jit
        def step(p, s):
            l, g = jax.value_and_grad(loss_fn)(p, mean_w, max_w)
            upd, s = opt.update(g, s)
            return optax.apply_updates(p, upd), s, l

        for i in range(steps_per_stage):
            params, opt_state, l = step(params, opt_state)
        err = np.abs(np.asarray(predict(params) - y))
        if verbose:
            print(f"stage mean_w={mean_w} max_w={max_w}: "
                  f"max|err| {err.max():.3e}, mean|err| {err.mean():.3e}",
                  file=sys.stderr)
    return ({k: np.asarray(v).tolist() for k, v in params.items()},
            float(err.max()), float(err.mean()))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="pade_tanh.json")
    ap.add_argument("--steps", type=int, default=20000,
                    help="optimizer steps per loss stage")
    args = ap.parse_args()
    coeffs, emax, emean = fit(args.steps)
    result = {"form": "tanh(x) ~= clip(x*(n0+n1*x^2+n2*x^4)"
                      "/(d0+d1*x^2+d2*x^4), -1, 1)",
              "num": coeffs["num"], "den": coeffs["den"],
              "max_abs_err": emax, "mean_abs_err": emean,
              "grid": "[-10, 10) step 0.01"}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("num", "den", "max_abs_err")}))


if __name__ == "__main__":
    main()
