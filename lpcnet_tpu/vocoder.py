"""High-level synthesis API: the functional equivalent of the reference's
public C API (include/lpcnet.h:163-198 lpcnet_create/_synthesize/_destroy).

State is an explicit pytree (state-in/state-out), so streams are trivially
batched, checkpointable, and shardable across a device mesh.

Usage:
    voc = Synthesizer(cfg)                  # random-init or pass params
    state = voc.reset(batch=256)
    state, pcm = voc.synthesize(state, features)   # (B, T, 36) -> (B, T*160)
"""
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .constants import NB_TOTAL_FEATURES
from .kernels import sample_scan
from .models import lpcnet


class Synthesizer:
    def __init__(self, cfg: Optional[lpcnet.LPCNetConfig] = None,
                 params: Optional[Dict[str, Any]] = None,
                 rng: Optional[jax.Array] = None,
                 backend: str = "auto",
                 dotprod_su: bool = False):
        """backend: 'pallas' (fused VMEM-resident kernel, TPU only),
        'scan' (portable lax.scan), 'dotprod' (the reference's deployed
        int8 DOT_PROD arithmetic emulated exactly — kernels/sample_dotprod,
        vec.h:200-340 semantics; dotprod_su selects the unsigned+SU-bias
        AVX/NEON flavor over the signed portable one), or 'auto' (pallas
        on TPU)."""
        self.cfg = cfg or lpcnet.LPCNetConfig()
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = lpcnet.init_params(rng, self.cfg)
        self.params = params
        self.tables = lpcnet.precompute_sample_tables(params, self.cfg)
        if backend == "auto":
            backend = ("pallas"
                       if jax.devices()[0].platform in ("tpu", "axon")
                       else "scan")
        self.backend = backend
        if backend == "dotprod":
            from .kernels import sample_dotprod
            self.qtables = sample_dotprod.quantize_tables(
                self.tables, self.cfg, su_bias=dotprod_su)
        # pallas kernel knobs (sample_pallas module docstring documents the
        # measured tradeoffs): LPCNET_KERNEL_VARIANT=base|fuse|opt|flat,
        # LPCNET_KERNEL_TABLES=f32|bf16 (bf16 embedding tables: 4x MXU rate
        # for the one-hot gathers). All variants are bit-identical except
        # bf16 tables (reduced-precision embeddings). Default "flat"
        # (matmul-scored sampling tree): measured +2-4% over the walked
        # tree on v5e (PERF.md kernel-variant table).
        import os
        self.kernel_variant = os.environ.get("LPCNET_KERNEL_VARIANT",
                                             "flat")
        self.table_dtype = (jnp.bfloat16
                            if os.environ.get("LPCNET_KERNEL_TABLES")
                            == "bf16" else jnp.float32)
        # LPCNET_PALLAS_INTERPRET=1: run the kernel in pallas interpret
        # mode so the exact CLI pallas path can be driven on CPU (debug)
        self.pallas_interpret = (os.environ.get("LPCNET_PALLAS_INTERPRET")
                                 == "1")
        self._synth = jax.jit(self._synth_impl)
        self._synth_teacher = jax.jit(self._synth_teacher_impl)

    def reset(self, batch: int, per_stream_rng: bool = False):
        """Fresh per-stream state (lpcnet_reset, lpcnet.c:174-182)."""
        from .ops import kiss99
        seeds = kiss99.batched_seed(batch, per_stream=per_stream_rng)
        return sample_scan.init_state(batch, self.cfg, seeds)

    def conditions(self, features: jax.Array) -> Dict[str, jax.Array]:
        return lpcnet.frame_conditions(self.params, features, self.cfg,
                                       self.tables)

    def _synth_impl(self, state, features):
        conds = lpcnet.frame_conditions(self.params, features, self.cfg,
                                        self.tables)
        if self.backend == "pallas":
            from .kernels import sample_pallas
            return sample_pallas.synthesize_frames_pallas(
                self.tables, state, conds, self.cfg,
                table_dtype=self.table_dtype, variant=self.kernel_variant,
                interpret=self.pallas_interpret)
        if self.backend == "dotprod":
            from .kernels import sample_dotprod
            return sample_dotprod.synthesize_frames_dotprod(
                self.tables, self.qtables, state, conds, self.cfg)
        return sample_scan.synthesize_frames(self.tables, state, conds,
                                             self.cfg)

    def _synth_teacher_impl(self, state, features, target, preload):
        conds = lpcnet.frame_conditions(self.params, features, self.cfg,
                                        self.tables)
        return sample_scan.synthesize_frames(self.tables, state, conds,
                                             self.cfg, target=target,
                                             preload=preload)

    def synthesize(self, state, features: jax.Array
                   ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        """features: (B, T, 20..36) -> (new_state, pcm (B, T*160) float32
        of rounded int16-range samples)."""
        return self._synth(state, features)

    def synthesize_temperature(self, state, features: jax.Array):
        """Temperature/PDF-floor sampling (training_tf2/test_lpcnet.py:
        131-138): voiced frames are sharpened with p *= p^max(0,
        1.5*corr_feat - 0.5) and the pdf tail below 0.002 is cut — less
        noisy voiced segments at the price of leaving the C-bit-exact
        sampling path. scan backend only."""
        if not hasattr(self, "_synth_temp"):
            def impl(state, features):
                conds = lpcnet.frame_conditions(self.params, features,
                                                self.cfg, self.tables)
                texp = jnp.maximum(0.0, 1.5 * features[..., 19] - 0.5)
                return sample_scan.synthesize_frames(
                    self.tables, state, conds, self.cfg, temp_exp=texp)
            self._synth_temp = jax.jit(impl)
        return self._synth_temp(state, features)

    def synthesize_teacher(self, state, features, target, preload):
        """Teacher-forced synthesis (the C 'preload' mode, lpcnet.c:256-261):
        per frame, samples [0, preload[b,t]) follow `target` instead of the
        sampled excitation — used by PLC resync and decoder priming."""
        return self._synth_teacher(state, features, target, preload)

    # ------------------------------------------------ reference-exact mode
    def reset_streaming(self, batch: int, per_stream_rng: bool = False):
        """State for synthesize_streaming: sample state + the causal
        frame-net delay lines (conv ring buffers, FEATURES_DELAY LPC)."""
        return {"synth": self.reset(batch, per_stream_rng),
                "fnet": lpcnet.frame_net_init_state(batch, self.cfg)}

    def synthesize_streaming(self, state, features: jax.Array):
        """Sample-exact twin of the C engine (lpcnet_synthesize,
        lpcnet.c:279-281): causal convs with warm-up zeroing, FEATURES_DELAY
        LPC pipelining, and the first FEATURES_DELAY frames emitted as
        silence WITHOUT advancing the sample network or RNG
        (lpcnet_synthesize_tail_impl, lpcnet.c:239-243). Matches the
        reference waveform under matched weights + RNG up to float-rounding
        bit flips (see tests/test_ref_parity.py). The batched
        `synthesize` path is faster but uses same-padded convs, whose
        conditioning alignment differs from the C's causal delay line."""
        if not hasattr(self, "_synth_streaming"):
            self._synth_streaming = jax.jit(self._synth_streaming_impl)
        return self._synth_streaming(state, features)

    def _synth_streaming_impl(self, state, features):
        cfg = self.cfg
        if self.backend == "dotprod":
            from .kernels import sample_dotprod

            def synth_samples(tables, st, cond, cfg2, n):
                return sample_dotprod.synth_samples_dotprod(
                    tables, self.qtables, st, cond, cfg2, n)
        else:
            from .kernels.sample_scan import synth_samples

        def body(carry, feat):
            fstate, synth = carry
            fstate, cond = lpcnet.frame_net_step(self.params, self.tables,
                                                 fstate, feat, cfg)
            cond = {k: v for k, v in cond.items() if k != "cfeat"}
            new_synth, out = synth_samples(self.tables, synth, cond, cfg,
                                           cfg.frame_size)
            warm = fstate["frame_count"] > cfg.lookahead     # (B,)
            synth = jax.tree.map(
                lambda a, b: jnp.where(
                    warm.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
                new_synth, synth)
            out = jnp.where(warm[:, None], out, 0.0)
            return (fstate, synth), out

        (fnet, synth), pcm = jax.lax.scan(
            body, (state["fnet"], state["synth"]),
            features.transpose(1, 0, 2))
        B, T = features.shape[:2]
        return ({"synth": synth, "fnet": fnet},
                pcm.transpose(1, 0, 2).reshape(B, T * cfg.frame_size))
