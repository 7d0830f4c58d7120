"""Packet-loss concealment engine (reference src/lpcnet_plc.c, causal mode).

Batched, masked re-design: every 10-ms step processes B independent streams,
each with its own loss flag; all three control paths (good frame, first good
frame after loss = "blend", lost frame) are computed batched and selected
per stream with masks. This replaces the reference's per-stream branchy C
(lpcnet_plc_update_causal :188-290, lpcnet_plc_conceal_causal :293-337)
with ONE fused synthesis launch + ONE feature pass per frame: lost rows
free-run, good rows teacher-force the whole frame, blend rows free-run the
first half and force the second — a per-row forcing window inside one
kernel (kernels/sample_pallas.py force_from). The feature pass is
pipelined one frame late (the extractor state advances on the PREVIOUS
output while computing the CURRENT input's features), so the good-path
features exist before the launch; for good streams output == input, so
the features are identical to the unpipelined form.

Deliberate divergences of PLCEngine from the C (documented):
  * We run teacher-forced state updates on every good frame — the
    reference's `#else` branch (lpcnet_plc.c:273-279). The C default
    (PLC_SKIP_UPDATES) skips them to save CPU; batched TPU synthesis makes
    them free and they strictly improve concealment start state.
  * A lost frame synthesizes all 160 samples from the newly predicted
    features; the C synthesizes the first 80 from the previous frame's
    conditions (lpcnet_plc.c:315-320). Blend cross-fade hides both.
  * On a blend frame the sample state advances free-running over the
    first 80 samples (the continuation that feeds the cross-fade) and
    teacher-forced on the input thereafter; the former two-pass design
    re-forced the faded audio from frame start. (Round-4 fusion; lost and
    good rows advance bit-identically to the two-pass design.)
  * KISS99 draws advance on masked-off paths (a batched-execution artifact);
    per-stream outputs remain deterministic functions of inputs.

StrictCausalPLCEngine below removes these divergences: it is a
bit-exact-class replica of the C's default causal engine (concealed and
blend frames match the compiled reference within +-1 rounding flips — see
tests/test_ref_parity.py::TestStrictPLCEngineParity).

Perf (v5e, B=1024): round 2 613x -> round 3 1050x (gather elimination in
the feature pass; AR-free teacher_advance for resync) -> round 4
**1548x** (6.6 ms/step): the two synthesis passes (free-run ~4.1 ms +
teacher_advance ~2.8 ms of the 9.8 ms round-3 step) fused into ONE
force_from kernel launch (~3.8 ms), the feature pass pipelined into one
2-frame call, the two PLC-net steps stacked into one 2B-row call, and
the remaining op-dispatch tail cut (Burg/Levinson recursions rewritten
from `.at[]` scatter + prefix-reverse chains to full-width masked
fusions; FEC queue reads as one-hot reduces). Scan backend: 139x.
Micro-timings of standalone pieces are unreliable under the async
transport — trust whole-run ablations and jax.profiler traces
(PERF.md section 6).

Feature queue for FEC (forward error correction via DRED) follows
lpcnet_plc_fec_add / get_fec_or_pred / fec_rewind (lpcnet_plc.c:111-173).
"""
import dataclasses
import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import features as F
from .constants import (FRAME_SIZE, LPC_ORDER, NB_BANDS, NB_FEATURES,
                        NB_TOTAL_FEATURES, PLC_MAX_FEC, TRAINING_OFFSET)
from .kernels import sample_scan
from .models import lpcnet as lpcnet_model
from .models import plc as plc_model
from .ops import burg as burg_ops

# energy attenuation after repeated losses (lpcnet_plc.c:292)
ATT_TABLE = np.array([0, 0, -.2, -.2, -.4, -.4, -.8, -.8, -1.6, -1.6],
                     dtype=np.float32)
DC_CONST = 0.003


@dataclasses.dataclass(frozen=True)
class PLCOptions:
    remove_dc: bool = False
    use_fec: bool = True


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        return ("pallas" if jax.devices()[0].platform in ("tpu", "axon")
                else "scan")
    return backend


class PLCEngine:
    def __init__(self, lpcnet_params, plc_params,
                 cfg: Optional[lpcnet_model.LPCNetConfig] = None,
                 plc_cfg: Optional[plc_model.PLCConfig] = None,
                 options: PLCOptions = PLCOptions(),
                 backend: str = "auto"):
        """backend: 'pallas' (fused VMEM kernel for the per-frame synthesis
        passes — ~7x faster PLC steps on TPU), 'scan' (portable), or
        'auto'. Outputs agree within the usual +-1 rounding-flip class."""
        self.cfg = cfg or lpcnet_model.LPCNetConfig()
        self.plc_cfg = plc_cfg or plc_model.PLCConfig()
        self.params = lpcnet_params
        self.plc_params = plc_params
        self.tables = lpcnet_model.precompute_sample_tables(lpcnet_params,
                                                            self.cfg)
        self.options = options
        self.backend = _resolve_backend(backend)
        self._step = jax.jit(self._step_impl)

    def _sel_mask(self, mask, a, b):
        pick = lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y)
        return jax.tree.map(pick, a, b)

    def _synth_samples(self, synth_state, cond, nsamples, target=None,
                       preload=None, n_active=None, force_from=None):
        """Backend-dispatched sample synthesis under one condition set.
        FULLY teacher-forced calls (target given, no partial preload /
        n_active / force_from) take the AR-free fast path: the forced
        output IS the target, so sample_scan.teacher_advance batches the
        mu-law/embedding math over all samples and only runs the GRU
        recurrences sequentially — a large cut of the PLC step's
        serialized cost. force_from: (B,) int32 — samples >= force_from
        are teacher-forced too (the fused PLC step's per-row mode
        select: lost rows free-run, good rows force the whole frame,
        blend rows force only the second half)."""
        cond = {k: cond[k] for k in ("cond_a", "cond_b", "lpc")}
        if (target is not None and preload is None and n_active is None
                and force_from is None and target.shape[1] == nsamples):
            if self.backend == "pallas":
                from .kernels import sample_pallas
                return sample_pallas.teacher_advance_pallas(
                    self.tables, synth_state, cond, self.cfg, target)
            return sample_scan.teacher_advance(
                self.tables, synth_state, cond, self.cfg, target)
        if self.backend == "pallas":
            from .kernels import sample_pallas
            # the flat (matmul-scored) sampling tree is the default in the
            # partially-forced passes too (bit-identical; fuse/opt only
            # exist for the frame kernel, so anything else maps to base)
            variant = ("flat" if os.environ.get("LPCNET_KERNEL_VARIANT",
                                                "flat") == "flat"
                       else "base")
            return sample_pallas.synth_samples_pallas(
                self.tables, synth_state, cond, self.cfg, nsamples,
                target=target, preload=preload, n_active=n_active,
                force_from=force_from, variant=variant)
        return sample_scan.synth_samples(
            self.tables, synth_state, cond, self.cfg, nsamples,
            target=target, preload=preload, n_active=n_active,
            force_from=force_from)

    def init_state(self, batch: int) -> Dict[str, Any]:
        return {
            "synth": sample_scan.init_state(batch, self.cfg),
            "fnet": lpcnet_model.frame_net_init_state(batch, self.cfg),
            "enc": F.init_state(batch),
            "plc_net": plc_model.init_net_state(batch, self.plc_cfg),
            "plc_copies": jax.tree.map(
                lambda x: jnp.repeat(x[:, None], self.cfg.lookahead + 1, 1),
                plc_model.init_net_state(batch, self.plc_cfg)),
            "loss_count": jnp.zeros((batch,), jnp.int32),
            "blend": jnp.zeros((batch,), bool),
            "fec": jnp.zeros((batch, PLC_MAX_FEC, NB_FEATURES), jnp.float32),
            "fec_fill": jnp.zeros((batch,), jnp.int32),
            "fec_read": jnp.zeros((batch,), jnp.int32),
            "fec_keep": jnp.zeros((batch,), jnp.int32),
            "fec_skip": jnp.zeros((batch,), jnp.int32),
            "dc_mem": jnp.zeros((batch,), jnp.float32),
            "syn_dc": jnp.zeros((batch,), jnp.float32),
            # previous frame's output audio: the enc feature-extractor
            # state is advanced on it one step late (see _step_impl) so
            # that the good-path features are available BEFORE the single
            # fused synthesis launch
            "prev_out": jnp.zeros((batch, FRAME_SIZE), jnp.float32),
        }

    def fec_add(self, state, feats, mask=None):
        """Queue FEC features (lpcnet_plc_fec_add, lpcnet_plc.c:111-132).
        feats: (B, 20); mask: (B,) bool selects streams that receive data."""
        B = feats.shape[0]
        if mask is None:
            mask = jnp.ones((B,), bool)
        fill = state["fec_fill"]
        # compaction when full: shift window [keep, fill) to the origin
        full = fill >= PLC_MAX_FEC
        shift = jnp.where(full, state["fec_keep"], 0)
        idx = (jnp.arange(PLC_MAX_FEC)[None, :] + shift[:, None]) \
            % PLC_MAX_FEC
        fec = jnp.take_along_axis(state["fec"],
                                  idx[..., None].repeat(NB_FEATURES, -1),
                                  axis=1)
        fill = fill - shift
        read = state["fec_read"] - shift
        keep = state["fec_keep"] - shift
        wpos = jnp.clip(fill, 0, PLC_MAX_FEC - 1)
        onehot = (jnp.arange(PLC_MAX_FEC)[None, :] == wpos[:, None])
        upd = onehot[..., None] & mask[:, None, None]
        fec = jnp.where(upd, feats[:, None, :], fec)
        new = dict(state)
        new.update(fec=fec,
                   fec_fill=jnp.where(mask, jnp.minimum(fill + 1,
                                                        PLC_MAX_FEC), fill),
                   fec_read=read, fec_keep=jnp.maximum(keep, 0))
        return new

    def fec_clear(self, state):
        z = jnp.zeros_like(state["fec_fill"])
        return {**state, "fec_fill": z, "fec_read": z, "fec_keep": z,
                "fec_skip": z}

    def step(self, state, pcm, lost):
        """Process one 10-ms frame per stream.

        pcm: (B, 160) float (ignored where lost); lost: (B,) bool.
        Returns (new_state, output pcm (B, 160))."""
        return self._step(state, pcm, lost)

    def run(self, state, pcm, lost):
        """Process T frames in ONE jitted call (a lax.scan over step):
        pcm (B, T*160), lost (B, T) bool -> (state, (B, T*160)).
        Identical to T step() calls but without T host dispatches — the
        throughput path for batch concealment (bench measures ~8x over
        per-frame stepping at batch 128)."""
        if not hasattr(self, "_run"):
            self._run = jax.jit(self._run_impl)
        return self._run(state, pcm, lost)

    def _run_impl(self, state, pcm, lost):
        B = pcm.shape[0]
        T = lost.shape[1]
        frames = pcm.reshape(B, T, FRAME_SIZE).transpose(1, 0, 2)

        def body(st, x):
            fr, lo = x
            st, out = self._step_impl(st, fr, lo)
            return st, out

        state, outs = jax.lax.scan(body, state, (frames, lost.T))
        return state, outs.transpose(1, 0, 2).reshape(B, T * FRAME_SIZE)

    # ------------------------------------------------------------------
    def _step_impl(self, state, pcm, lost):
        B = pcm.shape[0]
        cfg = self.cfg

        # --- optional DC removal on the incoming audio (lpcnet_plc.c:195-204)
        if self.options.remove_dc:
            dc_mem = state["dc_mem"] + state["syn_dc"]
            def dc_scan(m, x):
                lp = jnp.floor(0.5 + m)
                m = m + DC_CONST * (x - m)
                return m, lp
            dc_mem2, lp = jax.lax.scan(dc_scan, dc_mem, pcm.T)
            lp = lp.T
            pcm_proc = jnp.where(lost[:, None], pcm, pcm - lp)
            dc_mem = jnp.where(lost, state["dc_mem"], dc_mem2)
            syn_dc = jnp.where(lost, state["syn_dc"], 0.0)
        else:
            pcm_proc = pcm
            lp = jnp.zeros_like(pcm)
            dc_mem = state["dc_mem"]
            syn_dc = state["syn_dc"]

        # --- burg features of incoming audio (valid on good frames)
        burg36 = burg_ops.burg_cepstral_analysis(pcm_proc)

        # --- PIPELINED enc feature pass: advance the extractor on the
        # PREVIOUS frame's output (good streams' output was their input,
        # lost/blend streams' their synthesized/blended audio — same
        # history the C extractor sees, one step late), then compute this
        # frame's input features. For good streams output == input, so
        # featg is exactly the features the good path needs — and it is
        # available BEFORE synthesis, which lets the step run ONE fused
        # kernel launch instead of a free-run pass + a resync pass.
        # ONE 2-frame analysis call: frame 1 = previous output (advances
        # the kept state), frame 2 = current input (features only); the
        # kept state is the mid state after frame 1.
        _, featsg, _, enc_mid = F.compute_features(
            state["enc"],
            jnp.concatenate([state["prev_out"], pcm_proc], axis=-1),
            mode="single", return_mid=True)
        featg = featsg[:, 1, :NB_FEATURES]

        # --- FEC availability (get_fec_or_pred, lpcnet_plc.c:147-166).
        # The queue read is a one-hot reduce, not take_along_axis: TPU
        # lowers element gathers to the scalar core (~36 us/frame here)
        has_fec = ((state["fec_read"] < state["fec_fill"])
                   & (state["fec_skip"] == 0) & lost)
        rd1 = (jnp.arange(PLC_MAX_FEC)[None, :]
               == jnp.clip(state["fec_read"], 0,
                           PLC_MAX_FEC - 1)[:, None])
        fec_feat = jnp.sum(
            jnp.where(rd1[..., None], state["fec"], 0.0), axis=1)

        # --- ONE stacked PLC-net step for both the lost/blend input and
        # the good-path input (compute_plc_pred is GRU-latency-bound at
        # these widths; 2B rows cost the same as B)
        zeros36 = jnp.zeros((B, 2 * NB_BANDS), jnp.float32)
        zeros20 = jnp.zeros((B, NB_FEATURES), jnp.float32)
        one = jnp.ones((B, 1), jnp.float32)
        in_blend = jnp.concatenate([burg36, zeros20, one], axis=-1)
        in_lost = jnp.concatenate([zeros36, zeros20, 0 * one], axis=-1)
        in_fec = jnp.concatenate([zeros36, fec_feat, -one], axis=-1)
        blend = state["blend"] & ~lost
        x_lb = jnp.where(lost[:, None],
                         jnp.where(has_fec[:, None], in_fec, in_lost),
                         in_blend)
        in_good = jnp.concatenate([burg36, featg, one], axis=-1)

        # restore plc state from the copy on blend (lpcnet_plc.c:217)
        copies = state["plc_copies"]
        plc_net_in = jax.tree.map(
            lambda cur, cp: jnp.where(blend[:, None], cp[:, -1], cur),
            state["plc_net"], copies)
        # push a copy before prediction on lost frames (lpcnet_plc.c:305-314)
        new_copies = jax.tree.map(
            lambda cp, cur: jnp.where(
                lost[:, None, None],
                jnp.concatenate([cur[:, None], cp[:, :-1]], axis=1), cp),
            copies, plc_net_in)

        st2 = jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0),
                           plc_net_in, state["plc_net"])
        plc2, pred2 = plc_model.step(
            self.plc_params, st2, jnp.concatenate([x_lb, in_good], axis=0),
            self.plc_cfg)
        plc_lb = jax.tree.map(lambda x: x[:B], plc2)
        plc_g = jax.tree.map(lambda x: x[B:], plc2)
        pred = pred2[:B]

        # concealment features: FEC frame or prediction, with c0 attenuation
        # (lpcnet_plc.c:316-319)
        lc = state["loss_count"]
        att = jnp.where(
            lc >= 10,
            ATT_TABLE[9] - 2.0 * (lc - 9).astype(jnp.float32),
            jnp.asarray(ATT_TABLE)[jnp.clip(lc, 0, 9)])
        feat_lost = jnp.where(has_fec[:, None], fec_feat, pred)
        feat_lost = feat_lost.at[:, 0].set(
            jnp.maximum(-10.0, feat_lost[:, 0] + att))

        # --- ONE fused synthesis launch for all three paths, selected
        # per row by the conditioning features and the forcing window:
        #   lost  rows free-run from the concealment features,
        #   good  rows teacher-force the whole frame on their input,
        #   blend rows free-run the first half (the continuation used by
        #         the cross-fade) and force the second half on the input.
        # Lost and good rows advance bit-identically to the former
        # two-pass design (same state, same conditions, same targets);
        # blend rows' first 80 samples now advance free-running instead of
        # teacher-forced on the faded audio — a documented divergence of
        # this (already non-strict) engine; the cross-fade output is
        # unchanged in form.
        feats20 = jnp.where(lost[:, None], feat_lost,
                            jnp.where(blend[:, None], pred, featg))
        feats = jnp.zeros((B, NB_TOTAL_FEATURES), jnp.float32)
        feats = feats.at[:, :NB_FEATURES].set(feats20)
        new_fnet, cond = lpcnet_model.frame_net_step(
            self.params, self.tables, state["fnet"], feats, cfg)
        force_from = jnp.where(
            lost, cfg.frame_size,
            jnp.where(blend, TRAINING_OFFSET, 0)).astype(jnp.int32)
        new_synth, synth_out = self._synth_samples(
            state["synth"], cond, cfg.frame_size, target=pcm_proc,
            force_from=force_from)
        # first FEATURES_DELAY frames are silence (lpcnet.c:239-243)
        warm = (new_fnet["frame_count"] > cfg.lookahead)
        synth_out = jnp.where(warm[:, None], synth_out, 0.0)

        # blend cross-fade over the first half frame (lpcnet_plc.c:225-229)
        i = jnp.arange(TRAINING_OFFSET, dtype=jnp.float32)
        w = 0.5 - 0.5 * jnp.cos(np.pi * i / TRAINING_OFFSET)
        fade = w[None, :] * pcm_proc[:, :TRAINING_OFFSET] \
            + (1 - w)[None, :] * synth_out[:, :TRAINING_OFFSET]
        blended = jnp.concatenate([fade, pcm_proc[:, TRAINING_OFFSET:]],
                                  axis=-1)
        output = jnp.where(lost[:, None], synth_out,
                           jnp.where(blend[:, None], blended, pcm_proc))

        lb = lost | blend
        plc_net_out = self._sel_mask(lb, plc_lb, plc_g)

        # --- FEC bookkeeping
        fec_read = state["fec_read"]
        fec_skip = state["fec_skip"]
        # lost+fec consumes one frame; good frame discards one (lpcnet_plc.c
        # :259-262); blend rewinds FEATURES_DELAY (lpcnet_plc.c:234)
        consume = has_fec | (~lost & ~blend
                             & (fec_read < state["fec_fill"])
                             & (fec_skip == 0))
        dec_skip = ~lost & ~blend & (fec_skip > 0)
        fec_read = jnp.where(consume, fec_read + 1, fec_read)
        fec_skip = jnp.where(dec_skip, fec_skip - 1, fec_skip)
        fec_keep = jnp.maximum(
            state["fec_keep"],
            jnp.maximum(0, fec_read - cfg.lookahead - 1))
        fec_read = jnp.where(
            blend, jnp.maximum(fec_keep, fec_read - cfg.lookahead), fec_read)

        # the extractor advances on the DC-REMOVED output next step (the
        # former in-step feature pass also ran before the DC re-add below)
        prev_out = output

        # --- DC on concealed output (lpcnet_plc.c:330-335)
        if self.options.remove_dc:
            def sdc_scan(m, xx):
                m = m + DC_CONST * (xx - m)
                return m, m
            sdc2, _ = jax.lax.scan(sdc_scan, syn_dc, output.T)
            syn_dc = jnp.where(lost, sdc2, syn_dc)
            dc_add = jnp.floor(0.5 + dc_mem)
            output = jnp.where(lost[:, None], output + dc_add[:, None],
                               output + lp)

        new_state = dict(state)
        new_state.update(
            synth=new_synth, fnet=new_fnet, enc=enc_mid, prev_out=prev_out,
            plc_net=plc_net_out, plc_copies=new_copies,
            loss_count=jnp.where(lost,
                                 jnp.where(has_fec, 0, lc + 1), 0),
            blend=lost, fec_read=fec_read, fec_skip=fec_skip,
            fec_keep=fec_keep, dc_mem=dc_mem, syn_dc=syn_dc)
        return new_state, output


class StrictCausalPLCEngine:
    """Bit-exact-class replica of the reference causal PLC engine under its
    DEFAULT build flags (PLC_SKIP_UPDATES defined, blending enabled —
    lpcnet_plc.c:40, :64-66), unlike PLCEngine which deliberately
    teacher-forces every good frame (documented at the top of this file).

    Reference semantics reproduced here:
      * good frames only queue features into a 4-deep deferred buffer
        (run_frame_network_deferred, lpcnet.c:123-135); the sample-rate
        state stays frozen behind a PLC_BUF_SIZE (= FEATURES_DELAY*160+80
        = 400) sample delay buffer (lpcnet_private.h:77,92-94)
      * conceal first flushes the deferred features (lpcnet.c:137-145),
        teacher-forces the buffered samples in <=160-sample chunks
        (lpcnet_plc.c:298-312), then synthesizes 80 samples with the OLD
        conditions and 80 with the newly predicted features — the
        80-sample split conceal (lpcnet_plc.c:315-320)
      * the first good frame after a loss cross-fades a free-run
        continuation into the input over 80 samples, restores the
        snapshot, and teacher-forces the blended audio
        (lpcnet_plc.c:215-231)

    Batched over streams with per-stream masks; every path is computed for
    every stream and selected. remove_dc is not supported in strict mode
    (use PLCEngine(options=PLCOptions(remove_dc=True)) or the reference
    build); FEC queueing works via the inherited fec_add/fec_clear.
    """
    MAX_FEAT_BUF = 4      # conv1.ksize + conv2.ksize - 2 (lpcnet.c:124)

    def __init__(self, lpcnet_params, plc_params,
                 cfg: Optional[lpcnet_model.LPCNetConfig] = None,
                 plc_cfg: Optional[plc_model.PLCConfig] = None,
                 options: PLCOptions = PLCOptions(),
                 backend: str = "auto"):
        assert not options.remove_dc, \
            "strict mode does not implement the DC filter"
        self.cfg = cfg or lpcnet_model.LPCNetConfig()
        self.plc_cfg = plc_cfg or plc_model.PLCConfig()
        self.params = lpcnet_params
        self.plc_params = plc_params
        self.tables = lpcnet_model.precompute_sample_tables(lpcnet_params,
                                                            self.cfg)
        self.options = options
        self.backend = _resolve_backend(backend)
        self.buf_size = self.cfg.lookahead * FRAME_SIZE + TRAINING_OFFSET
        self._step = jax.jit(self._step_impl)

    # FEC queue bookkeeping, step/run, and backend dispatch are shared
    fec_add = PLCEngine.fec_add
    fec_clear = PLCEngine.fec_clear
    step = PLCEngine.step
    run = PLCEngine.run
    _run_impl = PLCEngine._run_impl
    _synth_samples = PLCEngine._synth_samples

    def init_state(self, batch: int) -> Dict[str, Any]:
        cfg = self.cfg
        na3 = 3 * cfg.gru_a_units
        nb3 = 3 * cfg.gru_b_units
        return {
            "synth": sample_scan.init_state(batch, cfg),
            "fnet": lpcnet_model.frame_net_init_state(batch, cfg),
            "enc": F.init_state(batch),
            "plc_net": plc_model.init_net_state(batch, self.plc_cfg),
            "plc_copies": jax.tree.map(
                lambda x: jnp.repeat(x[:, None], cfg.lookahead + 1, 1),
                plc_model.init_net_state(batch, self.plc_cfg)),
            # conditions left by the last run_frame_network (zeros after
            # reset, like the calloc'd LPCNetState)
            "last_cond": {
                "cond_a": jnp.zeros((batch, na3), jnp.float32),
                "cond_b": jnp.zeros((batch, nb3), jnp.float32),
                "lpc": jnp.zeros((batch, LPC_ORDER), jnp.float32)},
            "feat_buf": jnp.zeros((batch, self.MAX_FEAT_BUF, NB_FEATURES),
                                  jnp.float32),
            "feat_fill": jnp.zeros((batch,), jnp.int32),
            "pcm_buf": jnp.zeros((batch, self.buf_size + FRAME_SIZE),
                                 jnp.float32),
            "pcm_fill": jnp.full((batch,), self.buf_size, jnp.int32),
            "skip_analysis": jnp.zeros((batch,), jnp.int32),
            "blend": jnp.zeros((batch,), bool),
            "features": jnp.zeros((batch, NB_FEATURES), jnp.float32),
            "loss_count": jnp.zeros((batch,), jnp.int32),
            "fec": jnp.zeros((batch, PLC_MAX_FEC, NB_FEATURES), jnp.float32),
            "fec_fill": jnp.zeros((batch,), jnp.int32),
            "fec_read": jnp.zeros((batch,), jnp.int32),
            "fec_keep": jnp.zeros((batch,), jnp.int32),
            "fec_skip": jnp.zeros((batch,), jnp.int32),
        }

    # ------------------------------------------------------------------
    def _sel(self, mask, a, b):
        pick = lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y)
        return jax.tree.map(pick, a, b)

    def _fnet_masked(self, fstate, last_cond, feats20, mask):
        """run_frame_network for masked streams; inactive streams keep
        state and conditions."""
        feats = jnp.zeros((feats20.shape[0], NB_TOTAL_FEATURES),
                          jnp.float32).at[:, :NB_FEATURES].set(feats20)
        nf, cond = lpcnet_model.frame_net_step(
            self.params, self.tables, fstate, feats, self.cfg)
        cond = {k: cond[k] for k in ("cond_a", "cond_b", "lpc")}
        return (self._sel(mask, nf, fstate),
                self._sel(mask, cond, last_cond))

    def _push_copy(self, copies, cur, mask):
        shifted = jax.tree.map(
            lambda cp, c: jnp.concatenate([c[:, None], cp[:, :-1]], axis=1),
            copies, cur)
        return self._sel(mask, shifted, copies)

    def _feat_push(self, buf, fill, feats20, mask):
        """run_frame_network_deferred (lpcnet.c:123-135): append, dropping
        the oldest entry when the 4-deep buffer is full."""
        full = fill >= self.MAX_FEAT_BUF
        shifted = jnp.where(full[:, None, None],
                            jnp.concatenate([buf[:, 1:], buf[:, -1:]], 1),
                            buf)
        new_fill = jnp.where(full, fill, fill + 1)
        pos = new_fill - 1
        onehot = jnp.arange(self.MAX_FEAT_BUF)[None, :] == pos[:, None]
        written = jnp.where((onehot & mask[:, None])[..., None],
                            feats20[:, None, :], shifted)
        return (jnp.where(mask[:, None, None], written, buf),
                jnp.where(mask, new_fill, fill))

    def _get_fec_or_pred(self, plc, st, active, out_prev):
        """get_fec_or_pred (lpcnet_plc.c:147-166), batched: FEC frame if
        queued, else DNN prediction; the PLC net is updated either way."""
        B = out_prev.shape[0]
        has_fec = (st["fec_read"] < st["fec_fill"]) & (st["fec_skip"] == 0)
        fec_feat = jnp.take_along_axis(
            st["fec"], jnp.clip(st["fec_read"], 0, PLC_MAX_FEC - 1)
            [:, None, None].repeat(NB_FEATURES, -1), axis=1)[:, 0]
        zeros36 = jnp.zeros((B, 2 * NB_BANDS), jnp.float32)
        in_fec = jnp.concatenate(
            [zeros36, fec_feat, -jnp.ones((B, 1))], axis=-1)
        in_lost = jnp.zeros((B, 2 * NB_BANDS + NB_FEATURES + 1), jnp.float32)
        x = jnp.where(has_fec[:, None], in_fec, in_lost)
        new_plc, pred = plc_model.step(self.plc_params, plc, x, self.plc_cfg)
        out = jnp.where(active[:, None],
                        jnp.where(has_fec[:, None], fec_feat, pred),
                        out_prev)
        plc = self._sel(active, new_plc, plc)
        take = active & has_fec
        read = jnp.where(take, st["fec_read"] + 1, st["fec_read"])
        keep = jnp.where(take, jnp.maximum(
            0, jnp.maximum(st["fec_keep"], read - self.cfg.lookahead - 1)),
            st["fec_keep"])
        skip = jnp.where(active & ~has_fec & (st["fec_skip"] > 0),
                         st["fec_skip"] - 1, st["fec_skip"])
        fec_new = dict(st, fec_read=read, fec_keep=keep, fec_skip=skip)
        return out, plc, fec_new, take

    # ------------------------------------------------------------------
    def _step_impl(self, state, pcm, lost):
        B = pcm.shape[0]
        cfg = self.cfg
        off = TRAINING_OFFSET
        FS = FRAME_SIZE
        burg36 = burg_ops.burg_cepstral_analysis(pcm)
        zeros20 = jnp.zeros((B, NB_FEATURES), jnp.float32)
        one = jnp.ones((B, 1), jnp.float32)

        # =========== CONCEAL path (applied where lost) ===========
        # 1. flush the deferred feature buffer (run_frame_network_flush)
        fnetC, condC = state["fnet"], state["last_cond"]
        for j in range(self.MAX_FEAT_BUF):
            m = (j < state["feat_fill"]) & lost
            fnetC, condC = self._fnet_masked(fnetC, condC,
                                             state["feat_buf"][:, j], m)
        # 2. teacher-forced catch-up over the delay buffer
        #    (lpcnet_plc.c:298-312)
        synthC = state["synth"]
        plcC, copiesC = state["plc_net"], state["plc_copies"]
        fecC = {k: state[k] for k in
                ("fec", "fec_fill", "fec_read", "fec_keep", "fec_skip")}
        bufC, fillC = state["pcm_buf"], state["pcm_fill"]
        skipC = state["skip_analysis"]
        featuresC = state["features"]
        n_catchup = (self.buf_size + FS + FS - 1) // FS
        for _ in range(n_catchup):
            act = (fillC > 0) & lost
            upd = jnp.clip(fillC, 0, FS)
            copiesC = self._push_copy(copiesC, plcC, act)
            featuresC, plcC, fecC, _ = self._get_fec_or_pred(
                plcC, fecC, act, featuresC)
            fnetC, condC = self._fnet_masked(fnetC, condC, featuresC, act)
            synthC, _ = self._synth_samples(synthC, condC, FS,
                target=bufC[:, :FS], preload=upd,
                n_active=jnp.where(act, upd, 0))
            shifted = jnp.concatenate(
                [bufC[:, FS:], jnp.zeros((B, FS))], axis=-1)
            bufC = jnp.where(act[:, None], shifted, bufC)
            fillC = jnp.where(act, fillC - upd, fillC)
            skipC = skipC + act.astype(jnp.int32)
        # 3. 80 samples with the OLD conditions, 80 with the new prediction
        #    (the 80-sample split conceal, lpcnet_plc.c:313-320)
        copiesC = self._push_copy(copiesC, plcC, lost)
        synthC, out_head = self._synth_samples(synthC, condC, FS - off,
            n_active=jnp.where(lost, FS - off, 0))
        featuresC, plcC, fecC, got_fec = self._get_fec_or_pred(
            plcC, fecC, lost, featuresC)
        lcC = jnp.where(got_fec, 0, state["loss_count"] + 1)
        att = jnp.where(
            lcC >= 10,
            ATT_TABLE[9] - 2.0 * (lcC - 9).astype(jnp.float32),
            jnp.asarray(ATT_TABLE)[jnp.clip(lcC, 0, 9)])
        featuresC = featuresC.at[:, 0].set(
            jnp.maximum(-10.0, featuresC[:, 0] + att))
        fnetC, condC = self._fnet_masked(fnetC, condC, featuresC, lost)
        synthC, out_tail = self._synth_samples(synthC, condC, off,
            n_active=jnp.where(lost, off, 0))
        out_conceal = jnp.concatenate([out_head, out_tail], axis=-1)

        # =========== UPDATE path (good frames) ===========
        blend = (~lost) & state["blend"]
        goodA = (~lost) & ~blend
        # --- blend: restore copy, predict, cross-fade, teacher-force
        #     (lpcnet_plc.c:210-231)
        plc_rest = self._sel(blend, jax.tree.map(lambda c: c[:, -1],
                                                 state["plc_copies"]),
                             state["plc_net"])
        in_blend = jnp.concatenate([burg36, zeros20, one], axis=-1)
        plcB, predB = plc_model.step(self.plc_params, plc_rest, in_blend,
                                     self.plc_cfg)
        featbufB, featfillB = state["feat_buf"], state["feat_fill"]
        for _ in range(cfg.lookahead):       # lpcnet_plc.c:219-222
            featbufB, featfillB = self._feat_push(featbufB, featfillB,
                                                  predB, blend)
        fnetB, condB = self._fnet_masked(state["fnet"], state["last_cond"],
                                         predB, blend)
        _, tmp80 = self._synth_samples(state["synth"], condB, FS - off,
            n_active=jnp.where(blend, FS - off, 0))
        i = jnp.arange(FS - off, dtype=jnp.float32)
        w = 0.5 - 0.5 * jnp.cos(np.pi * i / (FS - off))
        faded = jnp.floor(0.5 + w[None, :] * pcm[:, :FS - off]
                          + (1 - w)[None, :] * tmp80)
        out_blend = jnp.concatenate([faded, pcm[:, FS - off:]], axis=-1)
        synthB, _ = self._synth_samples(state["synth"], condB, FS - off,
            target=faded, preload=jnp.full((B,), FS - off, jnp.int32),
            n_active=jnp.where(blend, FS - off, 0))
        # pcm buffer after blend: last 80 input samples (lpcnet_plc.c:242)
        bufB = jnp.zeros_like(state["pcm_buf"])
        bufB = bufB.at[:, :off].set(pcm[:, FS - off:])
        fillB = jnp.full((B,), off, jnp.int32)

        # final output (needed now for the shared feature pass)
        output = jnp.where(lost[:, None], out_conceal,
                           jnp.where(blend[:, None], out_blend, pcm))

        # --- shared enc feature pass: every path extracts features of its
        #     output frame through the same streaming state
        new_enc, featsg, _ = F.compute_features(state["enc"], output,
                                                mode="single")
        featg = featsg[:, 0, :NB_FEATURES]

        # --- good non-blend: PLC-net update + FEC discard
        #     (lpcnet_plc.c:251-262)
        in_good = jnp.concatenate([burg36, featg, one], axis=-1)
        plcG, predG = plc_model.step(self.plc_params, state["plc_net"],
                                     in_good, self.plc_cfg)
        gskip = goodA & (state["fec_skip"] > 0)
        gread = goodA & ~gskip & (state["fec_read"] < state["fec_fill"])
        fec_readU = jnp.where(gread, state["fec_read"] + 1,
                              state["fec_read"])
        fec_skipU = jnp.where(gskip, state["fec_skip"] - 1,
                              state["fec_skip"])
        fec_keepU = jnp.where(
            goodA, jnp.maximum(0, jnp.maximum(
                state["fec_keep"], fec_readU - cfg.lookahead - 1)),
            state["fec_keep"])

        # pcm delay buffer for good frames: steady state keeps the last
        # buf_size samples; catch-up frames append at pcm_fill
        # (lpcnet_plc.c:244-247 vs :281-286)
        steady = goodA & (state["skip_analysis"] == 0)
        pos = jnp.arange(self.buf_size + FRAME_SIZE)[None, :]
        # steady: buf = [old[FS : buf_size+FS] with pcm at buf_size..]
        steady_buf = jnp.concatenate(
            [state["pcm_buf"][:, FS:self.buf_size], pcm,
             jnp.zeros((B, FS))], axis=-1)
        # case C: write pcm at offset pcm_fill, fill += FS
        offl = state["pcm_fill"][:, None]
        in_window = (pos >= offl) & (pos < offl + FS)
        idx = jnp.clip(pos - offl, 0, FS - 1)
        appended = jnp.where(in_window,
                             jnp.take_along_axis(pcm, idx, axis=-1),
                             state["pcm_buf"])
        bufU = jnp.where(steady[:, None], steady_buf,
                         jnp.where((goodA & ~steady)[:, None], appended,
                                   jnp.where(blend[:, None], bufB,
                                             state["pcm_buf"])))
        fillU = jnp.where(steady, state["pcm_fill"],
                          jnp.where(goodA, state["pcm_fill"] + FS,
                                    jnp.where(blend, fillB,
                                              state["pcm_fill"])))

        # deferred feature push for all good frames (lpcnet_plc.c:266,
        # :275-277)
        featbufU, featfillU = self._feat_push(featbufB, featfillB, featg,
                                              ~lost)
        skipU = jnp.where((blend | goodA) & (state["skip_analysis"] > 0),
                          state["skip_analysis"] - 1,
                          state["skip_analysis"])

        # =========== merge ===========
        new_state = dict(state)
        new_state.update(
            synth=self._sel(lost, synthC,
                            self._sel(blend, synthB, state["synth"])),
            fnet=self._sel(lost, fnetC,
                           self._sel(blend, fnetB, state["fnet"])),
            last_cond=self._sel(lost, condC,
                                self._sel(blend, condB,
                                          state["last_cond"])),
            enc=new_enc,
            plc_net=self._sel(lost, plcC,
                              self._sel(blend, plcB, plcG)),
            plc_copies=self._sel(lost, copiesC, state["plc_copies"]),
            feat_buf=jnp.where(lost[:, None, None], state["feat_buf"],
                               featbufU),
            feat_fill=jnp.where(lost, 0, featfillU),
            pcm_buf=jnp.where(lost[:, None], bufC, bufU),
            pcm_fill=jnp.where(lost, 0, fillU),
            skip_analysis=jnp.where(lost, skipC, skipU),
            blend=lost,
            features=jnp.where(lost[:, None], featuresC,
                               jnp.where(blend[:, None], predB, predG)),
            loss_count=jnp.where(lost, lcC, 0),
            fec_read=jnp.where(lost, fecC["fec_read"], fec_readU),
            fec_keep=jnp.where(lost, fecC["fec_keep"], fec_keepU),
            fec_skip=jnp.where(lost, fecC["fec_skip"], fec_skipU),
        )
        return new_state, output


class NonCausalPLCEngine:
    """Non-causal PLC with 5 ms lookahead (lpcnet_plc.c:349-492): output is
    delayed by TRAINING_OFFSET (80 samples), which lets the first good frame
    after a loss be blended with a TIME-REVERSED synthesis that meets the
    real audio halfway — much smoother recovery than the causal cross-fade.

    Requires a no-lookahead model (FEATURES_DELAY == 0, enforced like the C
    at lpcnet_plc.c:356-361). Batched over streams with per-stream loss
    masks; every control path is computed for every stream and selected.

    remove_dc (the demo's `noncausal_dc` method) follows the C exactly:
    DC is tracked/removed on input (lpcnet_plc.c:366-374), the blend path
    re-tracks it over the 5 ms concealment continuation and re-removes
    with the updated estimate (:389-399), concealed output re-adds the
    estimate through an 80-sample dc_buf delay line matched to the
    engine's output delay (:443-448, :477-489).

    Documented divergence from the C: the enc feature-extractor state
    advances with batched chunk calls, so its pitch history is equivalent
    but not byte-identical.
    """

    def __init__(self, lpcnet_params, plc_params,
                 cfg: Optional[lpcnet_model.LPCNetConfig] = None,
                 plc_cfg: Optional[plc_model.PLCConfig] = None,
                 options: PLCOptions = PLCOptions(),
                 backend: str = "auto"):
        self.cfg = cfg or lpcnet_model.LPCNetConfig(lookahead=0)
        assert self.cfg.lookahead == 0, (
            "Non-causal PLC needs a no-lookahead model (FEATURES_DELAY==0),"
            " cf. lpcnet_plc.c:356-361")
        self.plc_cfg = plc_cfg or plc_model.PLCConfig()
        self.params = lpcnet_params
        self.plc_params = plc_params
        self.tables = lpcnet_model.precompute_sample_tables(lpcnet_params,
                                                            self.cfg)
        self.options = options
        self.backend = _resolve_backend(backend)
        self._step = jax.jit(self._step_impl)

    _synth_samples = PLCEngine._synth_samples

    def init_state(self, batch: int) -> Dict[str, Any]:
        return {
            "synth": sample_scan.init_state(batch, self.cfg),
            "fnet": lpcnet_model.frame_net_init_state(batch, self.cfg),
            "enc": F.init_state(batch),
            "plc_net": plc_model.init_net_state(batch, self.plc_cfg),
            "features": jnp.zeros((batch, NB_TOTAL_FEATURES), jnp.float32),
            "pcm_buf": jnp.zeros((batch, FRAME_SIZE), jnp.float32),
            "queued": jnp.zeros((batch,), bool),
            "queued_samples": jnp.zeros((batch, FRAME_SIZE), jnp.float32),
            "loss_count": jnp.zeros((batch,), jnp.int32),
            "dc_mem": jnp.zeros((batch,), jnp.float32),
            "syn_dc": jnp.zeros((batch,), jnp.float32),
            "dc_buf": jnp.zeros((batch, TRAINING_OFFSET), jnp.float32),
        }

    def step(self, state, pcm, lost):
        """One 10-ms frame per stream; output is the stream DELAYED by
        80 samples. pcm: (B, 160) (ignored where lost); lost: (B,) bool."""
        return self._step(state, pcm, lost)

    run = PLCEngine.run
    _run_impl = PLCEngine._run_impl

    # ------------------------------------------------------------------
    def _cond(self, fstate, feats36):
        fstate, cond = lpcnet_model.frame_net_step(
            self.params, self.tables, fstate, feats36, self.cfg)
        return fstate, {k: v for k, v in cond.items() if k != "cfeat"}

    def _sel(self, mask, a, b):
        pick = lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - 1)), x, y)
        return jax.tree.map(pick, a, b)

    def _step_impl(self, state, pcm, lost):
        B = pcm.shape[0]
        cfg = self.cfg
        off = TRAINING_OFFSET
        buf = state["pcm_buf"]
        lc = state["loss_count"]
        dc = self.options.remove_dc

        # --- 0. queued teacher-forced catch-up (process_queued_update,
        # lpcnet_plc.c:342-347) — runs first on every path
        fnetQ, condQ = self._cond(state["fnet"], state["features"])
        synthQ, _ = self._synth_samples(state["synth"], condQ, FRAME_SIZE,
            target=state["queued_samples"])
        synth = self._sel(state["queued"], synthQ, state["synth"])
        fnet = self._sel(state["queued"], fnetQ, state["fnet"])

        # --- DC removal on the incoming audio (update path only,
        # lpcnet_plc.c:366-374)
        def dc_scan(m, x):
            lp = jnp.floor(0.5 + m)
            m = m + DC_CONST * (x - m)
            return m, lp

        if dc:
            delta0 = jnp.trunc(state["syn_dc"])     # int delta = syn_dc
            mem_bak = state["dc_mem"] + state["syn_dc"]
            dc_mem1, lp1 = jax.lax.scan(dc_scan, mem_bak, pcm.T)
            lp1 = lp1.T
            pcm1 = pcm - lp1
        else:
            delta0 = jnp.zeros((B,))
            mem_bak = state["dc_mem"]
            dc_mem1, lp1 = state["dc_mem"], jnp.zeros_like(pcm)
            pcm1 = pcm

        burg36 = burg_ops.burg_cepstral_analysis(pcm1)
        zeros20 = jnp.zeros((B, NB_FEATURES), jnp.float32)
        one = jnp.ones((B, 1), jnp.float32)

        # ============ UPDATE path (good frame, lpcnet_plc.c:350-450)
        was_lost = lc > 0
        # --- blend sub-path: PLC pred on [burg36 | 0 | 1]
        in_blend = jnp.concatenate([burg36, zeros20, one], axis=-1)
        plc_b, pred_b = plc_model.step(self.plc_params, state["plc_net"],
                                       in_blend, self.plc_cfg)
        feats_b = jnp.zeros((B, NB_TOTAL_FEATURES)).at[:, :NB_FEATURES].set(
            pred_b)
        # pass 1: continue concealment for the buffered 5 ms (:386)
        fnet1, cond1 = self._cond(fnet, feats_b)
        synth1, tail_new = self._synth_samples(synth, cond1, off)
        buf_b = jnp.concatenate([buf[:, :off], tail_new], axis=-1)
        # blend DC re-track: undo the initial removal, fold the synthesized
        # 5 ms into syn_dc, and re-remove with the updated estimate
        # (lpcnet_plc.c:389-399)
        if dc:
            def sdc_scan(m, x):
                m = m + DC_CONST * (x - m)
                return m, ()

            syn_b, _ = jax.lax.scan(sdc_scan, jnp.zeros((B,)), tail_new.T)
            delta_b = jnp.trunc(delta0 + syn_b)
            dc_mem_b0 = mem_bak + syn_b
            dc_mem_b, lp2 = jax.lax.scan(dc_scan, dc_mem_b0, pcm.T)
            lp2 = lp2.T
            pcm2 = pcm - lp2
        else:
            delta_b = jnp.zeros((B,))
            dc_mem_b, lp2, pcm2 = dc_mem1, lp1, pcm1
        pcm_rm = jnp.where(((lc > 0) & ~lost)[:, None], pcm2, pcm1)
        lp_rm = jnp.where(((lc > 0) & ~lost)[:, None], lp2, lp1)
        # pass 2: time-reversed synthesis from cleared sample state (:401-411)
        rev_in = pcm_rm[:, ::-1]
        synth_clear = sample_scan.init_state(B, cfg)
        synth_clear["rng"] = synth1["rng"]     # keep the RNG stream moving
        fnet2, cond2 = self._cond(fnet1, feats_b)
        synth2, _ = self._synth_samples(synth_clear, cond2, FRAME_SIZE, target=rev_in)
        _, rev_out = self._synth_samples(synth2, cond2, off)
        # raised-cosine cross-fade, reversed into the buffer tail (:407-411)
        i = jnp.arange(off, dtype=jnp.float32)
        w = 0.5 - 0.5 * jnp.cos(np.pi * i / off)
        mixed = w * buf_b[:, FRAME_SIZE - 1 - jnp.arange(off, dtype=jnp.int32)] \
            + (1 - w) * (rev_out + delta_b[:, None])
        mixed = jnp.floor(0.5 + mixed)[:, ::-1]
        buf_b = jnp.concatenate([buf_b[:, :off], mixed], axis=-1)
        # blend: the synth/frame states revert to the pre-pass copy (:414)
        # and the catch-up is queued for the next step (:415-418)
        queued_b = jnp.concatenate([buf_b[:, off:], pcm_rm[:, :off]], axis=-1)
        # enc state advances over the blended previous frame (:421-424)
        encB, _, _ = F.compute_features(state["enc"], buf_b, mode="single")

        # --- shared: enc features of the incoming frame (:430-433)
        enc_in = self._sel(lost | ~was_lost, state["enc"], encB)
        enc2, featsg, _ = F.compute_features(enc_in, pcm_rm, mode="single")
        featg36 = featsg[:, 0]

        # --- good sub-path (no preceding loss, :434-441)
        in_good = jnp.concatenate(
            [burg36, featg36[:, :NB_FEATURES], one], axis=-1)
        plc_g, pred_g = plc_model.step(self.plc_params, state["plc_net"],
                                       in_good, self.plc_cfg)
        delayed = jnp.concatenate([buf[:, off:], pcm_rm[:, :off]], axis=-1)
        fnetG, condG = self._cond(fnet, featg36)
        synthG, _ = self._synth_samples(synth, condG, FRAME_SIZE, target=delayed)

        # update-path results (blend output IS the queued catch-up buffer,
        # lpcnet_plc.c:415-418,441-444)
        out_upd = jnp.where(was_lost[:, None], queued_b, delayed)
        if dc:
            # re-add the DC estimate through the 80-sample output delay
            # (lpcnet_plc.c:443-448)
            out_upd = out_upd + jnp.concatenate(
                [state["dc_buf"], lp_rm[:, :off]], axis=-1)
        buf_upd = pcm_rm
        synth_upd = self._sel(was_lost, synth, synthG)   # blend keeps copy
        fnet_upd = self._sel(was_lost, fnet, fnetG)
        plc_upd = self._sel(was_lost, plc_b, plc_g)
        feats_upd = jnp.where(was_lost[:, None], feats_b,
                              jnp.zeros((B, NB_TOTAL_FEATURES))
                              .at[:, :NB_FEATURES].set(pred_g))
        enc_upd = enc2

        # ============ CONCEAL path (lost frame, lpcnet_plc.c:452-492)
        zeros57 = jnp.zeros((B, 2 * NB_BANDS + NB_FEATURES + 1), jnp.float32)
        plc_c, pred_c = plc_model.step(self.plc_params, state["plc_net"],
                                       zeros57, self.plc_cfg)
        att = jnp.where(
            lc >= 10,
            ATT_TABLE[9] - 2.0 * (lc - 9).astype(jnp.float32),
            jnp.asarray(ATT_TABLE)[jnp.clip(lc, 0, 9)])
        feats_c = jnp.zeros((B, NB_TOTAL_FEATURES)).at[:, :NB_FEATURES].set(
            pred_c)
        feats_c = feats_c.at[:, 0].set(
            jnp.maximum(-10.0, feats_c[:, 0] + att))
        fnetC, condC = self._cond(fnet, feats_c)
        # first loss: teacher-force the buffered 5 ms then free-run (:463-466)
        target_first = jnp.concatenate(
            [buf[:, off:], jnp.zeros((B, off))], axis=-1)
        preload_first = jnp.full((B,), off, jnp.int32)
        synthC1, outC1 = self._synth_samples(synth, condC, FRAME_SIZE,
            target=target_first, preload=preload_first)
        buf_c1 = jnp.concatenate([outC1[:, off:], buf[:, off:]], axis=-1)
        # repeated loss: free-run a full frame (:467-475)
        synthC2, outC2 = self._synth_samples(synth, condC, FRAME_SIZE)
        bufmid = jnp.concatenate([buf[:, :off], outC2[:, :off]], axis=-1)
        encC, _, _ = F.compute_features(state["enc"], bufmid, mode="single")
        buf_c2 = jnp.concatenate([outC2[:, off:], outC2[:, :off]], axis=-1)

        first = lc == 0
        out_con = jnp.where(first[:, None], outC1, outC2)
        buf_con = jnp.where(first[:, None], buf_c1, buf_c2)
        synth_con = self._sel(first, synthC1, synthC2)
        enc_con = self._sel(first, state["enc"], encC)

        if dc:
            # conceal DC handling (lpcnet_plc.c:477-489): track syn_dc on
            # the newly synthesized samples, re-add floor(.5+dc_mem)
            # through the dc_buf delay line
            dc_int = jnp.floor(0.5 + state["dc_mem"])
            track = jnp.where(first[:, None],
                              jnp.concatenate([jnp.zeros((B, off)),
                                               jnp.ones((B, off))], -1),
                              jnp.ones((B, FRAME_SIZE)))

            def sdc_masked(m, xm):
                x, msk = xm
                m = jnp.where(msk > 0, m + DC_CONST * (x - m), m)
                return m, ()

            syn_con, _ = jax.lax.scan(
                sdc_masked, state["syn_dc"],
                (out_con.T, track.T))
            out_con = out_con + jnp.concatenate(
                [state["dc_buf"], dc_int[:, None].repeat(off, -1)], axis=-1)
            dc_buf_con = dc_int[:, None].repeat(off, -1)
            dc_buf_upd = lp_rm[:, off:]
            new_dc = {
                "dc_mem": jnp.where(lost, state["dc_mem"],
                                    jnp.where(was_lost, dc_mem_b, dc_mem1)),
                "syn_dc": jnp.where(lost, syn_con, 0.0),
                "dc_buf": jnp.where(lost[:, None], dc_buf_con, dc_buf_upd),
            }
        else:
            new_dc = {}

        # ============ merge paths
        new_state = dict(state)
        new_state.update(
            synth=self._sel(lost, synth_con, synth_upd),
            fnet=self._sel(lost, fnetC, fnet_upd),
            enc=self._sel(lost, enc_con, enc_upd),
            plc_net=self._sel(lost, plc_c, plc_upd),
            features=jnp.where(lost[:, None], feats_c, feats_upd),
            pcm_buf=jnp.where(lost[:, None], buf_con, buf_upd),
            queued=jnp.where(lost, False, was_lost),
            queued_samples=jnp.where(lost[:, None],
                                     state["queued_samples"], queued_b),
            loss_count=jnp.where(lost, lc + 1, 0),
            **new_dc,
        )
        output = jnp.where(lost[:, None], out_con, out_upd)
        return new_state, output
