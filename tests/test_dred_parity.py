"""DRED RDO-VAE parity vs the ACTUAL reference C inference
(dred_rdovae_enc.c / dred_rdovae_dec.c built by tools/ref_dred/build.sh
with weights from utils/export_ref.export_rdovae_blob).

Measured at the deployable geometry (cond 256 / cond2 256, the torch
trainer's defaults): encoder latents max|diff| 1.4e-6, initial states
4.5e-7, decoder qframes 2.2e-7 over 20 recurrent dframes — 1-ulp class.

Reference-bug note: the C stack allocates `float zero_vector[1024]` as
the GRU condition buffer (dred_rdovae_enc.c:49, dred_rdovae_dec.c:60)
but compute_gruB reads 3*N floats from it — any model with GRU width
N > 341 (e.g. the TF trainer's default cond 1024) makes the reference
read past the buffer and add stack garbage to the GRU gates. Parity is
therefore only defined for 3N <= 1024 geometries."""
import os
import subprocess

import numpy as np
import pytest

from conftest import ref_build_skip


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    import jax
    from lpcnet_tpu.models import rdovae as rv
    from lpcnet_tpu.utils import export_ref
    tmp = tmp_path_factory.mktemp("refdred")
    build = subprocess.run(
        ["bash", "tools/ref_dred/build.sh", "/root/reference", str(tmp)],
        capture_output=True, text=True)
    if build.returncode != 0:
        ref_build_skip(f"reference build failed: {build.stderr[-300:]}")
    bin_path = build.stdout.strip().splitlines()[-1]
    cfg = rv.RDOVAEConfig(cond_size=256, cond_size2=256, approx=True)
    params = rv.init_params(jax.random.PRNGKey(2), cfg)
    export_ref.export_rdovae_blob(
        jax.tree.map(np.asarray, params), str(tmp / "w.bin"))
    return bin_path, str(tmp / "w.bin"), params, cfg, tmp


class TestDREDParity:
    def test_encoder(self, harness):
        import jax.numpy as jnp
        from lpcnet_tpu.models import rdovae as rv
        bin_path, blob, params, cfg, tmp = harness
        rs = np.random.RandomState(11)
        T = 20
        feats = (rs.randn(1, 2 * T, 20) * 0.3).astype(np.float32)
        feats.reshape(T, 40).tofile(tmp / "in.f32")
        r = subprocess.run([bin_path, "enc", blob, str(tmp / "in.f32"),
                            str(tmp / "lat.f32"), str(tmp / "st.f32")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref_lat = np.fromfile(tmp / "lat.f32", np.float32).reshape(-1, 80)
        ref_st = np.fromfile(tmp / "st.f32", np.float32).reshape(-1, 24)
        z, state = rv.encode(params, jnp.asarray(feats), cfg)
        assert np.abs(np.asarray(z[0]) - ref_lat).max() < 1e-5   # meas 1.4e-6
        assert np.abs(np.asarray(state[0]) - ref_st).max() < 1e-5  # meas 4.5e-7

    def test_stats_tables_roundtrip(self, harness, tmp_path):
        """Statistical-model export (dump_rdovae.py:110-145): generated
        dred_rdovae_stats_data.{h,c} compile into the reference runtime and
        the q8/q10/q15 tables read back through the actual
        DRED_rdovae_get_*_pointer accessors (dred_rdovae.c:118-136)
        BIT-IDENTICAL to export_rdovae_stats."""
        import jax
        from lpcnet_tpu.models import rdovae as rv
        from lpcnet_tpu.utils import export_ref
        _, _, params, cfg, _ = harness
        rs = np.random.RandomState(21)
        params = dict(params)
        params["quant_embed"] = {"e": (rs.randn(
            cfg.nb_quant, 6 * cfg.nb_latents) * 0.7).astype(np.float32)}
        export_ref.export_rdovae_stats_c(params, str(tmp_path))
        build = subprocess.run(
            ["bash", "tools/ref_dred/build.sh", "/root/reference",
             str(tmp_path), str(tmp_path)], capture_output=True, text=True)
        if build.returncode != 0:
            ref_build_skip(f"build failed: {build.stderr[-300:]}")
        bin_path = build.stdout.strip().splitlines()[-1]
        n = cfg.nb_quant * cfg.nb_latents
        r = subprocess.run([bin_path, "stats", str(tmp_path / "stats.bin"),
                            str(n)], capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        raw = np.fromfile(tmp_path / "stats.bin", np.uint16).reshape(4, n)
        ours = export_ref.export_rdovae_stats(params)
        order = ["dred_quant_scales_q8", "dred_dead_zone_q10",
                 "dred_r_q15", "dred_p0_q15"]
        for row, name in zip(raw, order):
            np.testing.assert_array_equal(row, ours[name], err_msg=name)

    def test_shipped_artifact_deploys(self, harness):
        """The COMMITTED DRED checkpoint (examples/speech_dred_params.bin)
        exported with export_rdovae_blob runs in the actual reference C
        encoder with 1-ulp latent agreement — the TPU-trained artifact
        deploys into the reference runtime (download_model.sh parity)."""
        import jax
        import jax.numpy as jnp
        from lpcnet_tpu.cli import load_dred_model
        from lpcnet_tpu.models import rdovae as rv
        from lpcnet_tpu.utils import export_ref
        bin_path, _, _, _, tmp = harness
        ship = os.path.join(os.path.dirname(__file__), os.pardir,
                            "examples", "speech_dred_params.bin")
        if not os.path.exists(ship):
            pytest.skip("shipped DRED artifact missing")
        params, cfg = load_dred_model(ship)
        cfg = rv.RDOVAEConfig(cond_size=cfg.cond_size,
                              cond_size2=cfg.cond_size2, approx=True)
        export_ref.export_rdovae_blob(
            jax.tree.map(np.asarray, params), str(tmp / "ship.bin"))
        rs = np.random.RandomState(31)
        T = 16
        feats = (rs.randn(1, 2 * T, 20) * 0.3).astype(np.float32)
        feats.reshape(T, 40).tofile(tmp / "ship_in.f32")
        r = subprocess.run(
            [bin_path, "enc", str(tmp / "ship.bin"), str(tmp / "ship_in.f32"),
             str(tmp / "ship_lat.f32"), str(tmp / "ship_st.f32")],
            capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref_lat = np.fromfile(tmp / "ship_lat.f32", np.float32).reshape(-1, 80)
        z, _ = rv.encode(params, jnp.asarray(feats), cfg)
        # trained-checkpoint activations are larger than the random-weight
        # harness's, so the float-association residual is too: meas 1.5e-5
        assert np.abs(np.asarray(z[0]) - ref_lat).max() < 1e-4

    def test_decoder(self, harness):
        import jax.numpy as jnp
        from lpcnet_tpu.models import rdovae as rv
        bin_path, blob, params, cfg, tmp = harness
        rs = np.random.RandomState(12)
        S = 8
        L = (rs.randn(S, 80) * 0.5).astype(np.float32)
        st0 = np.tanh(rs.randn(24)).astype(np.float32)
        st0.tofile(tmp / "dst.f32")
        L.tofile(tmp / "dlat.f32")
        r = subprocess.run([bin_path, "dec", blob, str(tmp / "dst.f32"),
                            str(tmp / "dlat.f32"), str(tmp / "dout.f32")],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
        ref_q = np.fromfile(tmp / "dout.f32", np.float32).reshape(-1, 80)
        # ours decodes latents time-reversed (training semantics); the C
        # runs forward — feed z = L[::-1] and un-reverse the output
        out = rv.decode(params, jnp.asarray(L[None, ::-1].copy()),
                        jnp.asarray(st0[None]), cfg)
        our_q = np.asarray(out[0])[::-1].reshape(-1, 80)
        assert np.abs(ref_q - our_q).max() < 5e-6   # measured 2.2e-7
