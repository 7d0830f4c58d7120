"""Torch-interchange parity: reference torch-trained RDO-VAE checkpoints
(and wexchange numpy export dirs) import into this framework and reproduce
the torch model's outputs.

Oracle: the ACTUAL reference torch model (torch/rdovae/rdovae/rdovae.py),
imported from /root/reference at test time (the same
use-the-reference-as-oracle pattern as tools/ref_*). The checkpoint layout
under test is what train_rdovae.py:179-215 saves; the numpy layout is what
export_rdovae_weights.py:258-293 / wexchange dump_torch_weights write."""
import os
import sys

import numpy as np
import pytest

from conftest import ref_build_skip

REF_TORCH = "/root/reference/torch/rdovae"


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """A small reference torch RDOVAE with random weights, saved exactly as
    train_rdovae.py:179-215 does, plus the live model as oracle."""
    if not os.path.isdir(REF_TORCH):
        ref_build_skip("reference torch/rdovae not available")
    import torch
    sys.path.insert(0, REF_TORCH)
    try:
        from rdovae import RDOVAE
    except Exception as e:  # pragma: no cover - environment-dependent
        ref_build_skip(f"reference torch rdovae unimportable: {e}")
    finally:
        sys.path.pop(0)

    torch.manual_seed(0)
    model_args = (20, 24, 16, 32, 32)  # nf, latent, quant_levels, c, c2
    model_kwargs = {"state_dim": 8, "split_mode": "split",
                    "pvq_num_pulses": 82, "state_dropout_rate": 0.0}
    model = RDOVAE(*model_args, **model_kwargs)
    with torch.no_grad():
        # the quant embedding initializes to 0 - randomize so the
        # statistical-model mapping is actually exercised
        model.statistical_model.quant_embedding.weight.normal_(0.0, 0.3)
    model.eval()
    ckpt = {"state_dict": model.state_dict(), "model_args": model_args,
            "model_kwargs": model_kwargs}
    path = tmp_path_factory.mktemp("torch") / "rdovae_ckpt.pth"
    torch.save(ckpt, str(path))
    return model, str(path)


def test_checkpoint_import_encode_decode_parity(torch_ckpt):
    import torch

    import jax.numpy as jnp
    from lpcnet_tpu.models import rdovae as rv
    from lpcnet_tpu.utils import import_torch

    model, path = torch_ckpt
    params, cfg = import_torch.import_rdovae_torch(path)
    assert cfg.nb_latents == 24 and cfg.nb_quant == 16
    assert cfg.cond_size == 32 and cfg.state_dim == 8

    rs = np.random.RandomState(1)
    feats = rs.randn(2, 8, 20).astype(np.float32) * 0.4
    with torch.no_grad():
        z_t, st_t = model.core_encoder(torch.from_numpy(feats))
    z_j, st_j = rv.encode(params, jnp.asarray(feats), cfg)
    np.testing.assert_allclose(np.asarray(z_j), z_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_j), st_t.numpy(),
                               rtol=2e-4, atol=2e-5)

    zq = rs.randn(2, 3, 24).astype(np.float32)
    state0 = rs.randn(2, 8).astype(np.float32) * 0.5
    with torch.no_grad():
        # torch's decode flips by itself (rdovae.py:649-656); its GRU-init
        # denses expect (B, 1, state_dim)
        f_t = model.decode(torch.from_numpy(zq),
                           torch.from_numpy(state0[:, None, :]))
    f_j = rv.decode(params, jnp.asarray(zq), jnp.asarray(state0), cfg)
    np.testing.assert_allclose(np.asarray(f_j), f_t.numpy(),
                               rtol=2e-4, atol=2e-5)


def test_checkpoint_import_statistical_model_parity(torch_ckpt):
    import torch

    import jax.numpy as jnp
    from lpcnet_tpu.models import rdovae as rv
    from lpcnet_tpu.utils import import_torch

    model, path = torch_ckpt
    params, cfg = import_torch.import_rdovae_torch(path)
    qid = np.array([0, 3, 15], np.int32)
    with torch.no_grad():
        stats = model.statistical_model(torch.from_numpy(qid.astype(
            np.int64)))
    qp = rv.quant_params(params, jnp.asarray(qid), cfg)
    np.testing.assert_allclose(np.asarray(qp["scale"]),
                               stats["quant_scale"].numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(qp["dead_zone"]),
                               stats["dead_zone"].numpy(), rtol=1e-5,
                               atol=1e-6)
    n = cfg.nb_latents
    np.testing.assert_allclose(np.asarray(qp["hard"][..., n:]),
                               stats["r_hard"].numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(qp["hard"][..., :n]),
                               stats["theta_hard"].numpy(), rtol=1e-5,
                               atol=1e-6)


def test_numpy_exchange_dir_import(torch_ckpt, tmp_path):
    """The wexchange numpy-export layout (per-layer dirs of raw torch
    arrays) imports to the identical pytree as the checkpoint path."""
    import torch

    import jax
    from lpcnet_tpu.utils import import_torch

    model, path = torch_ckpt
    # write the exchange dir exactly as wexchange dump_torch_weights does
    # (export_rdovae_weights.py numpy_export)
    for mod_name, exch in import_torch._EXCHANGE_NAMES.items():
        mod = model.get_submodule(mod_name)
        d = tmp_path / exch
        d.mkdir()
        if isinstance(mod, torch.nn.GRU):
            np.save(d / "weight_ih_rzn.npy",
                    mod.weight_ih_l0.detach().numpy())
            np.save(d / "weight_hh_rzn.npy",
                    mod.weight_hh_l0.detach().numpy())
            np.save(d / "bias_ih_rzn.npy", mod.bias_ih_l0.detach().numpy())
            np.save(d / "bias_hh_rzn.npy", mod.bias_hh_l0.detach().numpy())
        elif isinstance(mod, torch.nn.Conv1d):
            np.save(d / "weight_oik.npy", mod.weight.detach().numpy())
            np.save(d / "bias.npy", mod.bias.detach().numpy())
        else:  # Linear / Embedding
            np.save(d / "weight.npy", mod.weight.detach().numpy())
            if getattr(mod, "bias", None) is not None:
                np.save(d / "bias.npy", mod.bias.detach().numpy())

    p_np, cfg_np = import_torch.import_rdovae_numpy_dir(str(tmp_path))
    p_ck, cfg_ck = import_torch.import_rdovae_torch(path)
    assert cfg_np == cfg_ck
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 p_np, p_ck)


def test_imported_model_runs_through_dred_codec(torch_ckpt):
    """A torch-trained model drives the full DRED application layer."""
    import jax.numpy as jnp
    from lpcnet_tpu.dred import DREDCodec, DREDConfig
    from lpcnet_tpu.utils import import_torch

    _, path = torch_ckpt
    params, cfg = import_torch.import_rdovae_torch(path)
    dc = DREDCodec(params, cfg, DREDConfig(num_dframes=4))
    rs = np.random.RandomState(2)
    feats = jnp.asarray(rs.randn(2, 32, 20).astype(np.float32) * 0.3)
    zd, sd = dc.encode(feats)
    sym, qid = dc.quantize_payload(zd)
    out = dc.decode(sym, qid, sd[:, -4])
    assert out.shape == (2, 16, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_cli_loads_torch_checkpoint(torch_ckpt):
    """load_dred_model dispatches .pth checkpoints through import_torch."""
    from lpcnet_tpu.cli import load_dred_model

    _, path = torch_ckpt
    params, cfg = load_dred_model(path)
    assert cfg.cond_size == 32 and cfg.nb_latents == 24
    assert params["enc"]["bits_conv"]["w"].shape == (4, 8 * 32, 24)
