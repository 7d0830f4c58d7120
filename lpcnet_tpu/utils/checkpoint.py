"""Training checkpoint/resume on top of the DNNw blob format.

The reference checkpoints per epoch via Keras ModelCheckpoint h5 files
(train_lpcnet.py:296-298, train_plc.py:265-267, train_rdovae.py:192-194) and
warm-starts via --retrain/--quantize (train_lpcnet.py:300-317). Here a
checkpoint is one self-contained blob holding the params pytree, the full
optimizer state (so Adam moments survive a resume), the global step, and a
JSON metadata dict (hyperparams, epoch) — the torch trainer's
"save everything" convention (torch/rdovae/train_rdovae.py:179-215).
"""
import json
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from . import weights_io


def save_training(path: str, params: Dict[str, Any], opt_state: Any,
                  step: int, meta: Optional[Dict[str, Any]] = None) -> None:
    """Write params + optimizer state + step + metadata as one blob."""
    arrays: Dict[str, np.ndarray] = {}
    flat = weights_io._flatten(params)
    manifest = {"params": {}, "nopt": 0, "step": int(step),
                "meta": meta or {}}
    for i, (name, a) in enumerate(sorted(flat.items())):
        rec = f"p{i:04d}"
        arrays[rec] = a.astype(np.float32) if a.dtype == np.float64 else a
        manifest["params"][rec] = {"name": name, "shape": list(a.shape),
                                   "dtype": str(arrays[rec].dtype)}
    leaves = jax.tree_util.tree_leaves(opt_state)
    manifest["nopt"] = len(leaves)
    for i, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        # canonicalize to the three blob dtypes (f32/i32/i8); reject the
        # rest up front rather than KeyError deep in weights_io after a
        # training run has been spent
        if a.dtype in (np.float64, np.float16) or a.dtype.name == "bfloat16":
            a = a.astype(np.float32)
        elif a.dtype in (np.int64, np.int16, np.uint32, np.uint64, np.bool_):
            a = a.astype(np.int32)
        if a.dtype not in (np.float32, np.int32, np.int8):
            raise ValueError(
                f"optimizer leaf {i} has unsupported dtype {a.dtype}; "
                "cannot serialize to a DNNw training blob")
        arrays[f"o{i:04d}"] = a
    mjson = json.dumps(manifest).encode()
    arrays["__train_manifest__"] = np.frombuffer(mjson, np.int8).copy()
    weights_io.write_blob(path, arrays)


def load_training(path: str, opt_state_template: Any = None
                  ) -> Tuple[Dict[str, Any], Any, int, Dict[str, Any]]:
    """Load a checkpoint. If opt_state_template (a freshly opt.init()'d
    state) is given, its leaves are replaced with the saved ones; otherwise
    opt state is returned as a raw leaf list."""
    raw = weights_io.read_blob(path)
    manifest = json.loads(raw["__train_manifest__"].tobytes().decode())
    params: Dict[str, Any] = {}
    for rec, info in manifest["params"].items():
        a = raw[rec].astype(info["dtype"]).reshape(info["shape"])
        node = params
        parts = info["name"].split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = a
    leaves = [raw[f"o{i:04d}"] for i in range(manifest["nopt"])]
    if opt_state_template is not None:
        tpl_leaves, treedef = jax.tree_util.tree_flatten(opt_state_template)
        assert len(tpl_leaves) == len(leaves), (
            f"optimizer mismatch: checkpoint has {len(leaves)} leaves, "
            f"template has {len(tpl_leaves)}")
        leaves = [np.asarray(l).reshape(np.shape(t)).astype(
            np.asarray(t).dtype) for l, t in zip(leaves, tpl_leaves)]
        opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        opt_state = leaves
    return params, opt_state, int(manifest["step"]), manifest["meta"]
