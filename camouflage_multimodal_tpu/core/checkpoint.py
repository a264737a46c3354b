"""Checkpointing.

Keeps the reference's best-metric checkpoint policy and metadata schemas
(RG: best val loss — ``region_graph/train.py:381-384``; KG: best val loss
with ``embedding_dim`` — ``train_model.py:420-427``; multimodal: best
F1-class-1 carrying config + optimizer state + metrics —
``train_multimodal.py:464-474``) while storing JAX pytrees instead of torch
state dicts.

Format (durable, orbax-style): a single ``.ckpt`` file that is a zip
archive (``np.savez``) holding every array leaf as a plain ``.npy`` entry
plus one ``__meta__`` JSON document recording the nested structure and all
scalar/string leaves. Nothing in the file references Python module paths —
unlike the pre-r4 pickle format, a refactor cannot orphan old artifacts.
Structured pytree nodes (optax namedtuple states, flax FrozenDicts, …) are
flattened through ``flax.serialization.to_state_dict`` at save time and are
restored into a caller-provided template with ``from_state_dict`` (the
``target=`` / ``state_template=`` arguments), exactly the orbax restore
contract. Legacy pickle checkpoints are still loadable (auto-detected by
file magic) so pre-r4 artifacts keep working.
"""

from __future__ import annotations

import json
import os
import pickle
import zipfile
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

_META_KEY = "__meta__"


# ---------------------------------------------------------------------------
# Structure <-> (JSON meta, array table) codec
# ---------------------------------------------------------------------------

def _encode(obj: Any, arrays: Dict[str, np.ndarray]) -> Any:
    """Recursively split ``obj`` into a JSON-able skeleton + an array table.

    Node forms: ``{"t": "d"|"l"|"tu", "v": ...}`` containers,
    ``{"t": "s", "v": scalar}`` scalars/strings/None,
    ``{"t": "a", "v": "aN"}`` array leaves,
    ``{"t": "sd", "v": ...}`` structured nodes flattened via
    ``flax.serialization.to_state_dict`` (namedtuples, FrozenDicts,
    dataclass pytrees) — these decode to plain dicts and are rebuilt with a
    template via :func:`load_checkpoint` / ``from_state_dict``.
    """
    if isinstance(obj, dict):
        for k in obj:
            if not isinstance(k, str):
                raise TypeError(
                    f"checkpoint dict keys must be str, got {k!r}")
        return {"t": "d", "v": {k: _encode(v, arrays) for k, v in obj.items()}}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # namedtuple
        return {"t": "sd",
                "v": _encode(serialization.to_state_dict(obj), arrays)}
    if isinstance(obj, (list, tuple)):
        return {"t": "l" if isinstance(obj, list) else "tu",
                "v": [_encode(v, arrays) for v in obj]}
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return {"t": "s", "v": obj}
    if isinstance(obj, (np.integer, np.floating, np.bool_)):
        return {"t": "s", "v": obj.item()}
    if isinstance(obj, (np.ndarray, jax.Array)):
        key = f"a{len(arrays)}"
        arrays[key] = np.asarray(jax.device_get(obj))
        return {"t": "a", "v": key}
    # Structured pytree node (optax state, FrozenDict, TrainState, ...).
    state = serialization.to_state_dict(obj)
    if type(state) is type(obj):
        raise TypeError(f"cannot checkpoint object of type {type(obj)!r}")
    return {"t": "sd", "v": _encode(state, arrays)}


def _decode(node: Any, arrays: Dict[str, np.ndarray]) -> Any:
    t, v = node["t"], node["v"]
    if t == "sd":  # flattened structured node -> its child (a plain dict)
        return _decode(v, arrays)
    if t == "d":
        return {k: _decode(x, arrays) for k, x in v.items()}
    if t == "l":
        return [_decode(x, arrays) for x in v]
    if t == "tu":
        return tuple(_decode(x, arrays) for x in v)
    if t == "s":
        return v
    return arrays[v]


def _restate(x: Any) -> Any:
    """Plain decoded structure -> flax state-dict convention (containers as
    str-indexed dicts) so ``from_state_dict`` can rebuild namedtuple/tuple
    targets from it."""
    if isinstance(x, dict):
        return {k: _restate(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return {str(i): _restate(v) for i, v in enumerate(x)}
    return x


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    meta = _encode(payload, arrays)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays,
                 **{_META_KEY: np.frombuffer(
                     json.dumps(meta).encode("utf-8"), dtype=np.uint8)})
    os.replace(tmp, path)  # atomic: a crash never truncates the live ckpt


def load_checkpoint(path: str, target: Any = None) -> Any:
    """Load a checkpoint saved by :func:`save_checkpoint`.

    Without ``target`` returns the plain nested structure (structured nodes
    such as optax states come back as str-keyed dicts). With ``target`` —
    a pytree of the same structure as the saved payload — the result is
    rebuilt into the target's exact pytree types via
    ``flax.serialization.from_state_dict`` (the orbax restore contract).
    Legacy pickle checkpoints (pre-r4) are detected by file magic and
    loaded for backward compatibility.
    """
    with open(path, "rb") as f:
        magic = f.read(2)
    if magic != b"PK":  # legacy pickle artifact
        with open(path, "rb") as f:
            blob = pickle.load(f)
    else:
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z[_META_KEY].tobytes()).decode("utf-8"))
            arrays = {k: z[k] for k in z.files if k != _META_KEY}
        blob = _decode(meta, arrays)
    if target is not None:
        blob = serialization.from_state_dict(target, _restate(blob))
    return blob


def checkpoint_format(path: str) -> str:
    """'npz' for the durable r4+ format, 'pickle' for legacy artifacts."""
    with open(path, "rb") as f:
        return "npz" if f.read(2) == b"PK" else "pickle"


# ---------------------------------------------------------------------------
# Mid-training resume (SURVEY §5: the reference had none — its trainers
# restart from scratch; this is the orbax-style full-train-state resume).
# ---------------------------------------------------------------------------

def save_resume_checkpoint(path: str, state: Any, *, epoch: int,
                           numpy_rng: np.random.Generator,
                           dropout_key: Any, history: Dict[str, Any],
                           best_val: float,
                           extra: Dict[str, Any] | None = None) -> None:
    """Snapshot EVERYTHING a trainer needs to continue bit-exactly:
    params + batch_stats + opt_state + step, the epoch counter, the host
    numpy shuffle RNG state, the device dropout key, the running history and
    the best-val watermark."""
    payload = {
        "train_state": {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        },
        "epoch": int(epoch),
        "numpy_rng_state": numpy_rng.bit_generator.state,
        "dropout_key": dropout_key,
        "history": history,
        "best_val": float(best_val),
    }
    if extra:
        payload.update(extra)
    save_checkpoint(path, payload)


def load_resume_checkpoint(path: str, state_template: Any = None) -> Dict[str, Any]:
    """Inverse of :func:`save_resume_checkpoint`. The caller rebuilds its
    TrainState from ``blob['train_state']`` and MUST restore
    ``numpy_rng.bit_generator.state`` before the first post-resume shuffle.

    ``state_template``: a freshly initialized TrainState whose
    ``opt_state`` pytree (optax namedtuples) the saved arrays are restored
    into — required to resume from the durable npz format; ignored for
    legacy pickle blobs (which pickled the namedtuples directly).
    """
    blob = load_checkpoint(path)
    if state_template is not None and "train_state" in blob:
        tgt = {
            "params": state_template.params,
            "batch_stats": state_template.batch_stats,
            "opt_state": state_template.opt_state,
            "step": state_template.step,
        }
        # npz blobs carry dict-ified optax namedtuples (different pytree
        # structure than the live TrainState) and need the template
        # restore; legacy pickle blobs stored the namedtuples directly and
        # already match.
        same = (jax.tree_util.tree_structure(blob["train_state"]["opt_state"])
                == jax.tree_util.tree_structure(tgt["opt_state"]))
        if not same:
            blob["train_state"] = serialization.from_state_dict(
                tgt, _restate(blob["train_state"]))
    return blob
