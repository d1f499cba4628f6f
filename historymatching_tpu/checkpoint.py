"""Ensemble-state checkpointing.

The reference has no serialization at all — its only "resume" is the
simulator restart from a saturation state (SURVEY.md §5). Here restart stays
first-class (`simulate(model, wsat0, ...)` from any state), and this module
adds real on-disk checkpoints of arbitrary array pytrees (ensembles,
saturation states, RNG keys, iteration counters) so long histories /
optimisation runs survive interruption.

Format: a single .npz holding the leaf arrays under their tree-path names
plus a JSON structure descriptor (`__treespec__`) — no pickle, no framework
lock-in; the arrays load as plain NumPy anywhere, and `load_checkpoint`
rebuilds the EXACT container structure that was saved: nested
dicts/lists/tuples, Python scalars, None, and registered NamedTuple /
dataclass node types (`SimResult` is pre-registered; add your own with
`register_node_type`). Resume entry points: `da.update.es_mda(...,
callback=, start_pass=)` (tests/test_aux.py::test_es_mda_resume bit-matches
an interrupted run against the uninterrupted posterior).
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

_SEP = "//"

# Known structured node types, by registered name. NamedTuples rebuild via
# cls(*children); dataclasses via cls(**{field: child}).
_NODE_TYPES: dict = {}


def register_node_type(cls, name=None):
    """Allow `cls` (a NamedTuple or dataclass whose fields are pytrees of
    arrays) as an interior node of checkpointed states."""
    _NODE_TYPES[name or cls.__name__] = cls
    return cls


def _default_registry():
    from historymatching_tpu.models.ressim import SimResult

    register_node_type(SimResult)


_default_registry()


def _encode(obj, path, leaves):
    """Recursively split `obj` into a JSON spec + named leaf arrays."""
    name = _SEP.join(path) if path else "root"
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, bool):  # before int: bool is an int subclass
        return {"t": "py", "v": obj}
    if isinstance(obj, (int, float)):
        return {"t": "py", "v": obj}
    if isinstance(obj, str):
        return {"t": "py", "v": obj}
    if isinstance(obj, dict):
        keys = list(obj)
        if not all(isinstance(k, str) for k in keys):
            raise TypeError(f"checkpoint dict keys must be str at {name!r}")
        return {"t": "dict", "k": keys,
                "c": [_encode(obj[k], path + [k], leaves) for k in keys]}
    if isinstance(obj, tuple) and hasattr(obj, "_fields"):  # NamedTuple
        tname = type(obj).__name__
        if tname not in _NODE_TYPES:
            raise TypeError(
                f"unregistered NamedTuple {tname!r} at {name!r} — call "
                "checkpoint.register_node_type first")
        return {"t": "node", "n": tname,
                "c": [_encode(v, path + [f], leaves)
                      for f, v in zip(obj._fields, obj)]}
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        tname = type(obj).__name__
        if tname not in _NODE_TYPES:
            raise TypeError(
                f"unregistered dataclass {tname!r} at {name!r} — call "
                "checkpoint.register_node_type first")
        fields = [f.name for f in dataclasses.fields(obj)]
        return {"t": "node", "n": tname, "f": fields,
                "c": [_encode(getattr(obj, f), path + [f], leaves)
                      for f in fields]}
    if isinstance(obj, (list, tuple)):
        return {"t": "list" if isinstance(obj, list) else "tuple",
                "c": [_encode(v, path + [str(i)], leaves)
                      for i, v in enumerate(obj)]}
    arr = np.asarray(obj)
    if arr.dtype == object:
        raise TypeError(f"non-array leaf of type {type(obj)} at {name!r}")
    leaves[name] = arr
    return {"t": "leaf", "k": name}


def _decode(spec, data):
    t = spec["t"]
    if t == "none":
        return None
    if t == "py":
        return spec["v"]
    if t == "leaf":
        return data[spec["k"]]
    if t == "dict":
        return {k: _decode(c, data) for k, c in zip(spec["k"], spec["c"])}
    if t == "list":
        return [_decode(c, data) for c in spec["c"]]
    if t == "tuple":
        return tuple(_decode(c, data) for c in spec["c"])
    if t == "node":
        cls = _NODE_TYPES.get(spec["n"])
        if cls is None:
            raise TypeError(
                f"checkpoint contains unregistered node type {spec['n']!r} — "
                "call checkpoint.register_node_type before loading")
        children = [_decode(c, data) for c in spec["c"]]
        if "f" in spec:  # dataclass
            return cls(**dict(zip(spec["f"], children)))
        return cls(*children)
    raise ValueError(f"corrupt checkpoint spec node {t!r}")


def save_checkpoint(path, state):
    """Save a pytree of arrays to `path` (.npz). Atomic (write + rename).

    Device (jax) arrays are pulled to host; structure (dicts, lists, tuples,
    scalars, None, registered node types) is recorded and restored exactly
    by `load_checkpoint`.
    """
    leaves: dict = {}
    spec = _encode(state, [], leaves)
    if not leaves:
        raise ValueError("empty checkpoint state (no array leaves)")
    arrays = dict(leaves)
    arrays["__treespec__"] = np.asarray(json.dumps(spec))
    tmp = f"{path}.tmp"
    np.savez(tmp, **arrays)
    # np.savez appends .npz to the temp name
    os.replace(tmp if os.path.exists(tmp) else f"{tmp}.npz", path)
    return path


def load_checkpoint(path):
    """Load a checkpoint, rebuilding the saved structure; array leaves come
    back as NumPy arrays (bit-identical bytes — feed them straight back into
    jnp). Legacy structureless .npz checkpoints load as nested dicts."""
    with np.load(path) as data:
        files = dict(data)
    spec_arr = files.pop("__treespec__", None)
    if spec_arr is None:  # legacy format: path-flattened keys only
        out: dict = {}
        for k, v in files.items():
            parts = k.split(_SEP)
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = v
        return out
    return _decode(json.loads(str(spec_arr)), files)
