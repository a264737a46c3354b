"""Migrate legacy pickle checkpoints to the durable npz format (r4).

Rewrites every ``*.ckpt`` under the given roots (default: ``artifacts/``)
that is still in the pre-r4 pickle format into the module-path-free
npz+JSON format of ``core/checkpoint.py``.  Idempotent: npz-format files
are skipped.  Values round-trip exactly (arrays bit-identical, scalars by
value); a verification re-load compares every array leaf before the
original is replaced.

Usage: python scripts/migrate_checkpoints.py [root ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from camouflage_multimodal_tpu.core.checkpoint import (  # noqa: E402
    checkpoint_format, load_checkpoint, save_checkpoint)


def _leaves(obj, path=()):
    if isinstance(obj, dict):
        for k, v in obj.items():
            yield from _leaves(v, path + (str(k),))
    elif isinstance(obj, tuple) and hasattr(obj, "_fields"):
        # namedtuple (optax states): flatten by field name, matching the
        # codec's flax to_state_dict convention
        for k in obj._fields:
            yield from _leaves(getattr(obj, k), path + (k,))
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            yield from _leaves(v, path + (str(i),))
    else:
        yield path, obj


def migrate(path: str) -> bool:
    if checkpoint_format(path) == "npz":
        return False
    blob = load_checkpoint(path)
    save_checkpoint(path + ".new", blob)
    back = load_checkpoint(path + ".new")
    old = {p: v for p, v in _leaves(blob)}
    new = {p: v for p, v in _leaves(back)}
    # namedtuple-shaped nodes flatten to the same positional paths either
    # way (_leaves indexes tuples positionally, the npz codec by str index)
    assert set(old) == set(new), (path, set(old) ^ set(new))
    for p, v in old.items():
        a, b = np.asarray(v), np.asarray(new[p])
        if a.dtype.kind in "OUS":
            assert str(a) == str(b), (path, p)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f"{path} {p}")
    os.replace(path + ".new", path)
    return True


def main() -> None:
    roots = sys.argv[1:] or ["artifacts"]
    n = 0
    for root in roots:
        for dirpath, _, files in os.walk(root):
            for f in sorted(files):
                if f.endswith(".ckpt"):
                    full = os.path.join(dirpath, f)
                    if migrate(full):
                        print("migrated", full)
                        n += 1
                    else:
                        print("already npz", full)
    print(f"{n} checkpoint(s) migrated")


if __name__ == "__main__":
    main()
