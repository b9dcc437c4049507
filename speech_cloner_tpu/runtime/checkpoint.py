"""Checkpoint / resume: pytree save-restore with reference-compatible naming.

Reference semantics being reproduced (SURVEY.md §5):
- save path ``<model_path>/<model_name>-<global_step>`` (encoder.py:223-235),
- restore-latest by scanning the directory (encoder.py:238-253; we use the
  step suffix instead of TF's `checkpoint` bookkeeping file),
- optimizer schedule state (step, epoch, lr) restores with the weights —
  the reference kept them inside the graph (encoder.py:164-169),
- pruning: keep N evenly-spaced checkpoints above a step floor
  (clean_ckpt.py:27-76).

Format: one ``.npz`` per checkpoint holding the flattened pytree (path-joined
keys), plus a JSON sidecar snapshotting the config next to the weights like
the reference's enc_14_ckpt/encoder_14_cfg_d.json. Saves are async: arrays
are fetched to host, then written on a daemon thread so the train loop never
blocks on disk.
"""

from __future__ import annotations

import json
import os
import re
import threading

import jax
import numpy as np

_SEP = "//"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(tree, (list, tuple)):
        out[f"{prefix}__len__"] = np.asarray(len(tree))
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix.removesuffix(_SEP)] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    # group by first path segment
    if list(flat.keys()) == [""]:
        return flat[""]
    groups: dict[str, dict] = {}
    scalars = {}
    for k, v in flat.items():
        if _SEP in k:
            head, rest = k.split(_SEP, 1)
            groups.setdefault(head, {})[rest] = v
        else:
            scalars[k] = v
    if "__len__" in scalars:
        n = int(scalars["__len__"])
        return [_unflatten(groups[str(i)]) if str(i) in groups else scalars[str(i)]
                for i in range(n)]
    out = {}
    for k, v in scalars.items():
        out[k] = v
    for k, g in groups.items():
        out[k] = _unflatten(g)
    return out


def _restore_like(tpl, ck, path: str = ""):
    """Rebuild ``tpl``'s structure from checkpoint tree ``ck``, walking both
    by key/index and failing loudly (with the path) on any mismatch."""
    where = path or "<root>"
    if isinstance(tpl, dict):
        if not isinstance(ck, dict):
            raise ValueError(f"checkpoint mismatch at {where}: "
                             f"expected a dict, found {type(ck).__name__}")
        missing = sorted(set(tpl) - set(ck))
        extra = sorted(set(ck) - set(tpl))
        if missing or extra:
            raise ValueError(f"checkpoint mismatch at {where}: "
                             f"missing keys {missing}, unexpected keys {extra}")
        return {k: _restore_like(tpl[k], ck[k], f"{path}{k}{_SEP}") for k in tpl}
    if isinstance(tpl, (list, tuple)):
        if not isinstance(ck, (list, tuple)) or len(tpl) != len(ck):
            raise ValueError(f"checkpoint mismatch at {where}: expected a "
                             f"sequence of {len(tpl)}, found "
                             f"{type(ck).__name__}"
                             + (f" of {len(ck)}" if isinstance(ck, (list, tuple)) else ""))
        vals = [_restore_like(t, c, f"{path}{i}{_SEP}")
                for i, (t, c) in enumerate(zip(tpl, ck))]
        if isinstance(tpl, tuple) and hasattr(tpl, "_fields"):  # NamedTuple
            return type(tpl)(*vals)
        return type(tpl)(vals) if isinstance(tpl, list) else tuple(vals)
    # leaf: dtype comes from the template, shape must agree
    arr = np.asarray(ck)
    want_shape = tuple(getattr(tpl, "shape", np.shape(tpl)))
    if tuple(arr.shape) != want_shape:
        raise ValueError(f"checkpoint mismatch at {where}: shape "
                         f"{tuple(arr.shape)} != template {want_shape}")
    want_dtype = getattr(tpl, "dtype", None) or np.asarray(tpl).dtype
    return arr.astype(want_dtype)


class Checkpointer:
    """Save/restore/prune for a named model directory."""

    def __init__(self, model_path: str, model_name: str):
        self.model_path = model_path
        self.model_name = model_name
        self._pattern = re.compile(re.escape(model_name) + r"-(\d+)\.npz$")
        self._last_thread: threading.Thread | None = None
        os.makedirs(model_path, exist_ok=True)

    # ------------------------------------------------------------- paths ---

    def _path(self, step: int) -> str:
        return os.path.join(self.model_path, f"{self.model_name}-{int(step)}.npz")

    def steps(self) -> list[int]:
        out = []
        for f in os.listdir(self.model_path):
            m = self._pattern.match(f)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_step(self) -> int | None:
        s = self.steps()
        return s[-1] if s else None

    # -------------------------------------------------------------- save ---

    def save(self, tree, step: int, config: dict | None = None, sync: bool = False):
        """Snapshot a pytree at ``step``. ``tree`` typically bundles
        {params, state, opt_state, step, epoch, rng}."""
        host_tree = jax.tree.map(lambda a: np.asarray(a), tree)
        flat = _flatten(host_tree)
        path = self._path(step)

        def _write():
            tmp = path + ".tmp.npz"
            np.savez(tmp, **flat)
            os.replace(tmp, path)
            if config is not None:
                with open(os.path.join(self.model_path,
                                       f"{self.model_name}_cfg_d.json"), "w") as f:
                    json.dump(config, f, indent=1, sort_keys=True, default=str)

        self.wait()
        t = threading.Thread(target=_write, daemon=True)
        t.start()
        self._last_thread = t
        if sync:
            self.wait()
        return path

    def wait(self):
        if self._last_thread is not None:
            self._last_thread.join()
            self._last_thread = None

    # ----------------------------------------------------------- restore ---

    def restore(self, step: int | None = None):
        """Load a checkpoint pytree; latest when step is None. Returns
        (tree, step) or (None, None) when nothing exists."""
        self.wait()
        if step is None:
            step = self.latest_step()
            if step is None:
                return None, None
        with np.load(self._path(step), allow_pickle=False) as z:
            flat = {k: z[k] for k in z.files}
        return _unflatten(flat), step

    def restore_into(self, template, step: int | None = None):
        """Restore into the exact pytree structure of ``template`` (dicts,
        lists, NamedTuples like optax states), matching leaves by their
        flattened path names — a structure mismatch (renamed param, changed
        optimizer) raises with the offending path instead of silently
        restoring the wrong leaf positionally.
        Returns (tree, step) or (template-unchanged, None)."""
        tree, step = self.restore(step)
        if tree is None:
            return template, None
        return _restore_like(template, tree), step

    # ------------------------------------------------------------- prune ---

    def prune(self, n_keep: int = 100, step_min: int = 0) -> int:
        """Keep ``n_keep`` evenly spaced checkpoints with step >= step_min,
        always retaining first and last survivors (clean_ckpt.py semantics).
        Returns number of deleted files."""
        self.wait()
        steps = self.steps()
        deleted = 0
        survivors = [s for s in steps if s >= step_min]
        for s in steps:
            if s < step_min:
                os.remove(self._path(s))
                deleted += 1
        if not survivors:
            return deleted
        delta = max(len(survivors) // n_keep, 1)
        keep_idx = set(range(0, len(survivors), delta))
        keep_idx.add(len(survivors) - 1)
        for i, s in enumerate(survivors):
            if i not in keep_idx:
                os.remove(self._path(s))
                deleted += 1
        return deleted
