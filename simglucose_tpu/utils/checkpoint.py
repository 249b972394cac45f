"""Checkpoint / resume for simulation and training state.

The reference has no mid-run persistence (SURVEY §5.4); its patient state is
implicit in a scipy integrator object.  Here ALL state is an explicit pytree
(:class:`EnvState`, the PPO ``TrainState``), so checkpointing is a pure
serialization problem.  Two backends:

  * ``npz`` (default) — single-file numpy archive of the flattened leaves;
    zero extra dependencies, bit-stable, best for small/medium state.
  * ``orbax`` — :class:`orbax.checkpoint.StandardCheckpointer` directories;
    use for large sharded training state (async-capable, per-leaf files).

Both work for single-env, batched, and sharded state (sharded arrays are
gathered to host on save; re-shard after restore with
:func:`simglucose_tpu.parallel.sharding.shard_batch`).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_state(path: str, tree: Any) -> None:
    """Serialize a state pytree to ``path`` (.npz archive of leaves)."""
    flat, _ = _flatten_with_paths(tree)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        **{f"leaf_{i}": np.asarray(jax.device_get(x)) for i, x in enumerate(flat)},
    )


def restore_state(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`.  ``like`` provides the
    tree structure AND the leaf contract: restored leaves are cast to
    ``like``'s dtypes (so e.g. an f32 checkpoint restored in an x64 session
    still matches the session's compiled signatures / donated buffers), and
    a shape mismatch raises with the offending leaf's tree path instead of
    failing later inside a jitted call."""
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        n_saved = len(z.files)
        if n_saved != len(paths_and_leaves):
            raise ValueError(
                f"checkpoint has {n_saved} leaves, expected "
                f"{len(paths_and_leaves)}"
            )
        leaves = []
        for i, (keypath, ref) in enumerate(paths_and_leaves):
            leaf = z[f"leaf_{i}"]
            ref = np.asarray(ref)
            if leaf.shape != ref.shape:
                raise ValueError(
                    f"checkpoint leaf {jax.tree_util.keystr(keypath)} has "
                    f"shape {leaf.shape}, expected {ref.shape} — the saved "
                    "state does not match `like` (wrong batch size / config?)"
                )
            if leaf.dtype != ref.dtype:
                leaf = leaf.astype(ref.dtype)
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Rolling checkpoint directory.

    ``backend='npz'`` (default) writes one ``ckpt_<step>.npz`` per step;
    ``backend='orbax'`` writes orbax StandardCheckpointer directories
    (``ckpt_<step>/``) for large sharded training state.

    >>> mgr = CheckpointManager('/tmp/ckpts', max_to_keep=3)
    >>> mgr.save(step, train_state)
    >>> state = mgr.restore(like=train_state)      # latest
    """

    def __init__(self, directory: str, max_to_keep: int = 3, backend: str = "npz"):
        if backend not in ("npz", "orbax"):
            raise ValueError(f"backend must be 'npz' or 'orbax'; got {backend!r}")
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        self.backend = backend
        os.makedirs(self.directory, exist_ok=True)
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()

    def _step_path(self, step: int) -> str:
        suffix = ".npz" if self.backend == "npz" else ""
        return os.path.join(self.directory, f"ckpt_{step:012d}{suffix}")

    def all_steps(self):
        steps = []
        for f in os.listdir(self.directory):
            if not f.startswith("ckpt_"):
                continue
            tail = f[len("ckpt_"):]
            if self.backend == "npz" and tail.endswith(".npz"):
                steps.append(int(tail[: -len(".npz")]))
            elif self.backend == "orbax" and tail.isdigit():
                steps.append(int(tail))
        return sorted(steps)

    def latest_step(self):
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree: Any) -> str:
        path = self._step_path(step)
        if self.backend == "npz":
            save_state(path, tree)
        else:
            self._ckptr.save(path, tree, force=True)
            self._ckptr.wait_until_finished()
        for old in self.all_steps()[: -self.max_to_keep]:
            old_path = self._step_path(old)
            if self.backend == "npz":
                os.remove(old_path)
            else:
                import shutil

                shutil.rmtree(old_path, ignore_errors=True)
        return path

    def restore(self, like: Any, step: int | None = None) -> Any:
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        if self.backend == "npz":
            return restore_state(self._step_path(step), like)
        restored = self._ckptr.restore(self._step_path(step), like)
        return restored
