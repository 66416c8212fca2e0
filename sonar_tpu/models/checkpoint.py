"""Train-state checkpointing (orbax) — save/restore params + optimizer state.

The reference has no training path at all (its denoiser is host-supplied),
so there is nothing to cite; this is framework completeness for the
training capability in models/train.py. Orbax is the standard JAX
checkpoint layer: async-capable, atomic directory commits, and restore
can target any sharding (pass a ``target`` tree of ShapeDtypeStruct with
NamedSharding to land leaves directly on a mesh without a host copy).

Orbax serializes custom pytree nodes (optax NamedTuple optimizer states,
dataclasses, ...) as plain lists/dicts, so a target-less restore would
hand back an ``opt_state`` that ``optimizer.update`` rejects. To keep the
no-target round-trip faithful, :func:`save_checkpoint` also writes a
pickled structure skeleton (the state tree with leaves dropped) into the
checkpoint directory; :func:`restore_checkpoint` unflattens the restored
leaves back through it. Leaf order is stable across the detour because
orbax's list/dict stand-ins flatten in the same depth-first order as the
original nodes (NamedTuple = field order, dict = sorted keys).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax

_SKELETON_FILE = "sonar_tree_skeleton.pkl"


def save_checkpoint(path: str | os.PathLike, state: Any, *,
                    force: bool = False) -> None:
    """Atomically write ``state`` (any pytree: params, (params, opt_state),
    a dict with step counters, ...) to ``path``."""
    import orbax.checkpoint as ocp

    path = os.fspath(os.path.abspath(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)
    # written AFTER orbax's atomic directory commit; restore treats it as
    # optional so a checkpoint remains readable if only the orbax part exists
    skeleton = jax.tree_util.tree_map(lambda _: 0, state)
    try:
        with open(os.path.join(path, _SKELETON_FILE), "wb") as f:
            pickle.dump(skeleton, f)
    except Exception:
        # unpicklable custom node (e.g. a lambda-holding registered type):
        # the orbax payload is intact, restore just needs an explicit target
        pass


def restore_checkpoint(path: str | os.PathLike, *, target: Any = None,
                       partial: bool = False) -> Any:
    """Load a checkpoint written by :func:`save_checkpoint`.

    Without ``target``, the original tree structure (including custom nodes
    like optax NamedTuple states) is rebuilt from the skeleton saved next
    to the arrays, so ``save(p, (params, opt_state)); restore(p)`` round-
    trips to something ``optimizer.update`` accepts.

    ``target`` (optional) is a pytree of arrays or
    ``jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(...))``
    leaves: when given, restored leaves are created with the target's
    shardings (the multi-chip restore path — no single-host gather).
    ``partial=True`` lets ``target`` name a SUBTREE of the checkpoint
    (e.g. only ``{"params": ...}`` out of a full train state) — only the
    named leaves are read and restored."""
    import orbax.checkpoint as ocp

    path = os.fspath(os.path.abspath(path))
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            raw = ckptr.restore(path)
            skel_path = os.path.join(path, _SKELETON_FILE)
            if os.path.exists(skel_path):
                with open(skel_path, "rb") as f:
                    skeleton = pickle.load(f)
                return jax.tree_util.tree_unflatten(
                    jax.tree_util.tree_structure(skeleton),
                    jax.tree_util.tree_leaves(raw))
            return raw
        as_abstract = jax.tree_util.tree_map(
            lambda leaf: leaf if isinstance(leaf, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                      sharding=getattr(leaf, "sharding", None)),
            target)
        # item=as_abstract carries the target TREE STRUCTURE too: orbax
        # stores custom nodes (e.g. optax NamedTuple states) as lists, and
        # only an item tree maps them back onto the original structure
        return ckptr.restore(
            path,
            args=ocp.args.PyTreeRestore(
                item=as_abstract,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    as_abstract),
                partial_restore=partial),
        )
