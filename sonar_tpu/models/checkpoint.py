"""Train-state checkpointing (orbax) — save/restore params + optimizer state.

The reference has no training path at all (its denoiser is host-supplied),
so there is nothing to cite; this is framework completeness for the
training capability in models/train.py. Orbax is the standard JAX
checkpoint layer: async-capable, atomic directory commits, and restore
can target any sharding (pass a ``target`` tree of ShapeDtypeStruct with
NamedSharding to land leaves directly on a mesh without a host copy).
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str | os.PathLike, state: Any, *,
                    force: bool = False) -> None:
    """Atomically write ``state`` (any pytree: params, (params, opt_state),
    a dict with step counters, ...) to ``path``."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.fspath(os.path.abspath(path)), state, force=force)


def restore_checkpoint(path: str | os.PathLike, *, target: Any = None) -> Any:
    """Load a checkpoint written by :func:`save_checkpoint`.

    ``target`` (optional) is a pytree of arrays or
    ``jax.ShapeDtypeStruct(shape, dtype, sharding=NamedSharding(...))``
    leaves: when given, restored leaves are created with the target's
    shardings (the multi-chip restore path — no single-host gather)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(os.fspath(os.path.abspath(path)))
        as_abstract = jax.tree_util.tree_map(
            lambda leaf: leaf if isinstance(leaf, jax.ShapeDtypeStruct)
            else jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                      sharding=getattr(leaf, "sharding", None)),
            target)
        # item=as_abstract carries the target TREE STRUCTURE too: orbax
        # stores custom nodes (e.g. optax NamedTuple states) as lists, and
        # only an item tree maps them back onto the original structure
        return ckptr.restore(
            os.fspath(os.path.abspath(path)),
            args=ocp.args.PyTreeRestore(
                item=as_abstract,
                restore_args=ocp.checkpoint_utils.construct_restore_args(
                    as_abstract)),
        )
