"""Checkpoint / resume.

The reference only ever *saves* — periodic `torch.save` of actor/critic
state dicts (reference: src/train.py:206-219) — and cannot resume
(train.py:135-137 asserts the work dir does not exist; optimizer state,
replay buffer, and RNG are never persisted — SURVEY §5). Here checkpoints
are full-state orbax saves: agent params + optimizer states + RNG + step
(+ optionally the replay buffer), with true resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def _np_tree(tree):
    """Host-copy a pytree. Zero-size leaves (e.g. a contact-force array for a
    contactless model) are replaced with a 1-element placeholder — orbax
    refuses zero-size arrays — and reconstructed from `like` at restore."""
    def conv(x):
        a = np.asarray(x)
        if a.size == 0:
            return np.zeros((1,), np.float32)
        return a

    return jax.tree_util.tree_map(conv, tree)


def save(path: str, tree: Any, step: int):
    """Save `tree` under path/<step>/."""
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    if _HAVE_ORBAX:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.join(path, str(step)), _np_tree(tree), force=True)
    else:  # plain numpy fallback
        flat, treedef = jax.tree_util.tree_flatten(tree)
        np.savez(os.path.join(path, f"{step}.npz"),
                 **{str(i): np.asarray(x) for i, x in enumerate(flat)})


def restore(path: str, step: int, like: Any) -> Optional[Any]:
    """Restore the tree saved at path/<step>/, shaped like `like`."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        target = os.path.join(path, str(step))
        if not os.path.exists(target):
            return None
        ckpt = ocp.PyTreeCheckpointer()
        restored = ckpt.restore(target, item=_np_tree(like))

        def back(l, r):
            la = np.asarray(l)
            if la.size == 0:  # placeholder round-trip (see _np_tree)
                return la
            return np.asarray(r).astype(la.dtype)

        return jax.tree_util.tree_map(back, like, restored)
    f = os.path.join(path, f"{step}.npz")
    if not os.path.exists(f):
        return None
    data = np.load(f)
    flat, treedef = jax.tree_util.tree_flatten(like)
    return jax.tree_util.tree_unflatten(
        treedef, [data[str(i)] for i in range(len(flat))])


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        base = name.split(".")[0]
        if base.isdigit():
            steps.append(int(base))
    return max(steps) if steps else None
