"""Checkpoint / resume.

The reference only ever *saves* — periodic `torch.save` of actor/critic
state dicts (reference: src/train.py:206-219) — and cannot resume
(train.py:135-137 asserts the work dir does not exist; optimizer state,
replay buffer, and RNG are never persisted — SURVEY §5). Here checkpoints
are full-state orbax saves: agent params + optimizer states + RNG + step
(+ optionally the replay buffer), with true resume.
"""

from __future__ import annotations

import json
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


def _merge_raw(raw: Any, like: Any) -> Any:
    """Merge a template-free orbax restore (`raw`: nested dicts/lists) onto
    `like` by key path. Fields of `like` that do not exist on disk keep
    their `like` value — so a checkpoint written before a state dataclass
    gained a field restores cleanly with the new field at its init value
    (forward compatibility; measured failure: runs/flag_r2c's 225k resume
    rejected after AgentState gained `gate_cooldown`)."""
    missing = []

    def lookup(path):
        node = raw
        for p in path:
            if isinstance(p, jax.tree_util.GetAttrKey):
                key = p.name
            elif isinstance(p, jax.tree_util.DictKey):
                key = p.key
            elif isinstance(p, jax.tree_util.SequenceKey):
                key = p.idx
            elif isinstance(p, jax.tree_util.FlattenedIndexKey):
                key = p.key
            else:  # pragma: no cover — unknown key kind
                raise KeyError(repr(p))
            if isinstance(node, dict):
                if key in node:
                    node = node[key]
                elif str(key) in node:
                    node = node[str(key)]
                else:
                    raise KeyError(str(key))
            elif isinstance(node, (list, tuple)):
                node = node[int(key)]
            else:
                raise KeyError(str(key))
        return node

    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    out = []
    for path, leaf in flat:
        try:
            out.append(lookup(path))
        except (KeyError, IndexError, TypeError, ValueError):
            missing.append(jax.tree_util.keystr(path))
            out.append(leaf)
    if missing:
        print("checkpoint predates fields (restored at init value): "
              + ", ".join(missing[:8])
              + (f" (+{len(missing) - 8} more)" if len(missing) > 8 else ""))
    return jax.tree_util.tree_unflatten(treedef, out)


def restore(path: str, step: int, like: Any) -> Optional[Any]:
    """Restore the tree saved at path/<step>/, shaped like `like`."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        target = os.path.join(path, str(step))
        if not os.path.exists(target):
            return None
        ckpt = ocp.PyTreeCheckpointer()
        try:
            restored = ckpt.restore(target, item=_np_tree(like))
        except Exception:  # structure drift (a checkpoint written before a
            # state dataclass gained/lost a field): fall back to a
            # template-free restore merged onto `like` by key path
            try:
                restored = _merge_raw(ckpt.restore(target), _np_tree(like))
            except Exception as e:
                print(f"checkpoint restore failed for {target}: {e}")
                return None

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
    try:
        return jax.tree_util.tree_unflatten(
            treedef, [data[str(i)] for i in range(len(flat))])
    except KeyError as e:
        print(f"checkpoint restore failed for {f}: {e}")
        return None


def record_health(path: str, step: int, ep_reward: float, reward_ema: float):
    """Sidecar health record for the collapse guard (train/loop.py).

    Measured failure mode (runs/flag_r2, docs/PERF.md): a collapse landed on
    the save_freq boundary, the periodic checkpoint captured the mid-collapse
    agent, and every subsequent guard rollback restored the poisoned state
    until the rollback budget was exhausted. Recording the reward level at
    save time lets the guard skip unhealthy checkpoints."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "health.jsonl"), "a") as f:
        f.write(json.dumps({"step": int(step), "ep_reward": float(ep_reward),
                            "reward_ema": float(reward_ema)}) + "\n")


def healthy_step(path: str, best_ema: float,
                 frac: float = 0.5) -> Optional[int]:
    """Newest saved step whose recorded health clears frac × best_ema.

    Health = min(instantaneous episode reward, reward EMA) at save time —
    the instantaneous term catches a save that lands ON the collapse chunk
    (the EMA still reads ~0.9× best there). Steps with no record (legacy
    runs) count as healthy so old work dirs keep the pre-health behavior."""
    if not os.path.isdir(path):
        return None
    health = {}
    f = os.path.join(path, "health.jsonl")
    if os.path.exists(f):
        for line in open(f):
            try:
                d = json.loads(line)
                health[int(d["step"])] = min(float(d["ep_reward"]),
                                             float(d["reward_ema"]))
            except (ValueError, KeyError):
                continue
    steps = sorted({int(n.split(".")[0]) for n in os.listdir(path)
                    if n.split(".")[0].isdigit()}, reverse=True)
    for s in steps:
        if s not in health or health[s] >= frac * best_ema:
            return s
    return None


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        base = name.split(".")[0]
        if base.isdigit():
            steps.append(int(base))
    return max(steps) if steps else None
