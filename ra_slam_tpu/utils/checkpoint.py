"""Checkpoint / resume.

The reference has no unified checkpointing (SURVEY.md §5.4): it saves
the OpenVSLAM map database (`save_map_database`), trajectories, and
binary reconstruction dumps, and "resumes" by re-fusing logged folders.
Here every subsystem state is a pytree with static shapes, so one
generic npz round-trip covers the whole system: the voxel map, the
sparse SLAM state (tracker + keyframes + landmarks), and the pose-graph
edges — true stop/resume, not just export.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _named_leaves(tree: Any):
    """(name, leaf) pairs where the name is the pytree key path — stable
    across reorderings/insertions of sibling fields, unlike a positional
    index. NOTE: capacities (array shapes) are part of the checkpoint
    contract: a checkpoint only loads into a system constructed with the
    same config (max_frames, max_keyframes, pool sizes, ...)."""
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in paths]


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays/scalars as an npz keyed by key path."""
    np.savez_compressed(
        path, **{name: np.asarray(v) for name, v in _named_leaves(tree)}
    )


def load_pytree(path: str, template: Any) -> Any:
    """Load an npz produced by `save_pytree` into `template`'s structure.

    Leaves are matched by key-path name (legacy positional `leaf_{i}`
    checkpoints still load); shapes/dtypes must match the template
    (same configs on both sides).
    """
    data = np.load(path)
    named = _named_leaves(template)
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for i, (name, t) in enumerate(named):
        key = name if name in data else f"leaf_{i}"
        if key not in data:
            raise KeyError(
                f"checkpoint {path} has no entry for leaf {name!r} "
                f"(saved by an incompatible version?)"
            )
        arr = data[key]
        t_arr = np.asarray(t)
        if arr.shape != t_arr.shape:
            raise ValueError(
                f"leaf {name}: checkpoint shape {arr.shape} != template "
                f"{t_arr.shape} (different config?)"
            )
        leaves.append(jnp.asarray(arr.astype(t_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_system(ckpt_dir: str, system) -> None:
    """Checkpoint a `RaSlamSystem`: voxel map + SLAM state + pose graph
    + host counters."""
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree(os.path.join(ckpt_dir, "map.npz"), system.map)
    meta = {"num_integrated": system.num_integrated}
    if system.slam is not None:
        # SlamState is self-contained: tracker + keyframes + pose-graph
        # edges + counters + per-frame matched statistics
        save_pytree(os.path.join(ckpt_dir, "slam.npz"), system.slam.state)
        meta["frames"] = system.slam._frames
        # pose buffer entries (timestamp -> pose)
        buf = system.slam.pose_buffer
        meta["pose_buffer"] = [
            (t, np.asarray(p.R).tolist(), np.asarray(p.t).tolist())
            for t, p in buf.entries()
        ]
    np.savez_compressed(
        os.path.join(ckpt_dir, "meta.npz"),
        meta=np.array([repr(meta)], dtype=object),
    )


def load_system(ckpt_dir: str, system) -> None:
    """Restore a checkpoint into a freshly-constructed `RaSlamSystem`
    (same configs). Mutates `system` in place."""
    from ast import literal_eval

    from ra_slam_tpu.core.se3 import SE3

    system.map = load_pytree(os.path.join(ckpt_dir, "map.npz"), system.map)
    meta = literal_eval(
        str(np.load(os.path.join(ckpt_dir, "meta.npz"),
                    allow_pickle=True)["meta"][0])
    )
    system.num_integrated = meta["num_integrated"]
    if system.slam is not None and os.path.exists(
        os.path.join(ckpt_dir, "slam.npz")
    ):
        system.slam.state = load_pytree(
            os.path.join(ckpt_dir, "slam.npz"), system.slam.state
        )
        system.slam._frames = [tuple(f) for f in meta["frames"]]
        for t, R, tr in meta.get("pose_buffer", []):
            system.slam.pose_buffer.register(
                t, SE3(jnp.asarray(R, jnp.float32), jnp.asarray(tr, jnp.float32))
            )
