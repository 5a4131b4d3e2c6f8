"""Full train-state checkpoint / resume via Orbax.

The reference checkpoints model weights only, acknowledging the gap
("todo optimizer states", ``configs/trainer.yaml:11``) — a crash loses the
optimizer and schedule. Here the whole train state (step, params, opt_state)
round-trips, enabling true mid-run resume (SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


# One CheckpointManager per directory, kept alive so async saves can
# drain in the background across save_every boundaries.
_MANAGERS: dict = {}


def _cached_manager_stale(d: str, mgr) -> bool:
    """A cached manager goes stale when its directory was deleted (or
    deleted and recreated by a fresh run to the same path — common in
    notebooks and parametrized tests) or when a step it believes committed
    vanished from disk: its internal step bookkeeping then garbage-collects
    ghost paths and ``restore`` targets files that no longer exist."""
    if not os.path.isdir(d):
        return True
    try:
        step = mgr.latest_step()
    except Exception:
        return True
    return step is not None and not os.path.isdir(os.path.join(d, str(step)))


def _manager(directory: str):
    import orbax.checkpoint as ocp

    d = os.path.abspath(directory)
    mgr = _MANAGERS.get(d)
    if mgr is not None and _cached_manager_stale(d, mgr):
        try:
            mgr.close()
        except Exception:
            pass  # the backing dir is gone; pending writes can't commit
        del _MANAGERS[d]
        mgr = None
    if mgr is None:
        mgr = ocp.CheckpointManager(
            d,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=3, create=True, enable_async_checkpointing=True
            ),
        )
        _MANAGERS[d] = mgr
    return mgr


def save_train_state(
    directory: str, step: int, state: Any, wait: bool = False
) -> None:
    """Checkpoint the full train state at ``step``.

    Async by default: Orbax copies the arrays to host memory synchronously
    (safe against the next donated train step reusing the buffers) and
    serializes to disk in a background thread — the train loop resumes
    while the write drains. ``wait=True`` (or ``wait_for_saves``) blocks
    until every pending write is committed; callers MUST wait before the
    process exits or before reading the checkpoint back.
    """
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    # Hand Orbax the live (possibly sharded, possibly non-addressable)
    # arrays: it coordinates per-host shard writes in multi-process runs
    # and snapshots to host before returning in all cases. An explicit
    # jax.device_get here would serialize the whole transfer on the
    # calling thread AND break non-addressable shardings.
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()


def wait_for_saves(directory: Optional[str] = None) -> None:
    """Block until pending async checkpoint writes are committed — for the
    given directory, or every directory this process has saved to."""
    if directory is not None:
        d = os.path.abspath(directory)
        mgr = _MANAGERS.get(d)
        if mgr is not None:
            mgr.wait_until_finished()
        return
    for mgr in _MANAGERS.values():
        mgr.wait_until_finished()


def _overlay(target: Any, restored: Any) -> Any:
    """Match ``restored`` leaves onto ``target`` by tree path: present leaves
    take the saved value cast to the target's dtype, absent/None leaves keep
    the live target value. Makes resume tolerant of schema evolution — e.g.
    checkpoints written before TrainState grew its ``rng`` leaf, or before
    frozen LLM params moved to compute-dtype storage."""
    import numpy as np

    def keystr(path):
        # Canonical path: GetAttrKey(.name) / DictKey(.key) / SequenceKey(.idx)
        # all map to their plain name, so a dataclass field and the dict key
        # it serializes to compare equal.
        parts = []
        for e in path:
            for attr in ("name", "key", "idx"):
                if hasattr(e, attr):
                    parts.append(str(getattr(e, attr)))
                    break
            else:
                parts.append(str(e))
        return "/".join(parts)

    saved = {
        keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(restored)[0]
        if v is not None
    }

    # Quantization-layout changes between save and load: a float kernel
    # restored into an int8 target leaf must be QUANTIZED (the plain dtype
    # cast below would produce unscaled truncation garbage), and an int8
    # kernel restored into a float target must be DEQUANTIZED with its
    # saved scale. Same rules as ops.quant.adapt_quantization (which
    # serves the nested-dict msgpack path), applied to the path-keyed
    # leaf map this overlay matches on; the (de)quantization math itself
    # is shared via quantize_int8/dequantize_int8.
    from llm_bci_tpu.ops.quant import dequantize_int8, quantize_int8

    for path, t in jax.tree_util.tree_flatten_with_path(target)[0]:
        ks = keystr(path)
        if not ks.endswith("/kernel"):
            continue
        v = saved.get(ks)
        if v is None:
            continue
        arr = np.asarray(v)
        t_int8 = np.dtype(getattr(t, "dtype", np.float32)) == np.int8
        if t_int8 and not np.issubdtype(arr.dtype, np.integer):
            q, scale = quantize_int8(arr, axis=0)
            saved[ks], saved[ks + "_scale"] = q, scale
        elif not t_int8 and arr.dtype == np.int8 and ks + "_scale" in saved:
            saved[ks] = dequantize_int8(
                arr, saved[ks + "_scale"], getattr(t, "dtype", np.float32)
            )

    filled: list = []
    mismatched: list = []

    def leaf(path, t):
        v = saved.get(keystr(path))
        if v is None:
            filled.append(keystr(path))
            return t
        arr = np.asarray(v)
        if np.shape(arr) != np.shape(t):
            # e.g. a threefry (2,)-key checkpoint restored into an rbg
            # (4,)-key TrainState after training.rng_impl changed: grafting
            # the wrong-shaped leaf would crash later, far from here, at the
            # first use. Keep the live value and say so.
            mismatched.append(f"{keystr(path)} {np.shape(arr)}->{np.shape(t)}")
            return t
        if hasattr(t, "dtype") and arr.dtype != t.dtype:
            arr = arr.astype(t.dtype)
        return arr

    out = jax.tree_util.tree_map_with_path(leaf, target)
    if filled:
        print(
            "restore_train_state: checkpoint predates parts of the current "
            f"TrainState schema; kept live values for {filled[:5]}"
            f"{'...' if len(filled) > 5 else ''}",
            flush=True,
        )
    if mismatched:
        print(
            "restore_train_state: checkpoint leaf shapes differ from the "
            f"live TrainState; kept live values for {mismatched[:5]}"
            f"{'...' if len(mismatched) > 5 else ''} (expected when "
            "training.rng_impl or the model schema changed between runs)",
            flush=True,
        )
    return out


def restore_train_state(directory: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure/shardings of ``target``; latest step if
    ``step`` is None. Returns (step, state).

    Tolerant of older checkpoint schemas: leaves are matched by tree path;
    matching leaves restore (dtype-cast to the live state), missing ones
    keep their live values."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    mgr.wait_until_finished()  # a save from this process may still be in flight
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"No checkpoints in {directory}")
    if jax.process_count() > 1:
        # Multi-process: restore straight into the live shardings (strict —
        # the single-process schema-tolerant overlay below would need host
        # copies of non-addressable shards, which don't exist).
        import orbax.checkpoint as ocp

        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding")
            else x,
            target,
        )
        return step, mgr.restore(step, args=ocp.args.StandardRestore(abstract))
    host_target = jax.device_get(target)
    try:
        restored = mgr.restore(step, args=ocp.args.StandardRestore(host_target))
    except (ValueError, TypeError, KeyError) as e:
        # Structure/shape mismatch between the saved tree and the live
        # TrainState (schema evolution): fall back to the as-saved tree —
        # nested dicts share the same keystr paths for matching leaves.
        # IO/corruption errors (OSError etc.) still propagate.
        print(
            f"restore_train_state: strict restore failed ({type(e).__name__}: "
            f"{e}); retrying structure-tolerant restore",
            flush=True,
        )
        restored = mgr.restore(step)
    return step, _overlay(host_target, restored)
