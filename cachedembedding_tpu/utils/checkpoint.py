"""Checkpoint / resume.

The reference persists nothing but the id-frequency map (SURVEY.md §5;
/root/reference/recsys/datasets/criteo.py:461-486) — a gap this framework closes.
A checkpoint directory holds:

  meta.json          — step counter, config repr, format version
  dense_params.npz   — the DLRM/DeepFM tower weights (flat pytree paths)
  host_table.npy     — the FLUSHED master embedding table (cache coherency is
                       guaranteed by CachedEmbeddingBag.flush() before save);
                       for VirtualHostTable only the overlay (written rows) is
                       stored as overlay.npz, so checkpoints stay proportional
                       to touched rows even for 90+ GB logical tables.

Loading restores the host table and dense params; the HBM cache re-warms from
the id-frequency map exactly as at cold start (cache contents are derived
state, not checkpoint state).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np

FORMAT_VERSION = 1


def _flatten(params) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path)
        arr = flat[key]
        assert arr.shape == leaf.shape, f"{key}: {arr.shape} != {leaf.shape}"
        leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, trainer, extra: Dict[str, Any] | None = None) -> None:
    """Save a CachedDLRMTrainer (or anything with .dense_params/.embed/._step_idx).

    Multi-process (column-wise mesh over a pod): every controller flushes —
    the replicated host master becomes coherent on each — but only process 0
    WRITES, so checkpointing onto a shared filesystem never races. Per-host
    paths also work (each host would then need its own save call gating
    removed — process 0's files are authoritative either way since the
    master is replicated)."""
    os.makedirs(path, exist_ok=True)
    trainer.embed.flush()
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    np.savez(os.path.join(path, "dense_params.npz"), **_flatten(trainer.dense_params))

    from cachedembedding_tpu.cache.host_table import DenseHostTable, VirtualHostTable

    ht = trainer.embed.host_table
    if isinstance(ht, DenseHostTable):
        np.save(os.path.join(path, "host_table.npy"), ht.array)
        table_kind = "dense"
    elif isinstance(ht, VirtualHostTable):
        rows, vals = _dump_overlay(ht)
        np.savez(os.path.join(path, "overlay.npz"), rows=rows, vals=vals)
        table_kind = "virtual"
    else:
        raise TypeError(f"unknown host table {type(ht)}")

    if getattr(trainer.embed, "host_accum", None) is not None:
        st = trainer.embed.host_accum.save_state()
        if st["kind"] == "dense":
            np.save(os.path.join(path, "accum.npy"), st["arr"])
        else:
            np.savez(os.path.join(path, "accum.npz"), rows=st["rows"], vals=st["vals"])

    meta = {
        "format_version": FORMAT_VERSION,
        "step": getattr(trainer, "_step_idx", 0),
        "optimizer": getattr(trainer.embed, "optimizer", "sgd"),
        "table_kind": table_kind,
        "num_embeddings": trainer.embed.num_embeddings,
        "embedding_dim": trainer.embed.embedding_dim,
    }
    if extra:
        meta.update(extra)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)


def _dump_overlay(ht) -> tuple[np.ndarray, np.ndarray]:
    """Extract written rows from a VirtualHostTable by probing the native hash
    table row-by-row is wasteful; instead re-gather every overlay key. The keys
    aren't exposed, so we track them via the scatter path — see
    VirtualHostTable.written_rows."""
    rows = ht.written_rows()
    vals = ht.gather(rows) if rows.size else np.zeros((0, ht.dim), np.float32)
    return rows, vals


def load_checkpoint(path: str, trainer) -> int:
    """Restore into an already-constructed trainer (shapes must match).
    Returns the step counter."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    assert meta["format_version"] == FORMAT_VERSION
    assert meta["num_embeddings"] == trainer.embed.num_embeddings
    assert meta["embedding_dim"] == trainer.embed.embedding_dim

    flat = dict(np.load(os.path.join(path, "dense_params.npz")))
    trainer.dense_params = _unflatten_like(trainer.dense_params, flat)

    from cachedembedding_tpu.cache.host_table import DenseHostTable, VirtualHostTable

    ht = trainer.embed.host_table
    if meta["table_kind"] == "dense":
        arr = np.load(os.path.join(path, "host_table.npy"), mmap_mode="r")
        assert isinstance(ht, DenseHostTable)
        np.copyto(ht.array, arr)
        if ht.supports_device_init:
            # restored values are arbitrary — no row still holds its init
            ht.mark_all_written()
    else:
        ov = np.load(os.path.join(path, "overlay.npz"))
        assert isinstance(ht, VirtualHostTable)
        if ov["rows"].size:
            ht.scatter(ov["rows"], ov["vals"])

    if getattr(trainer.embed, "host_accum", None) is not None:
        acc_npy = os.path.join(path, "accum.npy")
        acc_npz = os.path.join(path, "accum.npz")
        if os.path.exists(acc_npy):
            np.copyto(trainer.embed.host_accum.arr, np.load(acc_npy, mmap_mode="r"))
        elif os.path.exists(acc_npz):
            z = np.load(acc_npz)
            if z["rows"].size:
                trainer.embed.host_accum.scatter(z["rows"], z["vals"])

    # cache is derived state: re-warm it
    trainer.embed.reset_cache()
    trainer._step_idx = meta["step"]
    return meta["step"]
