"""Checkpoint/resume of streaming decoder state.

The reference has no checkpointing (a crash loses in-flight frames,
SURVEY.md section 5); here the entire decoder is a small explicit carry
pytree (FIR history + DPLL phase + HDLC state + shift register), so a
snapshot is exact: resuming from (carry, input offset) reproduces the
remaining output bit-for-bit.

Format: .npz of flattened carry leaves + a JSON-encoded treedef/meta
blob, no framework dependencies.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import numpy as np

from gnuais_tpu.runtime.pipeline import BatchPipeline, PipelineCarry, init_carry


def save_carry(path: Union[str, Path], carry: PipelineCarry,
               meta: Optional[Dict[str, Any]] = None) -> None:
    leaves = jax.tree.leaves(carry)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(str(path), **arrays)


def load_carry(path: Union[str, Path], n_streams: int
               ) -> Tuple[PipelineCarry, Dict[str, Any]]:
    data = np.load(str(path))
    template = init_carry(n_streams)
    leaves, treedef = jax.tree.flatten(template)
    loaded = []
    for i, tmpl in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != tuple(tmpl.shape):
            raise ValueError(
                f"carry leaf {i} shape {arr.shape} != expected {tmpl.shape}"
                f" (checkpoint taken with different stream count?)")
        loaded.append(arr.astype(np.asarray(tmpl).dtype))
    meta = json.loads(bytes(data["__meta__"]).decode()) if "__meta__" in data else {}
    return jax.tree.unflatten(treedef, loaded), meta


def save_pipeline(path: Union[str, Path], pipe: BatchPipeline,
                  samples_consumed: int,
                  extra: Optional[Dict[str, Any]] = None) -> None:
    meta = {
        "samples_consumed": samples_consumed,
        "n_streams": pipe.n_streams,
        "block_len": pipe.block_len,
        "counters": [(c.receivedframes, c.lostframes, c.lostframes2)
                     for c in pipe.counters],
        "extra": extra or {},
    }
    save_carry(path, pipe.carry, meta)


def restore_pipeline(path: Union[str, Path], pipe: BatchPipeline
                     ) -> Tuple[int, Dict[str, Any]]:
    """Restores carry + counters into ``pipe``; returns (input offset to
    resume from, the saver's ``extra`` metadata — e.g. downstream
    dispatcher state like the NMEA seqnr)."""
    carry, meta = load_carry(path, pipe.n_streams)
    pipe.carry = carry
    for c, (r, l, l2) in zip(pipe.counters, meta.get("counters", [])):
        c.receivedframes, c.lostframes, c.lostframes2 = r, l, l2
    return int(meta.get("samples_consumed", 0)), meta.get("extra", {})
