"""Checkpoint/resume for long DELTA_S sweeps.

The reference has no persistence at all: a failed search exits the process
and every result lives in memory (SURVEY.md 5.3-5.4).  Here chunked sweeps
write each finished chunk of per-candidate metrics to an .npz next to a
small JSON manifest; an interrupted search resumes at the first unfinished
chunk.  Plain numpy archives keep this dependency-free and
inspectable; the arrays are tiny (one scalar per candidate).
"""
from __future__ import annotations

import json
import os
import tempfile

import numpy as np


class SweepCheckpoint:
    """Append-only store of per-chunk sweep metrics keyed by chunk index."""

    def __init__(self, path: str, *, meta: dict | None = None):
        self.path = path
        self._meta_path = path + ".json"
        self._chunks: dict[int, dict[str, np.ndarray]] = {}
        self.meta = dict(meta or {})
        if os.path.exists(self.path):
            with np.load(self.path, allow_pickle=False) as z:
                for key in z.files:
                    idx_s, name = key.split("/", 1)
                    self._chunks.setdefault(int(idx_s), {})[name] = z[key]
            if os.path.exists(self._meta_path):
                with open(self._meta_path) as f:
                    stored = json.load(f)
                if meta is not None and stored != self.meta:
                    raise ValueError(
                        f"checkpoint {path} belongs to a different sweep: "
                        f"{stored} != {self.meta}")
                self.meta = stored

    def has_chunk(self, idx: int) -> bool:
        return idx in self._chunks

    def chunk(self, idx: int) -> dict[str, np.ndarray]:
        return self._chunks[idx]

    def add_chunk(self, idx: int, metrics: dict[str, np.ndarray]) -> None:
        self._chunks[idx] = {k: np.asarray(v) for k, v in metrics.items()}
        self._flush()

    def _flush(self) -> None:
        flat = {f"{i}/{k}": v for i, m in self._chunks.items()
                for k, v in m.items()}
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        # suffix must end in .npz or np.savez silently writes elsewhere
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        try:
            np.savez(tmp, **flat)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f)

    def assembled(self, n_chunks: int) -> dict[str, np.ndarray] | None:
        """Concatenated metrics if every chunk is present, else None."""
        if any(i not in self._chunks for i in range(n_chunks)):
            return None
        keys = self._chunks[0].keys()
        return {k: np.concatenate([self._chunks[i][k] for i in range(n_chunks)])
                for k in keys}


class TraceCheckpoint:
    """Checkpoint/resume for long segmented TRACES (SURVEY.md 5.3-5.4).

    Stores the full resumable integration state (the exact segment-kernel
    carry: positions, Kahan compensations, tangent/angle, accumulators,
    masks) plus the applied step count, atomically, so a multi-hour run
    survives preemption and resumes bit-identically.  Same .npz + JSON
    manifest conventions as :class:`SweepCheckpoint`.
    """

    def __init__(self, path: str, *, meta: dict | None = None):
        self.path = path
        self._meta_path = path + ".json"
        self.meta = dict(meta or {})
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                stored = json.load(f)
            if meta is not None and stored != self.meta:
                raise ValueError(
                    f"checkpoint {path} belongs to a different trace: "
                    f"{stored} != {self.meta}")
            self.meta = stored

    def load(self):
        """(state_arrays, done_steps) from disk, or None if absent."""
        if not os.path.exists(self.path):
            return None
        with np.load(self.path, allow_pickle=False) as z:
            done = int(z["done_steps"])
            n = int(z["n_state"])
            state = [z[f"s{i}"] for i in range(n)]
        return state, done

    def save(self, state_arrays, done_steps: int) -> None:
        d = os.path.dirname(os.path.abspath(self.path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        try:
            np.savez(tmp, done_steps=np.int64(done_steps),
                     n_state=np.int64(len(state_arrays)),
                     **{f"s{i}": np.asarray(a)
                        for i, a in enumerate(state_arrays)})
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        with open(self._meta_path, "w") as f:
            json.dump(self.meta, f)
