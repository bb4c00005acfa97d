"""Sharded, resumable result store for large solve sweeps.

The reference persists one monolithic npz per sweep with no resume — a
crashed 200-config run starts over (SURVEY.md §5, main_mpc.py:130-135).
Here results are written as fixed-size chunk shards with a JSON manifest;
re-running a sweep skips completed chunks (idempotent resume), and under
multi-host each process writes only its own shard files.

Layout:
    <root>/manifest.json                  {"chunks": {"0": "chunk_00000.npz", ...}}
    <root>/chunk_00000.npz                arrays for configs [0, chunk)
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class ResultStore:
    def __init__(self, root: str, meta: Optional[dict] = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)
            if meta and self._manifest.get("meta") not in (None, meta):
                raise ValueError(
                    f"store at {root} was created with different meta "
                    f"({self._manifest.get('meta')} != {meta}); refusing to mix")
        else:
            self._manifest = {"meta": meta or {}, "chunks": {}}
            self._flush_manifest()

    def _flush_manifest(self) -> None:
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._manifest, f, indent=1)
        os.replace(tmp, self._manifest_path)

    def done_chunks(self) -> List[int]:
        return sorted(int(k) for k in self._manifest["chunks"])

    def is_done(self, chunk_id: int) -> bool:
        return str(chunk_id) in self._manifest["chunks"]

    def write_chunk(self, chunk_id: int, **arrays: np.ndarray) -> None:
        name = f"chunk_{chunk_id:05d}.npz"
        path = os.path.join(self.root, name)
        np.savez(path + ".tmp.npz", **{k: np.asarray(v) for k, v in arrays.items()})
        os.replace(path + ".tmp.npz", path)
        self._manifest["chunks"][str(chunk_id)] = name
        self._flush_manifest()

    def read_chunk(self, chunk_id: int) -> Dict[str, np.ndarray]:
        name = self._manifest["chunks"][str(chunk_id)]
        with np.load(os.path.join(self.root, name)) as z:
            return {k: z[k] for k in z.files}

    def iter_chunks(self) -> Iterator[Tuple[int, Dict[str, np.ndarray]]]:
        for cid in self.done_chunks():
            yield cid, self.read_chunk(cid)

    def concatenated(self) -> Dict[str, np.ndarray]:
        """All chunks stacked along axis 0 (keys must match across chunks)."""
        out: Dict[str, List[np.ndarray]] = {}
        for _, arrays in self.iter_chunks():
            for k, v in arrays.items():
                out.setdefault(k, []).append(v)
        return {k: np.concatenate(v, axis=0) for k, v in out.items()}

    @property
    def meta(self) -> dict:
        return self._manifest["meta"]
