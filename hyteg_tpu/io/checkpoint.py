"""Checkpoint / restore of DoF functions with level-aware restoration.

Reference: src/hyteg/checkpointrestore/ADIOS2/AdiosCheckpointExporter.hpp:
51-239 (register functions over level ranges, one-shot + continuous
timestep-series checkpoints with user attributes; importer restores per
level and can restore-then-prolongate to a finer level). Here checkpoints
are compressed .npz archives keyed ``<name>/level<L>`` plus a JSON header;
restore_prolongated reuses the grid-transfer operators.
"""

from __future__ import annotations

import json
import os

import numpy as np


FORMAT_VERSION = 1


class CheckpointExporter:
    def __init__(self):
        self._entries = {}  # (name, level) -> array
        self._attrs = {}

    def register(self, name: str, level: int, cells_array) -> None:
        self._entries[(name, level)] = np.asarray(cells_array)

    def add_attribute(self, key: str, value) -> None:
        self._attrs[key] = value

    def store(self, directory: str, basename: str, timestep: int | None = None):
        os.makedirs(directory, exist_ok=True)
        suffix = f"_ts{timestep}" if timestep is not None else ""
        path = os.path.join(directory, f"{basename}{suffix}.npz")
        payload = {
            f"{name}/level{level}": arr for (name, level), arr in self._entries.items()
        }
        header = dict(
            version=FORMAT_VERSION,
            attrs=self._attrs,
            entries=[
                dict(name=n, level=l, shape=list(a.shape), dtype=str(a.dtype))
                for (n, l), a in self._entries.items()
            ],
        )
        payload["__header__"] = np.frombuffer(
            json.dumps(header).encode(), dtype=np.uint8
        )
        np.savez_compressed(path, **payload)
        return path


class CheckpointImporter:
    def __init__(self, path: str):
        self._npz = np.load(path)
        self.header = json.loads(bytes(self._npz["__header__"]).decode())
        assert self.header["version"] <= FORMAT_VERSION

    @property
    def attrs(self):
        return self.header["attrs"]

    def levels_of(self, name: str):
        return sorted(
            e["level"] for e in self.header["entries"] if e["name"] == name
        )

    def restore(self, name: str, level: int) -> np.ndarray:
        return self._npz[f"{name}/level{level}"]

    def restore_prolongated(self, name: str, stored_level: int,
                            target_level: int, transfer_factory):
        """Restore at stored_level, then prolongate to target_level using
        transfers from ``transfer_factory(coarse_level)`` (the reference's
        TerraNeo restart-into-finer-level pattern)."""
        import jax.numpy as jnp

        u = jnp.asarray(self.restore(name, stored_level))
        for l in range(stored_level, target_level):
            u = transfer_factory(l).prolongate(u)
        return u
