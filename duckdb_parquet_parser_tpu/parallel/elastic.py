"""Elastic recovery for the scan fleet.

Scan jobs are stateless (decode + match over immutable page shards), so
"failure recovery" is pure re-assignment: when a device/host drops out, its
page shard re-partitions across survivors and those batches re-run — no
training state, no checkpoint of in-flight work (SURVEY.md §5).  The
inverted-index build, the only long-running stateful op, checkpoints via
utils.checkpoints.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .partition import PageAssignment, assign_balanced


@dataclass
class FleetState:
    """Tracks device liveness + page ownership across failures."""

    weights: np.ndarray                 # [N] per-page cost (bytes)
    n_devices: int
    failed: set = field(default_factory=set)
    assignment: PageAssignment | None = None

    def __post_init__(self):
        if self.assignment is None:
            self.assignment = assign_balanced(self.weights, self.n_devices)

    @property
    def live_devices(self) -> list[int]:
        return [d for d in range(self.n_devices) if d not in self.failed]

    def mark_failed(self, device: int) -> np.ndarray:
        """Marks a device dead; returns the page ids needing re-run.

        The orphaned pages re-partition over the remaining devices balanced
        by weight; ownership of unaffected pages is preserved (idempotent
        scan tasks mean only the orphans re-execute).
        """
        if device in self.failed:
            return np.zeros(0, np.int64)
        self.failed.add(device)
        live = self.live_devices
        if not live:
            raise RuntimeError("all devices failed")
        orphans = np.nonzero(self.assignment.device_of == device)[0]
        if len(orphans):
            sub = assign_balanced(self.weights[orphans], len(live))
            remap = np.array(live, np.int64)
            self.assignment.device_of[orphans] = remap[sub.device_of]
            self.assignment.order = np.argsort(
                self.assignment.device_of, kind="stable"
            )
        return orphans

    def loads(self) -> np.ndarray:
        out = np.zeros(self.n_devices, np.int64)
        np.add.at(out, self.assignment.device_of, self.weights.astype(np.int64))
        return out
