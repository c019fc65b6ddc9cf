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


def elastic_distributed_scan(mesh, batch, dfa, *, negate: bool = False,
                             fleet: FleetState | None = None,
                             fault_hook=None, max_rounds: int | None = None):
    """Failure-detecting distributed scan: run sharded, DETECT failed
    devices, re-run only the orphaned page shards on the survivors, merge.

    `batch` must be padded + device-major ordered (device d owns the
    contiguous page rows [d*pp, (d+1)*pp)) — the layout ScanEngine.scan
    produces.  `fault_hook(result, round) -> iterable of failed device ids`
    is the detection seam: production detection is a device health probe or
    the XLA error surfacing as an exception; tests inject failures through
    it.  Orphan re-runs are bit-identical to the original shards (scan
    tasks are stateless — SURVEY.md §5), so the merged result equals a
    clean run.

    Returns (result, report) where report = {"failed": [...], "rounds": k,
    "reruns": pages re-executed}.
    """
    from .mesh import survivor_mesh
    from .partition import pad_pages, take_pages
    from .pipeline import distributed_scan

    n_dev = int(np.prod(list(mesh.shape.values())))
    pp = batch.n_pages // n_dev
    if fleet is None:
        weights = batch.arrays["page_payload_len"].astype(np.int64)
        fleet = FleetState(
            weights=weights, n_devices=n_dev,
            assignment=PageAssignment(
                order=np.arange(batch.n_pages),
                device_of=np.arange(batch.n_pages) // pp,
            ),
        )

    result = distributed_scan(mesh, batch, dfa, negate=negate)
    report = {"failed": [], "rounds": 0, "reruns": 0}
    rnd = 0
    while fault_hook is not None:
        if max_rounds is not None and rnd >= max_rounds:
            break
        failed = set(map(int, fault_hook(result, rnd))) - set(report["failed"])
        if not failed:
            break
        rnd += 1
        report["rounds"] = rnd
        orphan_parts = []
        for d in sorted(failed):
            report["failed"].append(d)
            orphan_parts.append(fleet.mark_failed(d))
        orphans = np.concatenate(orphan_parts) if orphan_parts else np.zeros(0, np.int64)
        # drop empty pad pages from the re-run (they contribute nothing)
        orphans = orphans[batch.arrays["page_num_values"][orphans] > 0]
        if not len(orphans):
            continue
        report["reruns"] += int(len(orphans))
        live = fleet.live_devices
        sub = pad_pages(take_pages(batch, orphans), len(live))
        sub_res = distributed_scan(survivor_mesh(mesh, live), sub, dfa,
                                   negate=negate)
        result.match_counts[orphans] = sub_res.match_counts[:len(orphans)]
        result.value_counts[orphans] = sub_res.value_counts[:len(orphans)]
        keep = result.page_gid >= 0
        result.totals = np.array(
            [int(result.match_counts[keep].sum()),
             int(result.value_counts[keep].sum())], np.int64)
    return result, report
