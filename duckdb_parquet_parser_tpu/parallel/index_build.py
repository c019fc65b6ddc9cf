"""Distributed chunked-index build: decode -> boundary plan -> all_to_all
entry shuffle -> per-device chunk ownership (BASELINE configs[4]).

Pipeline (mesh = 1-D 'pages' axis):
  1. per-shard decode yields the (row, len) emission stream (device or host);
  2. chunk boundaries come from the greedy prefix-sum recurrence (exact
     reference semantics, ops/index.py) — O(#chunks log n) on the host;
  3. chunk -> device ownership balances BYTES greedily (skew handling: a few
     hot chunks spread across devices instead of piling on one);
  4. entries exchange to their owners with the padded all_to_all
     (capacity planned from true counts; see parallel/shuffle.py);
  5. owners hold (row, len, chunk) triples for their chunks — chunk text
     materializes on demand via ChunkedIndex.materialize_chunk.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..host.reader import _string_stream
from ..ops.index import ChunkedIndex, build_index
from .shuffle import ExchangePlan, balanced_chunk_owners


@dataclass
class DistributedIndexResult:
    index: ChunkedIndex
    chunk_owners: np.ndarray          # [num_chunks] device id
    received: list[np.ndarray]        # per device: [k, 3] (row, len, chunk)
    shuffle_bytes: int                # payload bytes moved by the exchange
    skew_factor: float                # max/mean device load (bytes)


def distributed_index_build(mesh, reader, column: str,
                            chunk_size: int = 4096) -> DistributedIndexResult:
    from .pipeline import exchange_entries

    n_devices = int(np.prod(list(mesh.shape.values())))
    batch = reader.prescan(column)
    pos, lens, _offs, _chars = _string_stream(batch)
    index = build_index(pos, lens, reader.num_rows(), chunk_size)

    chunk_bytes = np.diff(np.concatenate([index.chunk_starts, [len(lens)]]))
    owners = balanced_chunk_owners(chunk_bytes, n_devices)

    dst = owners[index.chunk_of_entry]
    src = (np.arange(len(dst)) * n_devices) // max(len(dst), 1)
    plan = ExchangePlan.plan(dst, src, n_devices)
    payload = np.stack(
        [pos, lens, index.chunk_of_entry], axis=1
    ).astype(np.int64)
    send = plan.build_send_buffer(payload, src, fill=-1)
    recv = exchange_entries(mesh, send).reshape(n_devices, -1, 3)

    received = []
    for d in range(n_devices):
        rows = recv[d]
        received.append(rows[rows[:, 0] >= 0])

    loads = np.zeros(n_devices, np.int64)
    np.add.at(loads, owners, chunk_bytes.astype(np.int64))
    mean = loads.mean() if loads.size else 0.0
    return DistributedIndexResult(
        index=index,
        chunk_owners=owners,
        received=received,
        shuffle_bytes=int(send.nbytes),
        skew_factor=float(loads.max() / mean) if mean else 1.0,
    )
