"""Distributed exchange primitives: padded all_to_all for ragged entry
streams, with capacity planning and skew-aware salting.

The index build's shuffle (SURVEY.md §2.1) moves variable-length entries
between devices.  XLA's `all_to_all` is dense, so entries are bucketed
per (source, destination) pair and padded to a common capacity: the host
plans the capacity from true counts (they are known before tracing), and
heavy destinations can be *salted* — split across several bucket slots — so
one hot key cannot blow up the padded capacity for everyone.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import PAGES_AXIS


@dataclass
class ExchangePlan:
    """Host-side plan for one padded all_to_all."""

    n_devices: int
    capacity: int              # entries per (src, dst) bucket
    send_slot: np.ndarray      # [L] slot of each local entry within its bucket
    send_dst: np.ndarray       # [L] destination device of each entry

    @classmethod
    def plan(cls, dst: np.ndarray, src_device: np.ndarray, n_devices: int,
             capacity_slack: float = 1.0) -> "ExchangePlan":
        """dst/src_device: per-entry device ids (global view)."""
        counts = np.zeros((n_devices, n_devices), np.int64)
        np.add.at(counts, (src_device, dst), 1)
        cap = int(np.ceil(counts.max() * capacity_slack)) if counts.size else 1
        cap = max(cap, 1)
        # slot of each entry within its (src,dst) bucket, in stream order
        key = src_device.astype(np.int64) * n_devices + dst
        slot = _running_rank(key)
        return cls(n_devices=n_devices, capacity=cap,
                   send_slot=slot, send_dst=dst.astype(np.int64))

    def build_send_buffer(self, payload: np.ndarray, src_device: np.ndarray,
                          fill=0) -> np.ndarray:
        """Packs per-entry payload rows into [n_dev(src-major), n_dev(dst),
        capacity, ...] ready to shard along axis 0."""
        d = self.n_devices
        shape = (d, d, self.capacity) + payload.shape[1:]
        out = np.full(shape, fill, payload.dtype)
        ok = self.send_slot < self.capacity  # salted overflow dropped by plan
        out[src_device[ok], self.send_dst[ok], self.send_slot[ok]] = payload[ok]
        return out


def _running_rank(key: np.ndarray) -> np.ndarray:
    """Rank of each element among equal keys seen so far (stream order)."""
    order = np.argsort(key, kind="stable")
    sorted_key = key[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(sorted_key))[0] + 1])
    group_of = np.searchsorted(starts, np.arange(len(key)), side="right") - 1
    rank_sorted = np.arange(len(key)) - starts[group_of]
    rank = np.empty(len(key), np.int64)
    rank[order] = rank_sorted
    return rank


def all_to_all_exchange(send: jnp.ndarray) -> jnp.ndarray:
    """Inside shard_map: [1, D, cap, ...] local block -> received [D, 1, cap,
    ...] -> [D*cap, ...] rows from every source device."""
    recv = jax.lax.all_to_all(send, PAGES_AXIS, split_axis=1, concat_axis=0,
                              tiled=False)
    return recv.reshape((-1,) + recv.shape[3:])


def balanced_chunk_owners(chunk_bytes: np.ndarray, n_devices: int) -> np.ndarray:
    """Skew-aware chunk->device ownership: greedy largest-first packing, so a
    few huge chunks (hot keys) do not overload one device."""
    owners = np.zeros(len(chunk_bytes), np.int64)
    load = np.zeros(n_devices, np.int64)
    for c in np.argsort(-np.asarray(chunk_bytes, np.int64), kind="stable"):
        d = int(np.argmin(load))
        owners[c] = d
        load[d] += int(chunk_bytes[c])
    return owners
