"""The sharded scan pipeline: decode + regex match + index exchange as one
jit-compiled SPMD program over a 1-D "pages" mesh.

Everything per-page shards along the mesh axis; dictionaries, the DFA table,
and per-dictionary-entry match bits replicate (they are small by
construction: pages are ~1 KB, dictionaries <= non-null/5 entries).  The only
collectives are a `psum` for global totals and the padded `all_to_all` of the
inverted-index entry exchange — both ride ICI/DCN as XLA chooses.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops import decode as _decode
from ..ops.scan import dfa_match
from .mesh import PAGES_AXIS
from .shuffle import all_to_all_exchange

shard_map = jax.shard_map


def _local_match_counts(core, chars_pm, lens_pm, dict_match, dfa_table,
                        dfa_accept, *, vmax, max_def, negate):
    """Per-page accept counts + totals on the local page shard (pure jnp)."""
    n_local, cap, pitch = chars_pm.shape

    nonnull, nn_idx = _decode.decode_levels(jnp, core, max_def, vmax)
    is_dict = core["page_kind"] == 1

    # PLAIN pages: match the packed per-page entries
    flat_match = dfa_match(
        jnp, chars_pm.reshape(n_local * cap, pitch),
        lens_pm.reshape(n_local * cap), dfa_table, dfa_accept,
    ).reshape(n_local, cap)
    flat_match = flat_match ^ negate
    entry_valid = jnp.arange(cap, dtype=jnp.int32)[None, :] < core["page_nn"][:, None]
    plain_counts = jnp.sum(flat_match & entry_valid, axis=1)

    # dictionary pages: map replicated dict match bits through the idx stream
    dict_idx, ok = _decode.decode_dict_indices(jnp, core, nn_idx, cap)
    dn = dict_match.shape[0]
    g = jnp.clip(core["page_dict_base"][:, None] + jnp.clip(dict_idx, 0, None), 0, dn - 1)
    accept = (jnp.take(dict_match, g) ^ negate) & ok & nonnull
    dict_counts = jnp.sum(accept, axis=1)

    counts = jnp.where(is_dict, dict_counts, plain_counts).astype(jnp.int32)
    values = jnp.where(is_dict, jnp.sum(ok & nonnull, axis=1),
                       core["page_nn"]).astype(jnp.int32)
    totals = jax.lax.psum(
        jnp.stack([jnp.sum(counts), jnp.sum(values)]), PAGES_AXIS
    )
    return counts, values, totals


@functools.partial(jax.jit,
                   static_argnames=("mesh", "vmax", "max_def", "negate"))
def _scan_step(mesh, core, chars_pm, lens_pm, dict_match, dfa_table,
               dfa_accept, *, vmax, max_def, negate):
    spec_pages = {k: P(PAGES_AXIS) for k in core}
    fn = shard_map(
        functools.partial(_local_match_counts, vmax=vmax, max_def=max_def,
                          negate=negate),
        mesh=mesh,
        in_specs=(spec_pages, P(PAGES_AXIS), P(PAGES_AXIS), P(), P(), P()),
        out_specs=(P(PAGES_AXIS), P(PAGES_AXIS), P()),
        check_vma=False,
    )
    return fn(core, chars_pm, lens_pm, dict_match, dfa_table, dfa_accept)


@dataclass
class DistributedScanResult:
    page_gid: np.ndarray
    match_counts: np.ndarray
    value_counts: np.ndarray
    totals: np.ndarray  # [2] global (matches, values) via psum

    def pruned_pages(self) -> np.ndarray:
        keep = self.page_gid >= 0
        return self.page_gid[keep & (self.match_counts == 0)]

    def surviving_pages(self) -> np.ndarray:
        keep = self.page_gid >= 0
        return self.page_gid[keep & (self.match_counts > 0)]


def core_arrays(batch) -> dict:
    return {k: batch.arrays[k] for k in _decode.DECODE_ARRAYS if k in batch.arrays}


def distributed_scan(mesh, batch, dfa, *, negate: bool = False,
                     chars_pm=None, lens_pm=None) -> DistributedScanResult:
    """Runs the regex page-pruning scan sharded over `mesh`.

    `batch` must be page-padded to a multiple of the device count
    (parallel.partition.pad_pages) and prescanned with pad_strings > 0.
    """
    from .partition import strings_page_major

    if chars_pm is None:
        chars_pm, lens_pm = strings_page_major(batch)

    # replicated dictionary match bits
    if int(batch.dims.get("dict_n", 0)) > 0 and "dict_padded" in batch.arrays:
        dict_match = np.asarray(
            dfa_match(np, batch.arrays["dict_padded"], batch.arrays["dict_lens"],
                      dfa.table, dfa.accept)
        )
    else:
        dict_match = np.zeros(1, bool)

    core = {k: jnp.asarray(v) for k, v in core_arrays(batch).items()}
    counts, values, totals = _scan_step(
        mesh, core, jnp.asarray(chars_pm), jnp.asarray(lens_pm),
        jnp.asarray(dict_match), jnp.asarray(dfa.table),
        jnp.asarray(dfa.accept),
        vmax=batch.vmax, max_def=batch.max_def, negate=negate,
    )
    return DistributedScanResult(
        page_gid=batch.arrays["page_gid"].copy(),
        match_counts=np.asarray(counts, np.int64),
        value_counts=np.asarray(values, np.int64),
        totals=np.asarray(totals, np.int64),
    )


# ── index entry exchange ─────────────────────────────────────────────────────


@functools.partial(jax.jit, static_argnames=("mesh",))
def _exchange_step(mesh, send):
    fn = shard_map(
        all_to_all_exchange,
        mesh=mesh,
        in_specs=P(PAGES_AXIS),
        out_specs=P(PAGES_AXIS),
        check_vma=False,
    )
    return fn(send)


def exchange_entries(mesh, send_buffer: np.ndarray) -> np.ndarray:
    """Runs the padded all_to_all: send_buffer [D, D, cap, ...] (src-major)
    -> received [D*D*cap? see shuffle.all_to_all_exchange] rows per dest."""
    out = _exchange_step(mesh, jnp.asarray(send_buffer))
    return np.asarray(out)
