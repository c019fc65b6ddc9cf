"""ScanEngine — the engine's end-to-end facade (the "flagship model").

One object that takes a Parquet file and drives the full TPU pipeline:
structural pre-scan (host) -> page batches -> vectorized decode -> regex
page pruning -> chunked inverted index, optionally sharded over a device
mesh with the all_to_all entry exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..host.reader import ParquetReader, _string_stream
from ..ops.index import ChunkedIndex, build_index
from ..ops.regex import DFA, UnsupportedPattern, compile_pattern
from ..ops import scan as _scan_ops
from ..ops.scan import PageMatchResult, scan_batch, scan_batch_fallback
from ..parallel.mesh import make_mesh
from ..parallel.partition import pad_pages
from ..parallel.pipeline import DistributedScanResult, distributed_scan


@dataclass
class IndexBuildResult:
    index: ChunkedIndex
    chunk_owners: np.ndarray | None = None  # device owning each chunk (mesh runs)


class ScanEngine:
    """End-to-end scan engine over one Parquet file.

    mesh=None  -> single-device jit pipeline
    mesh=Mesh  -> pages sharded over the mesh ('pages' axis), collectives for
                  totals and the index entry exchange
    """

    def __init__(self, path: str, mesh=None):
        self.reader = ParquetReader(path)
        self.mesh = mesh

    # ── regex page pruning ──────────────────────────────────────────────────

    def scan(
        self, column: str, pattern: str, *, negate: bool = False,
        like: bool = False, engine: str | None = None,
        fleet=None, fault_hook=None,
    ) -> PageMatchResult | DistributedScanResult:
        from ..host import bindings
        from ..ops.regex import like_to_regex
        from ..ops.scan import scan_batch_device
        from ..utils.config import get_config

        from ..host.schema import ParquetType

        cfg = get_config()
        if engine is None:
            engine = cfg.scan_engine
        info = self.reader.column(column)
        if info.type != ParquetType.BYTE_ARRAY:
            raise TypeError(
                f"regex scan requires a BYTE_ARRAY column; '{column}' is "
                f"{info.type_name()}"
            )
        pat = like_to_regex(pattern) if like else pattern
        try:
            dfa = compile_pattern(pat)
        except UnsupportedPattern:
            dfa = None
        if dfa is None:
            batch = self.reader.prescan(column, pad_strings=8)
            return scan_batch_fallback(batch, pat, negate=negate)

        if self.mesh is not None:
            from ..parallel.partition import assign_balanced_equal, reorder_pages

            batch = self.reader.prescan(
                column, pad_strings=8,
                flags=bindings.PS_HOST_STRINGS | bindings.PS_PAYLOAD,
            )
            n_dev = int(np.prod(list(self.mesh.shape.values())))
            padded = pad_pages(batch, n_dev * max(cfg.pages_per_shard_multiple, 1))
            # byte-balanced shards: heaviest pages spread across devices under
            # the equal-count shard_map constraint (pad pages weigh 0)
            weights = padded.arrays["page_payload_len"].astype(np.int64) + 16
            weights = np.where(padded.arrays["page_num_values"] > 0, weights, 0)
            asg = assign_balanced_equal(weights, n_dev)
            padded = reorder_pages(padded, asg.order)
            if fault_hook is not None or fleet is not None:
                # elastic path: detect failed devices, re-run orphaned
                # shards on the survivors, merge (parallel/elastic.py)
                from ..parallel.elastic import elastic_distributed_scan

                res, report = elastic_distributed_scan(
                    self.mesh, padded, dfa, negate=negate, fleet=fleet,
                    fault_hook=fault_hook,
                )
                res.elastic_report = report
                return res
            return distributed_scan(self.mesh, padded, dfa, negate=negate)

        if engine == "native":
            return self.cold_scan(column, pat, negate=negate)
        if engine not in ("jax", "numpy"):
            raise ValueError(f"unknown scan engine: {engine!r}")
        if engine == "jax":
            # payload path: raw page bytes upload, device-side prefix parse +
            # MXU DFA — no host string walk
            batch = self.reader.prescan(
                column, pad_strings=8, flags=bindings.PS_PAYLOAD
            )
            return scan_batch_device(batch, pat, negate=negate)
        batch = self.reader.prescan(column, pad_strings=8)
        return scan_batch(batch, pat, negate=negate, xp=np)

    def matching_rows(
        self, column: str, pattern: str, *, negate: bool = False,
        like: bool = False,
    ) -> np.ndarray:
        """Absolute row ids of the non-null values matching `pattern` — the
        row-level result the page scan prunes toward ('WHERE col ~ pattern').
        Same participation/negate semantics as scan(); combine with
        read_rows() for point decodes of the hits."""
        from ..host.schema import ParquetType
        from ..ops.regex import like_to_regex
        from ..ops.scan import match_rows

        info = self.reader.column(column)
        if info.type != ParquetType.BYTE_ARRAY:
            raise TypeError(
                f"regex scan requires a BYTE_ARRAY column; '{column}' is "
                f"{info.type_name()}"
            )
        pat = like_to_regex(pattern) if like else pattern
        batch = self.reader.prescan(column, pad_strings=8)
        return match_rows(batch, pat, negate=negate)

    def cold_scan(
        self, column: str, pattern: str, *, negate: bool = False,
        like: bool = False, exact_counts: bool = False,
    ) -> PageMatchResult:
        """One-shot scan on the fused native cold path (native/dpq_scan.hpp):
        no batch packing, no device upload — the answer streams straight off
        the file mapping.  Bit-identical surviving/pruned page sets to the
        device engine; `exact_counts=True` additionally reproduces its
        match_counts (default is a 0/1 survivor indicator, which lets pages
        stop at the first deciding value).  Use `resident()` /
        `scan_batched()` when the column will be queried repeatedly."""
        return cold_scan(self.reader, column, pattern, negate=negate,
                         like=like, exact_counts=exact_counts)

    def scan_batched(
        self, column: str, pattern: str, *, negate: bool = False,
        batch_pages: int = 16384,
    ) -> PageMatchResult:
        """Large-file scan with the overlap engine: pages slice into
        fixed-shape batches; upload and compute overlap via JAX async
        dispatch (batch i+1 transfers while batch i computes), one compiled
        program for every batch (SURVEY.md §2.1 'overlap engine')."""
        import jax
        import jax.numpy as jnp

        from ..host import bindings
        from ..ops.strings import match_payload_stream
        from ..utils.config import get_config
        from ..utils.metrics import get_metrics
        from ..utils.tracing import stage, trace_session

        from ..ops.bitprog import BitprogUnsupported, compile_bitprog
        from ..ops.regex import substring_chain

        cfg = get_config()
        dfa = compile_pattern(pattern)
        try:
            prog = compile_bitprog(pattern)
            chain = None
        except BitprogUnsupported:
            prog = None
            chain = substring_chain(pattern)
        with trace_session(cfg.profile_dir):
            with get_metrics().timed("prescan", column=column) as box, \
                    stage("prescan"):
                batch = self.reader.prescan(
                    column, pad_strings=8, flags=bindings.PS_PAYLOAD
                )
                box["pages"] = batch.n_pages

            n = batch.n_pages
            bp = min(batch_pages, max(n, 1))
            from ..ops.scan import SPLIT_TRIGGER, scan_batch_device, scan_steps

            steps = scan_steps(batch.arrays["page_payload_len"])
            if steps > SPLIT_TRIGGER:
                # big pages (pyarrow-default ~1 MB): the fixed-shape batch
                # pipeline would walk one mega-page per lane — route through
                # the value-boundary split path instead
                return scan_batch_device(batch, pattern, negate=negate)

            @jax.jit
            def step(payload, plen, nn):
                hits, _ = match_payload_stream(
                    jnp, payload, plen, nn, dfa.table, dfa.accept, use_mxu=True,
                    chain=chain, prog=prog, max_steps=steps,
                )
                return (nn - hits) if negate else hits

            arrays = batch.arrays
            pending = []
            with get_metrics().timed("scan_dispatch", batches=-(-n // bp)), \
                    stage("scan_dispatch"):
                for lo in range(0, n, bp):
                    hi = min(lo + bp, n)
                    payload = arrays["payload"][lo:hi]
                    plen = arrays["page_payload_len"][lo:hi]
                    nn = arrays["page_nn"][lo:hi]
                    if hi - lo < bp:  # pad the tail batch to the compiled shape
                        pad = bp - (hi - lo)
                        payload = np.pad(payload, ((0, pad), (0, 0)))
                        plen = np.pad(plen, (0, pad))
                        nn = np.pad(nn, (0, pad))
                    # async: device_put + dispatch return immediately; the
                    # next batch's transfer overlaps this batch's compute
                    with stage("upload"):
                        dev = jax.device_put((payload, plen, nn))
                    pending.append(step(*dev))

            with stage("collect"):
                counts = np.concatenate([np.asarray(p) for p in pending])[:n]
        # dictionary pages (if any) take the dict fast path
        is_dict = arrays["page_kind"] == 1
        if bool(is_dict.any()):
            from ..ops.scan import scan_batch_device

            dict_res = scan_batch_device(batch, pattern, negate=negate)
            counts = np.where(is_dict, dict_res.match_counts, counts)
        return PageMatchResult(
            page_gid=arrays["page_gid"].copy(),
            match_counts=counts.astype(np.int64),
            value_counts=arrays["page_nn"].astype(np.int64),
        )

    def scan_streaming(
        self, column: str, pattern: str, *, negate: bool = False,
        block_pages: int | None = None, payload_bucket: int = 1536,
    ) -> PageMatchResult:
        """Pipelined COLD device scan: prescan -> upload -> dispatch overlap.

        Per-row-group prescans run on a host worker thread and stream into
        fixed-shape page blocks ([block_pages, payload_bucket], ONE compiled
        program); each block's device_put + dispatch are asynchronous, so the
        host prescan of row group i+1 overlaps the transfer/compute of row
        group i's blocks.  This is the device-side answer to a one-shot scan
        on a cold file (cold_scan() is the host-side one; resident()/
        scan_batched() serve repeated queries).

        Environment note: on this build box the TPU sits behind a relay
        whose per-dispatch round trip costs hundreds of ms, which dominates
        this path end-to-end (measured; the same pipeline on a
        directly-attached chip is upload-bandwidth bound).  cold_scan() is
        the production one-shot answer here."""
        import jax
        from concurrent.futures import ThreadPoolExecutor

        from ..host import bindings

        # jit-cached across calls (a per-call jax.jit would re-trace every
        # scan — measured 2.8 s per cold run before caching)
        step = _streaming_step(pattern, bool(negate))

        n_rg = self.reader.num_row_groups()
        col_idx = self.reader.find_column(column)
        if block_pages is None:
            # one block per row group, rounded so different files with
            # similar row-group sizes land on few compiled shapes; a partial
            # block then pads by at most the rounding, not a whole block
            probe = self.reader.prescan(
                col_idx, 0, 1, pad_strings=8, flags=bindings.PS_PAYLOAD,
                payload_align=payload_bucket,
            )
            block_pages = max(-(-int(probe.n_pages * 1.25) // 4096) * 4096, 4096)
            first_batch = probe
        else:
            first_batch = self.reader.prescan(
                col_idx, 0, 1, pad_strings=8, flags=bindings.PS_PAYLOAD,
                payload_align=payload_bucket,
            )
        if first_batch.n_pages and int(
                first_batch.arrays["page_payload_len"].max()) > 4096:
            # big pages (pyarrow-default ~1 MB): the fixed-shape streaming
            # blocks would walk one mega-page per lane — route through the
            # value-boundary split path instead (ops/scan.SPLIT_TRIGGER)
            from ..ops.scan import scan_batch_device

            batch = self.reader.prescan(
                column, pad_strings=8, flags=bindings.PS_PAYLOAD)
            return scan_batch_device(batch, pattern, negate=negate)

        def prescan_rg(rg):
            if rg == 0 and first_batch is not None:
                return first_batch
            return self.reader.prescan(
                col_idx, rg, rg + 1, pad_strings=8,
                flags=bindings.PS_PAYLOAD, payload_align=payload_bucket,
            )

        pending = []  # (batch, [device results])
        with ThreadPoolExecutor(max_workers=1) as pool:
            futures = [pool.submit(prescan_rg, rg) for rg in range(n_rg)]
            for fut in futures:
                batch = fut.result()  # rg i+1 prescans while we ship rg i
                arrays = batch.arrays
                payload = arrays["payload"]
                if payload.shape[1] != payload_bucket:  # oversized pages
                    pad = -(-payload.shape[1] // payload_bucket) * payload_bucket
                    payload = np.pad(payload, ((0, 0), (0, pad - payload.shape[1])))
                outs = []
                n = batch.n_pages
                for lo in range(0, n, block_pages):
                    hi = min(lo + block_pages, n)
                    p = payload[lo:hi]
                    pl = arrays["page_payload_len"][lo:hi]
                    nn = arrays["page_nn"][lo:hi]
                    if hi - lo < block_pages:
                        pad = block_pages - (hi - lo)
                        p = np.pad(p, ((0, pad), (0, 0)))
                        pl = np.pad(pl, (0, pad))
                        nn = np.pad(nn, (0, pad))
                    outs.append(step(*jax.device_put((p, pl, nn))))
                pending.append((batch, outs))

        # Per-block fetches: a device-side concatenate would be one fewer
        # round trip but introduces an ad-hoc op whose REMOTE COMPILE costs
        # minutes on this relay (measured 218 s) — plain fetches of the
        # already-computed block outputs pay only the ~40 ms RT each.
        gids, counts_parts, values_parts = [], [], []
        for batch, outs in pending:
            n = batch.n_pages
            counts = np.concatenate([np.asarray(o) for o in outs])[:n]
            is_dict = batch.arrays["page_kind"] == 1
            if bool(is_dict.any()):
                from ..ops.scan import scan_batch_device

                dict_res = scan_batch_device(batch, pattern, negate=negate)
                counts = np.where(is_dict, dict_res.match_counts, counts)
            gids.append(batch.arrays["page_gid"].copy())
            counts_parts.append(counts.astype(np.int64))
            values_parts.append(batch.arrays["page_nn"].astype(np.int64))
        return PageMatchResult(
            page_gid=np.concatenate(gids),
            match_counts=np.concatenate(counts_parts),
            value_counts=np.concatenate(values_parts),
        )

    def resident(self, column: str) -> "ResidentColumn":
        """Uploads the column's page buffers to HBM once for repeated
        queries (the serving pattern: scan throughput without re-upload)."""
        return ResidentColumn(self.reader, column)

    # ── chunked inverted index ──────────────────────────────────────────────

    def build_index(self, column: str, chunk_size: int | None = None,
                    checkpoint_dir: str | None = None) -> IndexBuildResult:
        from ..utils import checkpoints
        from ..utils.config import get_config

        if chunk_size is None:
            chunk_size = get_config().index_chunk_size

        if checkpoint_dir:
            cached = checkpoints.load_index(
                checkpoint_dir, self.reader._path, column, chunk_size
            )
            if cached is not None:
                return IndexBuildResult(index=cached)

        if self.mesh is not None:
            from ..parallel.index_build import distributed_index_build

            res = distributed_index_build(self.mesh, self.reader, column, chunk_size)
            out = IndexBuildResult(index=res.index, chunk_owners=res.chunk_owners)
        elif checkpoint_dir:
            # PARTIAL resume: the emission stream checkpoints per row group
            # (a build killed at 90% recomputes only the missing blocks —
            # the boundary plan over the concatenated stream is cheap)
            from ..ops.index import emissions_for_rg

            pos_parts, len_parts = [], []
            for rg in range(self.reader.num_row_groups()):
                blk = checkpoints.load_block(
                    checkpoint_dir, self.reader._path, column, rg)
                if blk is None:
                    blk = emissions_for_rg(self.reader, column, rg)
                    checkpoints.save_block(
                        checkpoint_dir, self.reader._path, column, rg, *blk)
                pos_parts.append(blk[0])
                len_parts.append(blk[1])
            pos = np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int64)
            lens = np.concatenate(len_parts) if len_parts else np.zeros(0, np.int64)
            out = IndexBuildResult(
                index=build_index(pos, lens, self.reader.num_rows(), chunk_size)
            )
        else:
            from ..ops.index import build_index_for_column

            out = IndexBuildResult(
                index=build_index_for_column(self.reader, column, chunk_size)
            )
        if checkpoint_dir:
            checkpoints.save_index(checkpoint_dir, self.reader._path, column, out.index)
        return out


import functools as _functools


@_functools.lru_cache(maxsize=32)
def _streaming_step(pattern: str, negate: bool):
    """jit-compiled fixed-shape block step for scan_streaming, cached per
    (pattern, negate) — shapes are pinned by the payload bucket so every
    block of every call reuses one compiled program."""
    import jax
    import jax.numpy as jnp

    from ..ops.bitprog import BitprogUnsupported, compile_bitprog
    from ..ops.regex import substring_chain
    from ..ops.strings import match_payload_stream

    dfa = compile_pattern(pattern)
    try:
        prog = compile_bitprog(pattern)
        chain = None
    except BitprogUnsupported:
        prog = None
        chain = substring_chain(pattern)

    @jax.jit
    def step(payload, plen, nn):
        hits, _ = match_payload_stream(
            jnp, payload, plen, nn, dfa.table, dfa.accept, use_mxu=True,
            chain=chain, prog=prog,
        )
        return (nn - hits) if negate else hits

    return step


def cold_scan(
    reader: ParquetReader, column: str, pattern: str, *, negate: bool = False,
    like: bool = False, exact_counts: bool = False,
) -> PageMatchResult:
    """Free-function form of ScanEngine.cold_scan over an open reader (the
    CLI's default one-shot path)."""
    import os

    from ..host import bindings
    from ..host.schema import ParquetType
    from ..ops.regex import (
        anchored_prune_range,
        like_to_regex,
        substring_chain,
    )

    info = reader.column(column)
    if info.type != ParquetType.BYTE_ARRAY:
        raise TypeError(
            f"regex scan requires a BYTE_ARRAY column; '{column}' is "
            f"{info.type_name()}"
        )
    pat = like_to_regex(pattern) if like else pattern
    chain = substring_chain(pat)
    # Page Index stats pruning: an anchored pattern's mandatory literal
    # prefix lets the native walk skip pages whose ColumnIndex [min, max]
    # range cannot hold a prefix-P value — before any decode.  Never sound
    # under negation (a no-match page SURVIVES a negated scan).
    # Unified prune range (ops/regex.anchored_prune_range): exact literals
    # as [L, L+"\0"), class-extended prefixes as [P+min_c, inc(P+max_c)),
    # plain literal prefixes as [P, inc(P)).
    prange = None
    if not negate and not os.environ.get("DPQ_NO_PRUNE"):
        prange = anchored_prune_range(pat)
    try:
        if chain:
            _dims, arrays = bindings.native_cold_scan(
                reader._h, reader.find_column(column), 0, -1,
                negate=negate, exact=exact_counts, needles=chain,
                prune_range=prange,
            )
        else:
            try:
                dfa = compile_pattern(pat)
            except UnsupportedPattern:
                batch = reader.prescan(column, pad_strings=8)
                return scan_batch_fallback(batch, pat, negate=negate)
            _dims, arrays = bindings.native_cold_scan(
                reader._h, reader.find_column(column), 0, -1,
                negate=negate, exact=exact_counts, table=dfa.table,
                accept=dfa.accept.astype(np.uint8), prune_range=prange,
            )
    except bindings.NativeError as e:
        if "unsupported value encoding" not in str(e):
            raise
        # delta-coded string pages: the prescan path re-serializes them
        batch = reader.prescan(column, pad_strings=8)
        return scan_batch(batch, pat, negate=negate)
    res = PageMatchResult(
        page_gid=arrays["page_gid"].copy(),
        match_counts=arrays["match_counts"].copy(),
        value_counts=arrays["value_counts"].copy(),
    )
    res.stats_pruned_pages = int(_dims.get("stats_pruned_pages", 0))
    res.dict_skipped_pages = int(_dims.get("dict_skipped_pages", 0))
    return res


class ResidentColumn:
    """A BYTE_ARRAY column resident in device memory, serving repeated regex
    scans (decode + match re-run per query; only the raw page buffers are
    cached — the production "load once, query many" path the benchmark
    measures).

    Pages live on device in LENGTH BUCKETS (ops/scan.length_buckets): the
    streaming matcher walks each bucket only to its own max payload length,
    recovering the padded-tail steps a single compiled shape wastes
    (~15-20% on 1 KB-page data).  Each bucket's byte stream is stored
    PRE-TRANSPOSED ([steps, n] — the layout the per-step column slices
    consume): transposing inside the query jit rematerializes ~90 MB per
    call once the matrix outgrows VMEM (~1 ms/query measured on the 2M-row
    fixture; ops/pallas/README.md round 2e).

    On a real device each bucket additionally keeps the TILED-CONTIGUOUS
    copy the Pallas streaming kernel consumes (round 3c,
    ops/pallas/stream_matcher.py): bitprog patterns serve at ~856M rows/s
    single / 1.24B pattern-rows/s fused-x3 vs 660M/748M for the lax.scan
    walk, which remains the path for DFA-fallback patterns and CPU runs
    (EngineConfig.pallas_stream gates the extra HBM copy)."""

    def __init__(self, reader: ParquetReader, column: str):
        import jax

        from ..host import bindings
        from ..ops import decode as _decode
        from ..ops.scan import dfa_match as _dfa_match
        from ..ops.scan import length_buckets
        from ..utils.jax_setup import enable_compile_cache

        enable_compile_cache()
        self._batch = reader.prescan(
            column, pad_strings=8, flags=bindings.PS_PAYLOAD
        )
        arrays = self._batch.arrays
        plen_np = np.asarray(arrays["page_payload_len"])
        is_dict = np.asarray(arrays["page_kind"]) == 1
        # Pallas streaming serving layout (round 3b): on a real device the
        # bucket ALSO keeps the tile_stream copy the kernel consumes —
        # ~856M vs 660M rows/s for the lax.scan walk on the 2M-row fixture
        # (ops/pallas/README.md); lax.scan stays for scan_many / DFA
        # fallback patterns and CPU runs.
        from ..utils.config import get_config

        use_pallas = (get_config().pallas_stream
                      and jax.default_backend() != "cpu")
        from ..ops.pallas.stream_matcher import stream_supported, tile_stream

        # Big pages (pyarrow-default ~1 MB) re-chunk at value boundaries
        # (ops/scan.split_payload_pages): the resident layout is then the
        # SEGMENT matrix (short lanes) + a per-page core for the dict path,
        # served through the split scan step (hits segment-sum to pages).
        from ..ops.scan import scan_steps, split_payload_pages

        self._split = None
        self._split_tiled = None
        sp = split_payload_pages(arrays)
        if sp is not None:
            sub_payload, sub_len, sub_nn, seg_page = sp
            steps = scan_steps(sub_len)
            payload_t = jax.device_put(
                np.ascontiguousarray(sub_payload[:, :steps].T))
            self._split = (
                payload_t,
                jax.device_put(np.ascontiguousarray(sub_len)),
                jax.device_put(np.ascontiguousarray(sub_nn)),
                jax.device_put(np.ascontiguousarray(seg_page)),
                steps,
                {k: jax.device_put(np.ascontiguousarray(arrays[k]))
                 for k in _decode.DECODE_ARRAYS if k in arrays},
            )
            if use_pallas and stream_supported(steps):
                self._split_tiled = tile_stream(payload_t, steps)
        self._buckets = []
        self._tiled = []
        buckets = ([] if self._split is not None
                   else length_buckets(np.where(is_dict, 0, plen_np)))
        for idx, steps in buckets:
            core = {
                k: jax.device_put(np.ascontiguousarray(arrays[k][idx]))
                for k in _decode.DECODE_ARRAYS if k in arrays
            }
            payload_t = jax.device_put(
                np.ascontiguousarray(arrays["payload"][idx][:, :steps].T)
            )
            plen = jax.device_put(np.ascontiguousarray(plen_np[idx]))
            self._buckets.append((idx, steps, core, payload_t, plen))
            self._tiled.append(
                tile_stream(payload_t, steps)
                if use_pallas and stream_supported(steps) else None
            )
        self._gid = arrays["page_gid"].copy()
        self._dfa_match = _dfa_match

    @property
    def n_pages(self) -> int:
        return self._batch.n_pages

    def scan(self, pattern: str, *, negate: bool = False,
             like: bool = False) -> PageMatchResult:
        import jax
        import numpy as _np

        from ..ops.regex import like_to_regex, substring_chain
        from ..ops.scan import _device_scan_step

        pat = like_to_regex(pattern) if like else pattern
        dfa = compile_pattern(pat)
        arrays = self._batch.arrays
        if int(self._batch.dims.get("dict_n", 0)) > 0 and "dict_padded" in arrays:
            dict_match = _np.asarray(
                self._dfa_match(_np, arrays["dict_padded"], arrays["dict_lens"],
                                dfa.table, dfa.accept)
            )
        else:
            dict_match = _np.zeros(1, bool)
        dict_match_d = jax.device_put(dict_match)

        from ..ops.bitprog import BitprogUnsupported, compile_bitprog

        table = _np.ascontiguousarray(dfa.table, _np.int32)
        try:
            compile_bitprog(pat)
            prog_pattern, chain = pat, None
        except BitprogUnsupported:
            prog_pattern, chain = None, substring_chain(pat)

        if self._split is not None:
            payload_t, sub_len, sub_nn, seg, steps, core = self._split
            n_segs = int(sub_len.shape[0])

            def _split_step(use_pallas):
                step = _device_scan_step(
                    table.tobytes(), table.shape,
                    _np.ascontiguousarray(dfa.accept, bool).tobytes(),
                    self._batch.vmax, self._batch.nn_cap,
                    self._batch.max_def, bool(negate), True,
                    tuple(chain) if chain else None, prog_pattern, steps,
                    True, n_segs if use_pallas else None, split=True,
                    dn_max=_scan_ops.batch_dn_max(self._batch.arrays),
                )
                return step(core,
                            self._split_tiled if use_pallas else payload_t,
                            sub_len, sub_nn, seg, dict_match_d)

            c = v = None
            if self._split_tiled is not None and prog_pattern is not None:
                try:
                    c, v = _split_step(True)
                except Exception:  # Mosaic compile failure: lax fallback
                    c = v = None
            if c is None:
                c, v = _split_step(False)
            return PageMatchResult(
                page_gid=self._gid.copy(),
                match_counts=_np.asarray(c, _np.int64),
                value_counts=_np.asarray(v, _np.int64),
            )

        n = self.n_pages
        counts = _np.zeros(n, _np.int64)
        values = _np.zeros(n, _np.int64)
        pending = []
        for (idx, steps, core, payload, plen), tiled in zip(self._buckets,
                                                            self._tiled):
            # Pallas streaming fast path: bitprog patterns over the tiled
            # resident layout (round 3b); lax.scan otherwise — and as the
            # live fallback should Mosaic reject this chip/shape
            use_pallas = tiled is not None and prog_pattern is not None

            def _bucket_step(use_pallas=use_pallas, steps=steps, idx=idx,
                             core=core, payload=payload, plen=plen,
                             tiled=tiled):
                step = _device_scan_step(
                    table.tobytes(), table.shape,
                    _np.ascontiguousarray(dfa.accept, bool).tobytes(),
                    self._batch.vmax, self._batch.nn_cap,
                    self._batch.max_def, bool(negate),
                    True, tuple(chain) if chain else None,
                    prog_pattern, steps, True,
                    len(idx) if use_pallas else None,
                    dn_max=_scan_ops.batch_dn_max(self._batch.arrays),
                )
                return step(core, tiled if use_pallas else payload, plen,
                            dict_match_d)

            if use_pallas:
                try:
                    pending.append((idx, _bucket_step()))
                    continue
                except Exception:  # Mosaic compile failure: lax fallback
                    pass
            pending.append((idx, _bucket_step(use_pallas=False)))
        for idx, (c, v) in pending:
            counts[idx] = _np.asarray(c, _np.int64)
            values[idx] = _np.asarray(v, _np.int64)
        return PageMatchResult(
            page_gid=self._gid.copy(),
            match_counts=counts,
            value_counts=values,
        )

    def scan_many(self, patterns: list[str], *, negate: bool = False,
                  like: bool = False) -> list[PageMatchResult]:
        """K patterns in ONE pass over the resident byte stream — the
        multi-query serving path.  The payload walk, per-step slices and
        boundary control amortize over every pattern (the per-pattern
        transitions still sum): measured 8.2 ms fused vs 10.6 ms separate
        for the 3 bench patterns on the 2M-row fixture (~1.3x, growing
        with K and with cheaper patterns).

        Patterns outside the register-machine family (needing the MXU DFA
        fallback) are scanned individually; results come back in input
        order either way."""
        import jax
        import numpy as _np

        from ..ops.bitprog import compile_bitprog
        from ..ops.regex import like_to_regex, substring_chain
        from ..ops.scan import _device_scan_multi_step

        if self._split is not None:
            # value-boundary split layout (big pages): per-pattern scans —
            # the fused walk does not carry the segment-sum plumbing (yet)
            return [self.scan(p, negate=negate, like=like) for p in patterns]

        pats = [like_to_regex(p) if like else p for p in patterns]
        fused, solo = [], []
        for j, pat in enumerate(pats):
            try:
                compile_bitprog(pat)
                fused.append(j)
            except UnsupportedPattern:  # incl. BitprogUnsupported
                (fused if substring_chain(pat) else solo).append(j)

        results: list = [None] * len(pats)
        for j in solo:
            results[j] = self.scan(pats[j], negate=negate)
        if not fused:
            return results

        arrays = self._batch.arrays
        dict_n = max(int(self._batch.dims.get("dict_n", 0)), 1)
        dm = _np.zeros((len(fused), dict_n), bool)
        if int(self._batch.dims.get("dict_n", 0)) > 0 and "dict_padded" in arrays:
            for r, j in enumerate(fused):
                dfa = compile_pattern(pats[j])
                dm[r] = _np.asarray(
                    self._dfa_match(_np, arrays["dict_padded"],
                                    arrays["dict_lens"], dfa.table, dfa.accept)
                )
        dm_d = jax.device_put(dm)

        n = self.n_pages
        counts = _np.zeros((len(fused), n), _np.int64)
        values = _np.zeros((len(fused), n), _np.int64)
        # fused Pallas walk when every pattern is bitprog-compiled and the
        # tiled resident layout exists (round 3c); lax.scan multi otherwise
        def _all_prog():
            from ..ops.bitprog import BitprogUnsupported

            try:
                for j in fused:
                    compile_bitprog(pats[j])
                return True
            except BitprogUnsupported:
                return False

        all_prog = _all_prog()
        pending = []
        for (idx, steps, core, payload, plen), tiled in zip(self._buckets,
                                                            self._tiled):
            use_pallas = tiled is not None and all_prog

            def _bucket_step(use_pallas=use_pallas, steps=steps, idx=idx,
                             core=core, payload=payload, plen=plen,
                             tiled=tiled):
                step = _device_scan_multi_step(
                    tuple(pats[j] for j in fused), self._batch.vmax,
                    self._batch.nn_cap, self._batch.max_def, bool(negate),
                    steps, True, len(idx) if use_pallas else None,
                    dn_max=_scan_ops.batch_dn_max(self._batch.arrays),
                )
                return step(core, tiled if use_pallas else payload, plen,
                            dm_d)

            if use_pallas:
                try:
                    pending.append((idx, _bucket_step()))
                    continue
                except Exception:  # Mosaic compile failure: lax fallback
                    pass
            pending.append((idx, _bucket_step(use_pallas=False)))
        for idx, (cs, vs) in pending:
            for r in range(len(fused)):
                counts[r, idx] = _np.asarray(cs[r], _np.int64)
                values[r, idx] = _np.asarray(vs[r], _np.int64)
        for r, j in enumerate(fused):
            results[j] = PageMatchResult(
                page_gid=self._gid.copy(),
                match_counts=counts[r],
                value_counts=values[r],
            )
        return results


# ── graft entry support: jittable kernels over a self-contained example ─────


def build_example_batch(tmpdir: str, *, rows: int = 400, n_unique=None):
    """Writes a small two-row-group string fixture and prescans it."""
    import os

    from ..host.schema import ParquetType
    from ..host.writer import ColumnSpec, ParquetWriter

    rng = np.random.default_rng(0)
    path = os.path.join(tmpdir, "graft_example.parquet")
    letters = np.frombuffer(b"abcdefghijklmnopqrstuvwxyz ", np.uint8)

    def strings(n, uniq):
        if uniq:
            pool = [f"word_{i}_{'x' * (i % 5)}".encode() for i in range(uniq)]
            return [pool[int(rng.integers(uniq))] for _ in range(n)]
        return [bytes(rng.choice(letters, int(rng.integers(3, 25)))) for _ in range(n)]

    w = ParquetWriter(
        path, [ColumnSpec("s", ParquetType.BYTE_ARRAY, optional=True)],
        key_value={"pad": "x" * 512},
    )
    vals = strings(rows, 8) + strings(rows, None)
    w.write_row_group({"s": [None if rng.random() < 0.1 else v for v in vals[:rows]]})
    w.write_row_group({"s": [None if rng.random() < 0.1 else v for v in vals[rows:]]})
    w.close()

    from ..host import bindings as _b

    reader = ParquetReader(path)
    return reader, reader.prescan(
        "s", pad_strings=8, flags=_b.PS_HOST_STRINGS | _b.PS_PAYLOAD
    )


def single_chip_forward(batch, dfa: DFA):
    """Returns (jittable_fn, example_args): one fused decode+match+count step
    on a page batch — the engine's flagship forward step (raw-payload
    streaming MXU DFA for PLAIN pages, dict fast path for the rest), the
    compile-check surface for the driver."""
    import jax.numpy as jnp

    from ..ops import decode as _decode
    from ..ops.scan import dfa_match as _dfa_match
    from ..ops.strings import match_payload_stream

    arrays = batch.arrays
    core = {k: jnp.asarray(v) for k, v in arrays.items()
            if k in _decode.DECODE_ARRAYS}
    if "dict_padded" in arrays:
        dict_match_np = np.asarray(
            _dfa_match(np, arrays["dict_padded"], arrays["dict_lens"],
                       dfa.table, dfa.accept))
    else:
        dict_match_np = np.zeros(1, bool)

    vmax, nn_cap, max_def = batch.vmax, batch.nn_cap, batch.max_def
    table, accept = dfa.table, dfa.accept

    def forward(core, payload, plen, dict_match):
        # single-chip: same math as the sharded kernel minus the psum
        is_dict = core["page_kind"] == 1
        nn = core["page_nn"]
        hits, _seen = match_payload_stream(
            jnp, payload, jnp.where(is_dict, 0, plen),
            jnp.where(is_dict, 0, nn), table, accept, use_mxu=True,
        )
        nonnull, nn_idx = _decode.decode_levels(jnp, core, max_def, vmax)
        dict_idx, ok = _decode.decode_dict_indices(jnp, core, nn_idx, nn_cap,
                                                   nonnull=nonnull)
        g = jnp.clip(core["page_dict_base"][:, None] + jnp.clip(dict_idx, 0, None),
                     0, dict_match.shape[0] - 1)
        from ..ops.pallas.dict_lookup import dict_lookup

        dm = dict_lookup(jnp, [dict_match.astype(jnp.int32)], g)[0] != 0
        dict_counts = jnp.sum(dm & ok & nonnull, axis=1)
        return jnp.where(is_dict, dict_counts, hits)

    example_args = (
        core, jnp.asarray(arrays["payload"]),
        jnp.asarray(arrays["page_payload_len"]), jnp.asarray(dict_match_np),
    )
    return forward, example_args


def make_engine(path: str, distributed: bool = False) -> ScanEngine:
    return ScanEngine(path, mesh=make_mesh() if distributed else None)
