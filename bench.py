"""Benchmark harness — measures the engine against the reference binary.

Workload (mirrors the reference's implied benchmark, SURVEY.md §6): a
TPC-H-lineitem-like file with an `l_comment`-style string column; the headline
metric is decode + regex page-pruning scan rows/s on one chip versus the
reference's single-CPU decode rows/s (the reference has no regex path, so the
baseline is its *decode-only* iterator — a conservative denominator for us).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "rows/s", "vs_baseline": N}
Details go to stderr.  The fixture is cached under /tmp/dpq_bench.

Usage: python bench.py [--rows N] [--reps K] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CACHE = Path(os.environ.get("DPQ_BENCH_DIR", "/tmp/dpq_bench"))
PATTERN = "special.*requests"  # TPC-H Q13-style filter


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def gen_fixture(rows: int) -> Path:
    """lineitem-like fixture: comment strings (~27-43 chars), i64, f64."""
    from duckdb_parquet_parser_tpu.host.schema import ParquetType
    from duckdb_parquet_parser_tpu.host.writer import ColumnSpec, ParquetWriter

    path = CACHE / f"lineitem_{rows}.parquet"
    if path.exists():
        return path
    CACHE.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    rng = np.random.default_rng(2026)

    words = [
        b"carefully", b"furiously", b"quickly", b"slyly", b"blithely", b"requests",
        b"deposits", b"packages", b"accounts", b"theodolites", b"pending", b"final",
        b"special", b"express", b"regular", b"ironic", b"unusual", b"bold",
        b"among", b"across", b"above", b"sleep", b"haggle", b"nag", b"wake",
    ]
    w = ParquetWriter(
        str(path),
        [
            ColumnSpec("l_quantity", ParquetType.INT64),
            ColumnSpec("l_extendedprice", ParquetType.DOUBLE),
            ColumnSpec("l_comment", ParquetType.BYTE_ARRAY, optional=True),
        ],
        key_value={"pad": "x" * 512},
    )
    rg_rows = 500_000
    done = 0
    widx = np.arange(len(words))
    lens_of = np.array([len(x) for x in words])
    while done < rows:
        n = min(rg_rows, rows - done)
        # 5 words + 4 spaces per comment
        pick = rng.integers(0, len(words), (n, 5))
        ln = lens_of[pick].sum(axis=1) + 4
        offs = np.zeros(n + 1, np.int64)
        np.cumsum(ln, out=offs[1:])
        chars = np.full(offs[-1], ord(" "), np.uint8)
        at = offs[:-1].copy()
        for k in range(5):
            for wi in widx:
                sel = pick[:, k] == wi
                if not sel.any():
                    continue
                word = np.frombuffer(words[wi], np.uint8)
                starts = at[sel]
                idx = starts[:, None] + np.arange(len(word))[None, :]
                chars[idx.ravel()] = np.tile(word, int(sel.sum()))
            at += lens_of[pick[:, k]] + 1
        valid = (rng.random(n) > 0.01).astype(np.uint8)
        w.write_row_group(
            {
                "l_quantity": rng.integers(1, 51, n),
                "l_extendedprice": rng.random(n) * 1e5,
                "l_comment": ((offs, chars, valid)),
            }
        )
        done += n
    w.close()
    log(f"fixture {path} ({path.stat().st_size/1e6:.1f} MB) in {time.time()-t0:.1f}s")
    return path


def bench_reference(path: Path, reps: int) -> dict:
    from tests.oracle.build_oracle import build_oracle

    exe = build_oracle()
    if exe is None:
        log("reference unavailable; baseline = NaN")
        return {}
    import subprocess

    out = {}
    r = subprocess.run(
        [str(exe), str(path), "bench-iter", "l_comment", str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    vals = r.stdout.split()
    n_values, secs = int(vals[1]), float(vals[5])
    out["ref_iter_rows_per_s"] = n_values / secs
    out["ref_iter_values"] = n_values // reps

    r = subprocess.run(
        [str(exe), str(path), "bench-column", "l_quantity", str(reps)],
        capture_output=True, text=True, timeout=3600,
    )
    vals = r.stdout.split()
    out["ref_column_rows_per_s"] = int(vals[1]) / float(vals[3])
    log(f"reference: iter {out['ref_iter_rows_per_s']:.3g} rows/s, "
        f"read_column(i64) {out['ref_column_rows_per_s']:.3g} rows/s")
    return out


def bench_engine(path: Path, reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from duckdb_parquet_parser_tpu.host.reader import ParquetReader
    from duckdb_parquet_parser_tpu.ops import decode as D
    from duckdb_parquet_parser_tpu.ops.regex import compile_pattern
    from duckdb_parquet_parser_tpu.ops.scan import dfa_match, segment_counts
    from duckdb_parquet_parser_tpu.parallel.partition import strings_page_major

    out = {}
    dev = jax.devices()[0]
    log(f"engine device: {dev}")

    # ── cold end-to-end scan: open + prescan + upload + decode/match ────────
    t0 = time.time()
    reader = ParquetReader(str(path))
    t_open = time.time() - t0
    t0 = time.time()
    batch = reader.prescan("l_comment", pad_strings=8)
    t_prescan = time.time() - t0

    t0 = time.time()
    chars_pm, lens_pm = strings_page_major(batch)
    t_relayout = time.time() - t0

    dfa = compile_pattern(PATTERN)
    core = {k: v for k, v in batch.arrays.items() if k in D.DECODE_ARRAYS}

    n, cap, pitch = chars_pm.shape
    vmax, max_def = batch.vmax, batch.max_def

    @jax.jit
    def scan_step(core, chars, lens):
        nonnull, nn_idx = D.decode_levels(jnp, core, max_def, vmax)
        match = dfa_match(
            jnp, chars.reshape(n * cap, pitch), lens.reshape(n * cap),
            dfa.table, dfa.accept,
        ).reshape(n, cap)
        entry_valid = (
            jnp.arange(cap, dtype=jnp.int32)[None, :] < core["page_nn"][:, None]
        )
        counts = jnp.sum(match & entry_valid, axis=1)
        return counts, jnp.sum(nonnull, axis=1)

    t0 = time.time()
    core_d = jax.device_put(core)
    chars_d = jax.device_put(chars_pm.reshape(n, cap * pitch))
    lens_d = jax.device_put(lens_pm)
    jax.block_until_ready((core_d, chars_d, lens_d))
    t_upload = time.time() - t0

    chars_view = chars_d.reshape(n, cap, pitch)
    t0 = time.time()
    counts, _nn = jax.block_until_ready(scan_step(core_d, chars_view, lens_d))
    t_first = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        counts, _nn = jax.block_until_ready(scan_step(core_d, chars_view, lens_d))
        times.append(time.time() - t0)
    t_device = min(times)

    total_rows = int(batch.arrays["page_num_values"].sum())
    n_pruned = int(((np.asarray(counts) == 0)).sum())
    e2e = t_open + t_prescan + t_relayout + t_upload + t_device
    out["rows"] = total_rows
    out["engine_e2e_rows_per_s"] = total_rows / e2e
    out["engine_device_rows_per_s"] = total_rows / t_device
    out["pruned_pages"] = n_pruned
    out["t"] = dict(open=t_open, prescan=t_prescan, relayout=t_relayout,
                    upload=t_upload, first_step=t_first, device=t_device)
    log(f"engine scan: e2e {out['engine_e2e_rows_per_s']:.3g} rows/s "
        f"(device-only {out['engine_device_rows_per_s']:.3g}); "
        f"times {out['t']}; pruned {n_pruned}/{n} pages")

    # ── fixed-width decode GB/s (l_quantity, INT64) ─────────────────────────
    t0 = time.time()
    b2 = reader.prescan("l_quantity")
    t_prescan2 = time.time() - t0
    planes = b2.plain_planes
    core2 = {k: v for k, v in b2.arrays.items() if k in D.DECODE_ARRAYS}
    kw = dict(max_def=b2.max_def, out_len=b2.vmax, nn_len=b2.nn_cap, mode="plain")

    t0 = time.time()
    core2_d = jax.device_put(core2)
    planes_d = jax.device_put(tuple(planes))
    jax.block_until_ready((core2_d, planes_d))
    t_upload2 = time.time() - t0

    def dec(core, planes):
        return D.decode_fixed(jnp, core, list(planes), [], None, **kw)

    dec_jit = jax.jit(dec)
    jax.block_until_ready(dec_jit(core2_d, planes_d))
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(dec_jit(core2_d, planes_d))
        times.append(time.time() - t0)
    t_dec = min(times)
    nbytes = total_rows * 8
    out["decode_i64_gb_per_s"] = nbytes / t_dec / 1e9
    out["decode_i64_e2e_rows_per_s"] = total_rows / (t_prescan2 + t_upload2 + t_dec)
    log(f"decode i64: {out['decode_i64_gb_per_s']:.3g} GB/s device, "
        f"e2e {out['decode_i64_e2e_rows_per_s']:.3g} rows/s "
        f"(prescan {t_prescan2:.3f}s upload {t_upload2:.3f}s dec {t_dec:.4f}s)")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.rows = 200_000
        args.reps = 1

    path = gen_fixture(args.rows)
    ref = bench_reference(path, args.reps)
    eng = bench_engine(path, args.reps)

    value = eng.get("engine_e2e_rows_per_s", 0.0)
    baseline = ref.get("ref_iter_rows_per_s")
    vs = value / baseline if baseline else None
    line = {
        "metric": "decode_regex_scan_rows_per_s",
        "value": round(value, 1),
        "unit": "rows/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }
    log(json.dumps({"detail": {**ref, **{k: v for k, v in eng.items() if k != 't'}}}))
    print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
