"""Chunked inverted index: oracle parity (counts + row->chunk map) and unit
tests of the boundary recurrence (flush-before-append overshoot semantics)."""

import numpy as np
import pytest

from duckdb_parquet_parser_tpu.host.reader import ParquetReader
from duckdb_parquet_parser_tpu.ops.index import (
    build_index,
    build_index_for_column,
    chunk_boundaries,
    entry_sizes,
)
from tests import fixtures


def scalar_chunks(sizes, chunk_size):
    """Direct restatement of the reference loop (src/main.cpp:21-32)."""
    chunk_of = []
    cur = 0
    cid = 0
    for s in sizes:
        if cur >= chunk_size:
            cur = 0
            cid += 1
        cur += s
        chunk_of.append(cid)
    return chunk_of


def test_entry_sizes_digit_prefix():
    lens = np.array([0, 1, 9, 10, 99, 100, 999, 1000, 12345])
    got = entry_sizes(lens)
    want = np.array([len(str(l)) + l for l in lens])
    assert np.array_equal(got, want)


@pytest.mark.parametrize("chunk_size", [64, 1000, 4096])
def test_boundaries_match_scalar_loop(chunk_size, rng):
    sizes = rng.integers(1, 60, 5000)
    starts = chunk_boundaries(sizes, chunk_size)
    chunk_of = np.searchsorted(starts, np.arange(len(sizes)), side="right") - 1
    assert chunk_of.tolist() == scalar_chunks(sizes, chunk_size)


def test_index_oracle_parity(tmp_path, oracle, rng):
    for kind, kwargs in [("plain", {}), ("dict", {"n_unique": 10})]:
        path = fixtures.strings_file(
            tmp_path / f"{kind}.parquet", rng, n=2500, null_p=0.2, **kwargs
        )
        r = ParquetReader(path)
        for cs in (1000, 4096):
            idx = build_index_for_column(r, "s", cs)
            out = oracle(path, "index", "s", str(cs)).splitlines()
            assert idx.num_rows == int(out[0].split()[1])
            assert idx.num_chunks == int(out[1].split()[1])
            ref_map = np.array([int(x) for x in out[2:]], np.int64)
            assert np.array_equal(idx.tuple_to_chunk, ref_map)


def test_materialize_chunk_roundtrip(tmp_path, rng):
    from duckdb_parquet_parser_tpu.host.reader import _string_stream

    path = fixtures.strings_file(tmp_path / "m.parquet", rng, n=500, null_p=0.1)
    r = ParquetReader(path)
    batch = r.prescan("s")
    pos, lens, offs, chars = _string_stream(batch)
    idx = build_index(pos, lens, r.num_rows(), 512)
    blob = idx.materialize_chunk(0, chars, offs)
    # chunk content = concatenated "<len><bytes>" entries
    first_len = int(lens[0])
    assert blob.startswith(str(first_len).encode())
    decoded = r.read_column("s")
    first_val = decoded.values[int(pos[0])]
    assert blob[len(str(first_len)) : len(str(first_len)) + first_len] == first_val


def test_null_rows_keep_zero(tmp_path, rng):
    path = fixtures.strings_file(tmp_path / "z.parquet", rng, n=300, null_p=0.5)
    r = ParquetReader(path)
    idx = build_index_for_column(r, "s")
    decoded = r.read_column("s")
    assert np.all(idx.tuple_to_chunk[~decoded.valid] == 0)
