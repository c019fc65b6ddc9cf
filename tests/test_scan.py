"""Regex page-pruning scan: survivor-set correctness on plain and dictionary
pages (ground truth: Python `re` over decoded values), DFA vs host fallback,
numpy vs jax backends."""

import re

import numpy as np
import pytest

from duckdb_parquet_parser_tpu.host.reader import ParquetReader
from duckdb_parquet_parser_tpu.ops.scan import scan_batch, scan_batch_fallback
from tests import fixtures


def truth_pruned(reader, col, pattern, negate):
    """Pages with no (non-null, emitted) value accepted, via re.search."""
    batch = reader.prescan(col)
    decoded = reader.read_column(col)
    rx = re.compile(pattern.encode(), re.DOTALL)
    row_start = batch.arrays["page_row_start"]
    counts = np.zeros(batch.n_pages, np.int64)
    for pos in np.nonzero(decoded.valid)[0]:
        p = np.searchsorted(row_start, pos, "right") - 1
        counts[p] += (rx.search(decoded.values[pos]) is not None) ^ negate
    return np.sort(batch.arrays["page_gid"][counts == 0])


@pytest.fixture(scope="module", params=["plain", "dict", "mixed_rgs"])
def strings_path(request, tmp_path_factory):
    rng = np.random.default_rng(hash(request.param) % 2**32)
    d = tmp_path_factory.mktemp("scan")
    if request.param == "plain":
        return fixtures.strings_file(d / "p.parquet", rng, n=2500, null_p=0.15)
    if request.param == "dict":
        return fixtures.strings_file(d / "d.parquet", rng, n=2500, n_unique=11, null_p=0.15)
    # one dict rg + one plain rg in the same column
    from duckdb_parquet_parser_tpu.host.schema import ParquetType
    from duckdb_parquet_parser_tpu.host.writer import ColumnSpec, ParquetWriter

    path = d / "m.parquet"
    w = ParquetWriter(
        str(path),
        [ColumnSpec("s", ParquetType.BYTE_ARRAY, optional=True)],
        key_value={"pad": "x" * 512},
    )
    w.write_row_group({"s": fixtures.random_strings(rng, 1000, n_unique=8, null_p=0.1)})
    w.write_row_group({"s": fixtures.random_strings(rng, 1000, null_p=0.1)})
    w.close()
    return str(path)


@pytest.mark.parametrize("negate", [False, True])
@pytest.mark.parametrize("pattern", ["alpha", "^x", "a.*z", "q[aeiou]", "([a-m])\\1*o"])
def test_scan_survivors(strings_path, pattern, negate):
    r = ParquetReader(strings_path)
    batch = r.prescan("s", pad_strings=8)
    want = truth_pruned(r, "s", pattern, negate)
    got = np.sort(scan_batch(batch, pattern, negate=negate).pruned_pages())
    # backreference pattern goes through the fallback automatically
    assert np.array_equal(got, want)
    got_fb = np.sort(scan_batch_fallback(batch, pattern, negate=negate).pruned_pages())
    assert np.array_equal(got_fb, want)


def test_scan_jax_backend(strings_path):
    import jax.numpy as jnp

    r = ParquetReader(strings_path)
    batch = r.prescan("s", pad_strings=8)
    a = scan_batch(batch, "alpha|echo", xp=np)
    b = scan_batch(batch, "alpha|echo", xp=jnp)
    assert np.array_equal(a.match_counts, np.asarray(b.match_counts))
    assert np.array_equal(a.pruned_pages(), np.asarray(b.pruned_pages()))


def test_scan_counts_values(strings_path):
    r = ParquetReader(strings_path)
    batch = r.prescan("s", pad_strings=8)
    res = scan_batch(batch, "alpha")
    decoded = r.read_column("s")
    assert int(res.value_counts.sum()) == int(decoded.valid.sum())
    # match everything -> zero pruned; match nothing -> all pruned
    assert len(scan_batch(batch, "").pruned_pages()) == 0
    assert len(scan_batch(batch, "^\\x00$").pruned_pages()) == batch.n_pages


def test_resident_scan_many_parity(tmp_path):
    """scan_many == per-pattern scan() for fused (bitprog/chain) patterns,
    solo MXU-DFA fallbacks, and both polarities."""
    import numpy as np

    from duckdb_parquet_parser_tpu.models.scan import ScanEngine

    from .fixtures import strings_file

    rng = np.random.default_rng(19)
    path = strings_file(tmp_path / "many.parquet", rng, n=1200, null_p=0.1,
                        n_unique=None, rgs=2)
    res = ScanEngine(path).resident("s")
    pats = ["alpha", "a.*o", "gamma|delta", "^br", "(al|br)*avo",
            "[a-z]{4,9}a"]  # lead-run counter machine rides the fused walk
    for negate in (False, True):
        many = res.scan_many(pats, negate=negate)
        for p, m in zip(pats, many):
            s = res.scan(p, negate=negate)
            np.testing.assert_array_equal(m.match_counts, s.match_counts, p)
            np.testing.assert_array_equal(m.value_counts, s.value_counts, p)


def test_dict_accept_localization_multi_rg(tmp_path):
    """Device scan over a multi-row-group dict STRING column (distinct
    chunk dictionaries -> two-stage local accept mapping) must match the
    numpy golden for plain and negated patterns."""
    from duckdb_parquet_parser_tpu.host.schema import ParquetType
    from duckdb_parquet_parser_tpu.host.writer import ColumnSpec, ParquetWriter
    from duckdb_parquet_parser_tpu.models.scan import ScanEngine

    rng = np.random.default_rng(23)
    path = str(tmp_path / "mrg_scan.parquet")
    w = ParquetWriter(path, [ColumnSpec("s", ParquetType.BYTE_ARRAY,
                                        optional=True)])
    for rg in range(3):
        keys = [f"city_{rg}_{k:02d}".encode() for k in range(20)]
        vals = [keys[i] for i in rng.integers(0, 20, 2500)]
        mask = (rng.random(2500) > 0.1).astype(np.uint8)
        w.write_row_group({"s": (vals, mask)})
    w.close()
    eng = ScanEngine(path)
    for pat, neg in [("city_1_.*", False), ("city_.*_0[0-5]", False),
                     ("city_1_.*", True)]:
        a = eng.scan("s", pat, engine="jax", negate=neg)
        g = eng.scan("s", pat, engine="numpy", negate=neg)
        np.testing.assert_array_equal(a.match_counts, g.match_counts,
                                      err_msg=pat)
        np.testing.assert_array_equal(a.value_counts, g.value_counts)
