"""Pallas streaming matcher (ops/pallas/stream_matcher.py) vs the
production walk — interpret mode on CPU; the real-device lane
(test_tpu_parity) runs the compiled kernel on the chip."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_parquet_parser_tpu.ops.bitprog import compile_bitprog
from duckdb_parquet_parser_tpu.ops.strings import match_payload_stream
from tests.test_bitprog import _pages


@pytest.mark.parametrize("pattern", [
    "a.*z", "ab|cde|fg", "^ab", "q[ax]+x", "a?", "a{40}",
    "gr[ae]y|colou?r", "bc$",
    # lead-run counter machines (sticky, non-sticky residual, '$'-sampled)
    "[abq]{9}", "[a-gq-z]{9,12}x", "[abx ]{10}$",
])
def test_interpret_parity(pattern):
    import jax.numpy as jnp

    from duckdb_parquet_parser_tpu.ops.pallas.stream_matcher import (
        match_stream_pallas,
    )

    rng = np.random.default_rng(12)
    pm, pl_, nn = _pages(rng, n_pages=300, vals_per_page=6, maxlen=18)
    prog = compile_bitprog(pattern)
    h0, s0 = match_payload_stream(np, pm, pl_, nn, None, None, prog=prog)
    # lane_tile=128 forces multiple grid tiles over 300 pages
    h1, s1 = match_stream_pallas(jnp.asarray(pm.T), pl_, nn, pattern,
                                 max_steps=pm.shape[1], lane_tile=128,
                                 inner=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(h1), h0, err_msg=pattern)
    np.testing.assert_array_equal(np.asarray(s1), s0, err_msg=pattern)


def test_tiled_layout_roundtrip():
    import jax.numpy as jnp

    from duckdb_parquet_parser_tpu.ops.pallas.stream_matcher import (
        tile_stream,
    )

    rng = np.random.default_rng(5)
    pt = rng.integers(0, 256, (64, 300), dtype=np.uint8)
    # lane pad rounds to a MAX_STREAMS*lane_tile quantum: 300 -> 8 tiles
    tiled = np.asarray(tile_stream(jnp.asarray(pt), 64, lane_tile=128))
    assert tiled.shape == (8, 64, 128)
    # tile t, column k == original column t*128 + k (zero-padded past N)
    for t in range(8):
        for k in (0, 5, 127):
            col = t * 128 + k
            want = pt[:, col] if col < 300 else np.zeros(64, np.uint8)
            np.testing.assert_array_equal(tiled[t, :, k], want)


def test_pick_streams_and_lane_tile():
    from duckdb_parquet_parser_tpu.ops.pallas.stream_matcher import (
        MAX_STREAMS, STREAM_VMEM_CAP, pick_lane_tile, pick_streams)

    # bench geometry: steps=1152 -> lane_tile shrinks until 8 tiles fit
    lt = pick_lane_tile(1152)
    assert MAX_STREAMS * 1152 * lt <= STREAM_VMEM_CAP
    assert pick_lane_tile(64) == 1024  # short strings keep the wide tile
    # multi-stream only when the tile count divides and the block fits
    assert pick_streams(152, 1152, 512) == 8
    assert pick_streams(150, 1152, 512) == 1   # 150 % 8 != 0
    assert pick_streams(152, 4096, 1024) == 1  # VMEM cap
    assert pick_streams(304, 1152, 256) == 8   # default cap stays at 8


def test_multi_stream_padding_lanes_inactive():
    """Lanes added by the lane_tile*MAX_STREAMS pad quantum must never
    contribute hits or seen counts (plen=0 pads)."""
    import jax.numpy as jnp

    from duckdb_parquet_parser_tpu.ops.pallas.stream_matcher import (
        match_stream_pallas,
    )

    rng = np.random.default_rng(3)
    pm, pl_, nn = _pages(rng, n_pages=37, vals_per_page=3, maxlen=12)
    prog = compile_bitprog("a.*z")
    h0, s0 = match_payload_stream(np, pm, pl_, nn, None, None, prog=prog)
    h1, s1 = match_stream_pallas(jnp.asarray(pm.T), pl_, nn, "a.*z",
                                 max_steps=pm.shape[1], lane_tile=128,
                                 inner=8, interpret=True)
    assert h1.shape[0] == 37 and s1.shape[0] == 37
    np.testing.assert_array_equal(np.asarray(h1), h0)
    np.testing.assert_array_equal(np.asarray(s1), s0)


def test_split_steps_wide_streams_parity(monkeypatch):
    """DPQ_STEP_BLOCKS splits the byte axis across a second sequential grid
    dim (carried state in VMEM scratch) so wider stream counts fit the
    VMEM cap — results must be bit-identical to the single-block walk."""
    import jax.numpy as jnp

    from duckdb_parquet_parser_tpu.ops.pallas.stream_matcher import (
        match_stream_pallas,
    )

    rng = np.random.default_rng(31)
    pm, pl_, nn = _pages(rng, n_pages=500, vals_per_page=5, maxlen=20)
    for pattern in ["a.*z", "q[ax]+x", "[abq]{9}"]:
        prog = compile_bitprog(pattern)
        h0, s0 = match_payload_stream(np, pm, pl_, nn, None, None, prog=prog)
        for sb, st in (("2", "8"), ("2", "16"), ("4", "16")):
            monkeypatch.setenv("DPQ_STEP_BLOCKS", sb)
            monkeypatch.setenv("DPQ_STREAMS", st)
            h1, s1 = match_stream_pallas(jnp.asarray(pm.T), pl_, nn, pattern,
                                         max_steps=pm.shape[1],
                                         lane_tile=128, inner=8,
                                         interpret=True)
            np.testing.assert_array_equal(np.asarray(h1), h0,
                                          err_msg=f"{pattern} sb={sb} s={st}")
            np.testing.assert_array_equal(np.asarray(s1), s0,
                                          err_msg=f"{pattern} sb={sb} s={st}")
            monkeypatch.delenv("DPQ_STEP_BLOCKS")
            monkeypatch.delenv("DPQ_STREAMS")
