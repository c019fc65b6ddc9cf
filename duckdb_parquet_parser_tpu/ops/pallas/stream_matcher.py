"""Pallas streaming matcher — the resident-serving fast path (round 3b).

Round-3b probes (ops/pallas/README.md) showed the lax.scan walk is bound by
its xs FEED (~30 GB/s effective on this chip) — not by op count, chain
depth, or step count.  This kernel streams a TILED-CONTIGUOUS copy of the
byte matrix ([n_tiles, steps, LANE_TILE] u8, one contiguous block DMA per
grid step) and walks ALL bytes of each lane tile inside ONE kernel
invocation (an internal fori_loop with INNER-byte unrolled blocks) — the
per-invocation fixed cost that throttled finer grids disappears, and the
UNCHANGED bitprog transition + value-boundary control (the production
matcher ops — elementwise int32, no gathers) run on VMEM-resident data.

Round 4: each grid invocation walks MAX_STREAMS=8 lane tiles at once with
[8, lane_tile] carried state — the 1D [lane_tile] layout left 7 of 8 vreg
sublanes empty and exposed the per-byte carried-dependency recurrence; 8
independent recurrences hide each other (README round 4/4b).  Measured on
the 2M-row fixture (marginal methodology): chain 2.01 ms (995M rows/s),
wide 1.83 ms (1.09B — was 595M single-stream), 3-alt 1.11B; the sweeps
and negative results live in ops/pallas/README.md.

Semantics are identical to ops/strings._match_stream_multi's
single-pattern walk; parity is pinned in test_pallas_stream (interpret
mode on CPU) and the real-device lane (test_tpu_parity).
"""

from __future__ import annotations

import functools
import os

import numpy as np

LANE_TILE = 1024   # lanes per grid tile (swept optimum on v5e)
INNER = 32         # bytes per unrolled inner block (must divide the steps)
VMEM_TILE_CAP = 4 << 20  # fall back to lax.scan when steps*LANE_TILE exceeds
# Round 4: the kernel is bound by the per-byte carried-dependency RECURRENCE
# with ~idle issue capacity (ops/pallas/README.md round 4) — so each grid
# invocation now walks MAX_STREAMS independent lane tiles at once: the
# carried state is [S, LANE_TILE] (S fills the vreg sublanes a 1D
# [LANE_TILE] op leaves empty), giving S independent recurrences whose
# latency chains hide each other.  S auto-reduces to the largest power of
# two that divides the tile count and fits the VMEM block cap.
MAX_STREAMS = 8
STREAM_VMEM_CAP = 5 << 20  # cap on the streams*steps*lane_tile payload
                           # block (double-buffered by the pipeline; VMEM
                           # is ~16 MB total on v5e)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def stream_supported(steps: int) -> bool:
    """Whether the kernel's VMEM tile fits for this step count — at the
    lane tile pick_lane_tile would actually choose (it shrinks the tile
    for large step counts, so e.g. steps in (4096, 32768] still route to
    the kernel at a narrower tile instead of the slower lax.scan walk)."""
    steps = _round_up(steps, INNER)
    return steps * pick_lane_tile(steps) <= VMEM_TILE_CAP


def pick_lane_tile(steps: int) -> int:
    """Widest lane tile whose MAX_STREAMS payload block fits VMEM.
    Mosaic needs the sublane (streams) block dim divisible by 8, so the
    fit must hold at S=MAX_STREAMS — narrower tiles keep the op shapes
    [8, lt] fully sublane-packed either way.  DPQ_LANE_TILE overrides
    (sweeps)."""
    env = os.environ.get("DPQ_LANE_TILE")
    if env:
        return int(env)
    lt = LANE_TILE
    while lt > 128 and MAX_STREAMS * steps * lt > STREAM_VMEM_CAP:
        lt //= 2
    return lt


def pick_streams(n_tiles: int, steps: int, lane_tile: int) -> int:
    """Largest multiple-of-8 stream count <= cap (default MAX_STREAMS;
    DPQ_STREAMS overrides) that divides the tile count and fits the
    payload block in VMEM, else 1 (the legacy single-stream layout).
    Intermediate counts are not expressible: Mosaic requires the streams
    block dim be divisible by 8."""
    env = os.environ.get("DPQ_STREAMS")
    cap = int(env) if env else MAX_STREAMS
    s = (cap // 8) * 8
    while s >= 8:
        if n_tiles % s == 0 and s * steps * lane_tile <= STREAM_VMEM_CAP:
            return s
        s -= 8
    return 1


@functools.lru_cache(maxsize=64)
def _build_call(patterns: tuple, steps: int, n_pad: int, lane_tile: int,
                inner: int, interpret: bool, streams: int = 1,
                step_blocks: int = 1):
    """The K-pattern kernel: the tile DMA, the byte loop, and the boundary
    control amortize over every pattern (the in-kernel analog of
    ops/strings.match_payload_multi).  `streams` independent lane tiles
    walk per grid invocation with [streams, lane_tile] carried state —
    independent recurrences that hide each other's latency chains
    (round 4; the win is ~flat time per invocation as streams grow)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from ..bitprog import compile_bitprog, make_bitprog_transition

    specs = [make_bitprog_transition(jnp, compile_bitprog(p))
             for p in patterns]
    k = len(specs)
    total_regs = sum(s[1] for s in specs)
    n_tiles = n_pad // lane_tile
    n_inner = steps // inner
    s = streams

    def byte_step(b, c, plen, nnv, carry):
        """One payload byte for every lane in `c` (shape-agnostic: [lt]
        in the legacy kernel, [s, lt] in the multi-stream one — the
        transitions and boundary control are pure elementwise int32)."""
        prefix_left, ctr, done = carry[0], carry[1], carry[2]
        hits = list(carry[3:3 + k])
        state = list(carry[3 + k:])
        st2, accs = [], []
        at = 0
        for trans, nregs, _ae in specs:
            s2, a = trans(tuple(state[at:at + nregs]), c)
            at += nregs
            st2.extend(s2)
            accs.append(a)
        active = (b < plen) & (done < nnv)
        in_prefix = prefix_left > 0
        la2 = ctr | (c << (8 * (4 - prefix_left)))
        pl2 = prefix_left - 1
        prefix_done = in_prefix & (pl2 == 0) & active
        zero_len = prefix_done & (la2 == 0)
        bl2 = ctr - 1
        value_done = (~in_prefix) & (bl2 == 0) & active
        fin = zero_len | value_done
        hits = [
            h + jnp.where(fin, jnp.where(zero_len, spec[2], a), 0)
            for h, spec, a in zip(hits, specs, accs)
        ]
        done = done + fin.astype(jnp.int32)
        prefix_left = jnp.where(
            fin, 4, jnp.where(in_prefix, pl2, prefix_left))
        ctr = jnp.where(fin, 0, jnp.where(in_prefix, la2, bl2))
        state = [
            jnp.where(prefix_done, 0, jnp.where(in_prefix, o, nw))
            for o, nw in zip(state, st2)
        ]
        return (prefix_left, ctr, done, *hits, *state)

    def walk(shape, plen, nnv, get_block, extract, init=None,
             n_blocks=None, byte_base=0):
        zero = jnp.zeros(shape, jnp.int32)

        def step(i, carry):
            blk = get_block(i)  # one hoisted inner-block slice per step
            for j in range(inner):
                b = byte_base + i * inner + j
                c = extract(blk, j).astype(jnp.int32)
                carry = byte_step(b, c, plen, nnv, carry)
            return carry

        if init is None:
            init = ((jnp.full(shape, 4, jnp.int32), zero, zero)
                    + tuple(zero for _ in range(k))
                    + tuple(zero for _ in range(total_regs)))
        return jax.lax.fori_loop(0, n_inner if n_blocks is None else n_blocks,
                                 step, init)

    def kernel(pay_ref, plen_ref, nn_ref, hits_ref, seen_ref):
        # multi-stream: [s, lane_tile] carried state — s independent
        # recurrences per invocation whose latency chains hide each other
        out = walk((s, lane_tile), plen_ref[...], nn_ref[...],
                   lambda i: pay_ref[:, pl.ds(i * inner, inner), :],
                   lambda blk, j: blk[:, j, :])
        for kk in range(k):
            hits_ref[:, kk, :] = out[3 + kk]
        seen_ref[:, 0, :] = out[2]

    def kernel1(pay_ref, plen_ref, nn_ref, hits_ref, seen_ref):
        # legacy single-stream layout: [lane_tile] 1D state, flat outputs
        # (kept for tile counts/steps the multi-stream blocks can't take —
        # Mosaic requires the streams block dim divisible by 8)
        out = walk((lane_tile,), plen_ref[0, :], nn_ref[0, :],
                   lambda i: pay_ref[0, pl.ds(i * inner, inner), :],
                   lambda blk, j: blk[j, :])
        for kk in range(k):
            hits_ref[kk, :] = out[3 + kk]
        seen_ref[0, :] = out[2]

    # Split-steps variant (DPQ_STEP_BLOCKS > 1): the byte axis additionally
    # splits across a second SEQUENTIAL grid dimension with the carried
    # state living in VMEM scratch — the per-invocation payload block
    # shrinks by the block count, so wider stream counts (S=16) fit the
    # VMEM cap at full lane tiles.  Outputs are written every step block
    # (the block stays resident until the tile index changes; the final
    # write wins).
    n_sb = step_blocks if s > 1 else 1
    if s > 1 and n_sb > 1:
        steps_blk = steps // n_sb
        n_blk_inner = steps_blk // inner
        C = 3 + k + total_regs
        from jax.experimental.pallas import tpu as pltpu

        def kernel_sb(pay_ref, plen_ref, nn_ref, hits_ref, seen_ref,
                      st_ref):
            sb = pl.program_id(1)
            first = (sb == 0)
            zero = jnp.zeros((s, lane_tile), jnp.int32)
            four = jnp.full((s, lane_tile), 4, jnp.int32)
            init = []
            for ci in range(C):
                fresh = four if ci == 0 else zero
                init.append(jnp.where(first, fresh, st_ref[ci]))
            out = walk((s, lane_tile), plen_ref[...], nn_ref[...],
                       lambda i: pay_ref[:, pl.ds(i * inner, inner), :],
                       lambda blk, j: blk[:, j, :],
                       init=tuple(init), n_blocks=n_blk_inner,
                       byte_base=sb * steps_blk)
            for ci in range(C):
                st_ref[ci] = out[ci]
            for kk in range(k):
                hits_ref[:, kk, :] = out[3 + kk]
            seen_ref[:, 0, :] = out[2]

        return pl.pallas_call(
            kernel_sb,
            grid=(n_tiles // s, n_sb),
            in_specs=[
                pl.BlockSpec((s, steps_blk, lane_tile),
                             lambda t, sb: (t, sb, 0)),
                pl.BlockSpec((s, lane_tile), lambda t, sb: (t, 0)),
                pl.BlockSpec((s, lane_tile), lambda t, sb: (t, 0)),
            ],
            out_specs=[
                pl.BlockSpec((s, k, lane_tile), lambda t, sb: (t, 0, 0)),
                pl.BlockSpec((s, 1, lane_tile), lambda t, sb: (t, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, k, lane_tile), jnp.int32),
                jax.ShapeDtypeStruct((n_tiles, 1, lane_tile), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((C, s, lane_tile), jnp.int32)],
            interpret=interpret,
        )

    if s == 1:
        return pl.pallas_call(
            kernel1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, steps, lane_tile), lambda t: (t, 0, 0)),
                pl.BlockSpec((1, lane_tile), lambda t: (0, t)),
                pl.BlockSpec((1, lane_tile), lambda t: (0, t)),
            ],
            out_specs=[
                pl.BlockSpec((k, lane_tile), lambda t: (0, t)),
                pl.BlockSpec((1, lane_tile), lambda t: (0, t)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((k, n_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            ],
            interpret=interpret,
        )

    return pl.pallas_call(
        kernel,
        grid=(n_tiles // s,),
        in_specs=[
            pl.BlockSpec((s, steps, lane_tile), lambda t: (t, 0, 0)),
            pl.BlockSpec((s, lane_tile), lambda t: (t, 0)),
            pl.BlockSpec((s, lane_tile), lambda t: (t, 0)),
        ],
        out_specs=[
            pl.BlockSpec((s, k, lane_tile), lambda t: (t, 0, 0)),
            pl.BlockSpec((s, 1, lane_tile), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, k, lane_tile), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 1, lane_tile), jnp.int32),
        ],
        interpret=interpret,
    )


def tile_stream(payload_t, steps: int, lane_tile: int | None = None,
                inner: int = INNER):
    """[P, N] u8 pre-transposed stream -> the kernel's TILED-CONTIGUOUS
    resident layout [n_tiles, steps', lane_tile] (built ONCE at residency —
    rebuilding per query would re-stream the whole matrix).  steps' rounds
    up to the INNER quantum (Mosaic must statically prove the dynamic
    byte-block offsets are sublane-aligned); the pad bytes sit past every
    payload_len, so they are inactive.  The lane count pads to a
    MAX_STREAMS*lane_tile quantum so the multi-stream kernel can always
    take MAX_STREAMS tiles per invocation (pad lanes have plen=0 ->
    inactive)."""
    import jax
    import jax.numpy as jnp

    p, n = payload_t.shape
    steps = _round_up(min(steps, p), inner)
    if lane_tile is None:
        lane_tile = pick_lane_tile(steps)
    q = MAX_STREAMS
    env_q = os.environ.get("DPQ_STREAMS")
    if env_q:  # wider sweeps need the tile count divisible by the cap
        q = max(q, (int(env_q) // 8) * 8)
    n_pad = _round_up(n, lane_tile * q)

    @jax.jit
    def build(x):
        if steps > p:
            x = jnp.concatenate(
                [x, jnp.zeros((steps - p, n), x.dtype)], axis=0)
        else:
            x = x[:steps]
        if n_pad != n:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
        return jnp.transpose(
            x.reshape(steps, n_pad // lane_tile, lane_tile), (1, 0, 2))

    return build(payload_t)


def match_stream_pallas_tiled(tiled, payload_len, nn, pattern,
                              n: int, inner: int = INNER,
                              interpret: bool = False):
    """Streaming match over a `tile_stream` layout.  Returns
    (hits, seen [n] i32) — the match_payload_stream contract (dict pages
    masked by the caller via plen/nn).  `pattern` may be a single pattern
    string or a tuple of K patterns (one fused walk, K hit vectors —
    `hits` is then [K, n])."""
    import jax.numpy as jnp

    single = isinstance(pattern, str)
    patterns = (pattern,) if single else tuple(pattern)
    n_tiles, steps, lt = tiled.shape
    n_pad = n_tiles * lt
    k = len(patterns)
    while steps % inner:
        inner //= 2
    # DPQ_STEP_BLOCKS > 1: split the byte axis across a second sequential
    # grid dim (state in VMEM scratch) — the per-invocation payload block
    # shrinks, letting wider stream counts fit the VMEM cap
    n_sb = 1
    env_sb = os.environ.get("DPQ_STEP_BLOCKS")
    if env_sb:
        n_sb = max(1, int(env_sb))
        while n_sb > 1 and steps % (n_sb * inner):
            n_sb -= 1
    streams = pick_streams(n_tiles, steps // n_sb, lt)
    if streams == 1:
        n_sb = 1
    plen = jnp.asarray(payload_len, jnp.int32)
    nnv = jnp.asarray(nn, jnp.int32)
    if n_pad != n:
        plen = jnp.pad(plen, (0, n_pad - n))
        nnv = jnp.pad(nnv, (0, n_pad - n))
    call = _build_call(patterns, steps, n_pad, lt, inner, interpret,
                       streams, n_sb)
    if streams == 1:
        hits, seen = call(tiled, plen.reshape(1, n_pad),
                          nnv.reshape(1, n_pad))
        seen = seen[0]
    else:
        hits, seen = call(tiled, plen.reshape(n_tiles, lt),
                          nnv.reshape(n_tiles, lt))
        hits = jnp.transpose(hits, (1, 0, 2)).reshape(k, n_pad)
        seen = seen.reshape(n_pad)
    if single:
        return hits[0, :n], seen[:n]
    return hits[:, :n], seen[:n]


def match_stream_pallas(payload_t, payload_len, nn, pattern: str,
                        max_steps: int, lane_tile: int | None = None,
                        inner: int = INNER, interpret: bool = False):
    """Convenience wrapper over a [P, N] stream: tiles then matches.  For
    REPEATED queries use tile_stream once + match_stream_pallas_tiled."""
    p, n = payload_t.shape
    steps = min(max_steps, p)
    while steps % inner:
        inner //= 2
    tiled = tile_stream(payload_t, steps, lane_tile)
    return match_stream_pallas_tiled(tiled, payload_len, nn, pattern, n,
                                     inner=inner, interpret=interpret)
