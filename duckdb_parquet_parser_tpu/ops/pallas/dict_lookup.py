"""Gather-free dictionary VALUE lookup — select for small tables, a Pallas
MXU kernel beyond.

The last hot-loop gather in the decode path was `take(dict_planes, gidx)`
(the reference's `dictionary[idx]` gather, src/reader/column_reader.cpp:
177-196): XLA:TPU gathers cost ~10-25 ns/element, capping dict-heavy decode
around ~50M rows/s.  Two gather-free strategies, dispatched on dictionary
size DN:

* DN <= SELECT_DICT_MAX: select-accumulation — `sum_d (gidx == d) * plane[d]`
  unrolled over the table.  O(DN) VPU ops per value; the same trick that won
  run expansion by ~10x (ops/pallas/README.md).

* DN <= PALLAS_DICT_MAX: the Pallas kernel below.  The lookup becomes a
  CHUNKED ONE-HOT MATMUL built in VMEM (never materialized to HBM — the
  reason this must be Pallas and not plain XLA, where the [values, DN]
  one-hot would be ~GBs of HBM traffic):

    - each i32 plane splits into four 8-bit limbs, exact in bfloat16;
    - the dictionary splits into `n_chunks = 128 // n_limbs` chunks of
      pow2 size CS, laid side-by-side in a [CS, 128] RHS — one MXU-shaped
      matrix holds the whole table;
    - per 1024-value block: one-hot over the IN-CHUNK index [.., 128, CS]
      (broadcast compare, no relayout), one dot -> [.., 128, 128] giving the
      value's limbs under EVERY chunk hypothesis, then a chunk-id select
      folds the right columns and rebuilds i32 planes with shifts.

  MACs per value = CS*128 (DN=1024 -> 8k), compute-bound on the MXU instead
  of latency-bound on the gather unit.

Everything is exact: one-hot rows select a single table row, limbs are
<= 255 (bf16-exact), and limb recombination is integer shifts.
"""

from __future__ import annotations

import functools

import numpy as np

# A/B on the 2M-row DN=100 fixture (v5e, value-space idx_vals, marginal
# methodology): select 2.0 ms (~1B rows/s), pallas kernel 9.7 ms (206M),
# XLA gather 32.5 ms (62M).  Select scales O(DN)/value -> crossover with the
# flat-ish pallas cost sits around DN~500-1000.
SELECT_DICT_MAX = 512
PALLAS_DICT_MAX = 8192
_TR = 8          # value-row tiles per block (TR x 128 values)
_LANE = 128


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p <<= 1
    return p


def _plan(dn: int, n_planes: int):
    """(CS, cs_log2, n_chunks_used, n_limbs) for a DN-entry table."""
    n_limbs = 4 * n_planes
    max_chunks = _LANE // n_limbs
    cs = _next_pow2(max(1, -(-dn // max_chunks)))
    cs = max(cs, 8)  # keep the contraction dim MXU-friendly
    n_chunks = -(-dn // cs)
    log2 = cs.bit_length() - 1
    return cs, log2, n_chunks, n_limbs


def build_limb_rhs(dict_planes, dn: int, cs: int, n_chunks: int):
    """[CS, 128] bf16 RHS: col l*n_chunks + c holds limb l of chunk c.
    jnp ops throughout — the planes may be tracers inside the decode jit."""
    import jax.numpy as jnp

    cols = []
    for plane in dict_planes:
        arr = jnp.asarray(plane)[:dn].astype(jnp.uint32)
        arr = jnp.pad(arr, (0, n_chunks * cs - dn))
        for li in range(4):
            limb = ((arr >> (8 * li)) & 0xFF).astype(jnp.float32)
            cols.append(jnp.transpose(limb.reshape(n_chunks, cs)))
    rhs = jnp.concatenate(cols, axis=1)  # [cs, n_limbs * n_chunks]
    return jnp.pad(rhs, ((0, 0), (0, _LANE - rhs.shape[1]))).astype(jnp.bfloat16)


def _kernel(gidx_ref, rhs_ref, *out_refs, cs, cs_log2, n_chunks, n_planes):
    import jax
    import jax.numpy as jnp

    g = gidx_ref[:]                       # [TR, 128] i32
    in_chunk = g & (cs - 1)
    chunk = g >> cs_log2
    oh = (
        in_chunk[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (_TR, _LANE, cs), 2)
    ).astype(jnp.bfloat16)
    prod = jax.lax.dot_general(
        oh, rhs_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TR, 128, 128]: limbs under every chunk hypothesis
    sel = chunk[:, :, None] == jax.lax.broadcasted_iota(
        jnp.int32, (_TR, _LANE, n_chunks), 2
    )
    for p in range(n_planes):
        acc = jnp.zeros((_TR, _LANE), jnp.int32)
        for li in range(4):
            l = p * 4 + li
            limb = jnp.sum(
                jnp.where(sel, prod[:, :, l * n_chunks : (l + 1) * n_chunks],
                          0.0),
                axis=2,
            ).astype(jnp.int32)
            acc = acc | (limb << (8 * li))
        out_refs[p][:] = acc


@functools.lru_cache(maxsize=32)
def _lookup_call(n_planes, cs, cs_log2, n_chunks, m_rows, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(
        _kernel, cs=cs, cs_log2=cs_log2, n_chunks=n_chunks, n_planes=n_planes
    )
    grid = (-(-m_rows // _TR),)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TR, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, _LANE), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((_TR, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(n_planes)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((grid[0] * _TR, _LANE), jnp.int32)
            for _ in range(n_planes)
        ),
        interpret=bool(interpret),
    )


def dict_lookup_pallas(dict_planes, gidx, dn: int):
    """MXU-chunked lookup: dict_planes list of [DN] i32, gidx [N, V] i32
    (pre-clipped to [0, DN)); returns list of [N, V] i32."""
    import jax
    import jax.numpy as jnp

    n, v = gidx.shape
    n_planes = len(dict_planes)
    cs, cs_log2, n_chunks, _limbs = _plan(dn, n_planes)
    rhs = build_limb_rhs(dict_planes, dn, cs, n_chunks)

    m = n * v
    m_rows = -(-m // _LANE)
    pad_rows = -(-m_rows // _TR) * _TR
    flat = jnp.ravel(gidx)
    flat = jnp.pad(flat, (0, pad_rows * _LANE - m)).reshape(pad_rows, _LANE)
    # interpret only off-TPU (the axon relay platform IS a TPU; interpret
    # mode there would trace the kernel body op-by-op on the device)
    call = _lookup_call(
        n_planes, cs, cs_log2, n_chunks, pad_rows,
        jax.default_backend() == "cpu",
    )
    outs = call(flat, rhs)
    if not isinstance(outs, (list, tuple)):
        outs = (outs,)
    return [o.reshape(-1)[:m].reshape(n, v) for o in outs]


def dict_lookup_select(xp, dict_planes, gidx, dn: int, ways: int = 8):
    """Select-accumulation lookup for small tables (exact, pure VPU).

    The accumulation runs in `ways` INDEPENDENT partial sums (d strided)
    combined by a short tree at the end: a single `acc = acc + where(...)`
    chain serializes DN adds back-to-back, and the VPU's multiple ALUs can
    only overlap work that is not on that carried chain (round-4 A/B on
    the DN=100 fixture: 8-way split ~2x the single chain)."""
    outs = []
    for plane in dict_planes:
        accs = [xp.zeros_like(gidx) for _ in range(min(ways, max(dn, 1)))]
        for d in range(dn):
            w = d % len(accs)
            accs[w] = accs[w] + xp.where(gidx == d, plane[d], 0)
        while len(accs) > 1:  # pairwise combine tree
            nxt = [a + b for a, b in zip(accs[0::2], accs[1::2])]
            if len(accs) % 2:
                nxt.append(accs[-1])
            accs = nxt
        outs.append(accs[0])
    return outs


def dict_lookup_local(xp, planes_pp, idx, dn_max: int, ways: int = 8):
    """Select-accumulation over PER-PAGE local tables (round 4).

    `planes_pp`: list of [N, dn_max] i32 — plane values of each page's OWN
    dictionary chunk (built once on host from page_dict_base/size; zero
    past dict_size).  `idx` is the LOCAL in-page index [N, V].  A multi-
    row-group file concatenates its chunk dictionaries into one global
    table, so the global select scans sum(chunk sizes) entries per value
    while each page can only ever hit its own chunk — selecting on the
    local index costs dn_max ops instead (4x fewer on a 4-row-group file).
    The value operand is a broadcast [N, 1] column; same vreg cost as the
    global select's scalar."""
    outs = []
    for pp in planes_pp:
        accs = [xp.zeros_like(idx) for _ in range(min(ways, max(dn_max, 1)))]
        for d in range(dn_max):
            w = d % len(accs)
            accs[w] = accs[w] + xp.where(idx == d, pp[:, d][:, None], 0)
        while len(accs) > 1:
            nxt = [a + b for a, b in zip(accs[0::2], accs[1::2])]
            if len(accs) % 2:
                nxt.append(accs[-1])
            accs = nxt
        outs.append(accs[0])
    return outs


def dict_lookup(xp, dict_planes, gidx):
    """Dispatcher: numpy golden -> take; DN <= SELECT_DICT_MAX -> select;
    DN <= PALLAS_DICT_MAX -> Pallas MXU kernel; else the XLA gather."""
    if not dict_planes:
        return []
    dn = int(np.asarray(dict_planes[0]).shape[0]) if xp is np else int(
        dict_planes[0].shape[0]
    )
    if xp is np:
        return [np.asarray(p)[gidx] for p in dict_planes]  # np.take is ~10x slower
    if dn <= SELECT_DICT_MAX:
        return dict_lookup_select(xp, dict_planes, gidx, dn)
    if dn <= PALLAS_DICT_MAX and len(dict_planes) * 4 <= _LANE:
        return dict_lookup_pallas(dict_planes, gidx, dn)
    return [xp.take(p, gidx) for p in dict_planes]
