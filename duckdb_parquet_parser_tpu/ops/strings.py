"""Device-side BYTE_ARRAY parsing — length prefixes and regex over RAW page
payloads, with zero per-value host work.

This is the full TPU-ification of the reference's string hot loops
(reference: src/reader/parquet_reader.cpp:442-453 PLAIN prefix walk;
src/reader/column_reader.cpp:249-253): the host uploads each page's raw value
section (`payload` [N, P] u8, from the PS_PAYLOAD pre-scan) and the device
does the rest:

  * `string_offsets`  — per-value (offset, len) tables via a lax.scan over the
    per-page value chain: all pages advance in lockstep, one value per step
    (pages are ~1 KB ⇒ tens of values), each step a 4-byte gather per page.
  * `match_payload_stream` — a streaming DFA that consumes one byte column
    per step across all pages: each page lane tracks (prefix_left, ctr,
    dfa_state, values_done, accepts), where ctr double-serves as the length
    accumulator (inside a prefix) and the bytes-left countdown (inside a
    value).  With use_mxu=True the transition is a gather-free one-hot
    matmul (mxu_dfa.py); no char matrix is ever materialized, so scan
    traffic equals the raw page bytes.

Both are xp-generic (numpy mirrors are the test oracle).
"""

from __future__ import annotations

import os

import numpy as np

# lax.scan unroll factor for the streaming matcher (tunable; measured sweet
# spot on v5e is 8-16)
SCAN_UNROLL = int(os.environ.get("DPQ_SCAN_UNROLL", "8"))


def string_offsets(xp, payload, nn, cap: int):
    """Parse PLAIN BYTE_ARRAY length prefixes on device.

    payload: [N, P] u8 (raw value sections, zero-padded);
    nn: [N] i32 value counts.  Returns (offs [N, cap] i32 — first char byte,
    lens [N, cap] i32); entries beyond nn are zero.

    All memory access is flat 1-D gathers (XLA:TPU lowers those well; 2-D
    take_along_axis is an order of magnitude slower — measured).
    """
    n, p = payload.shape
    flat = payload.reshape(-1).astype(xp.int32)
    base = xp.arange(n, dtype=xp.int32) * p

    def le32_at(off):  # absolute flat offsets [N] -> [N]
        o = xp.clip(off, 0, n * p - 4)
        b = lambda k: xp.take(flat, o + k)
        return b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)

    if xp is np:
        offs = np.zeros((n, cap), np.int32)
        lens = np.zeros((n, cap), np.int32)
        off = base.copy()
        for k in range(cap):
            ln = le32_at(off)
            live = k < nn
            offs[:, k] = np.where(live, off - base + 4, 0)
            lens[:, k] = np.where(live, ln, 0)
            off = np.where(live, off + 4 + ln, off)
        return offs, lens

    import jax

    def step(off, k):
        ln = le32_at(off)
        live = k < nn
        out_off = xp.where(live, off - base + 4, 0)
        out_len = xp.where(live, ln, 0)
        return xp.where(live, off + 4 + ln, off), (out_off, out_len)

    _, (offs, lens) = jax.lax.scan(
        step, base, xp.arange(cap, dtype=xp.int32)
    )
    return xp.transpose(offs), xp.transpose(lens)


def match_payload_stream(xp, payload, payload_len, nn, table, accept,
                         max_steps: int | None = None, use_mxu: bool = False):
    """Streaming DFA over raw PLAIN BYTE_ARRAY payloads.

    Returns (accept_counts [N] i32, values_seen [N] i32): number of values per
    page whose bytes the DFA accepts, with value boundaries parsed from the
    4-byte length prefixes on the fly.

    use_mxu=True replaces the table-gather transition with one-hot matmuls on
    the MXU (see mxu_dfa.py for the rationale: XLA gathers are ~10-25 ns/elem
    on TPU, the matmul path is compute-bound and far faster).
    """
    n, p = payload.shape
    steps = int(max_steps or p)
    n_states = table.shape[0]
    tflat = xp.asarray(table, dtype=xp.int32).reshape(-1)
    acc_i = xp.asarray(accept).astype(xp.int32)
    acc0 = int(np.asarray(accept)[0])  # accept of the empty string
    payload_i = payload.astype(xp.int32)
    nn = xp.asarray(nn, dtype=xp.int32)
    payload_len = xp.asarray(payload_len, dtype=xp.int32)

    def gather_transition(state, c):
        nxt = xp.take(tflat, xp.clip(state, 0, None) * 256 + c)
        return nxt, xp.take(acc_i, nxt)

    # Carry layout: `ctr` serves double duty — inside a length prefix it
    # accumulates the little-endian length; inside a value it counts bytes
    # left.  They are never live simultaneously (at the prefix->value
    # boundary the accumulated length IS the initial bytes-left), which
    # drops two registers and several selects per byte.  Inactive lanes
    # (past the section or the value count) may hold garbage ctr/state —
    # harmless, since `active` gates every finalize.
    def control_update(carry, b, c, st2, acc_st2):
        """Value-boundary state machine for one byte (st2/acc_st2 = the DFA
        transition result for this byte under the carried state)."""
        prefix_left, ctr, state, done, hits = carry
        active = (b < payload_len) & (done < nn)
        in_prefix = prefix_left > 0

        # prefix byte: accumulate little-endian length into ctr
        la2 = ctr | (c << (8 * (4 - prefix_left)))
        pl2 = prefix_left - 1
        prefix_done = in_prefix & (pl2 == 0) & active
        zero_len = prefix_done & (la2 == 0)

        # value byte: count down ctr
        bl2 = ctr - 1
        value_done = (~in_prefix) & (bl2 == 0) & active

        fin = zero_len | value_done
        hits = hits + xp.where(fin, xp.where(zero_len, acc0, acc_st2), 0)
        done = done + fin.astype(xp.int32)

        new_prefix_left = xp.where(fin, 4, xp.where(in_prefix, pl2, prefix_left))
        new_ctr = xp.where(fin, 0, xp.where(in_prefix, la2, bl2))
        new_state = xp.where(prefix_done, 0, xp.where(in_prefix, state, st2))
        return (new_prefix_left, new_ctr, new_state, done, hits)

    zero = lambda: xp.zeros(n, xp.int32)
    init = (xp.full(n, 4, xp.int32), zero(), zero(), zero(), zero())

    if xp is np:
        carry = init
        for b in range(steps):
            c = payload_i[:, b]
            st2, acc_st2 = gather_transition(carry[2], c)
            carry = control_update(carry, b, c, st2, acc_st2)
        return carry[4], carry[3]

    import jax

    cols = xp.transpose(payload_i)  # [P, N]

    # Byte-batched MXU transition: one block-diagonal matmul per B bytes.
    # Default OFF — measured 10x SLOWER on v5e (the onehot concat + group
    # reshape relayouts cost far more than the MXU padding they save).
    if use_mxu and os.environ.get("DPQ_DFA_BYTE_BATCH") == "1":
        from .mxu_dfa import make_hypothesis_transition

        g_fn, select_fn, b_bytes = make_hypothesis_transition(table, accept)
        steps_p = -(-steps // b_bytes) * b_bytes
        if steps_p > cols.shape[0]:
            cols = xp.concatenate(
                [cols, xp.zeros((steps_p - cols.shape[0], n), cols.dtype)]
            )
        groups = cols[:steps_p].reshape(-1, b_bytes, n)
        b_idx = xp.arange(steps_p, dtype=xp.int32).reshape(-1, b_bytes)

        def gstep(carry, xs):
            bs, cg = xs  # [B], [B, N]
            # one MXU matmul computes the per-hypothesis transitions of all
            # B bytes; only the select + boundary control stays sequential
            g_list = g_fn(cg)
            for t in range(b_bytes):
                st2, acc_st2 = select_fn(carry[2], g_list[t])
                carry = control_update(carry, bs[t], cg[t], st2, acc_st2)
            return carry, None

        carry, _ = jax.lax.scan(
            gstep, init, (b_idx, groups), unroll=max(1, SCAN_UNROLL // b_bytes)
        )
        return carry[4], carry[3]

    if use_mxu:
        from .mxu_dfa import make_transition

        transition = make_transition(table, accept)
    else:
        transition = gather_transition

    def step(carry, xs):
        b, c = xs
        st2, acc_st2 = transition(carry[2], c)
        return control_update(carry, b, c, st2, acc_st2), None

    carry, _ = jax.lax.scan(
        step, init, (xp.arange(steps, dtype=xp.int32), cols[:steps]),
        unroll=SCAN_UNROLL,
    )
    return carry[4], carry[3]


def match_values_by_offset(xp, payload, offs, lens, table, accept,
                           pitch: int):
    """Per-value DFA with chars gathered from the payload on the fly
    (pitch = max value length scan steps; all gathers flat 1-D).
    Values longer than `pitch` would be truncated — callers must size pitch
    from the true max length.  Returns [N, cap] bool accepts."""
    n, cap = offs.shape
    p = payload.shape[1]
    tflat = xp.asarray(table, dtype=xp.int32).reshape(-1)
    acc = xp.asarray(accept)
    flat = payload.reshape(-1).astype(xp.int32)
    gbase = (xp.arange(n, dtype=xp.int32) * p)[:, None] + offs  # [N, cap]
    top = n * p - 1

    if xp is np:
        state = np.zeros((n, cap), np.int32)
        for j in range(pitch):
            c = flat[np.clip(gbase + j, 0, top)]
            nxt = tflat[state * 256 + c]
            state = np.where(j < lens, nxt, state)
        return acc[state]

    import jax

    def step(state, j):
        c = xp.take(flat, xp.clip(gbase + j, 0, top))
        nxt = xp.take(tflat, state * 256 + c)
        return xp.where(j < lens, nxt, state), None

    state, _ = jax.lax.scan(
        step, xp.zeros((n, cap), xp.int32), xp.arange(pitch, dtype=xp.int32)
    )
    return xp.take(acc, state)
