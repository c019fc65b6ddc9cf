// Chunked-index boundary plan over the PS_INDEX emission stream.
//
// Reproduces the reference prototype's chunking exactly (reference:
// src/main.cpp:10-38): entries append `std::to_string(len) + value` to the
// current chunk; the chunk is flushed BEFORE an append once its accumulated
// size has reached `chunk_size` (chunks overshoot by one entry — a quirk
// preserved deliberately), and every emitted row records its chunk id in the
// row->chunk map (rows with no emission keep 0).
//
// The emission stream comes from the prescan pack pass (PS_INDEX):
// page-contiguous (pos, len) slots in row order, len == -1 marking dropped
// OOB dictionary indices (skipped — they are NULL in column space).  The
// whole plan is one sequential O(M) sweep — a few ms at 10^6 entries — so
// the index build's cost is the prescan itself.

#pragma once

#include <cstdint>
#include <cstring>
#include <memory>
#include <vector>

#include "dpq_reader.hpp"

namespace dpq {

inline int dec_digits_i64(int64_t v) {
  int d = 1;
  while (v >= 10) {
    v /= 10;
    d++;
  }
  return d;
}

inline std::unique_ptr<ArrayStore> index_plan(const int64_t* pos,
                                              const int32_t* lens,
                                              int64_t cap, int64_t num_rows,
                                              int64_t chunk_size) {
  if (cap < 0 || num_rows < 0 || chunk_size <= 0)
    throw Error("index_plan: bad arguments");

  int64_t m = 0;
  for (int64_t j = 0; j < cap; j++) m += (lens[j] >= 0);

  auto store = std::make_unique<ArrayStore>();
  store->dims["m"] = m;
  store->dims["num_rows"] = num_rows;
  const int64_t m1 = std::max<int64_t>(m, 1);
  auto* out_pos = store->alloc<int64_t>("positions", {m1});
  auto* out_len = store->alloc<int64_t>("lens", {m1});
  auto* out_chunk = store->alloc<int64_t>("chunk_of_entry", {m1});
  auto* t2c =
      store->alloc<int64_t>("tuple_to_chunk", {std::max<int64_t>(num_rows, 1)});
  // calloc-backed: rows without an emission keep chunk 0 (reference quirk)

  std::vector<int64_t> starts;
  starts.push_back(0);
  int64_t acc = 0, chunk = 0, e = 0;
  for (int64_t j = 0; j < cap; j++) {
    const int32_t ln = lens[j];
    if (ln < 0) continue;
    if (acc >= chunk_size) {  // flush BEFORE the append (src/main.cpp:26-29)
      chunk++;
      acc = 0;
      starts.push_back(e);
    }
    const int64_t p = pos[j];
    out_pos[e] = p;
    out_len[e] = ln;
    out_chunk[e] = chunk;
    if (p >= 0 && p < num_rows) t2c[p] = chunk;
    acc += ln + dec_digits_i64(ln);
    e++;
  }
  store->dims["num_chunks"] = chunk + 1;
  auto* out_starts =
      store->alloc<int64_t>("chunk_starts", {int64_t(starts.size())});
  std::memcpy(out_starts, starts.data(), starts.size() * sizeof(int64_t));
  return store;
}

}  // namespace dpq
