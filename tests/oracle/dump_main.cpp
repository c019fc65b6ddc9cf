// dump_main.cpp — parity-oracle driver compiled against the READ-ONLY
// reference sources at /root/reference (used only as a test oracle; no
// reference code is copied into the framework).
//
// Usage:
//   dump <file> schema                     -> schema_string()
//   dump <file> column <name>              -> one line per value (to_string)
//   dump <file> column-rg <name> <rg>      -> one row group
//   dump <file> iter <name>                -> "pos len string" per non-null
//   dump <file> pages                      -> page index entries
//   dump <file> index <name> [chunk_size]  -> chunked-index totals + row map
//   dump <file> bench-iter <name> <reps>   -> timed full column iteration
#include <chrono>
#include <cstring>
#include <iostream>
#include <string>

#include "reader/parquet_reader.hpp"

int main(int argc, char** argv) {
  if (argc < 3) {
    std::cerr << "usage: dump <file> <mode> [args]\n";
    return 2;
  }
  std::string file = argv[1];
  std::string mode = argv[2];

  ParquetReader reader;
  if (!reader.open(file)) {
    std::cerr << "open failed\n";
    return 1;
  }

  if (mode == "schema") {
    std::cout << reader.schema_string();
    return 0;
  }
  if (mode == "pages") {
    for (size_t i = 0; i < reader.num_pages(); i++) {
      const auto& e = reader.page_index_entry(i);
      std::cout << i << " " << e.data_offset << " " << e.data_size << " "
                << e.row_group_idx << " " << e.column_idx << "\n";
    }
    return 0;
  }
  if (mode == "column" || mode == "column-rg") {
    std::vector<Value> vals;
    if (mode == "column") {
      vals = reader.read_column(argv[3]);
    } else {
      vals = reader.read_column(argv[3], size_t(std::stoul(argv[4])));
    }
    for (const auto& v : vals) std::cout << v.to_string() << "\n";
    return 0;
  }
  if (mode == "read-pages") {
    // per-page decode results via ColumnReader::read_pages
    const auto& col_info = reader.column(std::string(argv[3]));
    size_t rg = argc > 4 ? std::stoul(argv[4]) : 0;
    const auto& chunk = reader.metadata().row_groups[rg].columns[size_t(col_info.column_index)];
    ColumnReader cr(
        [&reader](size_t o, size_t l) { return reader.read_range(o, l); },
        chunk, col_info.type, col_info.max_def_level, col_info.max_rep_level);
    for (const auto& pr : cr.read_pages()) {
      std::cout << "page " << pr.page_num << " type " << int(pr.type)
                << " n " << pr.num_values << "\n";
      for (const auto& v : pr.values) std::cout << v.to_string() << "\n";
    }
    return 0;
  }
  if (mode == "iter") {
    // NOTE: only (pos, len) are printed.  The reference's next() returns a
    // char* into page_strings_, which its own auto-refill invalidates for the
    // last string of every page (use-after-free; observed emitting garbage on
    // row-group boundaries).  pos/len are value copies and well-defined;
    // string *contents* are parity-checked via the `column` mode instead.
    auto it = reader.column_iterator(argv[3]);
    while (it.has_next()) {
      auto [pos, len, ptr] = it.next();
      (void)ptr;
      std::cout << pos << " " << len << "\n";
    }
    return 0;
  }
  if (mode == "index") {
    size_t chunk_size = argc > 4 ? std::stoul(argv[4]) : 4096;
    size_t num_rows = size_t(reader.num_rows());
    std::vector<size_t> tuple_to_chunk(num_rows);
    auto it = reader.column_iterator(argv[3]);
    std::string chunk;
    size_t chunk_id = 0;
    while (it.has_next()) {
      auto [pos, len, ptr] = it.next();
      if (chunk.size() >= chunk_size) {
        chunk.clear();
        chunk_id++;
      }
      chunk += std::to_string(len) + std::string(ptr, len);
      tuple_to_chunk[pos] = chunk_id;
    }
    std::cout << "tuples " << num_rows << "\nchunks " << chunk_id + 1 << "\n";
    for (size_t i = 0; i < num_rows; i++) std::cout << tuple_to_chunk[i] << "\n";
    return 0;
  }
  if (mode == "bench-index") {
    // chunked-index build (the reference main.cpp loop) timed without the
    // row-map dump that `index` mode prints
    int reps = argc > 4 ? std::stoi(argv[4]) : 1;
    size_t chunks = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; r++) {
      size_t num_rows = size_t(reader.num_rows());
      std::vector<size_t> tuple_to_chunk(num_rows);
      auto it = reader.column_iterator(argv[3]);
      std::string chunk;
      size_t chunk_id = 0;
      while (it.has_next()) {
        auto [pos, len, ptr] = it.next();
        if (chunk.size() >= 4096) {
          chunk.clear();
          chunk_id++;
        }
        chunk += std::to_string(len) + std::string(ptr, len);
        tuple_to_chunk[pos] = chunk_id;
      }
      chunks = chunk_id + 1;
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::cout << "chunks " << chunks << " secs " << secs << "\n";
    return 0;
  }
  if (mode == "bench-iter") {
    int reps = argc > 4 ? std::stoi(argv[4]) : 1;
    size_t total = 0, bytes = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; r++) {
      auto it = reader.column_iterator(argv[3]);
      while (it.has_next()) {
        auto [pos, len, ptr] = it.next();
        (void)pos;
        (void)ptr;
        total++;
        bytes += len;
      }
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::cout << "values " << total << " bytes " << bytes << " secs " << secs
              << "\n";
    return 0;
  }
  if (mode == "bench-column") {
    int reps = argc > 4 ? std::stoi(argv[4]) : 1;
    size_t total = 0;
    auto t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; r++) {
      auto vals = reader.read_column(argv[3]);
      total += vals.size();
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    std::cout << "values " << total << " secs " << secs << "\n";
    return 0;
  }
  std::cerr << "unknown mode: " << mode << "\n";
  return 2;
}
