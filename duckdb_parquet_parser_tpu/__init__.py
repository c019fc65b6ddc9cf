"""duckdb_parquet_parser_tpu — a TPU-native vectorized Parquet scan engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`sputnik89/duckdb-parquet-parser`: host-side (C++17) Thrift footer/metadata
parsing, page indexing and structural pre-scan; device-side branch-free page
decode (PLAIN / RLE-dictionary / definition-level null materialization), regex
(LIKE / NOT LIKE) page-pruning scans, and chunked inverted-index construction
— scaling over multi-host TPU meshes via `jax.sharding` + `shard_map`.
"""

from .version import __version__

__all__ = ["__version__"]
