"""Canonical parquet sink (reference operator W1).

Matches the reference writer's physical layout
(``src/touches/parquet_writer.cpp:105-132``, ``parquet_writer.h:56-59``):
SNAPPY compression, dictionary encoding disabled, ~20 MB row groups
(512 Ki rows x ~40 B/row) with ~1 MB pages, optional KV footer metadata
(``touchdetector_version`` / ``touch2parquet_version``,
``parquet_writer.cpp:115-120``).

Spark-first: ``df.write.parquet`` with writer options — one output file
per task, the Spark analogue of the reference's one-file-per-MPI-rank
naming (``touch2parquet.cpp:84``).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame

ROW_GROUP_BYTES = 20 * 1024 * 1024
PAGE_BYTES = 1024 * 1024


def write_canonical_parquet(
    df: DataFrame,
    path: str,
    kv_metadata: dict[str, str] | None = None,
    mode: str = "overwrite",
    partitions: int | None = None,
    metadata_sidecar: bool = True,
    bloom_filter_columns: list[str] | None = None,
) -> None:
    """Write ``df`` with the reference's parquet physical options.

    ``kv_metadata`` is stamped into each file footer in a driver-side
    post-pass (Spark's writer cannot attach custom footer KV).  The
    rewrite is metadata+recompress of already-written files; version
    stamps at 100 TB scale should instead ride in the Spark field
    metadata that the reference itself knows how to read
    (``sonata_writer.cpp:102-111``) — supported via schema metadata.

    ``metadata_sidecar`` additionally writes the ``_metadata`` summary
    file (all row-group footers + file paths) that the reference's
    ``parquet2hdf5`` prefers over per-file footers
    (``parquet2hdf5.cpp:205-218``) and that our own ordered reader
    consults first (``sources/ordering.py``).  Cost is one driver-side
    footer read per file — O(#files), the same as the row-count pass
    the ordered reader performs anyway.
    ``bloom_filter_columns`` writes a split-block Bloom filter per row
    group for each named column (``parquet.bloom.filter.enabled#col``,
    the parquet-mr writer property Spark passes through).  At 100 TB
    this is the point-lookup analogue of min/max zone maps: an
    equality probe on a high-cardinality key (synapse_id, doc_id,
    url_hash) skips every row group whose filter rejects the value
    without decoding a page — dictionary encoding is OFF in this
    canonical layout (reference parity), so Bloom filters are the only
    sub-row-group pruning equality predicates get.
    """
    if partitions:
        df = df.repartition(partitions)
    writer = (
        df.write.mode(mode)
        .option("compression", "snappy")
        .option("parquet.enable.dictionary", "false")
        .option("parquet.block.size", str(ROW_GROUP_BYTES))
        .option("parquet.page.size", str(PAGE_BYTES))
    )
    for col in bloom_filter_columns or []:
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
    writer.parquet(path)

    if kv_metadata:
        _stamp_kv_metadata(path, kv_metadata, spark=df.sparkSession)
    if metadata_sidecar:
        _write_metadata_sidecar(path)


def _write_metadata_sidecar(path: str) -> None:
    """Aggregate every file's footer into a ``_metadata`` summary file
    (relative file paths, all row groups) — readable by pyarrow and by
    the reference's sidecar-first schema logic.  Spark and pyarrow both
    skip ``_``-prefixed files during data discovery, so the sidecar
    never shadows the data."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return
    collector = []
    schema = None
    first_file = None
    for f in files:
        md = pq.read_metadata(f)
        md.set_file_path(os.path.basename(f))
        collector.append(md)
        file_schema = pq.ParquetFile(f).schema_arrow
        if schema is None:
            schema, first_file = file_schema, f
        elif not file_schema.equals(schema):
            # a sidecar recorded from the first file would misdescribe
            # the rest (e.g. append-mode runs with drifted schemas)
            raise ValueError(
                f"_metadata sidecar: schema of {f} differs from "
                f"{first_file} — unify schemas (or skip the sidecar) "
                "before writing a directory-level footer"
            )
    pq.write_metadata(
        schema, os.path.join(path, "_metadata"), metadata_collector=collector
    )


def _rewrite_file_with_kv(f: str, kv: dict[str, str]) -> None:
    """Rewrite ONE parquet file with merged footer KV metadata.  Runs
    wherever the file is reachable — driver or executor.

    Write-to-temp + atomic rename, NOT an in-place truncate: under
    speculative execution / task retry two attempts may process the
    same file concurrently, and an in-place rewrite would let one
    attempt read the other's half-written bytes.  With the rename, a
    concurrent reader sees either the original or a fully-stamped file,
    and re-stamping an already-stamped file is a no-op merge — the
    rewrite is idempotent."""
    import uuid

    import pyarrow.parquet as pq

    table = pq.read_table(f)
    merged = dict(table.schema.metadata or {})
    merged.update({k.encode(): str(v).encode() for k, v in kv.items()})
    tmp = os.path.join(
        os.path.dirname(f), f".{os.path.basename(f)}.{uuid.uuid4().hex}.tmp"
    )
    try:
        pq.write_table(
            table.replace_schema_metadata(merged),
            tmp,
            compression="snappy",
            use_dictionary=False,
            row_group_size=512 * 1024,
            data_page_size=PAGE_BYTES,
        )
        os.replace(tmp, f)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    # the rewrite invalidates Hadoop's checksum sidecar; a stale .crc
    # makes every later Spark read fail with ChecksumException, so drop it
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def _stamp_kv_metadata(path: str, kv: dict[str, str], spark=None) -> None:
    """Stamp footer KV into every file of ``path``.  With a session the
    rewrites fan out one-file-per-task (the driver would otherwise
    re-read AND re-compress the entire dataset through one process —
    O(data) on one node, a non-starter at 100 TB; same shared-filesystem
    requirement as the parallel HDF5 export).  Without a session, or
    for a single file, the driver does it directly."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return
    if spark is None or len(files) == 1:
        for f in files:
            _rewrite_file_with_kv(f, kv)
        return
    kv = dict(kv)
    abs_files = [os.path.abspath(f) for f in files]

    def rewrite(batches):
        import pandas as pd

        n = 0
        for pdf in batches:
            for f in pdf["file"]:
                _rewrite_file_with_kv(f, kv)
                n += 1
        yield pd.DataFrame({"rewritten": [n]})

    total = (
        spark.createDataFrame([(f,) for f in abs_files], "file string")
        .repartition(len(abs_files), "file")
        .mapInPandas(rewrite, "rewritten long")
        .groupBy()
        .sum("rewritten")
        .collect()[0][0]
    )
    if total != len(abs_files):
        raise RuntimeError(
            f"kv-metadata stamping rewrote {total} of {len(abs_files)} files"
        )


def write_partitioned_dataset(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_within: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-partitioned parquet layout (``key=value`` directories) —
    the 100 TB organization that turns a predicate on the partition
    column into directory pruning instead of a data scan.

    - ``partition_cols`` become directory levels; keep their
      cardinality moderate (date/day, category — never a high-card id:
      10^6 directories kill the file listing long before the scan).
    - ``sort_within`` clusters rows inside each file so min/max
      row-group statistics prune within partitions too (the poor
      man's z-order for a single sort axis).
    - ``max_records_per_file`` caps file size without an extra
      repartition job.

    Readback needs nothing special: ``spark.read.parquet(path)``
    recovers the partition columns from the directory names, and
    Catalyst turns partition-column filters into PartitionFilters
    (asserted in tests/test_bucketing.py).
    """
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = (
        out.write.mode(mode)
        .option("compression", "snappy")
        .partitionBy(*partition_cols)
    )
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
