"""SONATA HDF5 source: read a `.h5` edge file back into a DataFrame.

Spark has no native HDF5 reader, so this is the inverse of
``sinks.sonata.export_hdf5``: parse the edge population with h5py when
installed, else with the built-in classic-format reader
(``sinks/hdf5_minimal.MiniH5Reader``), and hand the columns to Spark
through one Arrow batch.  The built-in reader covers contiguous AND
chunked datasets with deflate/shuffle filters — the layouts libhdf5
pipelines typically write — so real-world SONATA files usually read
back without h5py; exotic layouts/filters raise a targeted
``NotImplementedError`` naming the dataset and the h5py remedy.

Scale note (honest): HDF5 is a single-file driver-side format here —
this source decodes on the driver and parallelizes afterwards, which
is right for interchange-sized edge files (the reference's own output)
and wrong for 100 TB.  At scale the parquet SONATA bundle IS the
distributed representation; convert once with this source and never
read the `.h5` twice:

    df = read_sonata_edges(spark, "edges.h5", "default")
    df.write.parquet("edges_parquet/")       # now it scales
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _open(h5_path: str):
    try:
        import h5py

        f = h5py.File(h5_path, "r")

        class _H5:  # uniform facade over the two backends
            def list_links(self, path):
                return sorted(f[path].keys())

            def read_dataset(self, path):
                return f[path][()]

            def read_attrs(self, path):
                return dict(f[path].attrs)

        return _H5()
    except ImportError:
        from parquet_converters_spark.sinks.hdf5_minimal import MiniH5Reader

        return MiniH5Reader(h5_path)


def read_sonata_edges(
    spark: SparkSession,
    h5_path: str,
    population: str,
    with_row_index: bool = True,
) -> DataFrame:
    """Load ``/edges/<population>`` (top-level node ids + ``0/``
    properties; ``@library`` codes stay integer codes) as a DataFrame.
    ``with_row_index`` adds the global position column so the ordered
    round-trip ``export_hdf5 -> read_sonata_edges`` is loss-free."""
    import pandas as pd

    r = _open(h5_path)
    base = f"/edges/{population}"
    cols: dict[str, object] = {}
    for name in r.list_links(base):
        if name in ("0", "indices"):
            continue
        cols[name] = r.read_dataset(f"{base}/{name}")
    for name in r.list_links(f"{base}/0"):
        if name == "@library":
            continue
        cols[name] = r.read_dataset(f"{base}/0/{name}")
    pdf = pd.DataFrame(cols)
    if with_row_index:
        pdf["row_index"] = range(len(pdf))
    return spark.createDataFrame(pdf)


def read_sonata_library(
    spark: SparkSession, h5_path: str, population: str, name: str
) -> DataFrame:
    """One ``0/@library/<name>`` enumeration as (index, value)."""
    r = _open(h5_path)
    values = r.read_dataset(f"/edges/{population}/0/@library/{name}")
    rows = [
        (i, v.decode() if isinstance(v, bytes) else str(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "index long, value string")


_NP_TO_SPARK = {
    "i1": "tinyint", "i2": "smallint", "i4": "int", "i8": "bigint",
    "f4": "float", "f8": "double",
}


def read_sonata_edges_distributed(
    spark: SparkSession,
    h5_path: str,
    population: str,
    rows_per_partition: int = 1 << 20,
    columns: list[str] | None = None,
) -> DataFrame:
    """Parallel ``.h5`` ingest — the read-side mirror of
    ``sinks.sonata.export_hdf5_parallel`` and the S6 "partitioned
    parallel scan" shape applied to SONATA HDF5.

    The driver parses ONLY the file metadata (dataset layouts + chunk
    maps, via :meth:`MiniH5Reader.dataset_layout` over mmap — a few KB
    of reads regardless of file size), splits the edge range into
    ``rows_per_partition`` row slices, and every Spark partition opens
    the file itself and reads/decodes just its slice's byte ranges:
    a contiguous dataset is one seek+read per column, a chunked one
    reads only the overlapping chunks (deflate/shuffle reversed
    executor-side with the standalone ``decode_chunk``).

    Requires executors to share the filesystem with the driver (local
    mode / GPFS / Lustre / NFS) — the same requirement as the parallel
    writer, and as the reference's MPI-IO reader
    (``src/parquet2hdf5.cpp:44-55`` splits files across ranks the same
    way).  Unlike :func:`read_sonata_edges` nothing edge-scale ever
    materializes on the driver.

    Returns the same columns as :func:`read_sonata_edges` plus
    ``row_index`` (the global position, so ordering survives the
    parallel read).  ``columns`` restricts the read to the named
    datasets — the column-pruning analogue of a parquet scan's
    ReadSchema: unrequested datasets cost zero I/O (each column is a
    separate contiguous extent / chunk set in the file).
    """
    import numpy as np

    r = _open(h5_path)
    base = f"/edges/{population}"
    names: list[str] = []
    for name in r.list_links(base):
        if name not in ("0", "indices"):
            names.append(name)
    for name in r.list_links(f"{base}/0"):
        if name != "@library":
            names.append(name)
    if columns is not None:
        missing = sorted(set(columns) - set(names))
        if missing:
            raise KeyError(
                f"columns {missing} not in edge population "
                f"{population!r} (has {sorted(names)})"
            )
        names = [n for n in names if n in set(columns)]
    if hasattr(r, "dataset_layout"):
        paths = {
            n: (f"{base}/{n}" if n in r.list_links(base) else f"{base}/0/{n}")
            for n in names
        }
        layouts = {n: r.dataset_layout(p) for n, p in paths.items()}
        # the closure ships only scalars per column — a multi-TB file's
        # chunk map (millions of entries) must NOT ride along in the
        # task binary; executors re-walk the B-tree themselves over
        # mmap (metadata-only reads, O(chunk keys) per partition)
        for n, lay in layouts.items():
            lay.pop("chunks", None)
    else:  # h5py facade: driver-side fallback (h5py has no layout API here)
        return read_sonata_edges(spark, h5_path, population)

    n_rows = None
    for n, lay in layouts.items():
        if len(lay["shape"]) != 1:
            raise NotImplementedError(
                f"dataset {n!r} is {len(lay['shape'])}-D; the distributed "
                "edge reader handles 1-D edge columns"
            )
        if n_rows is None:
            n_rows = lay["shape"][0]
        elif lay["shape"][0] != n_rows:
            raise ValueError(
                f"dataset {n!r} has {lay['shape'][0]} rows, expected {n_rows}"
            )
    n_rows = int(n_rows or 0)

    fields = ["row_index bigint"]
    for n in names:
        dt = np.dtype(layouts[n]["dtype"])
        fields.append(
            f"`{n}` "
            + ("string" if dt.kind == "S" else _NP_TO_SPARK[dt.str[1:]])
        )
    schema = ", ".join(fields)

    ranges = [
        (s, min(s + rows_per_partition, n_rows))
        for s in range(0, max(n_rows, 1), rows_per_partition)
    ]
    target = os.path.abspath(h5_path)

    def read_slice(batches):
        import pandas as pd

        from parquet_converters_spark.sinks.hdf5_minimal import (
            MiniH5Reader,
            decode_chunk,
        )

        rdr = None  # one mmap per task, opened lazily
        chunk_maps: dict[str, list] = {}  # per-task B-tree walk cache
        for spec in batches:
            for start, end in zip(spec["start"], spec["end"]):
                start, end = int(start), int(end)
                out = {"row_index": np.arange(start, end, dtype=np.int64)}
                with open(target, "rb") as fh:
                    for n in names:
                        lay = layouts[n]
                        dt = np.dtype(lay["dtype"])
                        if lay["layout"] == "contig":
                            fh.seek(lay["addr"] + start * dt.itemsize)
                            arr = np.frombuffer(
                                fh.read((end - start) * dt.itemsize),
                                dtype=dt,
                            )
                        else:
                            if rdr is None:
                                rdr = MiniH5Reader(target)
                            c = lay["chunk_shape"][0]
                            arr = np.empty(end - start, dtype=dt)
                            if n not in chunk_maps:
                                chunk_maps[n] = rdr.dataset_layout(
                                    paths[n]
                                )["chunks"]
                            for offs, addr, size, mask in chunk_maps[n]:
                                o = offs[0]
                                if o >= end or o + c <= start:
                                    continue
                                fh.seek(addr)
                                chunk = decode_chunk(
                                    fh.read(size), lay["filters"], mask,
                                    dt, lay["chunk_shape"], name=n,
                                )
                                lo, hi = max(o, start), min(o + c, end)
                                arr[lo - start:hi - start] = chunk[
                                    lo - o:hi - o
                                ]
                        if dt.kind == "S":
                            out[n] = [v.decode() for v in arr]
                        else:
                            out[n] = arr
                yield pd.DataFrame(out)

    spec = spark.createDataFrame(ranges, "start long, end long").repartition(
        max(len(ranges), 1), "start"
    )
    return spec.mapInPandas(read_slice, schema)
