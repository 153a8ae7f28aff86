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
