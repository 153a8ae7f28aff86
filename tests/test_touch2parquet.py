"""Conversion round-trip tests (SURVEY §5 layer 2): touch binary ->
canonical parquet, checked against the reference's checked-in golden
output ``tests/testCircuit.parquet`` and its physical writer options."""

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import REFERENCE_TESTS


@pytest.fixture(scope="module")
def v1_out(spark, tmp_path_factory):
    from parquet_converters_spark.pipelines import touch2parquet

    out = str(tmp_path_factory.mktemp("t2p") / "v1_edges.parquet")
    touch2parquet(
        spark, os.path.join(REFERENCE_TESTS, "touches_v1", "touchesData.0"), out
    )
    return out


def test_v1_matches_reference_golden(spark, v1_out):
    """Row-for-row parity with the reference's own converted fixture
    (compared as multisets — the reference CI compares after sorting,
    .ci/test_circuit1k_touches.sh)."""
    golden = pq.read_table(
        os.path.join(REFERENCE_TESTS, "testCircuit.parquet")
    ).to_pylist()
    ours = pq.read_table(v1_out).to_pylist()
    assert len(ours) == len(golden) == 82

    cols = list(golden[0].keys())

    def key(row):
        return tuple(
            round(row[c], 4) if isinstance(row[c], float) else row[c] for c in cols
        )

    assert sorted(key(r) for r in ours) == sorted(key(r) for r in golden)


def test_v1_synapse_ids_unique_and_packed(v1_out):
    t = pq.read_table(v1_out)
    sid = t.column("synapse_id").to_pylist()
    gid = t.column("source_node_id").to_pylist()
    assert len(set(sid)) == len(sid)
    assert all(s >> 24 == g for s, g in zip(sid, gid))


def test_physical_layout(v1_out):
    """W1 writer parity: snappy, dictionary off, small-int logical types
    (parquet_writer.cpp:122-124, :34-41,52-53)."""
    import glob

    import pyarrow as pa

    f = pq.ParquetFile(glob.glob(os.path.join(v1_out, "*.parquet"))[0])
    arrow = f.schema_arrow
    assert arrow.field("efferent_section_id").type == pa.int16()
    assert arrow.field("branch_order").type == pa.int8()
    assert arrow.field("synapse_id").type == pa.int64()
    schema = f.schema  # parquet schema: INT32 physical + INT_16 converted
    by_name = {schema.column(i).name: schema.column(i) for i in range(len(schema))}
    assert by_name["efferent_section_id"].physical_type == "INT32"
    assert "Int(bitWidth=16" in str(by_name["efferent_section_id"].logical_type)
    assert "Int(bitWidth=8" in str(by_name["branch_order"].logical_type)
    for rg in range(f.metadata.num_row_groups):
        for c in range(f.metadata.num_columns):
            col = f.metadata.row_group(rg).column(c)
            assert col.compression == "SNAPPY"
            assert "PLAIN_DICTIONARY" not in col.encodings
            assert "RLE_DICTIONARY" not in col.encodings
    # KV metadata stamped (parquet_writer.cpp:115-120)
    kv = f.schema_arrow.metadata or {}
    assert b"touch2parquet_version" in kv
    assert b"touchdetector_version" in kv


def test_v2_branch_type_unpack(spark):
    """P3: hi nibble -> efferent, lo nibble -> afferent, +1 MorphIO offset
    (parquet_writer.h:63-69)."""
    from parquet_converters_spark.operators import to_canonical_edges
    from parquet_converters_spark.sources import read_touches

    raw = read_touches(
        spark, os.path.join(REFERENCE_TESTS, "touches_v2", "touchesData.0")
    )
    edges = to_canonical_edges(raw, 2)
    joined = (
        raw.select("synapse_id", "branch_type")
        .join(edges.select("synapse_id", "efferent_section_type", "afferent_section_type"), "synapse_id")
        .collect()
    )
    assert len(joined) == 1104
    for r in joined:
        assert r["efferent_section_type"] == ((r["branch_type"] >> 4) & 0xF) + 1
        assert r["afferent_section_type"] == (r["branch_type"] & 0xF) + 1


def test_v3_full_columns(spark, tmp_path):
    from parquet_converters_spark.pipelines import touch2parquet
    from parquet_converters_spark.schemas import edge_columns

    out = str(tmp_path / "v3.parquet")
    touch2parquet(
        spark, os.path.join(REFERENCE_TESTS, "touches_v3", "touchesData.0"), out
    )
    t = pq.read_table(out)
    assert t.column_names == edge_columns(3)
    assert t.num_rows == 62


def test_limit(spark):
    """L1: -n record cap (touch2parquet.cpp:47)."""
    from parquet_converters_spark.operators import to_canonical_edges
    from parquet_converters_spark.sources import read_touches

    raw = read_touches(
        spark, os.path.join(REFERENCE_TESTS, "touches_v2", "touchesData.0")
    )
    assert to_canonical_edges(raw, 2, limit=10).count() == 10


def test_validation_raises(spark):
    """P6: section/segment ids beyond 0x7fff abort the conversion
    (parquet_writer.cpp:207-219)."""
    from parquet_converters_spark.operators import validate_sections

    df = spark.createDataFrame(
        [(1, 0x8000, 1, 1)],
        "pre_section: int, pre_segment: int, post_section: int, post_segment: int",
    )
    with pytest.raises(ValueError, match="endianess"):
        validate_sections(df.withColumn("pre_section", df.pre_segment * 0 + 0x8000))


def test_cli_end_to_end(spark, tmp_path):
    """The module CLI mirrors the reference binaries: touch2parquet then
    parquet2sonata, driven through main() with argv."""
    from parquet_converters_spark.cli import main

    out_pq = str(tmp_path / "cli_edges")
    rc = main([
        "touch2parquet",
        "/root/reference/tests/touches_v2/touchesData.0",
        "-o", out_pq,
    ])
    assert rc == 0
    assert spark.read.parquet(out_pq).count() == 1104

    out_bundle = str(tmp_path / "cli_bundle")
    rc = main(["parquet2sonata", out_pq, out_bundle, "pop"])
    assert rc == 0
    import pyarrow.parquet as pq

    t = pq.read_table(f"{out_bundle}/edges/pop/table.parquet")
    assert t.num_rows == 1104
    r2e = pq.read_table(
        f"{out_bundle}/edges/pop/indices/source_to_target/range_to_edge_id.parquet"
    )
    assert r2e.num_rows == 1

    # -n limit mirrors the reference's export cap
    out_lim = str(tmp_path / "cli_limited")
    main(["touch2parquet", "/root/reference/tests/touches_v2/touchesData.0",
          "-o", out_lim, "-n", "100"])
    assert spark.read.parquet(out_lim).count() == 100

    # --hdf5 --parallel-h5 writes the real .h5 via partition offsets
    out_b2 = str(tmp_path / "cli_bundle_h5")
    h5 = str(tmp_path / "cli.h5")
    rc = main(["parquet2sonata", out_pq, out_b2, "pop",
               "--hdf5", h5, "--parallel-h5"])
    assert rc == 0
    from parquet_converters_spark.sinks.hdf5_minimal import MiniH5Reader

    assert len(MiniH5Reader(h5).read_dataset("/edges/pop/source_node_id")) == 1104


def test_cli_dedup(spark, tmp_path, sf_dir):
    """The dedup subcommand runs the near-dedup funnel end-to-end and
    writes exactly the survivor set."""
    from parquet_converters_spark.cli import main
    from parquet_converters_spark.functions.dedup import near_dedup_survivors

    out = str(tmp_path / "survivors")
    rc = main(["dedup", f"{sf_dir}/documents.parquet", out])
    assert rc == 0
    got = {r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {r.doc_id for r in near_dedup_survivors(docs).select("doc_id").collect()}
    assert got == want and 0 < len(got) < docs.count()


def test_cli_prepare_corpus(spark, tmp_path, sf_dir):
    from parquet_converters_spark.cli import main

    out = str(tmp_path / "clean")
    rc = main(["prepare-corpus", f"{sf_dir}/documents.parquet", out])
    assert rc == 0
    clean = spark.read.parquet(out)
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < clean.count() <= raw.count()
    assert set(clean.columns) == set(raw.columns)


def test_cli_version_flag(capsys):
    """Reference parity: parquet2hdf5's -v/--version flag."""
    import pytest as _pytest

    from parquet_converters_spark import __version__
    from parquet_converters_spark.cli import main

    with _pytest.raises(SystemExit) as e:
        main(["--version"])
    assert e.value.code == 0
    assert __version__ in capsys.readouterr().out


def test_touch2parquet_writes_metadata_sidecar(spark, tmp_path):
    """The canonical sink writes the `_metadata` summary the reference's
    parquet2hdf5 prefers (parquet2hdf5.cpp:205-218); our ordered reader
    consults it first, so the conversion chain no longer warns about a
    missing sidecar, and the sidecar's schema + row totals agree with
    the data files."""
    import pyarrow.parquet as pq

    from parquet_converters_spark.pipelines import touch2parquet
    from parquet_converters_spark.sources.ordering import _sidecar_schema
    from tests.conftest import REFERENCE_TESTS

    out = str(tmp_path / "v1.parquet")
    touch2parquet(
        spark,
        os.path.join(REFERENCE_TESTS, "touches_v1", "touchesData.0"),
        out,
    )
    sidecar = os.path.join(out, "_metadata")
    assert os.path.isfile(sidecar)
    md = pq.ParquetFile(sidecar).metadata
    data_rows = pq.read_table(out).num_rows
    assert md.num_rows == data_rows == 82
    schema = _sidecar_schema(out)
    assert schema is not None
    assert set(pq.read_table(out).column_names) == set(schema.names)
    # spark still reads the directory cleanly with the sidecar present
    assert spark.read.parquet(out).count() == 82


def test_kv_stamping_distributed_multi_file(spark, tmp_path):
    """The executor fan-out path of the KV stamp (session + >1 file):
    every file gets the merged footer, the sidecar reflects the stamped
    footers, and Spark reads the directory back cleanly (no stale
    .crc)."""
    import glob as _glob

    import pyarrow.parquet as pq

    from parquet_converters_spark.sinks.parquet_sink import (
        write_canonical_parquet,
    )

    df = spark.range(1000).selectExpr("id", "id * 2 as v")
    out = str(tmp_path / "multi.parquet")
    write_canonical_parquet(
        df, out, kv_metadata={"touch2parquet_version": "x", "k": "v"},
        partitions=4,
    )
    files = sorted(_glob.glob(os.path.join(out, "*.parquet")))
    assert len(files) == 4  # the distributed branch actually ran
    for f in files:
        md = pq.ParquetFile(f).schema_arrow.metadata
        assert md[b"touch2parquet_version"] == b"x"
        assert md[b"k"] == b"v"
    assert os.path.isfile(os.path.join(out, "_metadata"))
    assert spark.read.parquet(out).count() == 1000
    # no stray tmp files left behind by the atomic-rename rewrite
    assert not _glob.glob(os.path.join(out, "*.tmp"))


def test_cli_image_dedup(spark, tmp_path):
    from parquet_converters_spark.cli import main
    from parquet_converters_spark.functions.image_fingerprint import (
        bmp_realizing_dhash,
    )

    src = str(tmp_path / "images")
    a, b = 0x1111_2222_3333_4444, 0x7777_0000_5555_2222
    rows = [
        (1, bmp_realizing_dhash(a)),
        (2, bmp_realizing_dhash(a ^ 1)),      # 1 bit from a -> dup of 1
        (3, bmp_realizing_dhash(b)),
        (4, bmp_realizing_dhash(b)),          # exact dup of 3
    ]
    spark.createDataFrame(rows, "media_id long, payload binary").write.parquet(src)
    out = str(tmp_path / "kept")
    rc = main(["image-dedup", src, out])
    assert rc == 0
    kept = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}
