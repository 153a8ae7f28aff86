"""Layer-2 tests (SURVEY §5): fixture round-trips of the touch binary
source against an independent pure-python decoder."""

import math
import os

import pytest

from tests.conftest import REFERENCE_TESTS
from tests.reference_decode import decode_file

FIXTURES = [
    ("touches_v1", 1, 82),
    ("touches_v2", 2, 1104),
    ("touches_v3", 3, 62),
]


@pytest.mark.parametrize("name,version,count", FIXTURES)
def test_fixture_roundtrip(spark, name, version, count):
    from parquet_converters_spark.sources import read_touches

    path = os.path.join(REFERENCE_TESTS, name, "touchesData.0")
    df = read_touches(spark, path)
    rows = {r["file_pos"]: r.asDict() for r in df.collect()}
    assert len(rows) == count

    def close(a, b):
        if math.isnan(b):
            return math.isnan(a)
        return math.isclose(a, b, rel_tol=1e-6)

    n_checked = 0
    for expect in decode_file(path):
        got = rows[expect["file_pos"]]
        for k, v in expect.items():
            g = got[k]
            if isinstance(v, float):
                assert close(g, v), (k, g, v)
            elif isinstance(v, list):
                assert all(close(a, b) for a, b in zip(g, v)), (k, g, v)
            else:
                assert g == v, (k, g, v)
        n_checked += 1
    assert n_checked == count


def test_partitioned_scan_matches_single_partition(spark):
    """Static range-split (S6): many small partitions must yield the same
    rows as one."""
    from parquet_converters_spark.sources import read_touches

    path = os.path.join(REFERENCE_TESTS, "touches_v2", "touchesData.0")
    whole = read_touches(spark, path).collect()
    split = read_touches(spark, path, records_per_partition=100)
    assert split.rdd.getNumPartitions() == 12
    assert sorted(r["synapse_id"] for r in split.collect()) == sorted(
        r["synapse_id"] for r in whole
    )


def test_synapse_id_packing(spark):
    """synapse_id = (gid << 24) + (file_pos - shift[gid])
    (touch_reader.cpp:275-287)."""
    from parquet_converters_spark.sources import read_touches

    path = os.path.join(REFERENCE_TESTS, "touches_v1", "touchesData.0")
    for r in read_touches(spark, path).collect():
        assert r["synapse_id"] >> 24 == r["pre_neuron_id"]


def test_endian_swapped_input(spark, tmp_path):
    """S3: a big-endian variant of the v1 fixture decodes identically."""
    import numpy as np

    from parquet_converters_spark.schemas import touch_dtype
    from parquet_converters_spark.sources import read_touches

    src = os.path.join(REFERENCE_TESTS, "touches_v1")
    dt = touch_dtype(1)
    rec = np.fromfile(os.path.join(src, "touchesData.0"), dtype=dt)
    rec.astype(dt.newbyteorder(">")).tofile(tmp_path / "touchesData.0")

    raw = open(os.path.join(src, "touches.0"), "rb").read()
    import struct

    arch, nn = struct.unpack("<dq", raw[:16])
    out = struct.pack(">dq", arch, nn) + raw[16:32]
    body = raw[32:]
    for i in range(len(body) // 16):
        nid, count, offset = struct.unpack_from("<iIq", body, i * 16)
        out += struct.pack(">iIq", nid, count, offset)
    (tmp_path / "touches.0").write_bytes(out)

    expect = read_touches(spark, os.path.join(src, "touchesData.0")).collect()
    got = read_touches(spark, str(tmp_path / "touchesData.0")).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expect))


def test_observe_conversion_counters(spark, tmp_path):
    """M1 progress/verification counters ride the conversion job itself
    (observe() metrics — no second pass), matching an explicit recount."""
    from parquet_converters_spark.observability import observe_conversion
    from parquet_converters_spark.sources import read_touches

    df = read_touches(spark, "/root/reference/tests/touches_v2/touchesData.0")
    obs, observed = observe_conversion(df)
    out = str(tmp_path / "observed_out")
    observed.write.parquet(out)  # the one and only action
    m = obs.get
    assert m["n_records"] == 1104
    assert m["n_bad_sections"] == 0
    assert m["max_pre_gid"] == df.agg({"pre_neuron_id": "max"}).first()[0]
