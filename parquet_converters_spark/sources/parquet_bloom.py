"""From-spec parquet Bloom-filter reader and prober.

The canonical sink can now write split-block Bloom filters
(``sinks/parquet_sink.py bloom_filter_columns``) — the point-lookup
analogue of zone maps for the dictionary-less layout.  Neither the
in-container pyarrow (no ``bloom_filter_offset`` surface) nor DuckDB
1.0 (no ``parquet_bloom_probe``) can read them back, so verifying the
sink would otherwise mean trusting the writer's own claim.  This
module closes the loop from the published specs alone:

* a Thrift **compact-protocol** walker (thrift.apache.org spec:
  zigzag varints, delta field ids, nested struct/list skipping) over
  the parquet footer — FileMetaData(4: row_groups) -> RowGroup(1:
  columns) -> ColumnChunk(3: meta_data) -> ColumnMetaData(3:
  path_in_schema, 14: bloom_filter_offset, 15: bloom_filter_length);
* the **XXH64** hash (xxHash spec, seed 0) parquet mandates for Bloom
  input, known-answer-tested;
* the **split-block Bloom filter** probe (parquet-format
  BloomFilter.md): 32-byte blocks of 8 LE u32 words, block index
  ``((h >> 32) * nblocks) >> 32``, one bit per word via the 8
  published odd salts.

Reference analogue: footer-level verification mirrors how
``tests/test_hdf5_export.py`` inspects the reference's parquet writer
options (W1) by independent readback.
"""

from __future__ import annotations

import struct

# thrift compact-protocol wire types
_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12

_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)
_M64 = (1 << 64) - 1


class _Reader:
    """Minimal thrift compact-protocol cursor."""

    def __init__(self, buf: bytes, at: int = 0):
        self.buf = buf
        self.at = at

    def byte(self) -> int:
        b = self.buf[self.at]
        self.at += 1
        return b

    def varint(self) -> int:
        out = shift = 0
        while True:
            b = self.byte()
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ValueError("thrift: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def skip(self, wtype: int, depth: int = 0) -> None:
        if depth > 32:
            # honest parquet footers nest ~6 deep; a corrupt stream of
            # 0x1C bytes would otherwise recurse past the interpreter
            # limit (RecursionError escapes the ValueError contract)
            raise ValueError("thrift: structure nested deeper than 32")
        if wtype in (_CT_TRUE, _CT_FALSE):
            return
        if wtype == _CT_BYTE:
            self.at += 1
        elif wtype in (_CT_I16, _CT_I32, _CT_I64):
            self.varint()
        elif wtype == _CT_DOUBLE:
            self.at += 8
        elif wtype == _CT_BINARY:
            # NOT `self.at += self.varint()`: augmented assignment
            # loads the OLD offset before varint() consumes its bytes
            ln = self.varint()
            self.at += ln
        elif wtype in (_CT_LIST, _CT_SET):
            n, etype = self.list_header()
            for _ in range(n):
                self.skip(etype, depth + 1)
        elif wtype == _CT_MAP:
            n = self.varint()
            if n > len(self.buf) - self.at:
                # same lying-size guard as list_header — TRUE/FALSE
                # entries consume zero bytes, so an unchecked count
                # spins a near-infinite loop on corrupt input
                raise ValueError(
                    f"thrift: map of {n} entries with "
                    f"{len(self.buf) - self.at} bytes left"
                )
            if n:
                kv = self.byte()
                for _ in range(n):
                    self.skip(kv >> 4, depth + 1)
                    self.skip(kv & 0xF, depth + 1)
        elif wtype == _CT_STRUCT:
            for _fid, ftype in self.fields():
                self.skip(ftype, depth + 1)
        else:
            raise ValueError(f"thrift: unknown wire type {wtype}")

    def list_header(self) -> tuple[int, int]:
        h = self.byte()
        n, etype = h >> 4, h & 0xF
        if n == 15:
            n = self.varint()
        if n > len(self.buf) - self.at:
            # every element consumes >= 0 bytes, but no honest list
            # outnumbers the remaining buffer — a lying size would
            # otherwise drive a near-infinite skip loop
            raise ValueError(
                f"thrift: list of {n} elements with "
                f"{len(self.buf) - self.at} bytes left"
            )
        return n, etype

    def fields(self):
        """Yield ``(field_id, wire_type)`` until STOP; caller must
        consume (read or skip) each field's value before advancing."""
        fid = 0
        while True:
            h = self.byte()
            if h == _CT_STOP:
                return
            delta, ftype = h >> 4, h & 0xF
            fid = fid + delta if delta else self.zigzag()
            yield fid, ftype


def _read_footer(path: str) -> bytes:
    with open(path, "rb") as fh:
        fh.seek(0, 2)
        size = fh.tell()
        if size < 8:
            # files shorter than the 4-byte length + PAR1 tail would
            # drive fh.seek() negative (OSError errno 22) — keep the
            # documented ValueError contract instead
            raise ValueError(
                f"{path}: not a parquet file ({size} bytes, need >= 8)"
            )
        fh.seek(size - 8)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{path}: not a parquet file (no PAR1 tail)")
        (flen,) = struct.unpack("<I", tail[:4])
        if flen > size - 8:
            # a lying footer length would seek before byte 0 — same
            # OSError-vs-ValueError contract hole
            raise ValueError(
                f"{path}: footer length {flen} exceeds file body "
                f"({size - 8} bytes before the tail)"
            )
        fh.seek(size - 8 - flen)
        return fh.read(flen)


def footer_bloom_index(
    path: str,
) -> dict[tuple[int, str], tuple[int, int | None, int | None]]:
    """``{(row_group_index, column_path): (bloom_filter_offset,
    bloom_filter_length | None, physical_type | None)}`` for every
    column chunk that declares a Bloom filter — empty dict when the
    file has none.  ``physical_type`` is the parquet Type enum
    (1=INT32, 2=INT64, 6=BYTE_ARRAY, ...): the prober needs it to
    plain-encode probe values the way the writer hashed them.

    Corrupt/truncated footers raise ``ValueError`` (the codec-module
    contract) — never ``IndexError``/``struct.error``."""
    try:
        return _footer_bloom_index(path)
    except (IndexError, struct.error, UnicodeDecodeError) as e:
        raise ValueError(
            f"{path}: corrupt parquet footer ({e})"
        ) from e


def _footer_bloom_index(path):
    r = _Reader(_read_footer(path))
    out: dict[tuple[int, str], tuple[int, int | None, int | None]] = {}
    for fid, ftype in r.fields():  # FileMetaData
        if fid == 4 and ftype == _CT_LIST:  # row_groups
            n_rg, _ = r.list_header()
            for rg in range(n_rg):
                for cfid, cftype in r.fields():  # RowGroup
                    if cfid == 1 and cftype == _CT_LIST:  # columns
                        n_col, _ = r.list_header()
                        for _c in range(n_col):
                            _read_column_chunk(r, rg, out)
                    else:
                        r.skip(cftype)
        else:
            r.skip(ftype)
    return out


def _read_column_chunk(r: _Reader, rg: int, out: dict) -> None:
    for fid, ftype in r.fields():  # ColumnChunk
        if fid == 3 and ftype == _CT_STRUCT:  # meta_data
            path_parts: list[str] = []
            offset = length = ptype = None
            for mfid, mftype in r.fields():  # ColumnMetaData
                if mfid == 1:  # physical type (Type enum)
                    ptype = r.zigzag()
                elif mfid == 3 and mftype == _CT_LIST:  # path_in_schema
                    n, _ = r.list_header()
                    for _ in range(n):
                        ln = r.varint()
                        path_parts.append(
                            r.buf[r.at : r.at + ln].decode("utf-8")
                        )
                        r.at += ln
                elif mfid == 14:  # bloom_filter_offset
                    offset = r.zigzag()
                elif mfid == 15:  # bloom_filter_length
                    length = r.zigzag()
                else:
                    r.skip(mftype)
            if offset is not None:
                out[(rg, ".".join(path_parts))] = (offset, length, ptype)
        else:
            r.skip(ftype)


def read_bloom_blocks(path: str, offset: int) -> list[int]:
    """Parse the BloomFilterHeader at ``offset`` (algorithm/hash/
    compression unions validated: BLOCK + XXHASH + UNCOMPRESSED) and
    return the bitset as a flat list of little-endian u32 words
    (8 words per 32-byte block).  Corrupt headers raise ``ValueError``
    or ``NotImplementedError`` by name."""
    try:
        return _read_bloom_blocks(path, offset)
    except (IndexError, struct.error) as e:
        raise ValueError(
            f"{path}: corrupt bloom filter header at {offset} ({e})"
        ) from e


def _read_bloom_blocks(path: str, offset: int) -> list[int]:
    with open(path, "rb") as fh:
        fh.seek(offset)
        # header is tiny; 64 bytes is far more than its max encoding
        head = fh.read(64)
        r = _Reader(head)
        num_bytes = None
        for fid, ftype in r.fields():  # BloomFilterHeader
            if fid == 1:
                num_bytes = r.zigzag()
            elif fid in (2, 3, 4) and ftype == _CT_STRUCT:
                # unions of empty structs: variant field id 1 is the
                # only one parquet-format defines for the BLOCK /
                # XXHASH / UNCOMPRESSED members this prober supports
                variants = []
                for vfid, vtype in r.fields():
                    variants.append(vfid)
                    r.skip(vtype)
                if variants != [1]:
                    raise NotImplementedError(
                        f"parquet bloom: unsupported union variant "
                        f"{variants} in header field {fid} (only "
                        "split-block + XXH64 + uncompressed)"
                    )
            else:
                r.skip(ftype)
        if num_bytes is None or num_bytes <= 0 or num_bytes % 32:
            raise ValueError(
                f"parquet bloom: bad bitset size {num_bytes} at {offset}"
            )
        fh.seek(offset + r.at)
        bits = fh.read(num_bytes)
    if len(bits) != num_bytes:
        raise ValueError("parquet bloom: truncated bitset")
    return list(struct.unpack(f"<{num_bytes // 4}I", bits))


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (xxHash spec, 64-bit variant) — the hash parquet-format
    mandates for Bloom-filter input.  Known-answer-tested."""
    p1, p2, p3 = 0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9
    p4, p5 = 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    n = len(data)
    at = 0
    if n >= 32:
        v1 = (seed + p1 + p2) & _M64
        v2 = (seed + p2) & _M64
        v3 = seed & _M64
        v4 = (seed - p1) & _M64
        while at + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                (lane,) = struct.unpack_from("<Q", data, at + 8 * i)
                v = (v + lane * p2) & _M64
                v = (rotl(v, 31) * p1) & _M64
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            at += 32
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            # mergeRound: h ^= rotl(v * p2, 31) * p1 — multiply by p2
            # BEFORE the rotate (a swapped order passes every input
            # < 32 bytes and silently breaks all longer ones)
            h = ((h ^ (rotl(v * p2 & _M64, 31) * p1 & _M64)) * p1 + p4) & _M64
    else:
        h = (seed + p5) & _M64
    h = (h + n) & _M64
    while at + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, at)
        k = (rotl(lane * p2 & _M64, 31) * p1) & _M64
        h = ((rotl(h ^ k, 27) * p1) + p4) & _M64
        at += 8
    if at + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, at)
        h = ((rotl(h ^ (lane * p1 & _M64), 23) * p2) + p3) & _M64
        at += 4
    while at < n:
        h = (rotl(h ^ (data[at] * p5 & _M64), 11) * p1) & _M64
        at += 1
    h ^= h >> 33
    h = (h * p2) & _M64
    h ^= h >> 29
    h = (h * p3) & _M64
    h ^= h >> 32
    return h


def sbbf_might_contain(words: list[int], h: int) -> bool:
    """Split-block Bloom probe: ``words`` is the flat LE-u32 bitset
    (8 words per block), ``h`` the XXH64 of the plain-encoded value."""
    nblocks = len(words) // 8
    block = ((h >> 32) * nblocks) >> 32
    key = h & 0xFFFFFFFF
    base = block * 8
    for i in range(8):
        bit = (key * _SALT[i] & 0xFFFFFFFF) >> 27
        if not words[base + i] & (1 << bit):
            return False
    return True


_TYPE_NAMES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96",
    4: "FLOAT", 5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}


def plain_encode(value, ptype: int | None = 2) -> bytes:
    """Parquet plain encoding of a probe value for the column's
    PHYSICAL type (the writer hashed the stored encoding, so an INT32
    column probed with an 8-byte INT64 encoding would read every
    present value as absent — a silent all-False, which is why the
    type is checked by name instead)."""
    if isinstance(value, bool):
        raise NotImplementedError("parquet bloom: BOOLEAN has no filter")
    if isinstance(value, int):
        if ptype == 2:
            return struct.pack("<q", value)
        if ptype == 1:
            return struct.pack("<i", value)
        raise NotImplementedError(
            "parquet bloom: integer probe against a "
            f"{_TYPE_NAMES.get(ptype, ptype)} column (INT32/INT64 only)"
        )
    if isinstance(value, str):
        if ptype != 6:
            raise NotImplementedError(
                "parquet bloom: string probe against a "
                f"{_TYPE_NAMES.get(ptype, ptype)} column (BYTE_ARRAY only)"
            )
        return value.encode("utf-8")
    if isinstance(value, (bytes, bytearray)):
        if ptype not in (6, 7):
            raise NotImplementedError(
                "parquet bloom: bytes probe against a "
                f"{_TYPE_NAMES.get(ptype, ptype)} column"
            )
        return bytes(value)
    raise NotImplementedError(
        f"parquet bloom: no plain encoding for {type(value).__name__}"
    )


def bloom_probe(path: str, column: str, values) -> dict[int, list[bool]]:
    """Probe ``values`` against ``column``'s Bloom filter in every row
    group of ``path``: ``{row_group: [might_contain per value]}``.
    Raises ``KeyError`` when the column has no filter (so a sink
    regression cannot read as 'no false positives')."""
    index = footer_bloom_index(path)
    rgs = {
        rg: (off, ptype)
        for (rg, col), (off, _len, ptype) in index.items()
        if col == column
    }
    if not rgs:
        raise KeyError(
            f"{path}: no Bloom filter for column {column!r} "
            f"(filters present: {sorted({c for _rg, c in index})})"
        )
    out = {}
    for rg, (off, ptype) in sorted(rgs.items()):
        hashes = [xxh64(plain_encode(v, ptype)) for v in values]
        words = read_bloom_blocks(path, off)
        out[rg] = [sbbf_might_contain(words, h) for h in hashes]
    return out


def bloom_scan_plan(spark, path: str, column: str, values):
    """Row-group pruning plan for an equality point lookup over a
    bloom-filtered canonical dataset: one row per (file, row_group)
    with ``keep`` = whether ANY probe value might be contained —
    the read side of the W1 sink's split-block filters (r16 verdict
    item 2), shaped like ``zorder_layout_plan``: a cheap planning pass
    whose output IS the skip decision.

    Spark's own parquet reader applies these filters at row-group
    granularity during the scan (``parquet.filter.bloom.enabled``,
    on by default — verified by scan-node numOutputRows in
    tests/test_parquet_bloom.py), so a plain
    ``spark.read.parquet(path).filter(col == v)`` already gets the
    prune.  This planner exists for (a) skip-rate OBSERVABILITY — the
    reader never reports what it skipped — and (b) file-level pruning
    for readers that can't push the filter (pandas/pyarrow exports).

    Scale posture: the footer walks fan out over executors (one task
    per file, ~KB of footer I/O each, payload pages never touched) —
    at 100 TB / ~100k files this is a seconds-long metadata pass, the
    same shape as the ordered reader's row-count pass.  Returns a
    DataFrame ``(file, row_group, n_rows, keep)``.

    Mixed datasets: a file with NO filter on ``column`` (e.g. appended
    later by a writer without ``bloom_filter_columns``) keeps all its
    row groups — absence of evidence is never permission to skip, and
    ``bloom_pruned_read``'s full-scan-identical contract depends on
    it.  The call refuses by name (driver-side, before the fan-out)
    only when NO file in the dataset carries a filter for the column —
    the probably-wrong-column misuse case, not a mixed layout.
    """
    import glob as _glob
    import os as _os
    import re as _re

    vals = list(values)
    if not vals:
        raise ValueError("bloom_scan_plan: empty probe value list")
    # the footer walk opens files with plain open(): a URI scheme Spark
    # itself could read (s3a://, hdfs://) must be refused BY NAME, not
    # surfaced as a misleading 'no parquet files under <path>'
    m = _re.match(r"([a-z][a-z0-9+.-]*)://", path, _re.I)
    if m:
        raise ValueError(
            f"bloom_scan_plan: {m.group(1)}:// paths are not supported "
            f"— the footer probe reads local filesystem paths only"
        )
    files = sorted(
        _glob.glob(_os.path.join(path, "*.parquet"))
        if _os.path.isdir(path) else [path]
    )
    if not files:
        raise ValueError(f"bloom_scan_plan: no parquet files under {path}")
    # refuse a column NO file carries a filter for, BY NAME, on the
    # driver — an executor-side KeyError would surface as an opaque
    # wrapped PythonException after the fan-out.  Happy path reads one
    # footer (early exit on first hit); the no-hit walk is BOUNDED to a
    # driver-side sample, then goes distributed (one metadata task per
    # file) so a 100k-file dataset never serializes 100k footer reads
    # on the driver just to raise.
    _PROBE_CAP = 64
    hit = any(
        any(c == column for _rg, c in footer_bloom_index(f))
        for f in files[:_PROBE_CAP]
    )
    if not hit and len(files) > _PROBE_CAP:
        col = column

        def check(it):
            import pandas as pd

            from parquet_converters_spark.sources.parquet_bloom import (
                footer_bloom_index,
            )

            for pdf in it:
                yield pd.DataFrame({"hit": [any(
                    any(c == col for _rg, c in footer_bloom_index(f))
                    for f in pdf["file"]
                )]})

        # the driver sample already proved files[:_PROBE_CAP] carry no
        # filter — only the tail needs the distributed walk
        tail = files[_PROBE_CAP:]
        fdf = spark.createDataFrame([(f,) for f in tail], "file string")
        fdf = fdf.repartition(
            min(len(tail), spark.sparkContext.defaultParallelism)
        )
        hit = any(
            r["hit"] for r in fdf.mapInPandas(check, "hit boolean").collect()
        )
    if not hit:
        first = footer_bloom_index(files[0])
        raise KeyError(
            f"{path}: no file carries a Bloom filter for column "
            f"{column!r} (filters in {files[0]}: "
            f"{sorted({c for _rg, c in first})})"
        )

    def plan_one(it):
        import pandas as pd
        import pyarrow.parquet as pq

        from parquet_converters_spark.sources.parquet_bloom import (
            bloom_probe,
        )

        for pdf in it:
            rows = {"file": [], "row_group": [], "n_rows": [], "keep": []}
            for f in pdf["file"]:
                try:
                    probes = bloom_probe(f, column, vals)
                except KeyError:
                    # this FILE has no filter on the column (mixed
                    # dataset): keep everything, never crash the plan
                    probes = {}
                meta = pq.ParquetFile(f).metadata
                for rg in range(meta.num_row_groups):
                    rows["file"].append(f)
                    rows["row_group"].append(rg)
                    rows["n_rows"].append(meta.row_group(rg).num_rows)
                    # a row group with no filter entry must be KEPT —
                    # absence of evidence is not permission to skip
                    rows["keep"].append(
                        any(probes[rg]) if rg in probes else True
                    )
            yield pd.DataFrame(rows)

    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    fdf = fdf.repartition(min(len(files), spark.sparkContext.defaultParallelism))
    return fdf.mapInPandas(
        plan_one, "file string, row_group int, n_rows long, keep boolean"
    )


def bloom_pruned_read(spark, path: str, column: str, values):
    """Read only the FILES whose Bloom filters admit at least one of
    ``values``, then apply the exact equality filter — identical
    result to the full scan (false positives are filtered, false
    negatives are impossible), reading only surviving files.

    File granularity is the unit Spark's public reader API can skip
    by path; WITHIN each surviving file Spark's own bloom read
    filtering prunes the remaining row groups, so the two layers
    compose.  Returns the filtered DataFrame (empty, with the right
    schema, when every file is pruned)."""
    from pyspark.sql import functions as F

    plan = bloom_scan_plan(spark, path, column, values)
    keep_files = [
        r["file"]
        for r in plan.select("file", "keep").groupBy("file")
        .agg({"keep": "max"}).withColumnRenamed("max(keep)", "keep")
        .collect()
        if r["keep"]
    ]
    vals = list(values)
    base = spark.read.parquet(*keep_files) if keep_files else (
        spark.read.parquet(path).limit(0)
    )
    return base.filter(F.col(column).isin(vals))


def scan_output_rows(df) -> int:
    """``numOutputRows`` of ``df``'s scan leaf AFTER the frame has been
    executed — the rows that survived row-group pruning and reached
    the scan output.  The one shared home for the
    ``_jdf.queryExecution().executedPlan().collectLeaves()``
    incantation (classic-mode Spark internals; it shifts across Spark
    versions, so the test, the probe script, and the verify recipe all
    call THIS instead of keeping copies)."""
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return leaves.apply(0).metrics().apply("numOutputRows").value()
