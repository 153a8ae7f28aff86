"""Build an sf1-equivalent dataset by replicating sf0.1 Nx with key
remapping and per-copy perturbation (VERDICT r06 item 2: the engine's
analogue of the reference's circuit-1k -> 2k CI ladder,
`.ci/test_circuit1k_output.sh` -> `test_circuit2k_output.sh`).

Design goals — the probe must scale ROWS without changing the DATA
PROPERTIES the operators are sensitive to:

- `lineitem`/`orders`: order keys offset per copy (join fan-out and
  group cardinalities scale linearly; customers/parts/suppliers are
  reused, so per-key fan-in grows — the realistic direction).
- `documents`: per-copy deterministic word permutation — near-dup
  structure WITHIN a copy is preserved (similar docs get the same
  transformation) while shingle overlap ACROSS copies is destroyed,
  keeping the corpus dup-rate ~constant instead of exploding the LSH
  candidate count quadratically (10 exact copies of every doc would
  probe the data, not the engine).
- `embeddings`: per-copy seeded Gaussian jitter (sigma=0.05) — the
  distribution is preserved, bucketed-cosine pair counts stay
  ~linear.
- `events`: event ids offset, timestamps unchanged (same window
  density per wall-clock hour — the streaming/window operators see
  10x rows in the same time span, which is how real traffic grows).
- dims (`region nation customer supplier part`) are copied verbatim.

Usage: python scripts/make_scale_probe.py [OUT_DIR] [FACTOR]
Defaults: /tmp/scaledata/sf1 10
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _offset(col: pa.ChunkedArray, copy: int, span: int) -> pa.Array:
    return pa.array(col.to_numpy(zero_copy_only=False) + copy * span)


def scale_keyed(
    table: str, out_dir: str, factor: int, key_cols, spans_in: dict | None = None
) -> None:
    """Replicate with per-copy key offsets; other columns verbatim.
    ``spans_in`` overrides the per-column offset span — REQUIRED for
    foreign keys, whose span must be the referenced dim's key span
    (max over the fact column alone diverges when some dim rows have
    no facts)."""
    t = pq.read_table(os.path.join(SRC, f"{table}.parquet"))
    spans = {
        c: (spans_in or {}).get(c)
        or int(pa.compute.max(t.column(c)).as_py()) + 1
        for c in key_cols
    }
    parts = []
    for i in range(factor):
        cols = {
            name: (_offset(t.column(name), i, spans[name]) if name in key_cols else t.column(name))
            for name in t.column_names
        }
        parts.append(pa.table(cols, schema=t.schema))
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, f"{table}.parquet")
    )


def scale_documents(out_dir: str, factor: int) -> None:
    t = pq.read_table(os.path.join(SRC, "documents.parquet"))
    ids = t.column("doc_id").to_numpy()
    span = int(ids.max()) + 1
    texts = t.column("text").to_pylist()
    parts = [t]
    for i in range(1, factor):
        rng = np.random.default_rng(1000 + i)
        # ONE permutation template per copy, applied by position — so
        # two similar source docs stay similar to each other after the
        # transform (dup-rate preserved within the copy) while their
        # shingles diverge from every other copy's.
        perm_cache: dict[int, np.ndarray] = {}
        new_texts = []
        for s in texts:
            words = s.split()
            n = len(words)
            if n > 1:
                p = perm_cache.get(n)
                if p is None:
                    p = rng.permutation(n)
                    perm_cache[n] = p
                words = [words[j] for j in p]
            new_texts.append(" ".join(words))
        arr = pa.array(new_texts, type=pa.string())
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(ids + i * span),
                    "text": arr,
                    "lang": t.column("lang"),
                    "source": t.column("source"),
                    "n_chars": pa.compute.utf8_length(arr).cast(pa.int64()),
                },
                schema=t.schema,
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, "documents.parquet")
    )


def scale_embeddings(out_dir: str, factor: int) -> None:
    t = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    ids = t.column("vec_id").to_numpy()
    span = int(ids.max()) + 1
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    parts = [t]
    for i in range(1, factor):
        rng = np.random.default_rng(2000 + i)
        jit = (mat + rng.normal(0, 0.05, mat.shape)).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(ids + i * span),
                    "embedding": pa.array(
                        jit.tolist(), type=t.schema.field("embedding").type
                    ),
                    "label": t.column("label"),
                },
                schema=t.schema,
            )
        )
    pq.write_table(
        pa.concat_tables(parts), os.path.join(out_dir, "embeddings.parquet")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--scale-dims"]
    scale_dims = "--scale-dims" in sys.argv
    out = args[0] if args else "/tmp/scaledata/sf1"
    factor = int(args[1]) if len(args) > 1 else 10
    os.makedirs(out, exist_ok=True)
    for dim in ["region", "nation"]:
        pq.write_table(
            pq.read_table(os.path.join(SRC, f"{dim}.parquet")),
            os.path.join(out, f"{dim}.parquet"),
        )
    if scale_dims:
        # ALSO replicate the entity dims and remap every foreign key —
        # this is the variant where graph/entity operators (pagerank's
        # distinct customer<->supplier graph) see a 10x NODE set, not
        # just 10x edge multiplicity.  Default mode reuses dims, which
        # is the realistic direction for fact growth (fan-in grows).
        def key_span(table: str, col: str) -> int:
            t = pq.read_table(
                os.path.join(SRC, f"{table}.parquet"), columns=[col]
            )
            return int(pa.compute.max(t.column(col)).as_py()) + 1

        spans = {
            "c_custkey": key_span("customer", "c_custkey"),
            "s_suppkey": key_span("supplier", "s_suppkey"),
            "p_partkey": key_span("part", "p_partkey"),
            "o_orderkey": key_span("orders", "o_orderkey"),
        }
        scale_keyed("customer", out, factor, {"c_custkey"}, spans)
        scale_keyed("supplier", out, factor, {"s_suppkey"}, spans)
        scale_keyed("part", out, factor, {"p_partkey"}, spans)
        fk = {
            "o_custkey": spans["c_custkey"],
            "l_partkey": spans["p_partkey"],
            "l_suppkey": spans["s_suppkey"],
            "l_orderkey": spans["o_orderkey"],
            **spans,
        }
        scale_keyed("orders", out, factor, {"o_orderkey", "o_custkey"}, fk)
        scale_keyed(
            "lineitem",
            out,
            factor,
            {"l_orderkey", "l_partkey", "l_suppkey"},
            fk,
        )
    else:
        for dim in ["customer", "supplier", "part"]:
            pq.write_table(
                pq.read_table(os.path.join(SRC, f"{dim}.parquet")),
                os.path.join(out, f"{dim}.parquet"),
            )
        scale_keyed("orders", out, factor, {"o_orderkey"})
        scale_keyed("lineitem", out, factor, {"l_orderkey"})
    scale_keyed("events", out, factor, {"event_id"})
    scale_documents(out, factor)
    scale_embeddings(out, factor)
    for name in sorted(os.listdir(out)):
        n = pq.ParquetDataset(os.path.join(out, name)).read(columns=[]).num_rows
        print(f"{name}: {n}")


if __name__ == "__main__":
    main()
