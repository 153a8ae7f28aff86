"""Quality gates: Gopher rules, char entropy, stratified sampling,
declarative expectations."""

import math

import pytest
from pyspark.sql import Row, functions as F

from parquet_converters_spark.functions.expectations import (
    check_expectations,
    check_referential,
)
from parquet_converters_spark.functions.sampling import stratified_sample
from parquet_converters_spark.functions.text import (
    char_entropy,
    gopher_flags,
    gopher_stats,
)


def _flags(spark, text):
    df = spark.createDataFrame([Row(text=text)])
    row = df.select(
        *[v.alias(k) for k, v in gopher_flags("text").items()]
    ).first()
    return row.asDict()


def test_gopher_word_count(spark):
    assert not _flags(spark, "too short")["too_few_words"]
    long_doc = "the quick brown fox jumps over the lazy dog again and again"
    assert _flags(spark, long_doc)["too_few_words"]


def test_gopher_bullet_and_ellipsis_lines(spark):
    bullets = "\n".join(["- item one"] * 9 + ["a normal closing line"])
    f = _flags(spark, bullets)
    assert f["bullet_lines"]  # 0.9 of lines — exactly at threshold
    all_bullets = "\n".join(["* item"] * 10)
    assert not _flags(spark, all_bullets)["bullet_lines"]
    dots = "\n".join(["trailing..."] * 4 + ["plain line"] * 6)
    assert not _flags(spark, dots)["ellipsis_lines"]


def test_gopher_symbol_ratio(spark):
    hashy = "# " * 10 + "word " * 10
    f = _flags(spark, hashy)
    assert not f["symbol_ratio"]  # 10 symbols / 20 words = 0.5 > 0.1


def test_gopher_alpha_and_stopwords(spark):
    numeric = " ".join(str(i) for i in range(20))
    f = _flags(spark, numeric)
    assert not f["alpha_words"]
    assert not f["stopwords"]
    english = "the cat sat on the mat and that was to be all of it have with"
    f = _flags(spark, english)
    assert f["alpha_words"] and f["stopwords"]


def test_gopher_stats_values(spark):
    df = spark.createDataFrame([Row(text="ab abcd\n- x")])
    row = df.select(
        *[v.alias(k) for k, v in gopher_stats("text").items()]
    ).first()
    assert row.word_count == 4
    assert row.mean_word_len == pytest.approx((2 + 4 + 1 + 1) / 4)
    assert row.bullet_line_frac == pytest.approx(0.5)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("aaaa", 0.0),
        ("ab", 1.0),
        ("abcd", 2.0),
        ("aabb", 1.0),
    ],
)
def test_char_entropy_exact(spark, text, expected):
    df = spark.createDataFrame([Row(text=text)])
    got = df.select(char_entropy("text").alias("e")).first().e
    assert got == pytest.approx(expected, abs=1e-9)


def test_char_entropy_mixed(spark):
    # "aab": p(a)=2/3, p(b)=1/3
    p = [2 / 3, 1 / 3]
    expected = round(-sum(x * math.log2(x) for x in p), 3)
    df = spark.createDataFrame([Row(text="aab")])
    assert df.select(char_entropy("text").alias("e")).first().e == expected


def test_stratified_sample_deterministic_and_consistent(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fracs = {"en": 0.5, "de": 0.25}
    s1 = stratified_sample(docs, "lang", "doc_id", fracs, 0.1)
    s2 = stratified_sample(docs, "lang", "doc_id", fracs, 0.1)
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1
    # audit mode agrees with filter mode
    audited = stratified_sample(docs, "lang", "doc_id", fracs, 0.1, keep_col="k")
    kept = {r.doc_id for r in audited.where("k").select("doc_id").collect()}
    assert kept == ids1
    # per-stratum rates are in the right ballpark (hash-uniform)
    counts = {
        r.lang: (r.total, r.sampled)
        for r in audited.groupBy("lang")
        .agg(F.count("*").alias("total"), F.sum(F.col("k").cast("int")).alias("sampled"))
        .collect()
    }
    t_en, s_en = counts["en"]
    assert 0.3 <= s_en / t_en <= 0.7


def test_check_expectations_counts(spark):
    df = spark.createDataFrame(
        [Row(x=1, y=None), Row(x=5, y=2), Row(x=-1, y=3)]
    )
    rep = check_expectations(
        df, {"x_pos": F.col("x") > 0, "y_present": F.col("y").isNotNull()}
    )
    got = {r.rule: (r.violations, r.total) for r in rep.collect()}
    assert got == {"x_pos": (1, 3), "y_present": (1, 3)}


def test_check_referential_orphans(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=2), Row(k=9)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    rep = check_referential(child, parent, "k", "pk", "fk").first()
    assert (rep.rule, rep.violations, rep.total) == ("fk", 1, 3)


def test_normalize_text_idempotent_and_exact(spark):
    """normalize_text strips exactly the injected mess and is
    idempotent (normalize∘normalize == normalize) — the property that
    makes content hashes stable no matter how many pipeline stages
    re-run the cleaner."""
    from pyspark.sql import functions as F

    from parquet_converters_spark.functions.text import normalize_text

    cases = [
        ("  a  b\r\n\r\nc  ", "a b\n\nc"),  # paragraph break preserved
        ("a\t\tb  c", "a b c"),
        ("\x07x\n\n\n\n\ny\x1f", "x\n\ny"),
        ("already clean", "already clean"),
        ("line 1 \n line 2", "line 1\nline 2"),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "t string")
    out = df.select(
        "t",
        normalize_text("t").alias("n1"),
        normalize_text(normalize_text("t")).alias("n2"),
    ).collect()
    want = dict(cases)
    for r in out:
        assert r["n1"] == want[r["t"]], (repr(r["t"]), repr(r["n1"]))
        assert r["n2"] == r["n1"]
