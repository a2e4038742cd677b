"""Randomized (seeded) fuzz parity: adversarial text through the full
pipeline must match the DuckDB oracle byte-for-byte — the randomized-testing
layer the reference lacks (SURVEY.md §5).

One Spark job over a few hundred generated documents: random unicode,
regex metacharacters, PII fragments, pathological whitespace, huge tokens.
"""

from __future__ import annotations

import random
import string

import duckdb
import pandas as pd
import pytest

from mysql_data_quality_spark.pipeline import quality_filter as QF

SEED = 1337


def _gen_texts(n: int = 300) -> list[str]:
    rng = random.Random(SEED)
    vocab = [
        "the", "data", "join", "über", "naïve", "文字", "🙂", "x@y.co",
        "(11) 91234-5678", "10.0.0.1", "badword1", "a" * 500, ".*+?[](){}|^$\\",
        "word-with-dash", "trailing.", "'quoted'", '"double"', "%", "_",
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 60)
        toks = [rng.choice(vocab) for _ in range(k)]
        sep = rng.choice([" ", "  ", "\t", "\n", " \n "])
        text = sep.join(toks)
        if rng.random() < 0.1:
            text = " " + text + " "
        if rng.random() < 0.05:
            text = "".join(
                rng.choice(string.printable) for _ in range(rng.randint(0, 80))
            )
        out.append(text)
    return out


@pytest.fixture(scope="module")
def fuzz_pages(spark):
    texts = _gen_texts()
    rows = [
        (f"https://fuzz.example.com/{i}", t, "en" if i % 3 else "de")
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, "url: string, text: string, lang: string")


def test_fuzz_decisions_match_oracle(spark, fuzz_pages):
    dec = QF.decisions(fuzz_pages).orderBy("url").toPandas()
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(QF.decisions_sql("pages") + " order by url").df()
    assert len(dec) == len(oracle) == 300
    for c in dec.columns:
        mism = (dec[c].values != oracle[c].values)
        assert not mism.any(), (
            f"{c}: first mismatch at "
            f"{dec['url'].values[mism.argmax()]}: "
            f"spark={dec[c].values[mism.argmax()]!r} "
            f"oracle={oracle[c].values[mism.argmax()]!r}"
        )


def test_fuzz_flat_hits_match_oracle(spark, fuzz_pages):
    fh = QF.flat_hits(fuzz_pages).orderBy("url").toPandas()
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(QF.flat_hits_sql("pages") + " order by url").df()
    for c in fh.columns:
        assert (fh[c].values == oracle[c].values).all(), c


def test_fuzz_dup_line_fraction_matches_oracle(spark, fuzz_pages):
    from pyspark.sql import functions as F

    from mysql_data_quality_spark.functions.text import (
        dup_line_fraction_col,
        dup_line_fraction_sql,
    )

    got = (
        fuzz_pages.select(
            "url", dup_line_fraction_col(F.col("text")).alias("f")
        )
        .orderBy("url")
        .toPandas()
    )
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(
        f"select url, {dup_line_fraction_sql('text')} as f "
        "from pages order by url"
    ).df()
    assert (got["f"].values == oracle["f"].values).all()


def _gen_urls(n: int = 300) -> list[str]:
    rng = random.Random(SEED + 1)
    schemes = ["http", "HTTPS", "Http", "ftp"]
    hosts = ["Example.COM", "sub.DOMAIN.org", "xn--bcher-kva.ch",
             "host-name.io", "A.B.C.D"]
    ports = ["", ":80", ":443", ":8080", ":0443"]
    paths = ["", "/", "/Path/To/Page", "/a//b/", "/%20x", "/p.html/",
             "/(weird)[path]"]
    queries = ["", "?a=1", "?utm_source=x&b=2", "??", "?q=a?b"]
    frags = ["", "#frag", "#a#b", "#"]
    out = []
    for _ in range(n):
        out.append(
            rng.choice(schemes) + "://" + rng.choice(hosts)
            + rng.choice(ports) + rng.choice(paths) + rng.choice(queries)
            + rng.choice(frags)
        )
    return out


def test_fuzz_canonical_url_matches_oracle(spark):
    from pyspark.sql import functions as F

    from mysql_data_quality_spark.functions.urls import (
        canonical_url_col,
        canonical_url_sql,
    )

    urls = _gen_urls()
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i: int, url: string")
    got = (
        df.select("i", canonical_url_col(F.col("url")).alias("c"))
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"i": range(len(urls)), "url": urls}))
    oracle = con.sql(
        f"select i, {canonical_url_sql('url')} as c from t order by i"
    ).df()
    mism = got["c"].values != oracle["c"].values
    assert not mism.any(), (
        f"first mismatch: in={urls[mism.argmax()]!r} "
        f"spark={got['c'].values[mism.argmax()]!r} "
        f"oracle={oracle['c'].values[mism.argmax()]!r}"
    )


def test_fuzz_dedup_exact_corpus_matches_oracle(spark):
    """Corpus dedup (both keep policies) on adversarial text — duplicate
    injections, unicode, pathological whitespace, None/empty — must keep
    exactly the ids the DuckDB window oracle keeps."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from mysql_data_quality_spark.operators import dedup

    rng = random.Random(4242)
    base = _gen_texts(120)
    rows: list[tuple[int, str | None]] = []
    i = 0
    for t in base:
        rows.append((i, t)); i += 1
        r = rng.random()
        if r < 0.25:  # exact dup
            rows.append((i, t)); i += 1
        elif r < 0.40:  # normalization dup (case + whitespace dressing)
            rows.append((i, "  " + (t or "").upper() + "\t")); i += 1
        elif r < 0.50:  # truncation dup family (distinct normalized text,
            rows.append((i, (t or "")[: len(t or "") // 2])); i += 1
        if rng.random() < 0.05:
            rows.append((i, None)); i += 1
        if rng.random() < 0.05:
            rows.append((i, "")); i += 1
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    con = duckdb.connect()
    con.register(
        "corpus_t", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    for keep in ("min_id", "longest"):
        got = sorted(
            r["doc_id"]
            for r in dedup.dedup_exact_corpus(
                df, "doc_id", "text", keep=keep
            ).select("doc_id").collect()
        )
        want = sorted(
            r[0]
            for r in con.sql(
                "select doc_id from ("
                + dedup.dedup_exact_corpus_sql(
                    "corpus_t", "doc_id", "text", keep=keep
                )
                + ")"
            ).fetchall()
        )
        assert got == want, f"{keep}: {len(got)} vs {len(want)}"


def test_fuzz_dedup_exact_corpus_duplicate_ids(spark):
    """Round-4 row-exact winner semantics under fuzz: ids REPEAT across
    rows (dirty crawl), including same-id rows inside one normalized
    group — the kept (id, text) multiset must match the SQL window
    oracle for both keep policies."""
    import hashlib
    import random

    from mysql_data_quality_spark.operators import dedup

    rng = random.Random(777)
    base = _gen_texts(80)
    rows: list[tuple[int, str | None]] = []
    for i, t in enumerate(base):
        uid = rng.randint(0, 30)  # heavy id collisions on purpose
        rows.append((uid, t))
        r = rng.random()
        if r < 0.3:  # same id, same normalized group, different raw text
            rows.append((uid, "  " + (t or "").upper() + " "))
        elif r < 0.45:  # different id, same text
            rows.append((rng.randint(0, 30), t))
        elif r < 0.55:  # same id, fully identical row
            rows.append((uid, t))
    df = spark.createDataFrame(rows, "doc_id: bigint, text: string")
    con = duckdb.connect()
    con.register(
        "dirty_t", pd.DataFrame(rows, columns=["doc_id", "text"])
    )

    def key(doc_id, text):
        h = hashlib.md5((text or "").encode()).hexdigest()
        return (doc_id, h)

    for keep in ("min_id", "longest"):
        got = sorted(
            key(r["doc_id"], r["text"])
            for r in dedup.dedup_exact_corpus(
                df, "doc_id", "text", keep=keep
            ).collect()
        )
        want = sorted(
            key(a, b)
            for a, b in con.sql(
                "select doc_id, text from ("
                + dedup.dedup_exact_corpus_sql(
                    "dirty_t", "doc_id", "text", keep=keep
                )
                + ")"
            ).fetchall()
        )
        assert got == want, f"{keep}: {len(got)} vs {len(want)}"


def test_fuzz_full_profile_decisions_match_oracle(spark, fuzz_pages):
    """The FULL profile (every Gopher/C4 rule live) through the same
    adversarial corpus: 6 more rule expressions (line/paragraph/n-gram
    repetition, C4 line filter + page predicates) must stay byte-equal
    to the oracle on regex metacharacters, unicode, pathological
    whitespace, and huge tokens."""
    from mysql_data_quality_spark.rules.heuristics import FULL_RULES

    dec = QF.decisions(fuzz_pages, rules=FULL_RULES).orderBy("url").toPandas()
    pdf = fuzz_pages.orderBy("url").toPandas()
    con = duckdb.connect()
    con.register("pages", pdf)
    oracle = con.sql(
        QF.decisions_sql("pages", rules=FULL_RULES) + " order by url"
    ).df()
    assert len(dec) == len(oracle) == 300
    for c in dec.columns:
        mism = (dec[c].values != oracle[c].values)
        assert not mism.any(), (
            f"{c}: first mismatch at "
            f"{dec['url'].values[mism.argmax()]}: "
            f"spark={dec[c].values[mism.argmax()]!r} "
            f"oracle={oracle[c].values[mism.argmax()]!r}"
        )


def test_fuzz_html_extraction_matches_oracle(spark):
    """Adversarial HTML (unclosed tags, angle brackets in text, entities,
    nested/repeated blocks, random printable noise) — extraction must be
    byte-equal across engines."""
    import random
    import string

    from pyspark.sql import functions as F

    from mysql_data_quality_spark.functions import htmltext

    rng = random.Random(90210)
    frags = [
        "<p>alpha beta.</p>", "<div class='x'>gamma</div>", "<br>",
        "<script>if (a < b) { x(); }</script>", "<style>p { color: red }</style>",
        "<!-- note -->", "&amp;", "&lt;tag&gt;", "&nbsp;", "plain words here",
        "2 < 3 and 5 > 4", "<b>bold", "</b>", "<ul><li>i1</li><li>i2</li></ul>",
        "<SCRIPT>SHOUT()</SCRIPT>", "<P ALIGN=left>Caps.</P>",
    ]
    rows = []
    for i in range(200):
        k = rng.randint(0, 12)
        doc = " ".join(rng.choice(frags) for _ in range(k))
        if rng.random() < 0.08:
            doc = "".join(
                ch for ch in (
                    rng.choice(string.printable)
                    for _ in range(rng.randint(0, 60))
                )
                # keep it valid UTF-8 + printable; strip \x0b etc handled
            )
        rows.append((i, doc.encode("utf-8")))
    df = spark.createDataFrame(rows, "i: bigint, html: binary")
    got = (
        df.select("i", htmltext.extract_text_col(F.col("html")).alias("t"))
        .orderBy("i")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("t0", pd.DataFrame(rows, columns=["i", "html"]))
    oracle = con.sql(
        f"select i, {htmltext.extract_text_sql('html')} as t "
        "from t0 order by i"
    ).df()
    mism = got["t"].values != oracle["t"].values
    assert not mism.any(), (
        f"first mismatch i={got['i'].values[mism.argmax()]}: "
        f"spark={got['t'].values[mism.argmax()]!r} "
        f"oracle={oracle['t'].values[mism.argmax()]!r}"
    )
