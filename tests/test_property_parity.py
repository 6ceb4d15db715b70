"""Property-based Spark↔DuckDB parity for the portable expression
primitives everything else is built on (hypothesis; SURVEY.md §5.2).

The oracle gate only sees the fixture corpus; these tests hammer the same
expressions with adversarial generated strings — mojibake chars, accents,
connector punctuation, quotes, mixed whitespace — and assert value-level
equality between the Spark Column expression and the DuckDB SQL the oracle
generators emit. A divergence here would silently corrupt every
hash/normalize-based oracle downstream.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from inbev_data_engineering_case_spark.functions import portable_hash64
from inbev_data_engineering_case_spark.operators.normalize import (
    accent_fold_sql_literals,
    clean_text,
    normalize_location,
)

# Conservative-but-nasty alphabet: ASCII, spaces/tabs, connector
# punctuation (\p{Pc}: _ and ‿), accented Latin, the U+FFFD replacement
# char the reference repairs, and quote chars (SQL-literal hazards).
ALPHABET = list(
    "abzABZ 019.,-'\"_"
) + ["\t", "\x0b", "�", "â", "‿", "Ä", "ä", "ö", "ü", "ß", "ç", "Å", "ø", "É", "è"]
# \x0b (vertical tab): Java's \s matches it, RE2's does not — every
# shared pattern must use the explicit whitespace class (functions.WS_RE)
# or these parity tests catch the divergence.

TEXTS = st.lists(
    st.text(alphabet=st.sampled_from(ALPHABET), max_size=24),
    min_size=1,
    max_size=24,
)

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _spark_values(spark, texts, expr):
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    return [r[0] for r in df.select(expr).collect()]


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_normalize_location_parity(spark, con, texts):
    got = _spark_values(spark, texts, normalize_location("s"))
    want = [
        con.execute(
            "SELECT replace(lower(trim(?)), ' ', '-')", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_clean_text_parity(spark, con, texts):
    matching, replace = accent_fold_sql_literals()
    got = _spark_values(spark, texts, clean_text("s"))
    want = [
        con.execute(
            "SELECT translate(regexp_replace(?, '\\p{Pc}', '', 'g'), "
            f"'{matching}', '{replace}')",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_word_ngrams_parity(spark, con, texts):
    """Word 3-gram shingles (the MinHash unit) must agree with the oracle's
    regexp_split + slice construction, including short/empty strings."""
    from inbev_data_engineering_case_spark.functions import word_ngrams

    got = _spark_values(spark, texts, word_ngrams("s", 3))
    want = [
        con.execute(
            "SELECT [array_to_string(w[i:i+2], ' ') FOR i IN range(1, len(w) - 1)]"
            " FROM (SELECT regexp_split_to_array(trim(?), '[ \\t\\n\\x0b\\f\\r]+') AS w)",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_portable_hash64_parity(spark, con, texts):
    got = _spark_values(spark, texts, portable_hash64("s"))
    want = [
        con.execute(
            "SELECT (('0x' || substr(md5(?), 1, 15)))::BIGINT", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_scrub_pii_parity(spark, con, texts):
    """The PII regexes are RE2-compatible by design — Spark's Java engine
    and DuckDB's RE2 must rewrite adversarial strings identically. Planted
    PII exercises the match path on every example."""
    from inbev_data_engineering_case_spark.operators.textops import (
        PII_EMAIL_RE,
        PII_PHONE_RE,
        scrub_pii,
    )

    planted = [
        f"{t} a.b-c_9@ex-am.ple.org +44 (0) 1234-5678 {t}" for t in texts
    ]
    got = _spark_values(spark, planted, scrub_pii("s"))
    want = [
        con.execute(
            "SELECT regexp_replace(regexp_replace(?, ?, '<EMAIL>', 'g'),"
            " ?, '<PHONE>', 'g')",
            [t, PII_EMAIL_RE, PII_PHONE_RE],
        ).fetchone()[0]
        for t in planted
    ]
    assert got == want


@settings(**SETTINGS)
@given(texts=TEXTS)
def test_repetition_ratio_parity(spark, con, texts):
    """Repetition ratios (q_repetition's oracle shape) must produce the
    bit-identical IEEE division in both engines, including the duplicate
    tokens the generator produces by chance."""
    from inbev_data_engineering_case_spark.operators.textops import (
        token_repetition_ratio,
    )

    # ensure at least some duplication and non-emptiness
    planted = [f"{t} x x" for t in texts]
    got = _spark_values(spark, planted, token_repetition_ratio("s"))
    want = [
        con.execute(
            "SELECT (len(w) - len(list_distinct(w))) / len(w) FROM"
            " (SELECT regexp_split_to_array(trim(lower(?)), '[ \\t\\n\\x0b\\f\\r]+') AS w)",
            [t],
        ).fetchone()[0]
        for t in planted
    ]
    assert got == want


FLOATS32 = st.lists(
    st.floats(
        min_value=-100.0,
        max_value=100.0,
        allow_nan=False,
        allow_infinity=False,
        width=32,  # float32, like the embedding column
    ),
    min_size=1,
    max_size=32,
)


@settings(**SETTINGS)
@given(xs=FLOATS32)
def test_floor_micros_parity(spark, con, xs):
    """floor(abs(x)*1e6) on float32-origin doubles must agree bit-for-bit
    between engines — it replaced round(x, 6) in oracle-compared columns
    because round's tie rules are engine-specific while float32→double
    widening, |x|, IEEE multiply and floor are all exact/deterministic."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(float(x),) for x in xs], "x float")
    got = [
        r[0]
        for r in df.select(
            F.floor(F.abs(F.col("x").cast("double")) * 1_000_000).cast(
                "long"
            )
        ).collect()
    ]
    want = [
        con.execute(
            "SELECT CAST(floor(abs(CAST(CAST(? AS FLOAT) AS DOUBLE))"
            " * 1000000) AS BIGINT)",
            [float(x)],
        ).fetchone()[0]
        for x in xs
    ]
    assert got == want


# URL-shaped adversarial pieces: schemes with odd but legal chars, hosts
# with mixed case/ports, paths/queries with tracking params in odd
# positions, fragments, and outright non-URLs.
_URL_PIECES = st.sampled_from(
    [
        "http://", "HTTPS://", "ftp://", "",
        "Example.COM", "a.b.c.ORG:8080", "Host.net:80", "x.io:443",
        "/", "/Path", "/a/b/", "//",
        "?a=1&b=2", "?utm_source=x", "?b=2&a=1&utm_x=9", "?fbclid=z",
        "?ref=hn&z=", "?=", "&&", "#frag", "#", "plain words", "?q=a%20b",
    ]
)
_URLS = st.lists(
    st.lists(_URL_PIECES, min_size=1, max_size=5).map("".join),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(urls=_URLS)
def test_canonical_url_parity_and_idempotence(spark, con, urls):
    from inbev_data_engineering_case_spark.operators.weburl import (
        canonical_url,
        canonical_url_sql,
    )

    got = _spark_values(spark, urls, canonical_url("s").alias("c"))
    con.execute("CREATE OR REPLACE TABLE _urls(s VARCHAR)")
    con.executemany("INSERT INTO _urls VALUES (?)", [(u,) for u in urls])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {canonical_url_sql('s')} FROM _urls"
        ).fetchall()
    ]
    assert got == want
    # idempotence: canonicalizing a canonical form is a no-op
    again = _spark_values(spark, got, canonical_url("s").alias("c"))
    assert again == got


# HTML-shaped adversarial pieces: unterminated tags, entities split
# across content, script/style with angle brackets inside, comments.
_HTML_PIECES = st.sampled_from(
    [
        "<p>", "</p>", "<P >", "text", "a & b", "&amp;", "&nbsp;", "&lt;",
        "<script>", "</script>", "if(i<n)", "<style>", "</style>",
        "<!--", "-->", "<br/>", "< notatag", ">", "  ", "\n", "&#39;",
        "<div class='x'>", "x=\"<b>\"", "&quot;",
    ]
)
_HTMLS = st.lists(
    st.lists(_HTML_PIECES, min_size=1, max_size=8).map("".join),
    min_size=1,
    max_size=12,
)


@settings(**SETTINGS)
@given(docs=_HTMLS)
def test_html_to_text_parity(spark, con, docs):
    from inbev_data_engineering_case_spark.operators.textops import (
        html_to_text,
        html_to_text_sql,
    )

    got = _spark_values(spark, docs, html_to_text("s").alias("t"))
    con.execute("CREATE OR REPLACE TABLE _docs(s VARCHAR)")
    con.executemany("INSERT INTO _docs VALUES (?)", [(d,) for d in docs])
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {html_to_text_sql('s')} FROM _docs"
        ).fetchall()
    ]
    assert got == want


# SCD2: random observation logs + a later batch — the incremental merge
# must equal a from-scratch rebuild of the concatenated log (per the
# contract: one observation per key per batch, batch after history).
_SCD_KEYS = st.integers(min_value=1, max_value=4)
_SCD_ATTRS = st.sampled_from(["A", "B", "C"])
_SCD_LOG = st.lists(
    st.tuples(_SCD_KEYS, _SCD_ATTRS, st.integers(1, 25)),  # day-of-month
    min_size=1,
    max_size=12,
)
_SCD_BATCH = st.dictionaries(_SCD_KEYS, _SCD_ATTRS, min_size=1, max_size=4)


@settings(**SETTINGS)
@given(log=_SCD_LOG, batch=_SCD_BATCH)
@pytest.mark.slow
def test_scd2_merge_equals_rebuild(spark, log, batch):
    import datetime

    from inbev_data_engineering_case_spark.operators.scd import (
        scd2_from_log,
        scd2_merge,
    )

    jan = [
        (k, a, datetime.date(2024, 1, day), i)
        for i, (k, a, day) in enumerate(log)
    ]
    feb_day = datetime.date(2024, 2, 1)
    feb = [
        (k, a, feb_day, 1000 + i) for i, (k, a) in enumerate(batch.items())
    ]
    schema = "k long, attr string, ts date, id long"
    history = scd2_from_log(
        spark.createDataFrame(jan, schema), "k", ["attr"], "ts", "id"
    )
    batch_df = spark.createDataFrame(
        [(k, a, t) for k, a, t, _ in feb], "k long, attr string, ts date"
    )
    merged = scd2_merge(history, batch_df, "k", ["attr"], "ts")
    rebuilt = scd2_from_log(
        spark.createDataFrame(jan + feb, schema), "k", ["attr"], "ts", "id"
    )
    cols = ["k", "attr", "effective_from", "effective_to", "is_current"]
    got = sorted(map(tuple, merged.select(*cols).collect()))
    want = sorted(map(tuple, rebuilt.select(*cols).collect()))
    assert got == want


def test_no_bare_backslash_s_in_engine_strings():
    """Lint guard: no string literal in the engine may contain \\s —
    Java's \\s matches \\x0B, RE2's does not, so a shared pattern using
    it diverges between Spark and the DuckDB oracles. Use the explicit
    class (functions.WS_RE). Docstrings are exempt (prose)."""
    import ast
    import glob

    offenders = []
    for path in glob.glob(
        "inbev_data_engineering_case_spark/**/*.py", recursive=True
    ):
        tree = ast.parse(open(path).read())
        docstrings = set()
        for node in ast.walk(tree):
            if isinstance(
                node,
                (ast.Module, ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef),
            ):
                d = ast.get_docstring(node, clean=False)
                if d:
                    docstrings.add(d)
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and "\\s" in node.value
                and node.value not in docstrings
            ):
                offenders.append(f"{path}:{node.lineno}")
    assert not offenders, offenders


def test_whitespace_classes_are_canonical():
    """Companion to the \\s guard: every explicit whitespace class in the
    engine and tests must be the ONE canonical spelling (functions.WS_RE
    without the quantifier) — a drifted copy (say, one oracle string
    dropping \\x0b) would reintroduce the same silent Spark-vs-oracle
    divergence."""
    import glob
    import re

    canonical = "[ \\t\\n\\x0b\\f\\r]"
    pat = re.compile(r"\[ \\t\\n[^\]]*\]")
    offenders = []
    for path in glob.glob(
        "inbev_data_engineering_case_spark/**/*.py", recursive=True
    ) + glob.glob("tests/*.py"):
        for i, line in enumerate(open(path), 1):
            if "re.compile" in line:  # this guard's own pattern literal
                continue
            # oracle SQL strings spell the class with DOUBLED
            # backslashes in source ('[ \\t...'); normalize so the
            # guard sees those copies too, not just raw-string ones
            for m in pat.findall(line.replace("\\\\", "\\")):
                if m != canonical:
                    offenders.append(f"{path}:{i}: {m}")
    assert not offenders, offenders
