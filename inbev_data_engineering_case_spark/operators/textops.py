"""Text-analysis operators for the training-data pipeline (north-star
extensions, SURVEY.md §7.2-7): token counting, quality scoring, language ID,
document fingerprinting.

All pure Column expressions over ``documents.text`` — JVM-side, zero UDFs,
so they run inside whole-stage codegen and scale linearly with rows (no
shuffle at all until an aggregation consumes them). Every function has an
exact ANSI-SQL twin used by the oracles (see queries.py), which is why the
hashes are md5-based (portable) rather than Spark's murmur3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.functions import (
    WS_RE,
    portable_hash64,
    sql_ident as _sql_ident,
    sql_str as _sql_str,
    tokens,
)

# Tiny per-language stopword inventories for the n-gram/stopword language-ID
# heuristic. Deliberately small and hard-coded: the operator's job is the
# *shape* (vectorized scoring + deterministic argmax), the lists are config.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "por", "con"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}
# Deterministic tie-break order for argmax (first wins on equal score).
LANG_PRIORITY = ["en", "es", "de", "fr"]

STOPWORDS_QUALITY = LANG_STOPWORDS["en"]
PUNCT_CLASS = "[.!?,;:]"


def token_count(text: Column | str) -> Column:
    """Whitespace token count (the cheap proxy; a BPE-ish regex variant is
    ``bpe_token_count``)."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """BPE-ish sub-word proxy: count alternating letter-runs, digit-runs and
    single non-space symbols — a deterministic stand-in for a real tokenizer
    with the same scaling shape (regex count, JVM-side)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(
                F.regexp_replace(text, r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0b\f\r])", "$1\x1f"),
                "\x1f",
            ),
            lambda t: F.trim(t) != "",
        )
    )


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars / total chars.

    Deliberately NOT rounded: both engines compute the identical IEEE
    division of identical ints, so the raw double is bit-identical, whereas
    round() rules differ between engines exactly at the tie values that
    small-denominator ratios constantly produce."""
    text = F.col(text) if isinstance(text, str) else text
    return F.length(
        F.regexp_replace(text, f"[^{PUNCT_CLASS[1:-1]}]", "")
    ) / F.length(text)


def stopword_ratio(text: Column | str, stopwords: list[str] | None = None) -> Column:
    """Stopword tokens / total tokens (lowercased)."""
    stopwords = stopwords or STOPWORDS_QUALITY
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return F.size(F.filter(toks, _isin(stopwords))) / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0,1]: rewards stopword presence
    (natural language), moderate length, and penalizes punctuation density.
    Deterministic, expression-only; weights are engine policy, not learned."""
    text = F.col(text) if isinstance(text, str) else text
    length_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return (
        0.5 * stopword_ratio(text)
        + 0.3 * length_score
        + 0.2 * (1 - F.least(punct_ratio(text) * 10, F.lit(1.0)))
    )


def _isin(words: list[str]):
    # Closure factory, NOT a default-arg lambda: PySpark counts a lambda's
    # parameters (defaults included) to decide the higher-order-function
    # arity, so `lambda t, sw=sw:` would receive the element *index* as sw.
    return lambda t: t.isin(*words)




def lang_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language over the lowercased token set."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return {
        lang: F.size(F.filter(toks, _isin(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(text: Column | str) -> Column:
    """Deterministic argmax over per-language stopword scores; 'und'
    (undetermined) when every score is zero; ties break by LANG_PRIORITY."""
    scores = lang_scores(text)
    all_zero = None
    for c in scores.values():
        all_zero = c == 0 if all_zero is None else all_zero & (c == 0)
    expr = F.when(all_zero, F.lit("und"))
    for i, lang in enumerate(LANG_PRIORITY):
        cond = None
        for other in LANG_PRIORITY[:i]:
            c = scores[lang] > scores[other]
            cond = c if cond is None else cond & c
        for other in LANG_PRIORITY[i + 1 :]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else cond & c
        expr = expr.when(cond, F.lit(lang))
    return expr


def score_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
):
    """(id, text, lang, quality[, *extra_cols]) for a corpus in ONE
    tokenization pass. ``extra_cols`` names input columns to carry
    through unchanged (e.g. the source/domain column the per-source
    cap partitions on) — pure projection passthrough, no extra scan.

    ``lang_id(text)`` and ``quality_score(text)`` as standalone Column
    expressions each embed their own ``tokens(lower(text))`` subtree, and
    the language argmax references every per-language score several times
    — Spark's subexpression elimination skips lambda-bearing expressions,
    so the corpus text would be re-split up to ~20× per row. This helper
    stages the plan instead: project the token array once, then the
    per-language hit counts, then the argmax/quality over plain attribute
    references (CollapseProject keeps non-cheap multiply-referenced
    aliases staged, so each runs once). Values are bit-identical to the
    standalone expressions; measured ~1.45× faster on the curation scan —
    the stage that reads the full 100 TB corpus.

    The input inherits the signature stages' parallelism guard
    (``dedup._ensure_parallelism``): scoring is compute-bound per row
    (tokenize + per-language membership counts), so a small input file
    (1-2 parquet splits) would otherwise pin the whole scoring stage to
    1-2 cores — measured 2.0s single-core vs ~0.3s guarded on the sf0.1
    curation fixture. On a cluster scan yielding thousands of splits the
    guard is a metadata-only no-op (r15 optimization round, guide §2).

    The three staged projections are built as SQL text and parsed with
    one ``selectExpr`` each (r16 optimization round): the Column-API
    form paid one py4j round-trip per node — the four ``F.filter``
    lambdas plus the argmax when-chain cost ~0.25-1.1s of driver-side
    tree construction per plan build, every run, on the operator every
    curation entry calls first — where the parse of identical SQL text
    is ~20ms. Semantics are bit-identical (same staged plan, same
    expression trees out of the parser; ``t IN (...)`` is the same
    ``In`` node ``Column.isin`` builds, ``0.5D`` the same double
    literal as ``F.lit(0.5)``) and remain pinned by
    ``test_score_documents_matches_standalone_expressions``.
    """
    from inbev_data_engineering_case_spark.operators.dedup import (
        _ensure_parallelism,
    )

    id_q = _sql_ident(id_col)
    t_q = _sql_ident(text_col)
    extra_q = [_sql_ident(c) for c in extra_cols]
    toks_sql = f"split(trim(lower({t_q})), {_sql_str(WS_RE)})"
    toks = _ensure_parallelism(df).selectExpr(
        id_q, t_q, *extra_q, f"{toks_sql} AS _toks"
    )
    scored = toks.selectExpr(
        id_q,
        t_q,
        *extra_q,
        "_toks",
        *[
            "size(filter(_toks, t -> t IN ("
            + ", ".join(_sql_str(w) for w in sw)
            + f"))) AS _s_{lang}"
            for lang, sw in LANG_STOPWORDS.items()
        ],
    )
    all_zero = " AND ".join(f"(_s_{lang} = 0)" for lang in LANG_PRIORITY)
    branches = [f"WHEN {all_zero} THEN 'und'"]
    for i, lang in enumerate(LANG_PRIORITY):
        conds = [
            f"(_s_{lang} > _s_{other})" for other in LANG_PRIORITY[:i]
        ] + [
            f"(_s_{lang} >= _s_{other})" for other in LANG_PRIORITY[i + 1 :]
        ]
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    lang_sql = "CASE " + " ".join(branches) + " END"
    # STOPWORDS_QUALITY is LANG_STOPWORDS["en"], so the quality stopword
    # count IS the English language score — reuse the attribute. The
    # punctuation class is PUNCT_CLASS negated, the same text
    # punct_ratio embeds.
    punct_sql = (
        f"(length(regexp_replace({t_q}, '[^.!?,;:]', '')) / length({t_q}))"
    )
    quality_sql = (
        "(0.5D * (_s_en / size(_toks))"
        f" + 0.3D * least(length({t_q}) / 500.0D, 1.0D)"
        f" + 0.2D * (1 - least({punct_sql} * 10, 1.0D)))"
    )
    return scored.selectExpr(
        id_q,
        t_q,
        f"{lang_sql} AS lang",
        f"{quality_sql} AS quality",
        *extra_q,
    )


def token_repetition_ratio(text: Column | str) -> Column:
    """Fraction of repeated tokens: 1 - distinct/total over the lowercased
    whitespace tokens (0 = all unique). The Gopher/C4-family intra-document
    repetition signal — boilerplate and SEO spam score high. Kept as the
    exact integer-difference division so both engines produce the
    identical IEEE double (same reasoning as ``punct_ratio``)."""
    toks = tokens(F.lower(F.col(text) if isinstance(text, str) else text))
    return (F.size(toks) - F.size(F.array_distinct(toks))) / F.size(toks)


def line_repetition_ratio(text: Column | str) -> Column:
    """Fraction of repeated lines: 1 - distinct/total over newline-split
    lines. Catches templated pages whose repeated units are whole lines
    (nav bars, footers) that token-level stats dilute."""
    text = F.col(text) if isinstance(text, str) else text
    lines = F.split(text, "\n")
    return (F.size(lines) - F.size(F.array_distinct(lines))) / F.size(lines)


# Conservative, RE2-compatible patterns (no lookarounds/backrefs) so the
# same regex text runs identically in Spark's Java engine and DuckDB's RE2.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9() \t\n\x0b\f\r-]{6,}[0-9]"


def scrub_pii(text: Column | str) -> Column:
    """Redact emails then phone-shaped digit runs with typed placeholders —
    the standard pre-training PII scrub pass. Order matters (emails first:
    a phone pattern must not eat digits inside an address). Pure
    ``regexp_replace`` expressions: codegen'd, no UDF, linear scan."""
    text = F.col(text) if isinstance(text, str) else text
    no_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PII_PHONE_RE, "<PHONE>")


def normalize_for_fingerprint(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse all whitespace
    runs to single spaces, trim."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(text)), WS_RE, " ")


def fingerprint(text: Column | str) -> Column:
    """64-bit portable content fingerprint of the normalized text."""
    return portable_hash64(normalize_for_fingerprint(text))


# ---------------------------------------------------------------------------
# HTML boilerplate removal (web-crawl text extraction)
# ---------------------------------------------------------------------------
# Ordered (pattern, replacement) rewrite chain shared verbatim with the
# DuckDB oracle. RE2-compatible: no backreferences (script/style each get
# their own closed-block pattern), no lookarounds; `(?is)` inline flags are
# honored by both Java's engine and RE2. Regex tag-stripping is the
# documented production trade for crawl-scale extraction (a DOM parse per
# document is Python/driver-bound): it handles well-formed markup and
# degrades to leaving text intact, never dropping it, on pathological
# markup (e.g. a literal `<` in prose consumes through the next `>`).
HTML_STRIP_RULES: list[tuple[str, str]] = [
    # closed script/style/noscript blocks first (content is never prose)
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?is)<noscript[^>]*>.*?</noscript>", " "),
    (r"(?s)<!--.*?-->", " "),          # comments (incl. commented markup)
    (r"(?s)<[^>]+>", " "),             # any remaining tag -> space
    # minimal entity decode: the named set that dominates real corpora.
    # &amp; decodes LAST (the standard order): decoding it first would
    # double-decode escaped entities — '&amp;lt;b&amp;gt;' (a page
    # DISPLAYING the text '&lt;b&gt;') must not collapse to '<b>'
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&amp;", "&"),
    # collapse whitespace runs — EXPLICIT class, not \s: Java's \s
    # includes \x0B (vertical tab) while RE2's does not, so the shared
    # rule text would diverge between Spark and the DuckDB oracle on any
    # document containing one
    (r"[ \t\n\x0b\f\r]+", " "),
]


def html_to_text(text: Column | str) -> Column:
    """Extract prose from HTML: drop script/style/noscript blocks and
    comments, strip remaining tags to spaces (so `</p><p>` never glues
    words), decode the common named entities, collapse whitespace, trim.
    A chain of codegen'd ``regexp_replace`` — one linear scan per rule,
    zero UDFs, zero shuffle; the rule table IS the oracle (same patterns
    run under DuckDB's RE2)."""
    out = F.col(text) if isinstance(text, str) else text
    for pattern, repl in HTML_STRIP_RULES:
        out = F.regexp_replace(out, pattern, repl)
    return F.trim(out)


def html_to_text_sql(expr: str) -> str:
    """The identical rewrite chain as a DuckDB SQL expression."""
    out = expr
    for pattern, repl in HTML_STRIP_RULES:
        pat = pattern.replace("'", "''")
        rep = repl.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return f"trim({out})"
