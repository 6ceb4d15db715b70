"""Distributed byte-pair-encoding: train merge rules on a corpus and
tokenize with them — the real subword tokenizer the training pipeline's
token budgets ultimately come from (``textops.bpe_token_count`` is the
cheap regex proxy; this is the genuine algorithm).

Scale shape (the industrial one, cf. the original BPE formulation):

- The corpus is scanned ONCE: tokenize → explode → word-frequency
  vocabulary. Everything after runs on the vocab table, which grows
  sublinearly with the corpus (Heaps' law) — at 100 TB the vocab is
  millions of rows, not billions of documents.
- Each merge round is one pair-count aggregation over the vocab
  (adjacent-pair explode weighted by word frequency → groupBy → argmax)
  plus one merge application. The argmax collect is ONE row per round —
  the same driver-sized model-state move as Lloyd's k-means in
  ``similarity.train_ivf_centroids``.
- Merge application rewrites the symbol arrays via Arrow-batched
  ``mapInPandas`` — the documented exception to the no-Python-UDF policy
  (like multimodal decode): left-to-right greedy pair merging is
  sequential within a word, which Spark's higher-order array functions
  can't express. Batches are vocab rows (small), never corpus rows.
- Lineage is truncated per round (``_materialize``), exactly like the
  components loop — round N's plan must not replay rounds 1..N-1.
- Tokenizing a corpus afterward is a single ``mapInPandas`` pass with the
  learned merge list shipped in the task closure (it is a model artifact
  of KBs–MBs, broadcast by Spark's task serialization).

End-of-word marker ``</w>`` follows the classic formulation so merges
distinguish word-final from word-internal pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inbev_data_engineering_case_spark.functions import tokens
from inbev_data_engineering_case_spark.operators.dedup import _materialize

EOW = "</w>"


def build_word_vocab(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One corpus pass → (word, n) frequency vocabulary over lowercased
    whitespace tokens. This is the only stage that touches corpus-sized
    data; its shuffle carries one row per distinct word."""
    return (
        docs.select(
            F.explode(tokens(F.lower(F.col(text_col)))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_seq(seq: list, left: str, right: str) -> list:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — the sequential step Spark arrays can't express."""
    out, i, merged = [], 0, left + right
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == left and seq[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _apply_merge(vocab_syms: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every vocab row's symbol array under one merge rule
    (Arrow-batched; rows are vocab entries, not documents)."""
    schema = vocab_syms.schema

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch = batch.copy()
            batch["syms"] = [
                _merge_seq(list(s), left, right) for s in batch["syms"]
            ]
            yield batch

    return vocab_syms.mapInPandas(apply, schema=schema)


def train_bpe(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus. Returns the
    ordered merge list (the model). Deterministic: the argmax tie-breaks
    lexicographically, so the same corpus always yields the same rules.

    Stops early when no adjacent pair reaches ``min_pair_count`` — further
    merges would memorize hapax words."""
    vocab = build_word_vocab(docs, text_col)
    syms = _materialize(
        vocab.select(
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(EOW))
            ).alias("syms"),
            "n",
        )
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = syms.select(
            F.posexplode(F.slice("syms", 1, F.size("syms") - 1)).alias(
                "i", "left"
            ),
            F.col("syms"),
            "n",
        ).select(
            "left",
            F.element_at("syms", F.col("i") + 2).alias("right"),
            "n",
        )
        best = (
            pairs.groupBy("left", "right")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))
        syms = _materialize(_apply_merge(syms, left, right))
    return merges


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus under learned merges → (id, bpe_tokens,
    n_bpe_tokens). One Arrow-batched pass; the merge list rides the task
    closure. Within a batch, each distinct word is tokenized once and
    cached — Zipf makes that cache hit constantly."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField(
                "bpe_tokens", T.ArrayType(T.StringType()), True
            ),
            T.StructField("n_bpe_tokens", T.LongType(), True),
        ]
    )
    rules = list(merges)

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is None:
            seq = list(word) + [EOW]
            for left, right in rules:
                seq = _merge_seq(seq, left, right)
            got = cache[word] = seq
        return got

    def tokenize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for batch in batches:
            ids, toks_out, counts = [], [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                words = (text or "").lower().split()
                doc_toks: list[str] = []
                for w in words:
                    doc_toks.extend(encode_word(w, cache))
                ids.append(doc_id)
                toks_out.append(doc_toks)
                counts.append(len(doc_toks))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "bpe_tokens": toks_out,
                    "n_bpe_tokens": counts,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        tokenize, schema=out_schema
    )
