"""Slowly-changing-dimension Type 2 maintenance — the canonical
silver-layer dimension pattern the reference's medallion pipeline
(SURVEY.md §2: bronze→silver→gold snapshots,
``data_transformations_bronze_to_silver.py``) stops short of: keep every
historical version of a dimension row with validity intervals instead of
overwriting in place, so facts join to the version that was true at
their event time (the as-of join in ``operators/asof.py`` consumes
exactly this shape).

Two entry points:

- ``scd2_from_log``: rebuild the full versioned history from an
  observation log (key, attributes, observed-at) — consecutive
  duplicate observations collapse, each surviving change opens a
  version; the whole derivation is two window functions over one
  exchange on the key. This is the backfill/bootstrap path, and it is
  the oracle-checked one (pure lag/lead SQL).
- ``scd2_merge``: the incremental daily path — merge one batch of
  current observations into an existing history table (close changed
  open rows, insert new versions, pass unchanged rows through), the
  same append-style artifact advancement as
  ``curate.advance_corpus_artifacts``. Verified by a pytest parity
  check against ``scd2_from_log`` on the concatenated log.

Scale shape: one exchange on the dimension key in both paths (windows
and joins all share it); ``scd2_merge`` touches only open rows plus the
batch — closed history is never rewritten (union it back unmodified, or
at the storage layer leave closed partitions untouched); no Python, no
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _changed(attr_cols: list[str], left: str, right: str):
    """Any-attribute-differs predicate, null-safe (<=> negation)."""
    cond = F.lit(False)
    for a in attr_cols:
        cond = cond | ~F.col(f"{left}.{a}").eqNullSafe(F.col(f"{right}.{a}"))
    return cond


def scd2_from_log(
    log: DataFrame,
    key_col: str,
    attr_cols: list[str],
    ts_col: str,
    id_col: str | None = None,
) -> DataFrame:
    """Versioned dimension history from an observation log.

    Output: ``(key_col, *attr_cols, effective_from, effective_to,
    is_current)`` — one row per (key, run of consecutive equal
    attributes); ``effective_to`` is the next version's start (null for
    the open version), so intervals are half-open ``[from, to)`` and an
    as-of probe at time t matches exactly one version.

    Ties on ``ts_col`` are broken by ``id_col`` (required for
    determinism when one key can be observed twice at one timestamp;
    the LAST observation in that order wins the interval start).
    """
    order = [F.col(ts_col)] + ([F.col(id_col)] if id_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    # version boundary = first row, or any attribute differs from the
    # previous observation of the same key
    boundary = F.lit(False)
    for a in attr_cols:
        boundary = boundary | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    boundary = boundary | F.lag(ts_col).over(w).isNull()
    # one row per version: its FIRST observation starts the interval
    runs = log.withColumn("_new_version", boundary).filter(
        F.col("_new_version")
    )
    # order the version chain by (ts, id) — NOT ts alone — so two
    # versions opened at the same timestamp chain deterministically
    w_next = Window.partitionBy(key_col).orderBy(*order)
    return runs.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w_next).alias("effective_to"),
        F.lead(ts_col).over(w_next).isNull().alias("is_current"),
    )


def scd2_merge(
    history: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_cols: list[str],
    batch_ts_col: str,
    validate: bool = True,
) -> DataFrame:
    """Merge one batch of observations into an SCD2 ``history`` table
    (schema as produced by ``scd2_from_log``); at most one observation
    per key per batch (enforce upstream with e.g. a latest-wins window).

    - unknown key            -> new open row;
    - known key, changed attrs -> close the open row at the batch ts,
      insert a new open row;
    - known key, same attrs  -> history unchanged;
    - closed rows            -> passed through untouched.

    PRECONDITION: every batch observation is dated strictly AFTER the
    key's open version began — closing an open row at an earlier ts
    would publish an inverted ``[from, to)`` interval that as-of probes
    can never match. ``validate=True`` (default) checks this with one
    dimension-scale aggregate and raises on violation; late-arriving
    observations belong in a ``scd2_from_log`` rebuild of the affected
    keys, not a forward merge. The check costs one extra batch-vs-open
    join execution per merge (dimension-scale); pass ``validate=False``
    on a feed whose timestamps are guaranteed monotone upstream.

    Concurrent writers: pure transformation — when two merge jobs can
    overlap (a retry racing its original), publish the new history
    through ``layers.commit_snapshot`` so one wins and the loser
    re-merges onto the winner's snapshot instead of clobbering it.
    """
    closed = history.filter(~F.col("is_current"))
    open_rows = history.filter(F.col("is_current")).alias("o")
    b = batch.alias("b")

    joined = b.join(open_rows, F.col(f"b.{key_col}") == F.col(f"o.{key_col}"), "left")
    if validate:
        # only observations that would CHANGE history can invert an
        # interval — an unchanged same-ts observation (e.g. an
        # idempotent batch replay) is a harmless no-op and must not trip
        n_late = (
            joined.filter(
                F.col("o.effective_from").isNotNull()
                & _changed(attr_cols, "b", "o")
                & (F.col(f"b.{batch_ts_col}") <= F.col("o.effective_from"))
            ).count()
        )
        if n_late:
            raise ValueError(
                f"scd2_merge: {n_late} batch observation(s) are not "
                "strictly after their key's open version — merging would "
                "invert validity intervals. Rebuild the affected keys "
                "with scd2_from_log instead."
            )
    is_new = F.col(f"o.{key_col}").isNull()
    changes = joined.filter(is_new | _changed(attr_cols, "b", "o")).select(
        F.col(f"b.{key_col}").alias(key_col),
        *[F.col(f"b.{a}").alias(a) for a in attr_cols],
        F.col(f"b.{batch_ts_col}").alias("effective_from"),
        F.lit(None).cast(history.schema["effective_to"].dataType).alias(
            "effective_to"
        ),
        F.lit(True).alias("is_current"),
    )
    change_keys = changes.select(key_col, F.col("effective_from").alias("_close_ts"))
    to_close = (
        open_rows.join(change_keys, key_col, "inner")
        .select(
            key_col,
            *attr_cols,
            "effective_from",
            F.col("_close_ts").alias("effective_to"),
            F.lit(False).alias("is_current"),
        )
    )
    untouched_open = open_rows.join(change_keys, key_col, "left_anti").select(
        key_col, *attr_cols, "effective_from", "effective_to", "is_current"
    )
    closed_sel = closed.select(
        key_col, *attr_cols, "effective_from", "effective_to", "is_current"
    )
    return closed_sel.unionByName(untouched_open).unionByName(to_close).unionByName(
        changes
    )


def point_in_time_join(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    from_col: str = "effective_from",
    to_col: str = "effective_to",
    broadcast_history: bool = False,
) -> DataFrame:
    """Point-in-time (PIT) join: enrich each fact row with the dimension
    version that was valid AT the fact's own timestamp — the
    feature-store correctness primitive that prevents future leakage
    into training data (a model trained on "the customer's segment
    today" instead of "their segment when the order happened" learns
    from the future; Feast/Tecton call this same operation a PIT join).

    ``history`` is SCD2-shaped (``scd2_from_log`` output): half-open
    ``[from_col, to_col)`` validity intervals per key, ``NULL`` end on
    the open version — so a probe at time t matches AT MOST one version
    (exactly one when t is not before the key's first version). Facts
    whose key is absent or whose ts precedes the first version are
    dropped (inner semantics): an unmatched fact has no leakage-safe
    attribute value, and silently nulling it would hide the coverage
    gap — count them upstream if needed.

    Scale shape: an equi-join on the key with the validity predicate as
    the join condition — both sides exchange once on the key and the
    per-key fan-out is bounded by that key's version count (small by
    SCD construction), so cost is fact-sized, never fact×history.
    ``broadcast_history=True`` skips the fact-side shuffle entirely when
    the dimension history fits in an executor (the common case: even a
    100M-row dimension with 10 versions/key is a few GB) — the same
    broadcast-the-model discipline as the ANN and LM operators.

    Returns all fact columns plus the history's attribute columns and
    ``from_col`` (the version stamp); ``to_col``/``is_current`` are
    dropped — the probe time plus version stamp identify the interval.
    """
    h = history.drop("is_current") if "is_current" in history.columns else history
    # explicit aliases: facts and history often derive from the SAME
    # source table (e.g. a dimension rebuilt from the fact log), and
    # bracket column refs on shared-lineage frames trip Spark's
    # ambiguous-self-join analyzer
    f_a, h_a = facts.alias("_pit_f"), h.alias("_pit_h")
    rhs = F.broadcast(h_a) if broadcast_history else h_a
    fc = lambda c: F.col(f"_pit_f.{c}")  # noqa: E731
    hc = lambda c: F.col(f"_pit_h.{c}")  # noqa: E731
    cond = (
        (fc(key_col) == hc(key_col))
        & (fc(ts_col) >= hc(from_col))
        & (hc(to_col).isNull() | (fc(ts_col) < hc(to_col)))
    )
    joined = f_a.join(rhs, cond, "inner")
    keep = [fc(c) for c in facts.columns] + [
        hc(c) for c in h.columns if c not in (key_col, to_col)
    ]
    return joined.select(*keep)
