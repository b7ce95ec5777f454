"""Sequence packing: assemble documents into fixed-budget training
contexts.

Two industry-standard semantics, two Spark shapes:

* ``pack_concat_chunks`` — GPT-style "concatenate then chunk": documents
  are laid end-to-end in a deterministic order and the stream is cut
  every ``budget`` units; a document may straddle a cut (it gets split
  at training time).  Pure window arithmetic — cumulative cost before
  each row, chunk id = floor(cum_before / budget) — so it stays entirely
  in whole-stage codegen and is exactly SQL-expressible (DuckDB oracle).

* ``pack_next_fit`` — strict-budget next-fit: walk the ordered stream,
  keep a running total, and open a new pack whenever adding the next
  document would exceed the budget.  No document is ever split.  The
  running-reset recurrence is not expressible with plain window
  functions (the reset point depends on every prior row), so it runs as
  an Arrow-batched ``applyInPandas`` over shard groups — the canonical
  "stateful scan per partition" seam.

Scale: both operators partition by ``shard_cols``.  Packing only needs
to be *locally* consecutive — packs never cross shards — so a skewed
shard (one language dominating a corpus) can be split further by
salting ``shard_cols`` with ``hash(order_col) % K`` without changing
semantics; pack ids are made globally unique by prefixing the shard.
Each shard's rows must fit in one task for next-fit (they are sorted
in-memory per group); with K chosen so shards are ~1 GB that holds on
standard executors.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def pack_concat_chunks(
    df: DataFrame,
    cost_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Concatenate-and-chunk packing: adds ``chunk_id`` (the chunk this
    document STARTS in), ``chunk_end_id`` (the chunk it ends in — greater
    than ``chunk_id`` iff the document straddles a cut) and ``cum_before``
    (stream offset of its first unit).  One shuffle (the window
    partitioning); everything else is codegen arithmetic."""
    w = (
        Window.partitionBy(*[F.col(c) for c in shard_cols])
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(F.col(cost_col)).over(w), F.lit(0))
    return (
        df.where(F.col(cost_col) > 0)
        .withColumn("cum_before", cum_before)
        .withColumn(
            "chunk_id",
            F.floor(F.col("cum_before") / F.lit(float(budget))).cast("long"),
        )
        .withColumn(
            "chunk_end_id",
            F.floor(
                (F.col("cum_before") + F.col(cost_col) - 1)
                / F.lit(float(budget))
            ).cast("long"),
        )
    )


def pack_next_fit(
    df: DataFrame,
    cost_col: str,
    budget: int,
    shard_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """Strict-budget next-fit packing: adds ``pack_id``, consecutive from
    0 within each shard.  A document larger than the budget gets a pack
    of its own (never dropped, never split — the caller decides).  The
    per-shard scan is a single Arrow batch pass; costs are plain int64
    arithmetic in numpy-backed pandas, no Python-per-row loop beyond the
    unavoidable sequential reset recurrence."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField("pack_id", LongType(), False)]
    )
    budget_l = int(budget)
    order_key = order_col

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_key, kind="mergesort").reset_index(
            drop=True
        )
        costs = pdf[cost_col].to_numpy()
        pack_ids = []
        pack, running = 0, 0
        for c in costs:
            c = int(c)
            if running > 0 and running + c > budget_l:
                pack += 1
                running = 0
            pack_ids.append(pack)
            running += c
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        return pdf

    return (
        df.where(F.col(cost_col) > 0)
        .groupBy(*[F.col(c) for c in shard_cols])
        .applyInPandas(assign, schema=out_schema)
    )
