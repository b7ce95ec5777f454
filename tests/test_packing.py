"""Sequence-packing tests: next-fit respects the budget and is
deterministic; concat-chunk ids reconstruct the stream arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.operators.packing import (
    pack_concat_chunks,
    pack_next_fit,
)
from advanced_etl_pipelines_spark.sources.readers import read_sf_table

SF = "/root/testdata/sf0.001"
BUDGET = 2048


def _docs(spark):
    return read_sf_table(spark, SF, "documents").select(
        "doc_id", "lang", "n_chars"
    )


def test_next_fit_respects_budget_unless_oversized(spark):
    packed = pack_next_fit(_docs(spark), "n_chars", BUDGET, ["lang"], "doc_id")
    per_pack = (
        packed.groupBy("lang", "pack_id")
        .agg(F.sum("n_chars").alias("tot"), F.count(F.lit(1)).alias("n"))
        .where((F.col("tot") > BUDGET) & (F.col("n") > 1))
    )
    # a pack may exceed the budget only when it holds a single oversized doc
    assert per_pack.count() == 0


def test_next_fit_pack_ids_contiguous_from_zero(spark):
    packed = pack_next_fit(_docs(spark), "n_chars", BUDGET, ["lang"], "doc_id")
    per_lang = packed.groupBy("lang").agg(
        F.min("pack_id").alias("lo"),
        F.max("pack_id").alias("hi"),
        F.countDistinct("pack_id").alias("n"),
    )
    bad = per_lang.where(
        (F.col("lo") != 0) | (F.col("n") != F.col("hi") + 1)
    )
    assert bad.count() == 0


def test_next_fit_deterministic_and_order_greedy(spark):
    df = _docs(spark)
    a = pack_next_fit(df, "n_chars", BUDGET, ["lang"], "doc_id")
    b = pack_next_fit(df.repartition(7), "n_chars", BUDGET, ["lang"], "doc_id")
    assert (
        a.orderBy("lang", "doc_id").collect()
        == b.orderBy("lang", "doc_id").collect()
    )
    # replay one language driver-side and check the greedy recurrence
    rows = (
        a.where(F.col("lang") == a.select("lang").first()[0])
        .orderBy("doc_id")
        .collect()
    )
    pack, running = 0, 0
    for r in rows:
        c = r.n_chars
        if running > 0 and running + c > BUDGET:
            pack += 1
            running = 0
        assert r.pack_id == pack
        running += c


def test_concat_chunks_offsets_are_stream_prefix_sums(spark):
    packed = pack_concat_chunks(
        _docs(spark), "n_chars", BUDGET, ["lang"], "doc_id"
    ).orderBy("lang", "doc_id")
    prev_lang, expect = None, 0
    for r in packed.collect():
        if r.lang != prev_lang:
            prev_lang, expect = r.lang, 0
        assert r.cum_before == expect
        assert r.chunk_id == r.cum_before // BUDGET
        assert r.chunk_end_id == (r.cum_before + r.n_chars - 1) // BUDGET
        expect += r.n_chars


def test_next_fit_fill_at_least_half_budget(spark):
    # classic next-fit guarantee: every closed pack is > budget/2 full
    # whenever the item that closed it could not fit; with doc sizes
    # bounded by the budget this means mean fill is comfortably > 0.5.
    packed = pack_next_fit(
        _docs(spark).where(F.col("n_chars") <= BUDGET),
        "n_chars",
        BUDGET,
        ["lang"],
        "doc_id",
    )
    per_pack = packed.groupBy("lang", "pack_id").agg(
        F.sum("n_chars").alias("tot"),
        F.max("pack_id").alias("pid"),
    )
    last_per_lang = per_pack.groupBy("lang").agg(F.max("pid").alias("last"))
    closed = per_pack.join(last_per_lang, "lang").where(
        F.col("pack_id") < F.col("last")
    )
    stats = closed.agg(F.avg(F.col("tot") / BUDGET).alias("fill")).first()
    if stats.fill is not None:
        assert stats.fill > 0.5
