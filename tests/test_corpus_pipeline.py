"""Corpus-curation pipeline e2e: stage audit monotonicity, dedup
behavior on planted duplicates, snapshot readability, rerun stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from advanced_etl_pipelines_spark.pipelines.corpus_curation import (
    near_dedup_keep_canonical,
    quality_gate,
    run_pipeline,
)
from advanced_etl_pipelines_spark.sources.readers import read_sf_table
from advanced_etl_pipelines_spark.sources.sinks import read_snapshot

SF = "/root/testdata/sf0.001"


def test_pipeline_end_to_end(spark, tmp_path):
    docs = read_sf_table(spark, SF, "documents")
    out = run_pipeline(
        spark, docs, str(tmp_path / "curated"), rates={"en": 0.5}
    )
    audit = {name: rows for name, rows, _ in out["audit"]}
    assert audit["ingest"] == docs.count()
    # every stage only removes rows
    order = [r for _, r, _ in out["audit"]]
    assert order == sorted(order, reverse=True)
    assert audit["near_dedup"] > 0

    curated = read_snapshot(spark, str(tmp_path / "curated"))
    assert curated.count() == audit["near_dedup"]
    assert set(curated.columns) == set(docs.columns)


def test_pipeline_rerun_identical(spark, tmp_path):
    docs = read_sf_table(spark, SF, "documents")
    a = run_pipeline(spark, docs, str(tmp_path / "a"), rates={"en": 0.5})
    b = run_pipeline(spark, docs, str(tmp_path / "b"), rates={"en": 0.5})
    ids_a = sorted(
        r.doc_id for r in read_snapshot(spark, str(tmp_path / "a")).collect()
    )
    ids_b = sorted(
        r.doc_id for r in read_snapshot(spark, str(tmp_path / "b")).collect()
    )
    assert ids_a == ids_b
    assert [x[:2] for x in a["audit"]] == [x[:2] for x in b["audit"]]


def test_near_dedup_drops_planted_near_dup(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches the bird sing in the tall green tree near the river"
    )
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base + " today", "en"),  # near-dup of 1
            (3, "completely different text about spark query engines "
                "and distributed joins across many executor nodes", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    kept = near_dedup_keep_canonical(docs, threshold=0.5)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]


def test_quality_gate_drops_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "too short", "en"),
         (2, " ".join(f"word{i}" for i in range(40)), "en")],
        "doc_id long, text string, lang string",
    )
    kept = quality_gate(docs)
    assert [r.doc_id for r in kept.collect()] == [2]
