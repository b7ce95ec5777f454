"""AQ raw-shape parsing unit tests (P1/P2/P3) on synthetic payloads —
the measurement-list shape has no checked-in reference fixture
(`ETL_Multi_Lvl_API/transform.py:132-162` is parsed defensively from
code; schema recorded in FIXTURES.md §2)."""

from __future__ import annotations

import json

import pytest

from advanced_etl_pipelines_spark.pipelines import air_quality as aq


def _land(tmp_path, name, payload):
    (tmp_path / f"{name}_raw_20251211T000000Z.json").write_text(
        json.dumps(payload)
    )


def test_measurement_list_shape_parses_and_pivots(spark, tmp_path):
    """results[].parameters[] with key synonyms: lastValue/value/avg,
    lastUpdated dict {utc:...}, parameter-name normalization, and the
    groupby-mean pivot (two readings for the same (city,time,param))."""
    payload = {
        "results": [
            {
                "city": "pune",
                "parameters": [
                    {"parameter": "pm25", "lastValue": 80.0,
                     "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                    {"parameter": "pm25", "lastValue": 100.0,
                     "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                    {"parameter": "no2", "value": 12.5,
                     "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                    {"parameter": "bogus_param", "value": 1.0,
                     "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                ],
            },
            {
                "name": "nashik",
                "parameters": [
                    {"parameter": "o3", "avg": 33.0,
                     "lastUpdated": {"utc": "2025-12-11T06:00:00+00:00"}},
                ],
            },
        ]
    }
    _land(tmp_path, "fallbackcity", payload)
    parsed = aq.parse_raw(aq.read_raw(spark, str(tmp_path)))
    rows = {r["city"]: r for r in parsed.collect()}
    assert set(rows) == {"pune", "nashik"}
    # duplicate pm25 readings collapse by mean BEFORE the pivot
    assert rows["pune"]["pm2_5"] == 90.0
    assert rows["pune"]["nitrogen_dioxide"] == 12.5
    assert rows["pune"]["pm10"] is None  # absent param -> padded null (P9)
    assert rows["nashik"]["ozone"] == 33.0
    assert rows["pune"]["time"].hour == 5


def test_measurement_list_city_falls_back_to_filename(spark, tmp_path):
    payload = {
        "results": [
            {
                "parameters": [
                    {"parameter": "pm10", "value": 42.0,
                     "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                ],
            }
        ]
    }
    _land(tmp_path, "indore", payload)
    parsed = aq.parse_raw(aq.read_raw(spark, str(tmp_path)))
    assert parsed.first()["city"] == "indore"


def test_mixed_shapes_union(spark, tmp_path):
    """One hourly-array file + one measurement-list file in the same raw
    dir land in one frame (shape detection + unionByName, A17)."""
    _land(
        tmp_path,
        "delhi",
        {"hourly": {"time": ["2025-12-11T00:00"], "pm2_5": [10.0]}},
    )
    _land(
        tmp_path,
        "pune",
        {
            "results": [
                {
                    "city": "pune",
                    "measurements": [
                        {"param": "so2", "value": 7.0,
                         "time": "2025-12-11T01:00:00+00:00"},
                    ],
                }
            ]
        },
    )
    staged = aq.transform(aq.parse_raw(aq.read_raw(spark, str(tmp_path))))
    rows = {r["city"]: r for r in staged.collect()}
    assert rows["delhi"]["pm2_5"] == 10.0
    assert rows["pune"]["sulphur_dioxide"] == 7.0


def test_mixed_struct_and_string_timestamps(spark, tmp_path):
    """One file uses {"utc": ...} dict timestamps, another a plain string
    `time` — BOTH must parse (a struct field must not hijack the whole
    coalesce chain for string-shaped rows)."""
    _land(
        tmp_path,
        "pune",
        {
            "results": [
                {
                    "city": "pune",
                    "parameters": [
                        {"parameter": "pm25", "value": 11.0,
                         "lastUpdated": {"utc": "2025-12-11T05:00:00+00:00"}},
                    ],
                }
            ]
        },
    )
    _land(
        tmp_path,
        "agra",
        {
            "results": [
                {
                    "city": "agra",
                    "parameters": [
                        {"parameter": "pm10", "value": 22.0,
                         "time": "2025-12-11T06:00:00+00:00"},
                    ],
                }
            ]
        },
    )
    parsed = aq.parse_raw(aq.read_raw(spark, str(tmp_path)))
    rows = {r["city"]: r for r in parsed.collect()}
    assert rows["pune"]["time"].hour == 5 and rows["pune"]["pm2_5"] == 11.0
    assert rows["agra"]["time"] is not None and rows["agra"]["time"].hour == 6
    assert rows["agra"]["pm10"] == 22.0


def test_corrupt_file_skipped(spark, tmp_path):
    (tmp_path / "bad_raw_20251211T000000Z.json").write_text("{not json")
    _land(
        tmp_path,
        "delhi",
        {"hourly": {"time": ["2025-12-11T00:00"], "pm2_5": [10.0]}},
    )
    staged = aq.transform(aq.parse_raw(aq.read_raw(spark, str(tmp_path))))
    assert staged.count() == 1  # corrupt doc dropped, good doc parsed
