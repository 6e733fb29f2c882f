"""Domain fixture tests for the rebuilt river pipeline (SURVEY.md §5
item 2): prep semantics, the canonical wire-parse contract (including
the all-string JSON and malformed-record behavior the reference's
mismatched schemas never exercised), WQI banding, anomaly flags.

Fixture shapes follow FIXTURES.md §1-3, including the hostile column
names (spaces, '@', non-ASCII '°') kept verbatim.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from bigdata_riveranalysis_spark.operators.river_pipeline import (
    flag_anomalies,
    parse_readings,
    prep,
    wqi_classify,
)

RAW_HEADER = "SampleDate,Years,WaterbodyName,pH,Dissolved Oxygen,Conductivity @25°C"
RAW_ROWS = [
    # Deliberately unsorted: prep must order by the constructed date.
    # Month names are the reference's ABBREVIATED form
    # (kafka/sort_the_source.py:14-18) — the shape the real feed has.
    "Mar,2008,YELLOW (FOXFORD)_020,7.1,85.0,420.0",
    "Jan,2007,CARRIGAHORIG STREAM_010,8.12,99.7,691.0",
    "Dec,2007,CARRIGAHORIG STREAM_010,6.9,55.0,1200.0",
    "Feb,2007,YELLOW (FOXFORD)_020,4.8,20.0,4100.0",
]


def _write_raw_csv(tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text(RAW_HEADER + "\n" + "\n".join(RAW_ROWS) + "\n")
    return str(p)


def test_prep_builds_sorted_first_of_month_dates(spark, tmp_path):
    out = prep(spark, _write_raw_csv(tmp_path)).collect()
    assert [r.FullDate for r in out] == [
        "2007-01-01",
        "2007-02-01",
        "2007-12-01",
        "2008-03-01",
    ]
    assert out[0].WaterbodyName == "CARRIGAHORIG STREAM_010"
    # 5-column projection with the reference's verbatim hostile names.
    assert out[0].asDict().keys() == {
        "FullDate",
        "WaterbodyName",
        "pH",
        "Dissolved Oxygen",
        "Conductivity @25°C",
    }


def test_prep_accepts_full_month_names_too(spark, tmp_path):
    """Tolerant superset: full English month names map identically."""
    p = tmp_path / "raw_full.csv"
    p.write_text(
        RAW_HEADER + "\n"
        "January,2007,CARRIGAHORIG STREAM_010,8.12,99.7,691.0\n"
        "December,2007,CARRIGAHORIG STREAM_010,6.9,55.0,1200.0\n"
    )
    out = prep(spark, str(p)).collect()
    assert [r.FullDate for r in out] == ["2007-01-01", "2007-12-01"]


def test_prep_fails_loudly_on_unmapped_month(spark, tmp_path):
    """An unmapped month name is a job failure, not a silent NULL date
    (the reference's pandas .map would silently yield NaT)."""
    p = tmp_path / "raw_bad.csv"
    p.write_text(RAW_HEADER + "\nThermidor,2007,CARRIGAHORIG STREAM_010,7.0,90.0,400.0\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="unmapped SampleDate"):
        prep(spark, str(p)).collect()


def test_prep_fails_loudly_on_null_month(spark, tmp_path):
    """A missing month is a data defect too — a NULL SampleDate must
    not silently sort to the front as a NULL FullDate (ADVICE r3)."""
    p = tmp_path / "raw_null.csv"
    p.write_text(RAW_HEADER + "\n,2007,CARRIGAHORIG STREAM_010,7.0,90.0,400.0\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="unmapped SampleDate"):
        prep(spark, str(p)).collect()


def test_parse_readings_types_and_malformed(spark):
    wire = [
        # All-string values, as csv.DictReader + json.dumps emits them.
        json.dumps(
            {
                "FullDate": "2007-01-01",
                "WaterbodyName": "CARRIGAHORIG STREAM_010",
                "pH": "8.12",
                "Dissolved Oxygen": "99.7",
                "Conductivity @25°C": "691.0",
            }
        ),
        "this is not json {",
    ]
    raw = spark.createDataFrame([(w,) for w in wire], "value string")
    rows = parse_readings(raw).collect()
    ok = next(r for r in rows if r.sensor_id is not None)
    assert ok.sensor_id == "CARRIGAHORIG STREAM_010"
    assert ok.timestamp.strftime("%Y-%m-%d") == "2007-01-01"
    assert (ok.ph_value, ok.do_value, ok.tds_value) == (8.12, 99.7, 691.0)
    # PERMISSIVE contract: malformed line -> all-NULL reading, not an error.
    bad = next(r for r in rows if r.sensor_id is None)
    assert (bad.timestamp, bad.ph_value, bad.do_value, bad.tds_value) == (
        None,
        None,
        None,
        None,
    )


def test_prep_to_parse_round_trip(spark, tmp_path):
    """prep output serialized to the JSON wire format parses back into
    exactly the typed readings — the contract the reference's
    topic/schema mismatches broke end-to-end."""
    prepped = prep(spark, _write_raw_csv(tmp_path))
    wire = prepped.select(F.to_json(F.struct(*prepped.columns)).alias("value"))
    typed = parse_readings(wire)
    got = {(r.sensor_id, r.timestamp.strftime("%Y-%m-%d"), r.ph_value) for r in typed.collect()}
    assert got == {
        ("CARRIGAHORIG STREAM_010", "2007-01-01", 8.12),
        ("YELLOW (FOXFORD)_020", "2007-02-01", 4.8),
        ("CARRIGAHORIG STREAM_010", "2007-12-01", 6.9),
        ("YELLOW (FOXFORD)_020", "2008-03-01", 7.1),
    }


def test_wqi_classify_bands(spark):
    rows = [
        ("s1", 7.0, 90.0, 400.0),  # no violations -> good
        ("s2", 5.0, 90.0, 400.0),  # pH out -> fair
        ("s3", 5.0, 50.0, 400.0),  # pH + DO out -> poor
        ("s4", 7.0, 90.0, 1500.0),  # conductivity out -> fair
    ]
    df = spark.createDataFrame(
        rows, "sensor_id string, ph_value double, do_value double, tds_value double"
    )
    got = {r.sensor_id: (r.wqi_band, r.n_violations) for r in wqi_classify(df).collect()}
    assert got == {
        "s1": ("good", 0),
        "s2": ("fair", 1),
        "s3": ("poor", 2),
        "s4": ("fair", 1),
    }


def test_flag_anomalies_marks_only_outlier(spark):
    # 20 tight readings + one wild pH spike on the same sensor.
    base = [("s1", 7.0 + 0.01 * i, 90.0, 400.0) for i in range(20)]
    spike = [("s1", 12.0, 90.0, 400.0)]
    df = spark.createDataFrame(
        base + spike, "sensor_id string, ph_value double, do_value double, tds_value double"
    )
    flagged = flag_anomalies(df, z_threshold=3.0).collect()
    assert sum(r.ph_value_anomaly for r in flagged) == 1
    assert next(r for r in flagged if r.ph_value_anomaly).ph_value == 12.0
    assert not any(r.do_value_anomaly or r.tds_value_anomaly for r in flagged)
