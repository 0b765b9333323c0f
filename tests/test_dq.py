"""DQ gate tests — GE-parity semantics (SURVEY.md §2.11, FIXTURES.md A4).

Seed rows replicate the reference's good/bad fixtures
(ge/test_validation.py:18-41 and :60-83 in /root/reference/).
"""

import pytest

from endtoend_etl_openmeteo_spark.operators.dq import (
    DQValidationError,
    Expectation,
    REFERENCE_WEATHER_SUITE,
    compile_expectations,
    dq_gate,
)
from endtoend_etl_openmeteo_spark.schemas import VALIDATION_RECORD_SCHEMA

GOOD = [
    ("Warsaw", "s3://raw/weather/test/file1.json", 52.23, 21.01,
     "Europe/Berlin", "2025-10-31T12:00:00", 15.5, 0.0, 5.2),
    ("Berlin", "s3://raw/weather/test/file2.json", 52.52, 13.41,
     "Europe/Berlin", "2025-10-31T12:00:00", 16.8, 2.5, 8.1),
]
BAD = [
    ("Warsaw", "s3://raw/weather/test/file1.json", 52.23, 21.01,
     "Europe/Berlin", None, 15.5, 0.0, 5.2),          # null time
    ("Berlin", "s3://raw/weather/test/file2.json", 52.52, 13.41,
     "Europe/Berlin", "2025-10-31T12:00:00", 150.0, -5.0, 8.1),  # temp/precip out of range
]
# null temperature with non-null time: must PASS (between ignores nulls)
EDGE = [
    ("Paris", "s3://raw/weather/test/file3.json", 48.86, 2.35,
     "Europe/Paris", "2025-10-31T12:00:00", None, 0.0, 1.0),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, VALIDATION_RECORD_SCHEMA)


def test_good_records_pass(spark):
    result = dq_gate(_df(spark, GOOD), REFERENCE_WEATHER_SUITE)
    rows = result.collect()
    assert len(rows) == 8
    assert all(r.passed for r in rows)


def test_bad_records_fail_with_expected_violations(spark):
    with pytest.raises(DQValidationError) as exc:
        dq_gate(_df(spark, BAD), REFERENCE_WEATHER_SUITE)
    failed = {f["expectation"] for f in exc.value.failures}
    assert failed == {
        "not_null_time",
        "between_temperature_2m_-90.0_60.0",
        "between_precipitation_0.0_1000.0",
    }


def test_null_measure_passes_bounds_check(spark):
    """GE parity: a null temperature passes `between` (only time/city/lat/
    lon/tz are not_null) — ge/validate_raw_weather.py:143-168."""
    result = dq_gate(_df(spark, GOOD + EDGE), REFERENCE_WEATHER_SUITE)
    assert all(r.passed for r in result.collect())


def test_mostly_threshold(spark):
    """mostly=0.5 tolerates up to half the rows violating."""
    suite = [Expectation("between", "temperature_2m", lo=-90.0, hi=60.0, mostly=0.5)]
    rows = GOOD + [("X", "s3://x", 0.0, 0.0, "UTC", "t", 999.0, 0.0, 0.0)]
    result = compile_expectations(_df(spark, rows), suite).collect()
    assert result[0].violations == 1
    assert result[0].passed  # 1/3 <= 0.5

    strict = [Expectation("between", "temperature_2m", lo=-90.0, hi=60.0, mostly=1.0)]
    with pytest.raises(DQValidationError):
        dq_gate(_df(spark, rows), strict)


def test_single_pass_compilation(spark):
    """The whole suite compiles to ONE aggregate over the data."""
    df = _df(spark, GOOD)
    result = compile_expectations(df, REFERENCE_WEATHER_SUITE)
    plan = result._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("aggregate") <= 2  # partial+final, not 8 passes


def test_unique_expectation(spark):
    rows = GOOD + [GOOD[0]]  # duplicate Warsaw row -> city duplicated
    suite = [Expectation("unique", "city")]
    result = compile_expectations(_df(spark, rows), suite).collect()[0]
    assert result.violations == 1 and not result.passed
    assert compile_expectations(_df(spark, GOOD), suite).collect()[0].passed


def test_observe_expectations_metrics_ride_the_action(spark):
    """observe() metrics equal the dedicated aggregate pass, row-split
    agrees, and unique is rejected (no distinct aggregates in observe)."""
    import pytest as _pytest

    from endtoend_etl_openmeteo_spark.operators.dq import (
        Expectation,
        compile_expectations,
        observation_results,
        observe_expectations,
        split_valid,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 999.0), (4, -5.0)],
        "id long, temp double",
    )
    suite = [
        Expectation("not_null", "temp", mostly=0.5),
        Expectation("between", "temp", lo=-90.0, hi=60.0),
    ]
    observed, obs = observe_expectations(df, suite)
    observed.write.format("noop").mode("overwrite").save()  # any action
    got = observation_results(obs, suite)
    want = [r.asDict() for r in compile_expectations(df, suite).collect()]
    for g, w in zip(got, want):
        assert g["violations"] == w["violations"]
        assert g["n_rows"] == w["n_rows"]
        assert g["passed"] == w["passed"]
    assert got[0]["passed"] is True      # 1/4 nulls <= 1 - 0.5
    assert got[1]["passed"] is False     # 999 out of bounds, strict

    valid, bad = split_valid(df, suite)
    # null temp violates not_null (row-wise) but passes bounds; -5 is in range
    assert {r.id for r in valid.collect()} == {1, 4}
    assert {r.id for r in bad.collect()} == {2, 3}

    with _pytest.raises(ValueError, match="unique"):
        observe_expectations(df, [Expectation("unique", "id")])


def test_mostly_denominator_is_nonnull_elements_like_ge(spark):
    """GE parity: unexpected_percent for value checks is over NON-NULL
    elements. 50% nulls + 20%-of-non-null violations at mostly=0.85 must
    FAIL (20% > 15%); the old total-rows denominator saw 10% and passed."""
    rows = [(None,)] * 10 + [(5.0,)] * 8 + [(99.0,)] * 2
    df = spark.createDataFrame(rows, "x double")
    res = {
        r["expectation"]: r
        for r in compile_expectations(
            df, [Expectation("between", "x", lo=0.0, hi=10.0, mostly=0.85)]
        ).collect()
    }
    r = res["between_x_0.0_10.0"]
    assert r["violations"] == 2 and r["n_rows"] == 20
    assert r["passed"] is False  # 2/10 non-null = 20% > 15%
    # and at mostly=0.8 (20% allowed) the same data passes
    res2 = compile_expectations(
        df, [Expectation("between", "x", lo=0.0, hi=10.0, mostly=0.8)]
    ).collect()[0]
    assert res2["passed"] is True
