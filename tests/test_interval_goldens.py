"""Goldens for the A8/A9 interval aggregations, mirroring the reference's own
unit tests case for case (/root/reference/src/tests/test_units.py:
test_aggregate_purity_no_conflict, test_aggregate_purity_conflict,
test_aggregate_size, test_aggregate_prices, test_aggregate_energy_efficiency,
test_aggregate_production_capacity) — same inputs, same expected
key/min/max tuples, including the reference's str(float) formatting
("400000000.0", not "4.0E8")."""

import pytest
import pyspark.sql.types as T
from pyspark.sql import functions as F

from deduplication_challenge_spark.operators.product_merge import (
    _energy_agg,
    _interval_agg,
)

RATED = T.StructType([
    T.StructField("qualitative", T.BooleanType()),
    T.StructField("type", T.StringType()),
    T.StructField("unit", T.StringType()),
    T.StructField("value", T.StringType()),
])
SIZE = T.StructType([
    T.StructField("dimension", T.StringType()),
    T.StructField("qualitative", T.BooleanType()),
    T.StructField("type", T.StringType()),
    T.StructField("unit", T.StringType()),
    T.StructField("value", T.StringType()),
])
PRICE = T.StructType([
    T.StructField("amount", T.DoubleType()),
    T.StructField("currency", T.StringType()),
    T.StructField("type", T.StringType()),
])
CAPACITY = T.StructType([
    T.StructField("quantity", T.LongType()),
    T.StructField("time_frame", T.StringType()),
    T.StructField("type", T.StringType()),
    T.StructField("unit", T.StringType()),
])
ENERGY = T.StructType([
    T.StructField("exact_percentage", T.DoubleType()),
    T.StructField("max_percentage", T.DoubleType()),
    T.StructField("min_percentage", T.DoubleType()),
    T.StructField("qualitative", T.StringType()),
    T.StructField("standard_label", T.StringType()),
])


def _run_interval(spark, rows, elem_schema, keys, vcol):
    """rows: list of per-product entry lists; each product gets id = index."""
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("fld", T.ArrayType(elem_schema)),
    ])
    df = spark.createDataFrame(
        [(i + 1, entries) for i, entries in enumerate(rows)], schema
    ).withColumn("_grp", F.lit("g"))
    out = _interval_agg(df, "fld", keys, vcol, "_grp").collect()
    assert len(out) <= 1
    if not out:
        return set()
    return {tuple(e[k] for k in keys) + (e["min"], e["max"]) for e in out[0]["fld"]}


def _run_energy(spark, rows):
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("energy_efficiency", T.ArrayType(ENERGY)),
    ])
    df = spark.createDataFrame(
        [(i + 1, entries) for i, entries in enumerate(rows)], schema
    ).withColumn("_grp", F.lit("g"))
    out = _energy_agg(df, "_grp").collect()
    if not out:
        return set()
    return {
        (e["qualitative"], e["standard_label"], e["min"], e["max"])
        for e in out[0]["energy_efficiency"]
    }


def test_aggregate_purity_no_conflict(spark):
    rows = [
        [(False, "exact", None, "99.998")],
        [],
        [(False, "exact", None, "90.998"),
         (True, "exact", None, "high"),
         (False, "exact", None, "89.998")],
    ]
    assert _run_interval(spark, rows, RATED, ["qualitative", "unit"], "value") == {
        (True, None, "high", "high"),
        (False, None, "89.998", "99.998"),
    }


def test_aggregate_purity_conflict(spark):
    # literal 'high' shares a key with numerics -> literal dropped
    rows = [
        [(False, "exact", None, "99.998")],
        [],
        [(False, "exact", None, "90.998"),
         (False, "exact", None, "high"),
         (False, "exact", None, "89.998")],
    ]
    assert _run_interval(spark, rows, RATED, ["qualitative", "unit"], "value") == {
        (False, None, "89.998", "99.998"),
    }


def test_aggregate_size(spark):
    rows = [
        [("Height", False, "exact", "in", "20.7"),
         ("Width", False, "exact", "in", "16.9"),
         ("Weight", False, "exact", "lbs", "190")],
        [("Height", False, "exact", "in", "30.7"),
         ("Weight", False, "exact", "lbs", "120")],
        [("Height", False, "exact", "cm", "209")],
    ]
    assert _run_interval(spark, rows, SIZE, ["dimension", "unit"], "value") == {
        ("Weight", "lbs", "120.0", "190.0"),
        ("Height", "in", "20.7", "30.7"),
        ("Height", "cm", "209.0", "209.0"),
        ("Width", "in", "16.9", "16.9"),
    }


def test_aggregate_prices(spark):
    rows = [
        [(1796.280029296875, "AUD", "exact")],
        [(1796.280029296875, "AUD", "min"), (1975.9100341796875, "AUD", "max")],
        [],
        [(140.0, "EUR", "exact")],
        [(123.0, "EUR", "min"), (1975.9100341796875, "AUD", "max")],
    ]
    assert _run_interval(spark, rows, PRICE, ["currency"], "amount") == {
        ("EUR", "123.0", "140.0"),
        ("AUD", "1796.280029296875", "1975.9100341796875"),
    }


def test_aggregate_production_capacity(spark):
    # pins the str(float) formatting: 400000000 -> '400000000.0', not '4.0E8'
    rows = [
        [(400000000, "Year", "exact", "Units")],
        [(60000, "Month", "exact", "Units")],
        [(1000, "Day", "exact", "Kilograms")],
        [(60, "Year", "min", "Tons"), (70, "Year", "max", "Tons")],
    ]
    assert _run_interval(spark, rows, CAPACITY, ["time_frame", "unit"], "quantity") == {
        ("Month", "Units", "60000.0", "60000.0"),
        ("Day", "Kilograms", "1000.0", "1000.0"),
        ("Year", "Tons", "60.0", "70.0"),
        ("Year", "Units", "400000000.0", "400000000.0"),
    }


def test_aggregate_energy_efficiency(spark):
    rows = [
        None,
        [(None, None, None, "high", None)],
        [(40.0, None, None, None, None)],
    ]
    assert _run_energy(spark, rows) == {
        (None, None, "40.0", "40.0"),
        ("high", None, "-1.0", "-1.0"),
    }


def test_energy_all_null_entry_drags_min(spark):
    # reference combine rule: an all-null entry contributes min=-1.0 even
    # when another entry of the same key has numerics
    rows = [
        [(None, None, None, "high", "A")],
        [(55.0, None, None, "high", "A")],
    ]
    assert _run_energy(spark, rows) == {("high", "A", "-1.0", "55.0")}


def test_energy_negative_values_participate(spark):
    rows = [[(-5.0, None, None, "low", "B")]]
    assert _run_energy(spark, rows) == {("low", "B", "-5.0", "-1.0")}


def test_pystr_double_matches_python_str(spark):
    """_pystr_double must reproduce Python str(float) across the magnitude
    range product data occupies (the reference stringifies bounds with
    str(float); Java's Double.toString would diverge at >= 1e7)."""
    import numpy as np

    from deduplication_challenge_spark.operators.product_merge import _pystr_double

    rng = np.random.Generator(np.random.PCG64(99))
    vals = []
    # integers at growing magnitudes (incl. the 4.0E8-style Java trap)
    for exp in range(16):
        vals.append(float(10 ** exp))
        vals.append(float(4 * 10 ** exp))
    # round decimals, float32-noise decimals, negatives
    vals += [round(float(x), rng.integers(0, 6)) for x in rng.uniform(-1e6, 1e6, 200)]
    vals += [float(np.float32(x)) for x in rng.uniform(-1e4, 1e4, 200)]
    vals += [-1.0, 0.0, 0.5, 123.0, 1796.280029296875, 1975.9100341796875]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {r["i"]: r["s"] for r in df.select("i", _pystr_double(F.col("v")).alias("s")).collect()}
    bad = [(v, got[i], str(v)) for i, v in enumerate(vals) if got[i] != str(v)]
    assert not bad, bad[:10]


def test_pystr_double_out_of_regime_is_visible(spark):
    """Outside |v| in [1e-4, 1e16) the decimal route diverges from
    str(float) — Python itself goes scientific below 1e-4 ('5e-05' vs the
    decimal route's '0.00005'), and large values NULL (overflow) or
    truncate; the guard must fall back to the plain double->string cast so
    the value stays visible and round-trips (ADVICE r2 + review r3)."""
    from deduplication_challenge_spark.operators.product_merge import _pystr_double

    vals = [1e21, -1e21, 1e-17, -1e-17, 5e22, 1e300,
            5e-05, -5e-05, 1e-10, 1.2345678901234567e-10]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, v double")
    got = {r["i"]: r["s"] for r in df.select("i", _pystr_double(F.col("v")).alias("s")).collect()}
    for i, v in enumerate(vals):
        assert got[i] is not None, v          # never silently nulled
        assert got[i] not in ("0.0", "-0.0"), v  # never collapsed to zero
        assert float(got[i]) == v, (v, got[i])   # round-trips to the value
