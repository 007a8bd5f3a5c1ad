"""The r11 SQL-string literal generation (similarity._dlit/_darr and the
expr-built centroid/plane/codebook literals) must be BIT-identical to the
F.lit Column-API construction it replaced: the ANN oracles unroll the
exact same arithmetic, so one flipped ulp in a baked literal would break
hash parity. These tests pin the equivalence directly against the legacy
formulation."""

from __future__ import annotations

import struct

import pyspark.sql.functions as F
import pytest

from sec_financial_data_pipeline_using_snowflake_dbt_spark.operators import (
    similarity as SIM,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").cache()

# doubles chosen to stress the repr round-trip: negative zero, denormal
# min, near-overflow exponent, repeating binary fractions, and a value
# whose shortest repr carries 17 significant digits
HARD_DOUBLES = [
    0.0,
    -0.0,
    5e-324,
    -5e-324,
    1.7976931348623157e308,
    0.1,
    -1.0 / 3.0,
    3.141592653589793,
    (0.1 + 0.2),  # 0.30000000000000004 — 17 digits
    1e-300,
    -123456.789012345678,
]


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


def test_dlit_parses_to_identical_bits(spark):
    cols = [F.expr(SIM._dlit(x)).alias(f"e{i}") for i, x in enumerate(HARD_DOUBLES)]
    cols += [F.lit(float(x)).alias(f"l{i}") for i, x in enumerate(HARD_DOUBLES)]
    row = spark.range(1).select(*cols).collect()[0]
    for i, x in enumerate(HARD_DOUBLES):
        assert _bits(row[f"e{i}"]) == _bits(x), f"expr literal {x!r} drifted"
        assert _bits(row[f"l{i}"]) == _bits(x), f"F.lit {x!r} drifted"


def test_dlit_rejects_non_finite():
    import math

    import pytest

    for bad in (math.nan, math.inf, -math.inf):
        with pytest.raises(ValueError):
            SIM._dlit(bad)


def _legacy_centroid_struct_array(cents):
    """The pre-r11 F.lit formulation, kept verbatim as the reference."""
    return F.array(
        *[
            F.struct(
                F.lit(int(cell)).cast("int").alias("cell"),
                F.array(*[F.lit(float(x)) for x in cvec]).alias("cvec"),
            )
            for cell, cvec in cents
        ]
    )


def test_centroid_struct_array_matches_legacy_bits(spark):
    cents = [
        (1, [0.1, -0.0, 5e-324]),
        (7, [(0.1 + 0.2), -1.0 / 3.0, 1e-300]),
    ]
    row = (
        spark.range(1)
        .select(
            SIM._centroid_struct_array(cents).alias("new"),
            _legacy_centroid_struct_array(cents).alias("old"),
        )
        .collect()[0]
    )
    assert len(row["new"]) == len(row["old"]) == 2
    for s_new, s_old in zip(row["new"], row["old"]):
        assert s_new["cell"] == s_old["cell"]
        for a, b in zip(s_new["cvec"], s_old["cvec"]):
            assert _bits(a) == _bits(b)


def test_nearest_cells_same_argmin_as_legacy(spark, emb):
    """End-to-end: assignments through the expr-built centroid literal
    equal the legacy F.lit path on a real corpus (same argmin AND same
    ranked distance array)."""
    cents = [
        (i + 1, [float(v) for v in r.embedding])
        for i, r in enumerate(emb.orderBy("vec_id").limit(4).collect())
    ]
    vecs = emb.select("vec_id", F.col("embedding").alias("v"))
    new = vecs.select(
        "vec_id", SIM._nearest_cells(F.col("v"), cents).alias("nc")
    )
    scored_old = F.transform(
        _legacy_centroid_struct_array(cents),
        lambda s: F.struct(
            SIM._sqdist(F.col("v"), s.cvec).alias("dist"), s.cell.alias("cell")
        ),
    )
    old = vecs.select("vec_id", F.array_sort(scored_old).alias("nc"))
    a = {r.vec_id: r.nc for r in new.collect()}
    b = {r.vec_id: r.nc for r in old.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert [(s.cell, _bits(s.dist)) for s in a[k]] == [
            (s.cell, _bits(s.dist)) for s in b[k]
        ]


def test_lsh_bucket_matches_legacy_bits(spark, emb):
    new = SIM.lsh_bucket(
        emb.select("vec_id", F.col("embedding").alias("cv")), "cv", 64, 6
    )
    out = emb
    bucket = F.lit(0).cast("long")
    for p in range(6):
        plane = F.array(*[F.lit(x) for x in SIM._hyperplane(64, p)])
        sign = (SIM.V.dot(F.col("embedding"), plane) > 0).cast("long")
        bucket = bucket + F.shiftleft(sign, p)
    old = out.withColumn("bucket", bucket)
    a = {r.vec_id: r.bucket for r in new.collect()}
    b = {r.vec_id: r.bucket for r in old.select("vec_id", "bucket").collect()}
    assert a == b
