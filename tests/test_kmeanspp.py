"""k-means|| seeding: cluster recovery on planted blobs, determinism
across partitioning, zero-weight duplicate handling, saturation break,
validation."""

from __future__ import annotations

import pytest

from opentelemetry_collector_components_spark.operators.kmeanspp import (
    kmeans_parallel_seeds,
)


def _blobs(spark, per=60, d=8):
    # 4 well-separated blobs on coordinate axes, deterministic jitter
    rows = []
    for b in range(4):
        for i in range(per):
            vec = [0.0] * d
            vec[b * 2] = 10.0
            vec[(b * 2 + 1) % d] = 5.0
            vec[i % d] += ((i * 13) % 7 - 3) / 10.0
            rows.append((b * per + i, vec))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covers_all_blobs_and_weights_total(spark):
    df = _blobs(spark)
    out = kmeans_parallel_seeds(df, l=4, rounds=3).collect()
    assert sum(r.weight for r in out) == 240
    blobs_hit = {r.cand_id // 60 for r in out}
    assert blobs_hit == {0, 1, 2, 3}  # d² sampling reaches every blob
    assert sum(1 for r in out if r.round_added == 0) == 1


def test_deterministic_across_partitioning(spark):
    df = _blobs(spark)
    a = sorted(map(tuple, kmeans_parallel_seeds(df.repartition(1), l=3, rounds=2).collect()))
    b = sorted(map(tuple, kmeans_parallel_seeds(df.repartition(13), l=3, rounds=2).collect()))
    assert a == b


def test_duplicate_vector_zero_weight(spark):
    # two identical points: if both become candidates, the higher id
    # weighs 0 (ties go to the lowest id); total weight is preserved
    df = _blobs(spark, per=30)
    out = kmeans_parallel_seeds(df, l=6, rounds=3).collect()
    assert sum(r.weight for r in out) == 120
    assert all(r.weight >= 0 for r in out)


def test_saturation_break(spark):
    # 2 points, l=8: the non-center point has d2 == phi, so l*d2*2^60 >
    # coin*phi is CERTAIN (the old divided threshold overflowed BIGINT
    # here and silently never picked it) -> both become centers, phi hits
    # 0, rounds stop early
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = kmeans_parallel_seeds(df, l=8, rounds=5)
    assert out.count() == 2
    assert sum(r.weight for r in out.collect()) == 2


def test_validation(spark):
    df = _blobs(spark, per=2)
    with pytest.raises(ValueError, match="must be >= 1"):
        kmeans_parallel_seeds(df, l=0)
    with pytest.raises(ValueError, match="empty"):
        kmeans_parallel_seeds(df.where("vec_id < 0"))
