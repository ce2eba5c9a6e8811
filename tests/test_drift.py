

def test_embedding_drift_identity_and_shift(spark):
    from opentelemetry_collector_components_spark.operators.drift import (
        embedding_drift,
    )

    rows = [(i, [0.1 * (i % 3), 0.2, -0.1]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    same = embedding_drift(df, df).collect()[0]
    assert same.n_ref == same.n_cur == 40
    assert same.centroid_cos == 1.0
    assert same.l2_shift_sq_micro2 == 0

    # shift the second slice along dim 0: cosine drops, L2 is the
    # exact squared centroid delta in micro units
    from pyspark.sql import functions as F
    shifted = df.select(
        "vec_id",
        F.expr("transform(embedding, (x, i) ->"
               " CASE WHEN i = 0 THEN x + 0.5 ELSE x END)").alias("embedding"),
    )
    out = embedding_drift(df, shifted).collect()[0]
    assert out.centroid_cos < 1.0
    assert out.l2_shift_sq_micro2 == 500_000 ** 2
