

# --- Gopher rules -----------------------------------------------------------
def test_gopher_rules_polarity(spark):
    import pyspark.sql.functions as F

    from opentelemetry_collector_components_spark.functions.textstats import (
        gopher_rules,
    )

    good = "the cat sat on a mat and looked out of the window to see " * 5
    bullety = "the a and of to intro\n" + "\n".join(f"- item {i}" for i in range(20))
    symboly = "the a and of to " + "# " * 40
    short = "the a of"
    df = spark.createDataFrame(
        [(1, good), (2, bullety), (3, symboly), (4, short)], "id int, t string"
    )
    rules = gopher_rules(F.col("t"))
    got = {r.id: r for r in df.select("id", *[c.alias(n) for n, c in rules.items()]).collect()}
    assert got[1].gopher_pass
    assert not got[2].r_bullet_lines and not got[2].gopher_pass
    assert not got[3].r_symbol_ratio
    assert not got[4].r_word_count and got[4].r_stopwords
