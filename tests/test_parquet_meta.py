"""Parquet footer parse: spec framing, DuckDB cross-validation, errors."""

import duckdb
import pytest

from opentelemetry_collector_components_spark.sources.parquet_meta import (
    parquet_footer_columns,
    parse_footer,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def test_parse_matches_duckdb():
    meta = parse_footer(open(EVENTS, "rb").read())
    want = duckdb.sql(
        f"""select path_in_schema, num_values, total_compressed_size,
            total_uncompressed_size, compression, row_group_num_rows
            from parquet_metadata('{EVENTS}')"""
    ).df()
    got = {c["path_in_schema"]: c for c in meta["columns"]}
    assert len(got) == len(want)
    for r in want.itertuples():
        g = got[r.path_in_schema]
        assert g["num_values"] == r.num_values
        assert g["total_compressed_size"] == r.total_compressed_size
        assert g["total_uncompressed_size"] == r.total_uncompressed_size
        assert g["codec"] == r.compression
        assert g["rg_num_rows"] == r.row_group_num_rows
    assert meta["num_rows"] == int(want["num_values"].iloc[0])


def test_framing_errors():
    data = open(EVENTS, "rb").read()
    with pytest.raises(ValueError, match="PAR1"):
        parse_footer(data[:-4] + b"XXXX")
    with pytest.raises(ValueError):
        parse_footer(b"PAR1\x00\x00\x00\x00PAR1")  # footer length 0 ok? start<4
    bad_len = data[:-8] + b"\xff\xff\xff\x7f" + data[-4:]
    with pytest.raises(ValueError, match="length"):
        parse_footer(bad_len)


def test_spark_distributed_scan(spark):
    out = parquet_footer_columns(
        spark, ["/root/testdata/sf0.001/events.parquet",
                "/root/testdata/sf0.001/documents.parquet"]
    ).toPandas()
    assert set(out["file_name"]) == {"events.parquet", "documents.parquet"}
    assert out["valid"].all()
    ev = out[out["file_name"] == "events.parquet"]
    assert set(ev["path_in_schema"]) == {
        "event_id", "ts", "user_id", "event_type", "value", "props"
    }


# --- row-group Statistics zone maps ----------------------------------------
def test_rowgroup_zone_maps_real_stats(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_components_spark.sources.parquet_meta import (
        rowgroup_zone_maps,
        stat_int64,
    )

    t = pa.table({"v": pa.array(list(range(100)), type=pa.int64())})
    pq.write_table(t, f"{tmp_path}/f.parquet", row_group_size=30)
    got = {r.file_id: r for r in rowgroup_zone_maps(
        spark, str(tmp_path), "v"
    ).collect()}
    assert len(got) == 4  # 30+30+30+10
    assert (got[0].v_min, got[0].v_max, got[0].n_rows) == (0, 29, 30)
    assert (got[3].v_min, got[3].v_max, got[3].n_rows) == (90, 99, 10)
    import pytest as _pt
    with _pt.raises(ValueError, match="8 bytes"):
        stat_int64(b"\x01\x02")
    assert stat_int64(None) is None
    assert stat_int64((-5).to_bytes(8, "little", signed=True)) == -5


def test_absent_statistics_mean_must_read(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opentelemetry_collector_components_spark.operators.skipping import (
        prune_scan,
    )
    from opentelemetry_collector_components_spark.sources.parquet_meta import (
        rowgroup_zone_maps,
    )

    t = pa.table({"v": pa.array([5, 6, 7], type=pa.int64())})
    pq.write_table(t, f"{tmp_path}/nostats.parquet", write_statistics=False)
    m = rowgroup_zone_maps(spark, str(tmp_path), "v")
    # absent stats must never read as "all NULL / skippable"
    r = prune_scan(m, [("v", 1000, 2000)]).collect()[0]
    assert r.must_read is True
