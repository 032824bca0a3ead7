"""Source-layer tests: text dir / KV lines / csv / json loaders."""

from __future__ import annotations

import json

from mapreduce_spark.sources.readers import (
    read_csv,
    read_json,
    read_kv_lines,
    read_text_dir,
)
from mapreduce_spark.sources.tables import TABLE_NAMES, load_table


def test_read_text_dir_one_row_per_line(spark, tmp_path):
    (tmp_path / "a.txt").write_text("l1\nl2\n")
    (tmp_path / "b.txt").write_text("l3\n")
    df = read_text_dir(spark, str(tmp_path))
    assert sorted(r["value"] for r in df.collect()) == ["l1", "l2", "l3"]
    withf = read_text_dir(spark, str(tmp_path), with_file=True)
    assert set(withf.columns) == {"value", "input_file"}
    files = {r["input_file"].rsplit("/", 1)[-1] for r in withf.collect()}
    assert files == {"a.txt", "b.txt"}


def test_read_kv_lines_first_tab_and_empty_key(spark, tmp_path):
    # the reference's KV model: key = before FIRST tab, may be empty
    # (/root/reference/mapreduce/worker/__main__.py:105)
    (tmp_path / "kv.txt").write_text("k\tv1\tv2\n\tonly-value\nplain\n")
    rows = {
        (r["key"], r["val"]) for r in read_kv_lines(spark, str(tmp_path)).collect()
    }
    assert ("k", "v1\tv2") in rows  # split at FIRST tab only
    assert ("", "only-value") in rows  # empty-string key is valid
    assert ("plain", "") in rows  # no tab → whole line is the key


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, str(p), schema="id INT, name STRING")
    assert df.schema.simpleString() == "struct<id:int,name:string>"
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (1, "alpha"),
        (2, "beta"),
    ]


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text("\n".join(json.dumps({"id": i, "v": i * 1.5}) for i in range(3)))
    df = read_json(spark, str(p), schema="id LONG, v DOUBLE")
    assert df.count() == 3


def test_load_table_all_tables(spark, sf_dir):
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        assert df.count() > 0, name


def test_events_ts_is_ntz(spark, sf_dir):
    # TIMESTAMP(NANOS) parquet must surface as timestamp_ntz, not bigint
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
