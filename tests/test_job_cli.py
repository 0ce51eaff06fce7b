"""Job-surface smoke tests for the describe/produce subcommands
(reference CLI verbs, main.rs:8-22, at table scale)."""

import argparse
import json
import os

from drivel_spark.fixtures import ClipFixtureSpec, build_clips


def test_describe_and_produce_roundtrip(spark, tmp_path):
    from drivel_spark.job import cmd_describe, cmd_produce

    data = str(tmp_path / "clips")
    build_clips(spark, 300, 4, ClipFixtureSpec(with_audio=False)).write.parquet(data)

    out = cmd_describe(
        argparse.Namespace(data=data, columns="clip_id,sr_hz,codec", json_schema=False, extended=False)
    )
    assert out["n_rows"] == 300
    assert out["columns"] == ["clip_id", "sr_hz", "codec"]

    produced = str(tmp_path / "gen")
    out2 = cmd_produce(
        argparse.Namespace(data=data, schema=None, n_rows=200, seed=7, out=produced)
    )
    assert out2["n_rows"] == 200
    gen = spark.read.parquet(produced)
    assert {"clip_id", "sr_hz", "dur_ms", "codec", "transcript"} <= set(gen.columns)
    # generated values respect the inferred bounds
    row = gen.selectExpr("min(sr_hz) lo", "max(sr_hz) hi").collect()[0]
    src = spark.read.parquet(data).selectExpr("min(sr_hz) lo", "max(sr_hz) hi").collect()[0]
    assert row["lo"] >= src["lo"] and row["hi"] <= src["hi"]


def test_produce_from_json_schema(spark, tmp_path):
    from drivel_spark.job import cmd_produce

    doc = {
        "type": "object",
        "properties": {
            "id": {"type": "string", "format": "uuid"},
            "level": {"type": "string", "enum": ["a", "b", "c"]},
            "score": {"type": "integer", "minimum": 1, "maximum": 9},
        },
        "required": ["id", "level", "score"],
    }
    schema_path = tmp_path / "schema.json"
    schema_path.write_text(json.dumps(doc))
    produced = str(tmp_path / "gen2")
    out = cmd_produce(
        argparse.Namespace(data=None, schema=str(schema_path), n_rows=150, seed=3, out=produced)
    )
    assert out["n_rows"] == 150
    pdf = spark.read.parquet(produced).toPandas()
    assert set(pdf["level"].dropna().unique()) <= {"a", "b", "c"}
    assert pdf["score"].dropna().between(1, 9).all()
