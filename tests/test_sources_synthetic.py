"""The custom Python DataSource must behave like a real source:
cataloged format name, partition-parallel reads, deterministic
content, pushed row budget honored."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_capstone_project_spark.sources.synthetic import (
    _row,
    register,
)


def test_synthetic_source_reads_deterministically(spark):
    register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 200)
        .option("partitions", 4)
        .load()
    )
    assert df.count() == 200
    # partition-parallel: the plan really splits into 4 input slices
    assert df.rdd.getNumPartitions() == 4

    # content is a pure function of event_id — compare a sample row
    got = {r.event_id: (r.user_id, r.event_type, r.value) for r in df.collect()}
    for eid in (0, 7, 199):
        _, _ts, user, etype, value = _row(eid)
        assert got[eid] == (user, etype, value)

    # two independent reads agree exactly (restart/retry safety)
    again = (
        spark.read.format("synthetic_events")
        .option("rows", 200)
        .option("partitions", 2)  # different parallelism, same data
        .load()
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, df.collect()))

    # plays with the rest of the engine: plain aggregation over it
    by_type = df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    assert sum(r.n for r in by_type) == 200


def test_synthetic_source_streams_to_parity(spark, tmp_path):
    """The streaming reader must deliver exactly the batch reader's
    rows across several micro-batches, through a checkpointed sink —
    the end-to-end non-file streaming-source path the Kafka seam can't
    run in this sandbox."""
    register(spark)
    batch = (
        spark.read.format("synthetic_events").option("rows", 250).load()
    )
    expected = sorted(map(tuple, batch.collect()))

    # availableNow does a single read() on a SimpleDataSourceStreamReader,
    # so drive a continuous trigger and stop once the source is drained.
    import time

    q = (
        spark.readStream.format("synthetic_events")
        .option("rows", 250)
        .option("rows_per_batch", 60)  # -> 5 micro-batches
        .load()
        .writeStream.format("memory")
        .queryName("t_synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while (
            spark.table("t_synth_stream").count() < 250
            and time.time() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    got = sorted(map(tuple, spark.table("t_synth_stream").collect()))
    assert got == expected


def test_jsonl_roundtrip_with_schema_and_corrupt_line(spark, tmp_path):
    """read_jsonl: explicit schema means single-pass scan, NULL for
    missing fields, tolerance of extra fields; a malformed line surfaces
    in _corrupt_record instead of failing the read."""
    import json as _json

    from data_engineering_capstone_project_spark.sources.readers import (
        read_jsonl,
        write_jsonl,
    )

    src = tmp_path / "docs.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "hello world", "lang": "en"}),
        _json.dumps({"doc_id": 2, "text": "salut"}),  # missing lang -> NULL
        _json.dumps({"doc_id": 3, "text": "hi", "lang": "en", "extra": 9}),
        "{not json",  # malformed -> _corrupt_record
    ]
    src.write_text("\n".join(lines) + "\n")

    schema = "doc_id bigint, text string, lang string, _corrupt_record string"
    df = read_jsonl(spark, str(src), schema).cache()
    good = {r.doc_id: (r.text, r.lang) for r in df.filter("_corrupt_record IS NULL").collect()}
    assert good == {1: ("hello world", "en"), 2: ("salut", None), 3: ("hi", "en")}
    assert df.filter("_corrupt_record IS NOT NULL").count() == 1

    out = str(tmp_path / "out")
    write_jsonl(df.filter("_corrupt_record IS NULL").select("doc_id", "text", "lang"), out)
    back = read_jsonl(spark, out, "doc_id bigint, text string, lang string")
    assert {r.doc_id: (r.text, r.lang) for r in back.collect()} == good
    df.unpersist()
