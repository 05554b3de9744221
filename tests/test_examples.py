"""Smoke tests for the example apps (VERDICT r3 item 6): the showcase
entrypoints are the only Python pytest never imported — keep them from
rotting by actually running the corpus pipeline end-to-end at sf0.001
and the twitter job's four-query fan-out over a file replay."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import types as T


def test_corpus_prep_app_end_to_end(spark, sf_dir):
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from corpus_prep_app import run

    out = tempfile.mkdtemp(prefix="corpus_smoke_")
    try:
        cap_k = 10
        run(spark, sf_dir, out, cap_k=cap_k, show=False)

        corpus = spark.read.parquet(f"{out}/corpus")
        profile = spark.read.parquet(f"{out}/profile")
        rows = profile.collect()
        assert len(rows) > 0
        assert corpus.count() > 0
        # the stage-3 cap-loss ledger ships as a run artifact (VERDICT r9
        # item 5): readable, right shape, and empty here — the default
        # cap never binds at sf0.001 occupancies, so any row would mean
        # silently lost pairs
        ledger = spark.read.parquet(f"{out}/metrics/dedup_cap_loss")
        assert set(ledger.columns) == {"band", "sig", "occupancy", "tier"}
        assert ledger.count() == 0
        # the profile is the corpus's own aggregate
        assert sum(r.n_docs for r in rows) == corpus.count()
        assert {r.split for r in rows} <= {"train", "val", "test"}
        # the per-domain quota cap held: ≤ cap_k docs per source overall
        per_source: dict[str, int] = {}
        for r in rows:
            per_source[r.source] = per_source.get(r.source, 0) + r.n_docs
        assert all(n <= cap_k for n in per_source.values()), per_source
        # rerun determinism: every decision is content/id-derived, so a
        # second run reproduces the corpus row-for-row
        out2 = tempfile.mkdtemp(prefix="corpus_smoke2_")
        try:
            run(spark, sf_dir, out2, cap_k=cap_k, show=False)
            again = spark.read.parquet(f"{out2}/corpus")
            assert corpus.exceptAll(again).count() == 0
            assert again.exceptAll(corpus).count() == 0
        finally:
            shutil.rmtree(out2, ignore_errors=True)
        # --char-tier (round 11): the multilingual evidence unions into
        # the dup graph, so the curated corpus can only shrink (more dup
        # evidence merges more clusters, never splits one), and the
        # ledger gains the tier label with the cap still inert
        out3 = tempfile.mkdtemp(prefix="corpus_smoke3_")
        try:
            run(spark, sf_dir, out3, cap_k=cap_k, char_tier=True, show=False)
            char_corpus = spark.read.parquet(f"{out3}/corpus")
            assert 0 < char_corpus.count() <= corpus.count()
            ledger3 = spark.read.parquet(f"{out3}/metrics/dedup_cap_loss")
            assert set(ledger3.columns) == {"band", "sig", "occupancy", "tier"}
            assert ledger3.count() == 0
        finally:
            shutil.rmtree(out3, ignore_errors=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_twitter_stream_app_fans_out_four_pipelines(spark):
    """The production entrypoint's exact wiring — four concurrent
    streaming queries with foreachBatch point-mapper sinks off one tweet
    lineage — drained over a two-file replay standing in for Kafka
    (same parse→pipeline path; the broker itself can't exist here). All
    four reference measurements must receive points, and the points
    must render as InfluxDB line protocol."""
    import sys

    sys.path.insert(0, "/root/repo/examples")
    from twitter_stream_app import build_queries

    from flink_streaming_twitter_spark.streaming.sinks import (
        influx_line,
        to_influx_points,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (base + dt.timedelta(seconds=s), txt, lang)
        for s, txt, lang in [
            (0, "hello #spark world", "en"),
            (1, "#spark again", "en"),
            (2, "more #flink", "de"),
            (6, "#spark three", "en"),
            (7, "#flink two", "de"),
            (11, "#spark four", "en"),
        ]
    ]
    # far-future flush so the append-mode Q-A finalizes its windows
    flush = [(base + dt.timedelta(seconds=2000), "#done", "en")]

    d = tempfile.mkdtemp(prefix="tweets_replay_")
    ckpt = tempfile.mkdtemp(prefix="tweets_ckpt_")
    try:
        # stamp strictly increasing mtimes so the file source admits the
        # data file before the flush file even on coarse-mtime
        # filesystems (flush first would watermark-drop every data row)
        import glob
        import os
        import time as _time

        stamped: set[str] = set()
        t0 = _time.time()
        for i, batch in enumerate((rows, flush)):
            mode = "overwrite" if i == 0 else "append"
            spark.createDataFrame(batch, schema).coalesce(1).write.mode(mode).parquet(d)
            for f in glob.glob(os.path.join(d, "*.parquet")):
                if f not in stamped:
                    os.utime(f, (t0 + i * 10, t0 + i * 10))
                    stamped.add(f)

        collected: dict[str, list] = {}

        def collecting_sink(measurement, ts_col, tags, fields):
            def on_batch(batch_df, batch_id):
                pts = to_influx_points(batch_df, measurement, ts_col, tags, fields)
                collected.setdefault(measurement, []).extend(pts.collect())

            return on_batch

        tweets = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
        )
        queries = build_queries(tweets, collecting_sink, ckpt, available_now=True)
        assert len(queries) == 4
        for q in queries:
            assert q.awaitTermination(180), f"{q.name} did not drain"

        expected_measurements = {
            "TrendingHashTagFlink2",
            "TrendingHashTagFlink1",
            "TotalTweetCountFlink",
            "TweetPerSecondCountFlink",
        }
        got = {m for m, pts in collected.items() if pts}
        assert got == expected_measurements, collected.keys()
        # Q-B's trigger-cadence top-1: the hot tag (hashtags() keeps the
        # '#' sigil, Main.java:189 semantics) wins some firing
        assert any(
            p.tags["hashtag"] == "#spark" for p in collected["TrendingHashTagFlink1"]
        )
        # running total converges to every tweet seen; the count field
        # arrives as a native int (typed struct), not a string
        totals = [p.fields["count"] for p in collected["TotalTweetCountFlink"]]
        assert all(isinstance(t, int) for t in totals)
        assert max(totals) == len(rows) + len(flush)
        p = collected["TweetPerSecondCountFlink"][0]
        line = influx_line(p.measurement, p.tags, p.fields, 0)
        assert line.startswith("TweetPerSecondCountFlink")
        # typed line protocol: integer fields carry the `i` suffix, the
        # rendering influxdb-java gives the reference's Long fields
        assert f'count={p.fields["count"]}i' in line
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
