"""Streaming (windowed aggs, incremental index ingest) and multimodal
plumbing tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from hnsw_spark.operators.multimodal import (
    FEATURE_DIM,
    frame_sample,
    image_features,
    resize_bilinear,
    synthetic_media,
)

pytestmark = pytest.mark.slow  # heavy parity/property module (see pytest.ini)
from hnsw_spark.streaming.ingest import (
    StreamingVectorIngest,
    stream_events,
    stream_interval_join,
    windowed_event_counts,
)


@pytest.fixture()
def event_files(spark, tmp_path):
    """Three parquet files (µs timestamps) acting as micro-batch arrivals."""
    src = str(tmp_path / "events_src")
    rows = [
        (i, f"2024-01-01 0{i % 3}:15:00", i % 5, "click" if i % 2 else "view", float(i), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    df.coalesce(3).write.mode("overwrite").parquet(src)
    return src


def test_windowed_stream_counts(spark, event_files):
    stream = stream_events(spark, event_files)
    assert stream.isStreaming
    agg = windowed_event_counts(stream, window="1 hour", watermark="4 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select * from win_counts").collect()
    finally:
        q.stop()
    assert sum(r.n for r in out) == 30
    assert all(r.win_end > r.win_start for r in out)
    by_type = {}
    for r in out:
        by_type[r.event_type] = by_type.get(r.event_type, 0) + r.n
    assert by_type == {"click": 15, "view": 15}


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics: a row arriving for a window already finalized by
    the watermark is DROPPED — the bounded-state guarantee that makes the
    streaming rollup safe at scale.  Arrival order is controlled by copying
    one parquet file per micro-batch into the watched dir."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "late_src"
    src.mkdir()

    def land(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.timestamp("us")),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        pq.write_table(table, src / name)

    stream = stream_events(spark, str(src))
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_test")
        .start()
    )
    try:
        # batch 1: two on-time rows in the [00:00, 01:00) window
        land("a.parquet", [(0, "2024-01-01 00:10:00", 1, "click", 1.0, "{}"),
                           (1, "2024-01-01 00:20:00", 1, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 2: hour-10 row advances the watermark to 08:00
        land("b.parquet", [(2, "2024-01-01 10:00:00", 1, "click", 1.0, "{}")])
        q.processAllAvailable()
        # batch 3: a LATE row for the long-closed [00:00, 01:00) window
        land("c.parquet", [(3, "2024-01-01 00:30:00", 1, "click", 9.0, "{}")])
        q.processAllAvailable()
        out = {
            (r.win_start.isoformat(), r.event_type): r
            for r in spark.sql("select * from late_test").collect()
        }
    finally:
        q.stop()
    early = out[("2024-01-01T00:00:00", "click")]
    assert early.n == 2  # the late event_id=3 row was dropped, not merged
    assert early.total_value == 2.0


def test_stream_interval_join_bounds_matches(spark, tmp_path):
    """Stream-stream interval join: a click pairs with the same user's views
    from the past hour only — outside-window and other-user views are
    excluded; both sides are watermarked so state is bounded."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    def land(dirname, name, cols, rows):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        pdf = pd.DataFrame(rows, columns=list(cols))
        fields = []
        for c in cols:
            if c.endswith("ts"):
                pdf[c] = pd.to_datetime(pdf[c])
                fields.append((c, pa.timestamp("us")))  # Spark can't read ns
            else:
                fields.append((c, pa.int64()))
        table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
            pa.schema(fields)
        )
        pq.write_table(table, d / name)

    clicks_schema = "click_id long, ts timestamp, user_id long"
    views_schema = "view_id long, r_ts timestamp, r_user_id long"
    land("clicks", "a.parquet", ["click_id", "ts", "user_id"],
         [(1, "2024-01-01 10:00:00", 7)])
    land("views", "a.parquet", ["view_id", "r_ts", "r_user_id"],
         [(100, "2024-01-01 09:30:00", 7),   # in window
          (101, "2024-01-01 08:30:00", 7),   # too old
          (102, "2024-01-01 10:30:00", 7),   # after the click
          (103, "2024-01-01 09:45:00", 8)])  # other user
    clicks = (spark.readStream.format("parquet").schema(clicks_schema)
              .load(str(tmp_path / "clicks")))
    views = (spark.readStream.format("parquet").schema(views_schema)
             .load(str(tmp_path / "views")))
    joined = stream_interval_join(clicks, views, max_delay="1 hour")
    q = (joined.writeStream.outputMode("append").format("memory")
         .queryName("sjoin").start())
    try:
        q.processAllAvailable()
        out = spark.sql("select click_id, view_id from sjoin").collect()
    finally:
        q.stop()
    assert {(r.click_id, r.view_id) for r in out} == {(1, 100)}


def test_streaming_vector_ingest_appends_and_flags_rebuild(spark, tmp_path):
    from hnsw_spark.sources.synthetic import synthetic_vectors

    centroids = np.array([[1.0] + [0.0] * 7, [0.0] * 7 + [1.0]])
    ingest = StreamingVectorIngest(centroids, str(tmp_path / "nodes"))
    batch1 = synthetic_vectors(spark, 50, 8, seed=1)
    batch2 = synthetic_vectors(spark, 30, 8, seed=2).withColumn(
        "vec_id", F.col("vec_id") + 1000
    )
    ingest.process_batch(batch1, 0)
    ingest.process_batch(batch2, 1)
    nodes = spark.read.parquet(str(tmp_path / "nodes"))
    assert nodes.count() == 80
    assert set(nodes.columns) == {"list_id", "id", "vector", "epoch_id"}
    assert nodes.select("list_id").distinct().count() <= 2
    assert ingest.appended == 80
    # exactly-once: replaying an epoch (foreachBatch retry after failure)
    # overwrites its own partition instead of double-appending
    ingest.process_batch(batch2, 1)
    assert spark.read.parquet(str(tmp_path / "nodes")).count() == 80


def test_image_features_shape_and_determinism(spark):
    media = synthetic_media(spark, count=10)
    feats = image_features(media).orderBy("media_id").collect()
    assert len(feats) == 10
    assert all(len(r.embedding) == FEATURE_DIM for r in feats)
    norms = [float(np.linalg.norm(r.embedding)) for r in feats]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    again = image_features(media).orderBy("media_id").collect()
    assert [r.embedding for r in again] == [r.embedding for r in feats]


def test_image_features_feed_knn(spark):
    from hnsw_spark.operators.knn import knn_exact

    media = synthetic_media(spark, count=12)
    emb = image_features(media).select(
        F.col("media_id").alias("vec_id"), "embedding"
    )
    res = knn_exact(emb, emb.filter(F.col("vec_id") == 0), k=3)
    rows = res.orderBy(F.desc("score")).collect()
    assert rows[0].id == 0 and rows[0].score == pytest.approx(1.0)


def test_resize_bilinear_identity_and_downscale(spark):
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    same = resize_bilinear(img, 4, 4)
    np.testing.assert_allclose(same, img.astype(float))
    small = resize_bilinear(img, 2, 2)
    assert small.shape == (2, 2, 3)


def test_frame_sample(spark):
    media = synthetic_media(spark, count=3, kind="video")
    frames = frame_sample(media, every_n=25).collect()
    # n_frames=100 → frames 0,25,50,75 per video
    assert len(frames) == 12
    assert {f.frame_idx for f in frames} == {0, 25, 50, 75}


def test_stream_window_agg_matches_batch(spark, event_files):
    # the streaming windowed agg must produce exactly the batch groupBy's
    # result on the same files — window boundaries, counts, and sums.
    stream = stream_events(spark, event_files)
    agg = windowed_event_counts(stream, window="1 hour", watermark="4 hours")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_parity")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.win_start, r.win_end, r.event_type, r.n, round(r.total_value, 9))
            for r in spark.sql("select * from win_parity").collect()
        }
    finally:
        q.stop()
    batch = (
        spark.read.parquet(event_files)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select("win.start", "win.end", "event_type", "n", "total_value")
    )
    want = {
        (r.start, r.end, r.event_type, r.n, round(r.total_value, 9))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_graph_ingest_grows_searchable_index(spark, tmp_path):
    # end-to-end B2: build a base HNSW index, stream two vector files in,
    # and the persisted index must contain every id and find a streamed one.
    import numpy as np

    from hnsw_spark.operators.hnsw_graph import build_hnsw_index
    from hnsw_spark.plans.persistence import load_index, save_index
    from hnsw_spark.sources.fvecs import stream_fvecs, write_fvecs
    from hnsw_spark.streaming.ingest import StreamingGraphIngest
    from hnsw_spark.sources.synthetic import synthetic_vectors

    base = synthetic_vectors(spark, 200, 8, seed=13)
    index_path = str(tmp_path / "hnsw_idx")
    save_index(build_hnsw_index(base, n_lists=2, m=8, ef_construction=32), index_path)

    src = tmp_path / "vec_stream"
    src.mkdir()
    rng = np.random.default_rng(4)
    for i in range(2):
        write_fvecs(str(src / f"b{i}.fvecs"), rng.normal(size=(10, 8)))
    stream = (
        stream_fvecs(spark, str(src))
        .selectExpr("vec_id + 1000 + 100 * cast(regexp_extract(path, 'b([0-9])', 1) as long) as vec_id",
                    "embedding")
    )
    ingest = StreamingGraphIngest(index_path)
    q = ingest.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    final = load_index(spark, index_path)
    assert final.index_df.count() == 220
    probe_vec = final.index_df.filter(F.col("id") == 1105).select("vector").first()[0]
    qdf = spark.createDataFrame([(1105, list(probe_vec))], "vec_id long, embedding array<float>")
    got = final.search(qdf, k=3, n_probe=2, ef_search=32,
                       dispatch="beam").toPandas()
    assert got.iloc[0]["id"] == 1105


def test_scene_cuts_land_on_planted_boundaries(spark):
    """The fake decoder changes scene every 40 frames; sampling every 10th
    frame, the detector must flag exactly frames 40 and 80 per video — and
    nothing within a scene (jitter stays under the threshold)."""
    from hnsw_spark.operators.multimodal import frame_features, scene_cuts

    media = synthetic_media(spark, count=4, kind="video")
    feats = frame_features(media, every_n=10)
    cuts = scene_cuts(feats, threshold=0.05).collect()
    by_media = {}
    for r in cuts:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    assert by_media == {m: [40, 80] for m in range(4)}
    assert all(r.dist > 0.05 for r in cuts)


def test_audio_features_shape_determinism_and_feed_knn(spark):
    from hnsw_spark.operators.knn import knn_exact
    from hnsw_spark.operators.multimodal import (
        FEATURE_DIM,
        audio_features,
        synthetic_media,
    )

    media = synthetic_media(spark, count=12, kind="audio")
    feats = audio_features(media)
    a = feats.orderBy("media_id").collect()
    b = audio_features(media).orderBy("media_id").collect()
    assert len(a) == 12
    assert all(len(r.embedding) == FEATURE_DIM for r in a)
    # deterministic fake decode → identical features across runs
    assert [list(r.embedding) for r in a] == [list(r.embedding) for r in b]
    # unit-normalized, and usable directly as an ANN corpus
    import numpy as np

    assert all(abs(np.linalg.norm(r.embedding) - 1.0) < 1e-5 for r in a)
    qs = feats.filter(F.col("media_id") < 2)
    top = knn_exact(
        feats, qs, k=3, metric="cosine", base_id="media_id", query_id="media_id"
    ).toPandas()
    # self-similarity ranks first per query
    first = top.sort_values(["query_id", "score"], ascending=[True, False]).groupby("query_id").first()
    assert (first["id"] == first.index).all()


def test_stream_interval_join_custom_right_key(spark):
    """The right-side key name is a real parameter (ADVICE r2): a right
    frame keyed by anything other than r_<by> must analyze and join.  Batch
    frames execute the same join condition the streaming plan uses."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    clicks = spark.createDataFrame(
        [(1, t0, 7)], "click_id long, ts timestamp, user_id long"
    )
    views = spark.createDataFrame(
        [
            (100, t0 - dt.timedelta(minutes=30), 7),  # in window
            (101, t0 - dt.timedelta(minutes=90), 7),  # too old
            (102, t0 - dt.timedelta(minutes=30), 8),  # other user
        ],
        "view_id long, vts timestamp, vuser long",
    )
    out = stream_interval_join(
        clicks, views, right_ts="vts", right_by="vuser", max_delay="1 hour"
    )
    assert {(r.click_id, r.view_id) for r in out.collect()} == {(1, 100)}


def test_streaming_corpus_dedup_cross_batch_and_replay(spark, tmp_path):
    """Survivors accumulate across epochs; a replayed epoch is idempotent
    (its own fingerprints must not shadow its survivors)."""
    from hnsw_spark.streaming.dedup import StreamingCorpusDedup

    ing = StreamingCorpusDedup(
        str(tmp_path / "corpus"), str(tmp_path / "seen")
    )
    b1 = spark.createDataFrame(
        [(0, "alpha doc"), (1, "alpha doc"), (2, "beta doc")],
        "doc_id bigint, text string",
    )
    ing.process_batch(b1, 0)
    b2 = spark.createDataFrame(
        [(10, "ALPHA   DOC"), (11, "gamma doc"), (12, "gamma doc")],
        "doc_id bigint, text string",
    )
    ing.process_batch(b2, 1)
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    assert sorted(r.doc_id for r in corpus.collect()) == [0, 2, 11]
    # replay epoch 1 (simulated failure retry): same final state
    ing.process_batch(b2, 1)
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    assert sorted(r.doc_id for r in corpus.collect()) == [0, 2, 11]
    seen = spark.read.parquet(str(tmp_path / "seen"))
    assert seen.count() == 3  # one fingerprint per surviving doc


def test_streaming_corpus_dedup_end_to_end_stream(spark, tmp_path):
    """Drive it through a real readStream → foreachBatch query."""
    from hnsw_spark.streaming.dedup import StreamingCorpusDedup

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(0, "doc one"), (1, "doc one"), (2, "doc two")],
        "doc_id bigint, text string",
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    ing = StreamingCorpusDedup(
        str(tmp_path / "corpus"), str(tmp_path / "seen")
    )
    q = ing.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    assert sorted(r.doc_id for r in corpus.collect()) == [0, 2]


def test_dedup_events_within_watermark(spark, tmp_path):
    """Duplicate deliveries of the same event_id inside the watermark
    horizon are dropped; distinct ids pass."""
    import datetime as dt

    from hnsw_spark.streaming.ingest import (
        EVENTS_STREAM_SCHEMA,
        dedup_events_within_watermark,
        stream_events,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (1, t0, 1, "click", 1.0, "{}"),           # duplicate delivery
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 2.0, "{}"),
        (1, t0 + dt.timedelta(minutes=2), 1, "click", 1.0, "{}"),  # replay
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, EVENTS_STREAM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    stream = stream_events(spark, src, max_files_per_trigger=10)
    q = (
        dedup_events_within_watermark(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("deduped_events")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("select event_id from deduped_events").collect()
    finally:
        q.stop()
    assert sorted(r.event_id for r in out) == [1, 2]


def test_streaming_search_answers_query_stream(spark, tmp_path):
    """A query stream answered against a cached IVF index: per-epoch
    results land exactly once and match the batch search tier."""
    import pyspark.sql.functions as F

    from hnsw_spark.operators.ann import build_ivf_index
    from hnsw_spark.sources.synthetic import synthetic_vectors
    from hnsw_spark.streaming.search import StreamingSearch

    base = synthetic_vectors(spark, 300, 16, seed=7)
    idx = build_ivf_index(base, n_lists=4, metric="cosine")
    idx.index_df = idx.index_df.cache()
    idx.index_df.count()

    qsrc = str(tmp_path / "queries")
    queries = base.filter(F.col("vec_id") < 6)
    queries.coalesce(1).write.mode("overwrite").parquet(qsrc)
    stream = spark.readStream.schema(queries.schema).parquet(qsrc)
    srv = StreamingSearch(
        idx, str(tmp_path / "results"), k=5, n_probe=4
    )
    q = srv.start(stream, str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "results"))
    assert srv.answered == 6
    assert got.select("query_id").distinct().count() == 6
    # full-probe streaming results == the batch tier's results exactly
    batch_res = {
        (r.query_id, r.id)
        for r in idx.search(queries, k=5, n_probe=4).collect()
    }
    assert {(r.query_id, r.id) for r in got.collect()} == batch_res
    # every query's best hit is itself (it is in the corpus)
    from pyspark.sql import Window

    top1 = (
        got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("score"), "id")
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    assert all(r.query_id == r.id for r in top1)
    idx.index_df.unpersist()
