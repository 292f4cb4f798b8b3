"""Pipeline-layer tests: compression operator round-trip, checkpoint
resume, multimodal plumbing, streaming rollup vs batch."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from dtaidistance_spark.operators.checkpoint import read_manifest, run_stage
from dtaidistance_spark.operators.compress import (compress_tier,
                                                   decompress_chunks)
from dtaidistance_spark.operators.ingest import transcript_points
from dtaidistance_spark.operators.multimodal import (decode_features,
                                                     resize_images,
                                                     sample_frames,
                                                     synth_media)
from dtaidistance_spark.operators.rollup import rollup_points
from dtaidistance_spark.sources.transcripts import synth_transcripts
from dtaidistance_spark.streaming.rollup_stream import run_file_stream


@pytest.fixture(scope="module")
def agg1m(spark):
    tr = synth_transcripts(spark, n_convs=20, seed=7, max_turns=120)
    pts = transcript_points(tr)
    agg = rollup_points(pts, "1m").cache()
    agg.count()
    return agg


class TestCompressOperator:
    def test_roundtrip_exact(self, spark, agg1m):
        chunks = compress_tier(agg1m, value_col="sum")
        back = decompress_chunks(chunks)
        a = agg1m.select("series_id", "bucket_ts",
                         F.col("sum").cast("double").alias("v")) \
            .orderBy("series_id", "bucket_ts").toPandas()
        b = back.orderBy("series_id", "bucket_ts").toPandas()
        assert len(a) == len(b)
        assert (a["series_id"].values == b["series_id"].values).all()
        assert (a["bucket_ts"].values == b["bucket_ts"].values).all()
        np.testing.assert_array_equal(
            a["v"].to_numpy().view(np.uint64),
            b["value"].to_numpy().view(np.uint64))  # bit-for-bit

    def test_compression_ratio(self, spark, agg1m):
        chunks = compress_tier(agg1m, value_col="cnt").toPandas()
        raw_bytes = int(chunks["n"].sum()) * 16
        enc_bytes = int(chunks["payload"].map(len).sum())
        assert enc_bytes < raw_bytes  # beats raw (ts, value) pairs


class TestCheckpoint:
    def test_run_and_resume(self, spark, agg1m, tmp_path):
        base = str(tmp_path / "stages")
        calls = {"n": 0}

        def make():
            calls["n"] += 1
            return agg1m

        out1 = run_stage(spark, "agg1m", make, base, fingerprint="v1")
        assert calls["n"] == 1
        m1 = read_manifest(base, "agg1m")
        assert m1["complete"] and m1["rows"] == agg1m.count()
        assert sum(m1["partitions"].values()) == m1["rows"]
        # resume: fn not called again
        out2 = run_stage(spark, "agg1m", make, base, fingerprint="v1")
        assert calls["n"] == 1
        assert out2.count() == out1.count()
        # changed fingerprint → recompute
        run_stage(spark, "agg1m", make, base, fingerprint="v2")
        assert calls["n"] == 2


class TestMultimodal:
    def test_decode_features_deterministic(self, spark):
        media = synth_media(spark, n=12)
        f1 = decode_features(media, n_features=8).orderBy("media_id").toPandas()
        f2 = decode_features(media, n_features=8).orderBy("media_id").toPandas()
        assert (f1["features"].map(tuple) == f2["features"].map(tuple)).all()
        assert all(len(v) == 8 for v in f1["features"])

    def test_resize_shape(self, spark):
        media = synth_media(spark, n=12)
        px = resize_images(media, out_w=4, out_h=3).toPandas()
        assert len(px) == len([1 for i in range(12) if i % 3 == 0])
        assert all(len(p) == 12 for p in px["pixels"])

    def test_frame_sampling_real_avi_values(self, spark):
        """Video rows now carry a real uncompressed-DIB AVI: the
        sampled frame signatures must equal the exact integer-mean of
        the deterministic frame formula, computed independently here."""
        from dtaidistance_spark.operators.multimodal import _synth_frame

        media = synth_media(spark, n=12)
        fr = sample_frames(media, every_k=2).toPandas()
        assert (fr["frame_idx"] % 2 == 0).all()
        assert set(fr["media_id"]) == {2, 5, 8, 11}
        for row in fr.itertuples(index=False):
            f = _synth_frame(int(row.media_id), int(row.frame_idx))
            exp = int(f.sum(dtype=np.int64)) / f.size / 255.0
            assert row.frame_sig == exp  # bit-exact, not approx

    def test_real_codec_path(self, spark):
        # every synth payload (PPM/PNG/WAV/AVI) now has a REAL decoder:
        # fake=False must succeed on the whole synthetic table...
        media = synth_media(spark, n=6)
        assert decode_features(media, fake=False).count() == 6
        # ...and still raise loudly on a genuinely undecodable payload
        from dtaidistance_spark.operators.multimodal import MEDIA_SCHEMA
        bogus = spark.createDataFrame(
            [(99, "video", bytearray(b"not-a-container"), 0, 0, 0, 3)],
            schema=MEDIA_SCHEMA)
        with pytest.raises(Exception):
            decode_features(bogus, fake=False).collect()


class TestAviCodec:
    """RIFF/AVI container (kernels/media.py): raw '00db' DIB frames
    roundtrip losslessly; '00dc' MJPEG frames decode through the
    module's own JPEG decoder; the codec boundary stays honest."""

    def test_raw_dib_roundtrip_exact(self):
        from dtaidistance_spark.kernels.media import (decode_avi,
                                                      encode_avi,
                                                      sniff_format)

        rng = np.random.default_rng(53)
        frames = [rng.integers(0, 256, (12, 16, 3), dtype=np.uint8)
                  for _ in range(5)]
        payload = encode_avi(frames, codec="raw", fps=10)
        assert sniff_format(payload) == "avi"
        assert b"idx1" in payload and b"movi" in payload
        dec, meta = decode_avi(payload)
        assert meta["n_frames"] == 5 and meta["fps"] == 10.0
        assert (meta["w"], meta["h"]) == (16, 12)
        assert all((a == b).all() for a, b in zip(frames, dec))
        # odd width exercises the DIB 4-byte stride padding
        odd = [rng.integers(0, 256, (7, 9, 3), dtype=np.uint8)
               for _ in range(3)]
        dec2, _ = decode_avi(encode_avi(odd, codec="raw"))
        assert all((a == b).all() for a, b in zip(odd, dec2))

    def test_mjpeg_frames_match_jpeg_decoder(self):
        from dtaidistance_spark.kernels.media import (decode_avi,
                                                      decode_jpeg,
                                                      encode_avi,
                                                      encode_jpeg)

        rng = np.random.default_rng(59)
        frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
                  for _ in range(4)]
        dec, meta = decode_avi(encode_avi(frames, codec="mjpeg", quant=1))
        assert meta["compression"] != 0
        exp = [decode_jpeg(encode_jpeg(f, quant=1)) for f in frames]
        assert all((a == b).all() for a, b in zip(exp, dec))

    def test_codec_boundary(self):
        import struct as _struct

        from dtaidistance_spark.kernels.media import (decode_avi,
                                                      encode_avi)

        frames = [np.zeros((8, 8, 3), dtype=np.uint8)]
        payload = bytearray(encode_avi(frames, codec="raw"))
        # flip biCompression in strf to a fake codec fourcc
        i = payload.index(b"strf") + 8 + 16
        payload[i:i + 4] = _struct.pack("<I", 0x34363248)  # 'H264'
        with pytest.raises(NotImplementedError):
            decode_avi(bytes(payload))
        with pytest.raises(ValueError):
            decode_avi(b"RIFF\x04\x00\x00\x00AVI ")
        good = encode_avi(frames, codec="raw")
        with pytest.raises(ValueError):  # truncated DIB frame
            decode_avi(good[:len(good) - 40] + good[-8:])


class TestStreaming:
    def test_stream_matches_batch(self, spark, tmp_path):
        tr = synth_transcripts(spark, n_convs=10, seed=3, max_turns=60)
        pts = transcript_points(tr, kinds=("turn_rate",))
        src_dir = str(tmp_path / "src")
        pts.select("series_id", "ts", "value").write.parquet(src_dir)
        out_dir = str(tmp_path / "out")
        ck_dir = str(tmp_path / "ck")
        run_file_stream(
            spark, src_dir,
            schema="series_id string, ts timestamp, value double",
            out_dir=out_dir, checkpoint_dir=ck_dir,
            series_expr="series_id")
        got = spark.read.parquet(out_dir) \
            .orderBy("series_id", "bucket_ts").toPandas()
        batch = rollup_points(pts, "1m") \
            .select("series_id", "bucket_ts", "cnt", "sum", "min", "max") \
            .orderBy("series_id", "bucket_ts").toPandas()
        # append mode emits only windows closed by the watermark; trailing
        # open windows stay in state — compare on the emitted subset and
        # require every safely-closed window to have been emitted
        merged = got.merge(batch, on=["series_id", "bucket_ts"],
                           suffixes=("_s", "_b"))
        assert len(merged) == len(got)  # every emitted row matches batch
        assert (merged["cnt_s"].values == merged["cnt_b"].values).all()
        np.testing.assert_allclose(merged["sum_s"], merged["sum_b"], rtol=1e-12)
        wm_cutoff = batch["bucket_ts"].max() - np.timedelta64(11, "m")
        closed = batch[batch["bucket_ts"] < wm_cutoff]
        assert len(got) >= len(closed)

    def test_late_data_dropped_after_watermark(self, spark, tmp_path):
        """Watermark semantics across incremental runs sharing one
        checkpoint: a row arriving after its window's watermark has
        passed is dropped; the already-emitted window is never revised
        (append mode), and new in-watermark data still aggregates."""
        import pandas as pd

        src_dir = tmp_path / "late_src"
        src_dir.mkdir()
        out_dir = str(tmp_path / "late_out")
        ck_dir = str(tmp_path / "late_ck")
        schema = "series_id string, ts timestamp, value double"

        def drop(name, rows):
            pdf = pd.DataFrame(rows, columns=["series_id", "ts", "value"])
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            spark.createDataFrame(pdf).coalesce(1) \
                .write.parquet(str(src_dir / name))

        t = pd.Timestamp("2024-01-01 10:00:00")
        # run 1: two events in the 10:00 window, then an event at 12:00
        # that pushes the watermark (10 min) far past the window's end
        drop("b1", [("a", t, 1.0), ("a", t + pd.Timedelta("20s"), 2.0),
                    ("a", t + pd.Timedelta("2h"), 5.0)])
        run_file_stream(spark, str(src_dir) + "/*", schema=schema,
                        out_dir=out_dir, checkpoint_dir=ck_dir,
                        series_expr="series_id")
        first = spark.read.parquet(out_dir).toPandas()
        w0 = first[first["bucket_ts"] == t]
        assert len(w0) == 1 and int(w0["cnt"].iloc[0]) == 2

        # run 2 (same checkpoint → watermark state persists): one LATE
        # row back in the closed 10:00 window + one fresh row at 13:00
        drop("b2", [("a", t + pd.Timedelta("30s"), 99.0),
                    ("a", t + pd.Timedelta("3h"), 7.0)])
        run_file_stream(spark, str(src_dir) + "/*", schema=schema,
                        out_dir=out_dir, checkpoint_dir=ck_dir,
                        series_expr="series_id")
        final = spark.read.parquet(out_dir).toPandas()
        w0 = final[final["bucket_ts"] == t]
        # the late row was dropped: the 10:00 window was emitted exactly
        # once, with the run-1 count, and never revised
        assert len(w0) == 1 and int(w0["cnt"].iloc[0]) == 2
        assert 99.0 not in set(final["max"])
        # the 12:00 window (closed by the 13:00 watermark) did emit
        w12 = final[final["bucket_ts"] == t + pd.Timedelta("2h")]
        assert len(w12) == 1 and int(w12["cnt"].iloc[0]) == 1

    def test_streaming_exact_dedup(self, spark, tmp_path):
        """dropDuplicatesWithinWatermark keyed on the exact_dedup md5
        fingerprint: one output row per distinct normalized text across
        micro-batch boundaries (within the watermark horizon), bounded
        state, idempotent resume from the checkpoint."""
        import pandas as pd

        from dtaidistance_spark.streaming.dedup_stream import (
            run_doc_dedup_stream)

        src_dir = tmp_path / "dd_src"
        src_dir.mkdir()
        out_dir = str(tmp_path / "dd_out")
        ck_dir = str(tmp_path / "dd_ck")
        schema = "doc_id long, ts timestamp, text string"
        t = pd.Timestamp("2024-01-01 10:00:00")

        def drop(name, rows):
            pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            spark.createDataFrame(pdf).coalesce(1) \
                .write.parquet(str(src_dir / name))

        # batch 1: dup inside the batch (1 vs 2, differing only by
        # whitespace/case — same normalized fingerprint) + a unique doc
        drop("b1", [(1, t, "Hello   World again"),
                    (2, t + pd.Timedelta("10s"), "hello world AGAIN"),
                    (3, t + pd.Timedelta("20s"), "something else")])
        run_doc_dedup_stream(spark, str(src_dir) + "/*", schema=schema,
                             out_dir=out_dir, checkpoint_dir=ck_dir)
        got1 = spark.read.parquet(out_dir).toPandas()
        assert len(got1) == 2
        assert set(got1["doc_id"]) < {1, 2, 3} and 3 in set(got1["doc_id"])

        # batch 2 (same checkpoint): a cross-batch dup of doc 3 within
        # the watermark is suppressed; a genuinely new doc passes
        drop("b2", [(4, t + pd.Timedelta("30s"), "  SOMETHING   ELSE "),
                    (5, t + pd.Timedelta("40s"), "brand new words")])
        run_doc_dedup_stream(spark, str(src_dir) + "/*", schema=schema,
                             out_dir=out_dir, checkpoint_dir=ck_dir)
        got2 = spark.read.parquet(out_dir).toPandas()
        assert len(got2) == 3 and 4 not in set(got2["doc_id"])
        assert 5 in set(got2["doc_id"])

        # rerun with nothing new: checkpoint resume emits nothing
        run_doc_dedup_stream(spark, str(src_dir) + "/*", schema=schema,
                             out_dir=out_dir, checkpoint_dir=ck_dir)
        assert spark.read.parquet(out_dir).count() == 3

    def test_stateful_sessionize_matches_batch(self, spark, tmp_path):
        """applyInPandasWithState sessionizer vs the batch window-cumsum
        sessionization, on the safely-closed subset."""
        from dtaidistance_spark.streaming.sessionize_stream import (
            stream_sessionize)
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        tr = synth_transcripts(spark, n_convs=8, seed=5, max_turns=80)
        pts = transcript_points(tr, kinds=("turn_rate",)) \
            .select("series_id", "ts", "value")
        src_dir = str(tmp_path / "sess_src")
        pts.write.parquet(src_dir)
        out_dir = str(tmp_path / "sess_out")
        ck_dir = str(tmp_path / "sess_ck")
        src = spark.readStream.schema(
            "series_id string, ts timestamp, value double").parquet(src_dir)
        q = (stream_sessionize(src, gap_s=600.0, watermark="30 minutes")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = spark.read.parquet(out_dir) \
            .orderBy("series_id", "session_start").toPandas()

        # batch twin: cumsum of >600 s silence flags
        w = W.partitionBy("series_id").orderBy("ts")
        ep = F.unix_micros(F.col("ts")) / 1e6
        g = pts.withColumn(
            "new_sess",
            F.when(F.lag("ts").over(w).isNull(), 1)
             .when(ep - F.unix_micros(F.lag("ts").over(w)) / 1e6 > 600.0, 1)
             .otherwise(0))
        g = g.withColumn("session_no", F.sum("new_sess").over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)))
        batch = (g.groupBy("series_id", "session_no")
                 .agg(F.min("ts").alias("session_start"),
                      F.max("ts").alias("session_end"),
                      F.count("*").alias("n_events"),
                      F.sum("value").alias("sum_val"))
                 .orderBy("series_id", "session_start").toPandas())
        merged = got.merge(
            batch, on=["series_id", "session_start"], suffixes=("_s", "_b"))
        # every emitted (closed) session must exist in batch with equal
        # boundaries and aggregates
        assert len(merged) == len(got) and len(got) > 0
        assert (merged["session_end_s"].values ==
                merged["session_end_b"].values).all()
        assert (merged["n_events_s"].values ==
                merged["n_events_b"].values).all()
        np.testing.assert_allclose(merged["sum_val_s"], merged["sum_val_b"],
                                   rtol=1e-12)


class TestMediaCodecs:
    """Real pure-numpy raster codecs (kernels/media.py) — the decoded
    image path of the multimodal pipeline (VERDICT r3 item 6)."""

    def test_ppm_roundtrip_and_grammar(self):
        from dtaidistance_spark.kernels.media import decode_ppm, encode_ppm

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
        p = encode_ppm(img)
        assert (decode_ppm(p) == img).all()
        # netpbm header grammar: comments + arbitrary whitespace
        p2 = b"P6\n# a comment\n13  11\n255\n" + p.split(b"255\n", 1)[1]
        assert (decode_ppm(p2) == img).all()

    def test_bmp_roundtrip_padding_and_bottom_up(self):
        from dtaidistance_spark.kernels.media import decode_bmp, encode_bmp

        rng = np.random.default_rng(11)
        # width 13 -> 39-byte rows padded to 40: exercises row padding
        img = rng.integers(0, 256, (5, 13, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all()

    def test_bmp_known_pixels(self):
        """Byte-level golden: a 1x2 image laid out by hand from the BMP
        spec (bottom-up, BGR, rows padded to 4 bytes)."""
        from dtaidistance_spark.kernels.media import decode_bmp, encode_bmp

        img = np.array([[[255, 0, 0], [0, 128, 255]]], dtype=np.uint8)
        payload = encode_bmp(img)
        # raster starts at offset 54: BGR of pixel0, BGR of pixel1, 2 pad
        assert payload[54:62] == bytes([0, 0, 255, 255, 128, 0, 0, 0])
        assert (decode_bmp(payload) == img).all()

    def test_png_roundtrip_all_filters(self):
        from dtaidistance_spark.kernels.media import decode_png, encode_png

        rng = np.random.default_rng(13)
        # 7 rows so the cycling default hits every filter type at least
        # once; width 13 exercises non-multiple-of-4 strides
        img = rng.integers(0, 256, (7, 13, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
        for f in range(5):  # each filter fixed for every scanline
            assert (decode_png(encode_png(img, filter_type=f)) == img).all(), f
        # gradient image (Paeth/Average-friendly data, catches sign slips)
        grad = ((np.arange(9)[:, None, None] * 17
                 + np.arange(11)[None, :, None] * 29
                 + np.arange(3)[None, None, :] * 47) % 256).astype(np.uint8)
        assert (decode_png(encode_png(grad)) == grad).all()

    def test_png_adam7_roundtrip_and_parity(self):
        from dtaidistance_spark.kernels.media import decode_png, encode_png

        rng = np.random.default_rng(29)
        # shapes straddling the 8x8 Adam7 grid: sub-8 (some passes
        # empty), exact multiples, and ragged remainders
        for (h, w) in [(1, 1), (3, 5), (8, 8), (9, 13), (16, 17), (2, 33)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for f in (None, 0, 1, 2, 3, 4):
                p = encode_png(img, filter_type=f, interlace=True)
                assert (decode_png(p) == img).all(), (h, w, f)
            # interlaced and sequential streams decode identically
            assert (decode_png(encode_png(img, interlace=True))
                    == decode_png(encode_png(img))).all()

    def test_png_adam7_known_bytes(self):
        """Spec golden for the Adam7 pass order, independent of the
        encoder: an 8x8 gradient's seven pass sub-images are extracted
        with the spec's (x0, y0, dx, dy) grids IN THE TEST, each
        scanline emitted with filter 0, concatenated, deflated — the
        decoder must scatter them back to the original image."""
        import struct
        import zlib

        from dtaidistance_spark.kernels.media import decode_png

        img = ((np.arange(8)[:, None, None] * 31
                + np.arange(8)[None, :, None] * 7
                + np.arange(3)[None, None, :] * 3) % 256).astype(np.uint8)
        passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        scan = bytearray()
        for (x0, y0, dx, dy) in passes:
            sub = img[y0::dy, x0::dx]
            for row in sub:
                scan += b"\x00" + row.tobytes()

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 8, 8, 8, 2,
                                                0, 0, 1))
                   + chunk(b"IDAT", zlib.compress(bytes(scan)))
                   + chunk(b"IEND", b""))
        assert (decode_png(payload) == img).all()

    def test_png_known_bytes(self):
        """Byte-level golden: a 2x2 PNG laid out by hand from the spec —
        guards against a matched encoder/decoder bug pair.  Row 0 uses
        filter 2 (Up over a zero row = raw), row 1 filter 1 (Sub:
        second pixel stores raw - left mod 256)."""
        import struct
        import zlib

        from dtaidistance_spark.kernels.media import decode_png

        img = np.array([[[10, 20, 30], [40, 50, 60]],
                        [[70, 80, 90], [15, 25, 35]]], dtype=np.uint8)
        scan = (b"\x02" + bytes([10, 20, 30, 40, 50, 60])
                + b"\x01" + bytes([70, 80, 90, 201, 201, 201]))

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        payload = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2,
                                                0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(scan))
                   + chunk(b"IEND", b""))
        assert (decode_png(payload) == img).all()

    def test_png_error_paths(self):
        import pytest as _pytest

        from dtaidistance_spark.kernels.media import decode_png, encode_png

        img = np.zeros((2, 2, 3), dtype=np.uint8)
        p = bytearray(encode_png(img))
        p[40] ^= 0xFF  # corrupt a byte inside IDAT -> CRC mismatch
        with _pytest.raises(ValueError):
            decode_png(bytes(p))
        # combinations outside the spec's legal matrix raise
        import struct
        import zlib

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        illegal = (b"\x89PNG\r\n\x1a\n"
                   + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 4, 2,
                                                0, 0, 0))
                   + chunk(b"IDAT", zlib.compress(b"\x00\x80\x80"))
                   + chunk(b"IEND", b""))
        with _pytest.raises(NotImplementedError):
            decode_png(illegal)  # 4-bit truecolor is not a legal combo

    def test_png_color_types(self):
        """All five 8-bit color types, hand-laid from the spec with
        filter-0 scanlines: grayscale replicates, gray+alpha and RGBA
        drop alpha, palette looks up PLTE — sequential AND an Adam7
        palette case (2x2 spans passes 1, 6 and 7 of the spec grid)."""
        import struct
        import zlib

        from dtaidistance_spark.kernels.media import decode_png

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        def png(w, h, ct, scan, extra=b"", interlace=0):
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct,
                                                 0, 0, interlace))
                    + extra
                    + chunk(b"IDAT", zlib.compress(scan))
                    + chunk(b"IEND", b""))

        # grayscale 2x1: pixels 7, 200
        got = decode_png(png(2, 1, 0, b"\x00\x07\xc8"))
        assert (got == np.array([[[7] * 3, [200] * 3]],
                                dtype=np.uint8)).all()
        # gray+alpha 1x2 (alpha dropped): gray 9 a 255, gray 30 a 0
        got = decode_png(png(1, 2, 4, b"\x00\x09\xff\x00\x1e\x00"))
        assert (got == np.array([[[9] * 3], [[30] * 3]],
                                dtype=np.uint8)).all()
        # RGBA 2x1 (alpha dropped)
        got = decode_png(png(2, 1, 6,
                             b"\x00" + bytes([1, 2, 3, 80, 4, 5, 6, 0])))
        assert (got == np.array([[[1, 2, 3], [4, 5, 6]]],
                                dtype=np.uint8)).all()
        # palette 2x1: indices 1, 0 over a 2-entry PLTE
        plte = chunk(b"PLTE", bytes([10, 20, 30, 200, 210, 220]))
        got = decode_png(png(2, 1, 3, b"\x00\x01\x00", extra=plte))
        assert (got == np.array([[[200, 210, 220], [10, 20, 30]]],
                                dtype=np.uint8)).all()
        # palette + Adam7: a 2x2 image spans passes 1, 6, 7 — pixel
        # (0,0) pass 1, (0,1) pass 6, row 1 pass 7; scanline stream is
        # the passes' filter-0 rows in order: [idx 0], [idx 1], [idx 1, 0]
        scan = b"\x00\x00" + b"\x00\x01" + b"\x00\x01\x00"
        got = decode_png(png(2, 2, 3, scan, extra=plte, interlace=1))
        want = np.array([[[10, 20, 30], [200, 210, 220]],
                         [[200, 210, 220], [10, 20, 30]]], dtype=np.uint8)
        assert (got == want).all()
        # palette index out of range -> corrupt data
        with pytest.raises(ValueError):
            decode_png(png(2, 1, 3, b"\x00\x05\x00", extra=plte))

    def test_png_subbyte_depths(self):
        """1/2/4-bit grayscale and palette scanlines: MSB-first bit
        unpacking (spec §7.2), padding bits past the row width ignored,
        gray samples scaled to 8-bit (x255 / x85 / x17)."""
        import struct
        import zlib

        from dtaidistance_spark.kernels.media import decode_png

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        def png(w, h, ct, depth, scan, extra=b""):
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                                 ct, 0, 0, 0))
                    + extra
                    + chunk(b"IDAT", zlib.compress(scan))
                    + chunk(b"IEND", b""))

        # 1-bit gray, width 10 (crosses a byte boundary, 6 pad bits):
        # bits 1010101010 -> 255,0 alternating
        got = decode_png(png(10, 1, 0, 1, b"\x00\xaa\x80"))
        want = np.tile(np.array([[255], [0]] * 5, dtype=np.uint8)
                       .reshape(1, 10, 1), (1, 1, 3))
        assert (got == want).all()
        # 2-bit gray: samples 0,1,2,3 in one byte -> 0,85,170,255
        got = decode_png(png(4, 1, 0, 2, b"\x00\x1b"))
        assert got[0, :, 0].tolist() == [0, 85, 170, 255]
        # 4-bit palette, width 3 (one pad nibble): nibbles 2,1,5
        plte = chunk(b"PLTE", bytes(range(48)))  # 16 entries
        pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
        got = decode_png(png(3, 1, 3, 4, b"\x00\x21\x50", extra=plte))
        assert (got == pal[[2, 1, 5]][None, :, :]).all()
        # sub-byte rows still unfilter: filter 2 (Up) on row 1 of a
        # 1-bit image adds the previous row's BYTES mod 256
        got = decode_png(png(8, 2, 0, 1, b"\x00\xf0" + b"\x02\x0f"))
        assert got[0, :, 0].tolist() == [255] * 4 + [0] * 4
        assert got[1, :, 0].tolist() == [255] * 8  # 0xF0 + 0x0F = 0xFF

    def test_png_16bit(self):
        """16-bit samples (big-endian) reduce to the high byte; the
        filters' left-neighbor offset doubles to channels*2 bytes
        (spec §9.2) — pinned with a Sub-filtered row whose 16-bit
        left-pixel arithmetic would corrupt an 8-bit-offset decoder."""
        import struct
        import zlib

        from dtaidistance_spark.kernels.media import decode_png

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        def png16(w, h, ct, scan):
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16,
                                                 ct, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(scan))
                    + chunk(b"IEND", b""))

        # grayscale 2x1, filter 0: 0x1234 -> 0x12, 0xFF01 -> 0xFF
        got = decode_png(png16(2, 1, 0, b"\x00\x12\x34\xff\x01"))
        assert (got == np.array([[[0x12] * 3, [0xFF] * 3]],
                                dtype=np.uint8)).all()
        # truecolor 2x1 with filter 1 (Sub): second pixel stores
        # byte-wise raw - left at a 6-byte offset
        p0 = bytes([0x10, 0x00, 0x20, 0x00, 0x30, 0x00])
        raw1 = np.array([0x40, 0x00, 0x50, 0x00, 0x60, 0x00])
        filt1 = ((raw1 - np.frombuffer(p0, dtype=np.uint8)) % 256
                 ).astype(np.uint8).tobytes()
        got = decode_png(png16(2, 1, 2, b"\x01" + p0 + filt1))
        assert (got == np.array([[[0x10, 0x20, 0x30],
                                  [0x40, 0x50, 0x60]]],
                                dtype=np.uint8)).all()
        # 16-bit RGBA drops alpha
        scan = (b"\x00" + bytes([1, 99, 2, 99, 3, 99, 0x80, 0]))
        got = decode_png(png16(1, 1, 6, scan))
        assert (got == np.array([[[1, 2, 3]]], dtype=np.uint8)).all()

    def test_decode_features_uses_real_pixels(self, spark):
        """Feature values must equal the strip means of the known
        synthetic pixel formula — i.e. the bytes really were parsed.
        synth_media alternates PPM and PNG image payloads (r5), so this
        pins BOTH container decoders against the formula end-to-end."""
        from dtaidistance_spark.kernels.media import sniff_format
        from dtaidistance_spark.operators.multimodal import (
            _synth_pixels, decode_features, synth_media)

        media = synth_media(spark, n=12)
        fmts = {int(r.media_id): sniff_format(bytes(r.payload))
                for r in media.where("kind = 'image'").toPandas()
                .itertuples(index=False)}
        assert set(fmts.values()) == {"ppm", "png"}  # both paths hit
        out = decode_features(media, n_features=8) \
            .where("kind = 'image'").orderBy("media_id").toPandas()
        for r in out.itertuples(index=False):
            gray = _synth_pixels(int(r.media_id)).mean(axis=2)
            exp = [gray[:, s * 4:(s + 1) * 4].mean() / 255.0
                   for s in range(8)]
            assert np.allclose(list(r.features), exp, atol=1e-12)

    def test_wav_roundtrip_and_chunk_walk(self):
        from dtaidistance_spark.kernels.media import (
            decode_wav, encode_wav, sniff_format)

        rng = np.random.default_rng(5)
        s = rng.integers(-32768, 32768, 777, dtype=np.int16)
        payload = encode_wav(s, 8000)
        assert sniff_format(payload) == "wav"
        got, rate = decode_wav(payload)
        assert rate == 8000 and (got == s).all()
        # decoder must walk unknown chunks before data (spec grammar)
        padded = (payload[:12] + b"LIST" + b"\x04\x00\x00\x00" + b"INFO"
                  + payload[12:])
        got2, rate2 = decode_wav(padded)
        assert rate2 == 8000 and (got2 == s).all()

    def test_wav_pcm8_and_stereo_downmix(self):
        import struct as _struct

        from dtaidistance_spark.kernels.media import decode_wav

        def wav(fmt_body, data):
            return (b"RIFF" + _struct.pack("<I", 20 + len(fmt_body)
                                           + len(data)) + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(fmt_body))
                    + fmt_body
                    + b"data" + _struct.pack("<I", len(data)) + data)

        # unsigned 8-bit PCM: 128 -> 0, 0 -> -32768, 255 -> 32512
        p = wav(_struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8),
                bytes([128, 0, 255]))
        got, rate = decode_wav(p)
        assert rate == 8000 and got.tolist() == [0, -32768, 32512]
        # stereo PCM16: per-frame floor-mean downmix
        frames = np.array([[100, 200], [-5, -6], [7, -8]], dtype="<i2")
        p = wav(_struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16),
                frames.tobytes())
        got, _ = decode_wav(p)
        assert got.tolist() == [150, -6, -1]  # floor division
        # ragged data (trailing pad byte) tolerated in every format
        p8 = wav(_struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 8),
                 bytes([128, 130, 0]))
        got, _ = decode_wav(p8)
        assert got.tolist() == [256]  # (0 + 512) // 2
        # a corrupt fmt declaring zero channels is a codec-layer error
        bad = wav(_struct.pack("<HHIIHH", 1, 0, 8000, 0, 2, 16),
                  b"\x00\x00")
        with pytest.raises(ValueError):
            decode_wav(bad)

    def test_wav_g711_and_float(self):
        """G.711 a-law/µ-law expansion (ITU reference points: µ 0xFF→0,
        0x00→-32124; A 0xD5→+8, 0xAA→+32256) and IEEE-float WAVE."""
        import struct as _struct

        from dtaidistance_spark.kernels.media import decode_wav

        def wav(tag, bits, data, ba=1):
            body = _struct.pack("<HHIIHH", tag, 1, 8000, 8000 * ba,
                                ba, bits)
            return (b"RIFF" + _struct.pack("<I", 20 + len(body)
                                           + len(data)) + b"WAVE"
                    + b"fmt " + _struct.pack("<I", len(body)) + body
                    + b"data" + _struct.pack("<I", len(data)) + data)

        got, _ = decode_wav(wav(7, 8, bytes([0xFF, 0x00, 0x80, 0x7F])))
        assert got.tolist() == [0, -32124, 32124, 0]
        got, _ = decode_wav(wav(6, 8, bytes([0xD5, 0x55, 0xAA, 0x2A])))
        assert got.tolist() == [8, -8, 32256, -32256]
        f = np.array([0.0, 0.5, -1.0, 2.0], dtype="<f4")  # 2.0 clips
        got, _ = decode_wav(wav(3, 32, f.tobytes(), ba=4))
        assert got.tolist() == [0, 16383, -32767, 32767]

    def test_wav_ima_adpcm(self):
        """IMA ADPCM (format 0x11): hand-replayed state machine golden
        + encoder/decoder lockstep on real signals."""
        import struct as _struct

        from dtaidistance_spark.kernels.media import (
            _IMA_INDEX, _IMA_STEPS, decode_wav, encode_wav_adpcm,
            sniff_format)

        # independent spec transcription for the golden
        def ref_step(pred, idx, nib):
            step = int(_IMA_STEPS[idx])
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            pred = pred - d if nib & 8 else pred + d
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX[nib])))
            return pred, idx

        # hand-assembled 1-block mono stream: predictor 100, index 5,
        # nibbles 3, 12 (one byte, low first)
        blk = _struct.pack("<hBB", 100, 5, 0) + bytes([3 | (12 << 4)])
        spb = (len(blk) - 4) * 2 + 1
        hdr = (b"RIFF" + _struct.pack("<I", 52 + len(blk)) + b"WAVE"
               + b"fmt " + _struct.pack("<IHHIIHHHH", 20, 0x11, 1, 8000,
                                        8000 * len(blk) // spb,
                                        len(blk), 4, 2, spb)
               + b"fact" + _struct.pack("<II", 4, spb)
               + b"data" + _struct.pack("<I", len(blk)))
        got, rate = decode_wav(hdr + blk)
        want = [100]
        pred, idx = 100, 5
        for nib in (3, 12):
            pred, idx = ref_step(pred, idx, nib)
            want.append(pred)
        assert rate == 8000 and got.tolist() == want

        # encoder → decoder on a sine: lossy but must track closely
        t = np.arange(2000)
        sig = (8000 * np.sin(2 * np.pi * t / 50)).astype(np.int16)
        payload = encode_wav_adpcm(sig, 16000, block_align=64)
        assert sniff_format(payload) == "wav"
        dec, rate = decode_wav(payload)
        # fact chunk trims the final block's padding exactly
        assert rate == 16000 and len(dec) == len(sig)
        err = dec.astype(np.float64) - sig
        rms_sig = np.sqrt(np.mean(sig.astype(np.float64) ** 2))
        assert np.sqrt(np.mean(err ** 2)) < 0.05 * rms_sig
        # 4-bit stream really is ~4x smaller than the PCM16 bytes
        assert len(payload) < 0.35 * (2 * len(sig))

    def test_audio_features_are_real_rms(self, spark):
        """Audio feature values must equal the frame RMS of the known
        synthetic sample formula — i.e. the WAVE bytes were parsed."""
        from dtaidistance_spark.operators.multimodal import (
            _synth_samples, decode_features, synth_media)

        media = synth_media(spark, n=6)
        out = decode_features(media, n_features=8) \
            .where("kind = 'audio'").orderBy("media_id").toPandas()
        assert len(out) == 2  # ids 1 and 4 are audio
        for r in out.itertuples(index=False):
            s = _synth_samples(int(r.media_id)).astype(np.float64)
            exp = [np.sqrt(np.mean(s[f * 256:(f + 1) * 256] ** 2)) / 32768.0
                   for f in range(8)]
            assert np.allclose(list(r.features), exp, atol=1e-15)

    def test_resize_images_decodes_ppm(self, spark):
        from dtaidistance_spark.operators.multimodal import (
            _synth_pixels, resize_images, synth_media)

        media = synth_media(spark, n=6)
        out = resize_images(media, out_w=4, out_h=3) \
            .orderBy("media_id").toPandas()
        assert len(out) == 2  # ids 0 and 3 are images
        for r in out.itertuples(index=False):
            gray = _synth_pixels(int(r.media_id)).mean(axis=2) / 255.0
            small = gray[:24, :32].reshape(3, 8, 4, 8).mean(axis=(1, 3))
            assert np.allclose(list(r.pixels), small.ravel(), atol=1e-12)


class TestJpegCodec:
    """Pure-numpy baseline JPEG (kernels/media.py, VERDICT r4 item 3
    follow-through: PNG landed r5, JPEG closes the compressed-image
    gap).  Oracles: (a) a hand-assembled single-block stream decoded
    against the textbook IDCT double-sum computed independently in the
    test (spec-formula pin, matrix-IDCT-free); (b) encoder/decoder
    roundtrips at quant=1 whose error is bounded by DCT rounding alone;
    (c) the documented NotImplementedError boundary for progressive."""

    @staticmethod
    def _idct_double_sum(F):
        """T.81 A.3.3 IDCT as the literal double sum — independent of
        the kernel's matrix-product implementation."""
        out = np.zeros((8, 8))
        c = np.ones(8)
        c[0] = 1.0 / np.sqrt(2.0)
        for x in range(8):
            for y in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (c[u] * c[v] * F[u, v]
                              * np.cos((2 * x + 1) * u * np.pi / 16)
                              * np.cos((2 * y + 1) * v * np.pi / 16))
                out[x, y] = s / 4.0
        return np.clip(np.round(out) + 128, 0, 255).astype(np.uint8)

    def test_hand_assembled_stream_matches_spec_formula(self):
        """Byte-by-byte hand-built 8×8 grayscale JPEG: DC=5 (category 3),
        one AC coefficient −3 at zigzag position 1 = F[0,1], EOB.
        Entropy bits hand-packed (0·101·0·00·1 = 0x51).  The expected
        pixels come from the literal spec double-sum, so this pins the
        whole chain (marker parse → canonical Huffman → EXTEND →
        dequantize → de-zigzag → IDCT → level shift) to T.81 itself."""
        import struct

        from dtaidistance_spark.kernels.media import decode_jpeg

        dqt = bytes([0x00]) + bytes([1] * 64)           # Pq=0, Tq=0, all-1s
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        dht_dc = bytes([0x00, 1] + [0] * 15) + bytes([3])       # "0" -> 3
        dht_ac = bytes([0x10, 2] + [0] * 15) + bytes([0x02, 0x00])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        payload = (b"\xff\xd8"
                   + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
                   + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
                   + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc))
                   + dht_dc
                   + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac))
                   + dht_ac
                   + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                   + bytes([0x51])
                   + b"\xff\xd9")
        F = np.zeros((8, 8))
        F[0, 0] = 5.0
        F[0, 1] = -3.0
        expected = self._idct_double_sum(F)
        got = decode_jpeg(payload)
        assert got.shape == (8, 8, 3)
        assert (got[:, :, 0] == expected).all()
        assert (got[:, :, 0] == got[:, :, 1]).all()

    def test_hand_assembled_16bit_dqt(self):
        """Same stream but with a 16-bit-precision DQT (Pq=1) whose
        entries are big-endian 16-bit 1s — exercises the wide-table
        parse path against the identical spec expectation."""
        import struct

        from dtaidistance_spark.kernels.media import decode_jpeg

        dqt = bytes([0x10]) + struct.pack(">64H", *([1] * 64))
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        dht_dc = bytes([0x00, 1] + [0] * 15) + bytes([3])
        dht_ac = bytes([0x10, 2] + [0] * 15) + bytes([0x02, 0x00])
        sos = bytes([1, 1, 0x00, 0, 63, 0])
        payload = (b"\xff\xd8"
                   + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
                   + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
                   + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc))
                   + dht_dc
                   + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac))
                   + dht_ac
                   + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
                   + bytes([0x51]) + b"\xff\xd9")
        F = np.zeros((8, 8))
        F[0, 0] = 5.0
        F[0, 1] = -3.0
        assert (decode_jpeg(payload)[:, :, 0]
                == self._idct_double_sum(F)).all()

    def test_gray_roundtrip_quant1_rounding_bound(self):
        """quant=1 leaves only FDCT/IDCT integer rounding: per-pixel
        error provably ≤ a few counts.  Non-multiple-of-8 dims exercise
        edge-padding + crop."""
        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg)

        rng = np.random.default_rng(23)
        for shape in [(8, 8), (24, 17), (9, 31)]:
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            dec = decode_jpeg(encode_jpeg(img, quant=1))
            assert dec.shape == shape + (3,)
            err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
            assert err.max() <= 2, (shape, err.max())

    def test_color_roundtrip_444_and_uniform_420(self):
        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg)

        rng = np.random.default_rng(29)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quant=1))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3
        # 4:2:0: uniform color makes chroma subsampling lossless, so the
        # MCU interleave (4 Y blocks + Cb + Cr) is pinned tightly
        img = np.zeros((20, 28, 3), dtype=np.uint8)
        img[:] = [37, 180, 99]
        dec = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_420_structured_luma_matches_independent_pipeline(self):
        """4:2:0 with varying luma + smooth chroma: expected image
        recomputed in the test via the independent JFIF pipeline
        (RGB→YCbCr → 2×2 box chroma → replication upsample → RGB)."""
        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg)

        x = np.arange(32)[None, :]
        y = np.arange(24)[:, None]
        r = ((x * 3 + y * 5) % 200 + 20).astype(np.float64)
        g = np.full((24, 32), 120.0)
        b = ((x + y) % 150 + 40).astype(np.float64)
        img = np.stack([r, g, b], axis=2).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
        rr, gg, bb = (img[:, :, i].astype(np.float64) for i in range(3))
        yy = 0.299 * rr + 0.587 * gg + 0.114 * bb
        cb = -0.168736 * rr - 0.331264 * gg + 0.5 * bb + 128.0
        cr = 0.5 * rr - 0.418688 * gg - 0.081312 * bb + 128.0
        cb = cb.reshape(12, 2, 16, 2).mean(axis=(1, 3))
        cr = cr.reshape(12, 2, 16, 2).mean(axis=(1, 3))
        cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
        exp_r = yy + 1.402 * (cr - 128.0)
        exp_g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        exp_b = yy + 1.772 * (cb - 128.0)
        exp = np.clip(np.round(np.stack([exp_r, exp_g, exp_b], axis=2)),
                      0, 255)
        assert np.abs(dec.astype(float) - exp).max() <= 4

    def test_restart_markers(self):
        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg)

        rng = np.random.default_rng(31)
        img = rng.integers(0, 256, (32, 40), dtype=np.uint8)
        payload = encode_jpeg(img, quant=1, restart_interval=2)
        assert b"\xff\xd0" in payload  # RST0 actually emitted
        dec = decode_jpeg(payload)
        assert np.abs(dec[:, :, 0].astype(int)
                      - img.astype(int)).max() <= 2

    def test_quantized_smooth_image_small_error(self):
        """A realistic flat quant table on a smooth image: error stays
        small (the compression actually did something: stream much
        smaller than raw)."""
        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg)

        x = np.arange(64)[None, :]
        y = np.arange(48)[:, None]
        img = ((np.sin(x / 9) + np.cos(y / 7)) * 60 + 128) \
            .clip(0, 255).astype(np.uint8)
        payload = encode_jpeg(img, quant=8)
        assert len(payload) < img.size // 2
        dec = decode_jpeg(payload)
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 8 and err.mean() < 2.0

    def test_codec_boundary_lossless_raises(self):
        import struct

        import pytest as _pytest

        from dtaidistance_spark.kernels.media import (decode_jpeg,
                                                      encode_jpeg,
                                                      sniff_format)

        sof3 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        payload = (b"\xff\xd8"
                   + b"\xff\xc3" + struct.pack(">H", 2 + len(sof3))
                   + sof3)
        with _pytest.raises(NotImplementedError):
            decode_jpeg(payload)
        # truncated entropy data fails loudly, not silently
        good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
        with _pytest.raises(ValueError):
            decode_jpeg(bytes(good[:len(good) // 2]) + b"\xff\xd9")
        assert sniff_format(bytes(good)) == "jpeg"

    def test_progressive_hand_assembled_stream(self):
        """Byte-by-byte hand-built progressive stream for the SAME
        coefficients as the baseline hand test (DC=5, F[0,1]=−3), split
        across four scans: DC first at Al=1 (diff 2, size-2 code +
        bits), AC first 1..63 at Al=1 (size-1 code, negative sign bit,
        then an EOB run covering the 62 trailing zeros), a one-bit DC
        refinement, and an AC refinement whose correction bit for the
        already-nonzero coefficient rides AFTER the EOB-run code — the
        exact buffered-bit semantics of T.81 G.1.2.3.  Every entropy
        byte below is hand-packed, so this pins the progressive decode
        chain to the spec independently of the repo's own encoder."""
        import struct

        from dtaidistance_spark.kernels.media import decode_jpeg

        dqt = bytes([0x00]) + bytes([1] * 64)
        sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        dht_dc = bytes([0x00, 1] + [0] * 15) + bytes([2])  # "0" -> size 2
        # two AC codes at length 2: "00" -> 0x01 (run 0 size 1),
        # "01" -> 0x00 (EOB / EOB-run length 1)
        dht_ac = bytes([0x10, 0, 2] + [0] * 14) + bytes([0x01, 0x00])

        def sos(ss, se, ahal, *entropy):
            hdr = bytes([1, 1, 0x00, ss, se, ahal])
            return (b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr
                    + bytes(entropy))

        payload = (
            b"\xff\xd8"
            + b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
            + b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_dc)) + dht_dc
            + b"\xff\xc4" + struct.pack(">H", 2 + len(dht_ac)) + dht_ac
            # DC first, Al=1: code(2)="0", diff bits "10" -> 010 +1-pad
            + sos(0, 0, 0x01, 0x5F)
            # AC first 1..63, Al=1: "00" + sign 0 (negative 1), then
            # EOB-run code "01" -> 00001 + 1-pad
            + sos(1, 63, 0x01, 0x0F)
            # DC refinement Ah=1 Al=0: bit (5 & 1) = 1 -> 1 + 0-pad
            + sos(0, 0, 0x10, 0x80)
            # AC refinement Ah=1 Al=0: EOB-run code "01" then the
            # buffered correction bit 1 for the nonzero coef -> 011
            + sos(1, 63, 0x10, 0x60)
            + b"\xff\xd9")
        F = np.zeros((8, 8))
        F[0, 0] = 5.0
        F[0, 1] = -3.0
        got = decode_jpeg(payload)
        assert (got[:, :, 0] == self._idct_double_sum(F)).all()

    def test_progressive_matches_sequential_bit_exact(self):
        """Progressive and sequential encoders share _prep_jpeg, so the
        entropy layer is the ONLY difference — decodes must be equal
        bit-for-bit (not approximately) across gray/color/4:2:0/
        non-multiple-of-8/quantized/restart configurations."""
        from dtaidistance_spark.kernels.media import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive)

        rng = np.random.default_rng(37)
        smooth = ((np.sin(np.arange(48)[:, None] / 7)
                   + np.cos(np.arange(64)[None, :] / 9)) * 60
                  + 128).clip(0, 255).astype(np.uint8)
        cases = [
            (rng.integers(0, 256, (24, 17), dtype=np.uint8), {}),
            (smooth, {"quant": 8}),
            (rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), {}),
            (rng.integers(0, 256, (20, 28, 3), dtype=np.uint8),
             {"subsample": True}),
            (rng.integers(0, 256, (32, 40), dtype=np.uint8),
             {"restart_interval": 2}),
        ]
        for img, kw in cases:
            seq = decode_jpeg(encode_jpeg(img, **kw))
            prog_payload = encode_jpeg_progressive(img, **kw)
            assert prog_payload[3] != 0xC0  # really SOF2, not baseline
            prog = decode_jpeg(prog_payload)
            assert (seq == prog).all(), (img.shape, kw)

    def test_progressive_custom_script_deep_refinement(self):
        """A deeper successive-approximation ladder (AC first at Al=3
        with three refinement rounds, DC at Al=2 with two) plus
        restarts inside a 4:2:0 color frame — exercises ZRL inside
        refinement passes, interleaved-DC restart resets, and EOB runs
        spanning restart-bounded segments.  Still bit-identical to the
        sequential decode."""
        from dtaidistance_spark.kernels.media import (
            decode_jpeg, encode_jpeg, encode_jpeg_progressive)

        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (24, 36, 3), dtype=np.uint8)
        comps = [0, 1, 2]
        script = [(comps, 0, 0, 0, 2)]
        script += [([c], 1, 20, 0, 3) for c in comps]
        script += [([c], 21, 63, 0, 3) for c in comps]
        script += [([c], 1, 63, 3, 2) for c in comps]
        script += [([c], 1, 63, 2, 1) for c in comps]
        script += [([c], 1, 63, 1, 0) for c in comps]
        script += [(comps, 0, 0, 2, 1), (comps, 0, 0, 1, 0)]
        payload = encode_jpeg_progressive(
            img, quant=1, subsample=True, restart_interval=3,
            script=script)
        assert b"\xff\xd0" in payload
        seq = decode_jpeg(encode_jpeg(img, quant=1, subsample=True))
        assert (decode_jpeg(payload) == seq).all()

    def test_decode_features_parses_jpeg_payload(self, spark):
        """Operator plumbing: a JPEG payload goes through the REAL
        decoder inside decode_features (features = strip means of the
        decoded gray image, within JPEG rounding of the source)."""
        import pandas as pd

        from dtaidistance_spark.kernels.media import encode_jpeg
        from dtaidistance_spark.operators.multimodal import (
            MEDIA_SCHEMA, decode_features)

        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        pdf = pd.DataFrame([(0, "image", encode_jpeg(img, quant=1),
                             32, 24, 16000, 3)],
                           columns=["media_id", "kind", "payload",
                                    "width", "height", "sample_rate",
                                    "n_frames"])
        media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
        out = decode_features(media, n_features=8).toPandas()
        gray = img.mean(axis=2)
        exp = [gray[:, s * 4:(s + 1) * 4].mean() / 255.0
               for s in range(8)]
        assert np.allclose(list(out.features[0]), exp, atol=0.02)


class TestSaltedIngest:
    """North-rule skew mandate: salted repartitioning for power-law turn
    counts.  The salted lag plan must be value-identical to the plain
    per-conversation window while bounding every window partition at
    salt_chunk rows."""

    def test_salted_equals_plain_on_skewed_corpus(self, spark):
        tr = synth_transcripts(spark, n_convs=24, seed=11, max_turns=150)
        plain = transcript_points(tr, kinds=("inter_turn_latency",))
        salted = transcript_points(tr, kinds=("inter_turn_latency",),
                                   salt_chunk=7)
        a = plain.orderBy("series_id", "seq").toPandas()
        b = salted.orderBy("series_id", "seq").toPandas()
        assert len(a) == len(b) and len(a) > 0
        for col in ("series_id", "conv_id", "kind", "seq", "ts"):
            assert (a[col].values == b[col].values).all(), col
        np.testing.assert_array_equal(a["value"].to_numpy(),
                                      b["value"].to_numpy())

    def test_boundary_repair_skips_empty_chunks(self, spark):
        # turn_idx 0,1 live in chunk 0; 22,23 in chunk 3 (chunks 1-2
        # empty) — prev of turn 22 must reach back to turn 1's ts.
        import datetime as dt
        rows = [("c", i, "user", "t", "",
                 dt.datetime(2024, 1, 1, 0, 0, s))
                for i, s in [(0, 0), (1, 10), (22, 50), (23, 55)]]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, "
                  "text string, tool string, ts timestamp")
        out = transcript_points(tr, kinds=("inter_turn_latency",),
                                salt_chunk=7) \
            .orderBy("seq").toPandas()
        assert out["seq"].tolist() == [1, 22, 23]
        assert out["value"].tolist() == [10.0, 40.0, 5.0]

    def test_salted_window_partition_is_bounded(self, spark):
        tr = synth_transcripts(spark, n_convs=8, seed=3, max_turns=64)
        salted = transcript_points(tr, kinds=("inter_turn_latency",),
                                   salt_chunk=16)
        plan = salted._jdf.queryExecution().executedPlan().toString()
        # the heavy lag window is keyed by (conv_id, __chunk), not conv_id
        assert "__chunk" in plan


class TestPerTurnTextInvariant:
    """North-rule per-row invariant: per-turn text equality under
    stable (conv_id, turn_idx) ordering — the transcript rows must
    survive physical-distribution perturbation (repartition, partition-
    local resort) and a storage round-trip through the snapshot sink
    byte-identically, and the synthetic corpus itself must regenerate
    identically from its seed (BASELINE.json input_hint)."""

    COLS = ["conv_id", "turn_idx", "role", "text", "tool"]

    def _ordered(self, df):
        from dtaidistance_spark.operators.ingest import ordered_turns
        return ordered_turns(df).select(*self.COLS).toPandas()

    def test_text_survives_shuffle_and_sink_roundtrip(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from dtaidistance_spark.sinks.snapshots import commit_tier, read_tier
        from dtaidistance_spark.sources.transcripts import synth_transcripts

        tr = synth_transcripts(spark, n_convs=30, seed=13, max_turns=100)
        ref = self._ordered(tr)
        assert len(ref) > 200  # power-law corpus actually materialized

        # adversarial physical layout: hash-repartition on an unrelated
        # key, then destroy within-partition order
        noisy = tr.repartition(17, "ts").sortWithinPartitions("text")
        base = str(tmp_path / "snap")
        commit_tier(
            noisy.withColumn("bucket_ts", F.col("ts"))
                 .withColumn("series_id", F.col("conv_id")),
            base, "turns")
        back = read_tier(spark, base, "turns")
        got = self._ordered(back)
        assert got.values.tolist() == ref.values.tolist()

    def test_corpus_regenerates_identically_from_seed(self, spark):
        from dtaidistance_spark.sources.transcripts import synth_transcripts

        a = synth_transcripts(spark, n_convs=30, seed=13, max_turns=100)
        b = synth_transcripts(spark, n_convs=30, seed=13, max_turns=100,
                              n_parts=7)  # different parallelism, same rows
        pa, pb = self._ordered(a), self._ordered(b)
        assert pa.values.tolist() == pb.values.tolist()
        # and a different seed is a genuinely different corpus
        c = synth_transcripts(spark, n_convs=30, seed=14, max_turns=100)
        assert self._ordered(c)["text"].tolist() != pa["text"].tolist()


class TestStreamMatch:
    """Streaming subsequence DTW (SPRING) — kernel parity with the batch
    subsequence kernel, chunk invariance, and the stateful operator
    end-to-end (streaming/match_stream.py)."""

    def _planted(self, seed=3, qlen=20, copies=(50, 40, 60), tail=30,
                 scale=0.05):
        rng = np.random.default_rng(seed)
        q = np.sin(np.linspace(0, 2 * np.pi, qlen))
        parts, spans, pos = [], [], 0
        for gap in copies:
            parts.append(rng.normal(scale=3.0, size=gap))
            pos += gap
            parts.append(q + rng.normal(scale=scale, size=qlen))
            spans.append((pos, pos + qlen - 1))
            pos += qlen
        parts.append(rng.normal(scale=3.0, size=tail))
        return q, np.concatenate(parts), spans

    def test_matching_function_bit_equal_to_batch(self):
        from dtaidistance_spark.kernels.subsequence import (
            subsequence_alignment)
        from dtaidistance_spark.streaming.match_stream import (
            spring_init, spring_step)

        rng = np.random.default_rng(7)
        for pen in (0.0, 0.1, 0.5):
            q, s = rng.normal(size=12), rng.normal(size=300)
            sa = subsequence_alignment(q, s, penalty=pen)
            st = spring_init(len(q))
            vals = []
            # threshold=-1: pure DP advance, no candidate masking
            for v in s:
                spring_step(st, q, np.array([v]), threshold=-1.0,
                            penalty_sq=pen ** 2)
                vals.append(float(np.sqrt(st.col[-1]) / len(q)))
            assert np.array_equal(np.array(vals), sa.matching)

    def test_planted_matches_and_chunk_invariance(self):
        from dtaidistance_spark.kernels.subsequence import (
            subsequence_alignment)
        from dtaidistance_spark.streaming.match_stream import (
            spring_init, spring_step)

        q, s, spans = self._planted()
        st = spring_init(len(q))
        ms = spring_step(st, q, s, threshold=0.05, penalty_sq=0.01)
        assert [(a, b) for a, b, _ in ms] == spans
        # emitted values equal the batch matching function at the end-points
        sa = subsequence_alignment(q, s, penalty=0.1)
        for _, e, v in ms:
            assert v == sa.matching[e]
        # any chunking (1-pt, 7-pt) == one-shot: state and emissions
        for step in (1, 7):
            st2 = spring_init(len(q))
            ms2 = []
            for i in range(0, len(s), step):
                ms2 += spring_step(st2, q, s[i:i + step], threshold=0.05,
                                   penalty_sq=0.01)
            assert ms2 == ms
            assert np.array_equal(st2.col, st.col)
            assert np.array_equal(st2.starts, st.starts)

    def test_flush_emits_trailing_open_candidate(self):
        from dtaidistance_spark.streaming.match_stream import (
            spring_init, spring_step, spring_flush)

        rng = np.random.default_rng(5)
        q = np.sin(np.linspace(0, 2 * np.pi, 20))
        s = np.concatenate([rng.normal(scale=3.0, size=30), q])
        st = spring_init(len(q))
        assert spring_step(st, q, s, threshold=0.05, penalty_sq=0.01) == []
        m = spring_flush(st)
        assert m == (30, 49, 0.0)  # exact copy -> distance exactly 0
        assert spring_flush(st) is None  # flush is idempotent

    def test_stateful_operator_matches_kernel(self, spark, tmp_path):
        """File stream -> applyInPandasWithState -> parquet sink equals a
        direct kernel run per series (closed matches; the open trailing
        candidate stays in state until the event-time timeout)."""
        import pandas as pd
        from dtaidistance_spark.streaming.match_stream import (
            spring_init, spring_step, stream_subsequence_match)

        q, s_a, spans_a = self._planted(seed=3)
        _, s_b, spans_b = self._planted(seed=11, copies=(35, 80), tail=45)
        t0 = pd.Timestamp("2026-01-05")
        pdf = pd.concat([
            pd.DataFrame({"series_id": sid,
                          "ts": t0 + pd.to_timedelta(
                              np.arange(len(vals)), unit="min"),
                          "value": vals})
            for sid, vals in (("A", s_a), ("B", s_b))])
        src_dir = str(tmp_path / "match_src")
        spark.createDataFrame(pdf).coalesce(1).write.parquet(src_dir)
        out_dir, ck_dir = str(tmp_path / "m_out"), str(tmp_path / "m_ck")
        src = spark.readStream.schema(
            "series_id string, ts timestamp, value double").parquet(src_dir)
        qh = (stream_subsequence_match(src, q, threshold=0.05, penalty=0.1)
              .writeStream.format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", ck_dir)
              .outputMode("append")
              .trigger(availableNow=True)
              .start())
        qh.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "match_start").toPandas())
        want = []
        for sid, vals in (("A", s_a), ("B", s_b)):
            st = spring_init(len(q))
            for m in spring_step(st, q, vals, threshold=0.05,
                                 penalty_sq=0.01):
                want.append((sid, *m))
        want.sort()
        assert [tuple(r) for r in
                got[["series_id", "match_start", "match_end",
                     "value"]].itertuples(index=False)] == want
        assert got["closed"].all()
        assert [(a, b) for sid, a, b, _ in want if sid == "A"] == spans_a


class TestGifCodec:
    """GIF LZW codec (kernels/media.py, late r5): real variable-width
    dictionary LZW per the public GIF89a spec, single-frame decode."""

    def test_roundtrip_with_dictionary_growth(self):
        from dtaidistance_spark.kernels.media import decode_gif, encode_gif

        rng = np.random.default_rng(7)
        # 216 distinct colors + 20k random pixels: code width grows past
        # 9 bits and the 4096-entry table overflows -> CLEAR/reset path
        img = (rng.integers(0, 6, (100, 200, 3)) * 51).astype(np.uint8)
        assert np.array_equal(decode_gif(encode_gif(img)), img)

    def test_two_color_and_full_palette(self):
        from dtaidistance_spark.kernels.media import decode_gif, encode_gif

        t = np.array([[[255, 0, 0], [0, 0, 255]],
                      [[0, 0, 255], [255, 0, 0]]], dtype=np.uint8)
        assert np.array_equal(decode_gif(encode_gif(t)), t)
        grad = np.zeros((4, 256, 3), dtype=np.uint8)
        grad[..., 0] = np.arange(256, dtype=np.uint8)[None, :]
        assert np.array_equal(decode_gif(encode_gif(grad)), grad)

    def test_hand_assembled_golden(self):
        """Spec-formula golden: a 2x1 two-color GIF laid out BY HAND
        (descriptor fields, palette, LSB-first variable-width codes
        CLEAR,1,0,END at width 3) — pins the decoder to the public spec
        rather than to the encoder twin."""
        from dtaidistance_spark.kernels.media import decode_gif

        payload = (b"GIF89a"
                   + bytes([2, 0, 1, 0])        # screen 2x1
                   + bytes([0x80, 0, 0])         # GCT, 2 entries
                   + bytes([0, 0, 0, 255, 255, 255])
                   + b"\x2c" + bytes([0, 0, 0, 0, 2, 0, 1, 0, 0])
                   + bytes([2])                  # LZW min code size
                   + bytes([2, 0x0C, 0x0A])      # codes 4,1,0,5 packed
                   + b"\x00\x3b")
        want = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
        assert np.array_equal(decode_gif(payload), want)

    def test_extension_skip_and_dispatch(self):
        from dtaidistance_spark.kernels.media import (decode_gif,
                                                      decode_raster,
                                                      encode_gif,
                                                      sniff_format)

        img = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)
        payload = bytearray(encode_gif(img))
        # splice a graphic-control extension between GCT and image block
        idx = payload.index(0x2C, 13)
        gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
        payload = bytes(payload[:idx]) + gce + bytes(payload[idx:])
        assert sniff_format(payload) == "gif"
        assert np.array_equal(decode_gif(payload), img)
        assert np.array_equal(decode_raster(payload), img)

    def test_interlace_roundtrip_and_parity(self):
        from dtaidistance_spark.kernels.media import decode_gif, encode_gif

        rng = np.random.default_rng(31)
        # heights exercising all four passes, partial passes, and h < 8
        for (h, w) in [(1, 4), (3, 4), (8, 5), (13, 7), (29, 3)]:
            img = (rng.integers(0, 6, (h, w, 3)) * 51).astype(np.uint8)
            p = encode_gif(img, interlace=True)
            assert np.array_equal(decode_gif(p), img), (h, w)
            assert np.array_equal(decode_gif(p),
                                  decode_gif(encode_gif(img)))

    def test_interlace_spec_row_order(self):
        """Spec pin independent of the encoder's interlace path: rows
        transmitted in the appendix-E pass order (every 8th from 0,
        every 8th from 4, every 4th from 2, every 2nd from 1) are what
        a flagged image block carries — so encoding the row-permuted
        image SEQUENTIALLY and then setting the interlace flag must
        decode back to the original."""
        from dtaidistance_spark.kernels.media import decode_gif, encode_gif

        h, w = 13, 3
        img = (np.arange(h * w * 3).reshape(h, w, 3) % 6 * 51
               ).astype(np.uint8)
        order = ([y for y in range(0, h, 8)] + [y for y in range(4, h, 8)]
                 + [y for y in range(2, h, 4)] + [y for y in range(1, h, 2)])
        payload = bytearray(encode_gif(img[order]))
        idx = payload.index(0x2C, 13)
        payload[idx + 9] |= 0x40  # set the interlace flag
        assert np.array_equal(decode_gif(bytes(payload)), img)


class TestCodecProperties:
    """Property-based roundtrip fuzzing (hypothesis) for the raster
    codecs — arbitrary shapes, palettes and pixel patterns, beyond the
    hand-picked fixtures above."""

    def test_gif_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dtaidistance_spark.kernels.media import decode_gif, encode_gif

        @settings(max_examples=40, deadline=None)
        @given(st.integers(1, 24), st.integers(1, 24),
               st.integers(1, 255), st.integers(0, 2**31 - 1),
               st.booleans())
        def prop(h, w, n_colors, seed, interlace):
            rng = np.random.default_rng(seed)
            palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
            idx = rng.integers(0, n_colors, (h, w))
            img = palette[idx]
            assert np.array_equal(
                decode_gif(encode_gif(img, interlace=interlace)), img)

        prop()

    def test_png_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dtaidistance_spark.kernels.media import decode_png, encode_png

        @settings(max_examples=30, deadline=None)
        @given(st.integers(1, 24), st.integers(1, 24),
               st.integers(0, 2**31 - 1),
               st.sampled_from([None, 0, 1, 2, 3, 4]),
               st.booleans())
        def prop(h, w, seed, filter_type, interlace):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(
                decode_png(encode_png(img, filter_type=filter_type,
                                      interlace=interlace)), img)

        prop()

    def test_bmp_ppm_wav_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dtaidistance_spark.kernels.media import (decode_bmp,
                                                      decode_ppm,
                                                      decode_wav,
                                                      encode_bmp,
                                                      encode_ppm,
                                                      encode_wav)

        @settings(max_examples=30, deadline=None)
        @given(st.integers(1, 16), st.integers(1, 16),
               st.integers(0, 2**31 - 1))
        def prop(h, w, seed):
            rng = np.random.default_rng(seed)
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)
            assert np.array_equal(decode_ppm(encode_ppm(img)), img)
            pcm = rng.integers(-2**15, 2**15, h * w + 1,
                               dtype=np.int64).astype(np.int16)
            out, rate = decode_wav(encode_wav(pcm, 8000))
            assert rate == 8000 and np.array_equal(out, pcm)

        prop()


class TestStreamAnomaly:
    """streaming/anomaly_stream.py — the streaming twin of
    functions/stats.anomaly_zscore; flagged set AND z values must equal
    the batch operator bit-for-bit on integer inputs."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import anomaly_zscore
        from dtaidistance_spark.streaming.anomaly_stream import zscore_step

        y = rng.integers(0, 50, size=120)
        y[[30, 77]] = 4000                    # guaranteed spikes
        rows = [("a", i, int(v)) for i, v in enumerate(y)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        batch = (anomaly_zscore(df, window=24, threshold=2.5, min_obs=8,
                                order_col="bucket_ts")
                 .orderBy("bucket_ts").toPandas())
        state = []
        got = zscore_step(state, y, window=24, threshold=2.5, min_obs=8)
        assert len(got) == len(batch) > 0
        for (i, yy, n, z), (_, brow) in zip(got, batch.iterrows()):
            assert i == brow["bucket_ts"] and yy == brow["y"]
            assert n == brow["n_prev"]
            assert z == brow["z"]             # bit-equal, not allclose

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import zscore_step

        y = [int(v) for v in rng.integers(0, 30, size=90)]
        y[40] = 9000
        whole_state, whole = [], []
        whole = zscore_step(whole_state, y, 24, 2.5, 8)
        chunk_state, chunks = [], []
        off = 0
        for size in (1, 7, 13, 30, 39):
            got = zscore_step(chunk_state, y[off:off + size], 24, 2.5, 8)
            chunks += [(i + off, yy, n, z) for (i, yy, n, z) in got]
            off += size
        assert chunk_state == whole_state
        assert [(i, yy, n, z) for (i, yy, n, z) in whole] == chunks

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        from dtaidistance_spark.functions.stats import anomaly_zscore
        import pandas as pd

        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_anomaly_zscore)

        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(4):
            y = rng.integers(0, 40, size=60)
            y[25 + s] = 5000
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), int(v))
                     for i, v in enumerate(y)]
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir = str(tmp_path / "an_src")
        out_dir = str(tmp_path / "an_out")
        ck_dir = str(tmp_path / "an_ck")
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_anomaly_zscore(src, window=24, threshold=2.5,
                                   min_obs=8)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        batch = (anomaly_zscore(
            spark.createDataFrame(pdf), window=24, threshold=2.5,
            min_obs=8, order_col="ts")
            .orderBy("series_id", "ts")
            .withColumnRenamed("ts", "ts_b").toPandas())
        assert len(got) == len(batch) > 0
        assert list(got["series_id"]) == list(batch["series_id"])
        assert list(got["ts"]) == list(batch["ts_b"])
        assert list(got["y"]) == list(batch["y"])
        assert list(got["n_prev"]) == list(batch["n_prev"])
        assert list(got["z"]) == list(batch["z"])   # bit-equal

    def test_validation(self, spark):
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_anomaly_zscore)
        import pytest as _pt
        with _pt.raises(ValueError):
            stream_anomaly_zscore(None, window=1)
        with _pt.raises(ValueError):
            stream_anomaly_zscore(None, min_obs=1)


class TestStreamHolt:
    """streaming/anomaly_stream.py::stream_holt_linear — the streaming
    twin of functions/stats.holt_linear; final state must equal the
    batch fold bit-for-bit on integer inputs."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import holt_linear
        from dtaidistance_spark.streaming.anomaly_stream import holt_step

        y = [int(v) for v in rng.integers(0, 1000, size=50)]
        rows = [("a", i, v) for i, v in enumerate(y)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        batch = (holt_linear(df, horizons=(1,), order_col="bucket_ts")
                 .toPandas().iloc[0])
        st = [0, 0, float("nan"), float("nan")]
        out = holt_step(st, y)
        assert out[-1][2] == 50
        assert st[2] == batch["level"]        # bit-equal
        assert st[3] == batch["trend"]
        assert st[2] + 1.0 * st[3] == batch["fc_1"]

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import holt_step

        y = [int(v) for v in rng.integers(0, 100, size=37)]
        a = [0, 0, float("nan"), float("nan")]
        holt_step(a, y)
        b = [0, 0, float("nan"), float("nan")]
        for lo in range(0, 37, 5):
            holt_step(b, y[lo:lo + 5])
        assert a == b

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.stats import holt_linear
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_holt_linear)

        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(3):
            y = rng.integers(0, 500, size=40)
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), int(v))
                     for i, v in enumerate(y)]
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir = str(tmp_path / "h_src")
        out_dir = str(tmp_path / "h_out")
        ck_dir = str(tmp_path / "h_ck")
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_holt_linear(src)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        assert len(got) == len(pdf)
        final = got.groupby("series_id").tail(1).set_index("series_id")
        batch = (holt_linear(spark.createDataFrame(pdf), horizons=(1,),
                             order_col="ts")
                 .toPandas().set_index("series_id"))
        for s in batch.index:
            assert final.loc[s, "level"] == batch.loc[s, "level"]
            assert final.loc[s, "trend"] == batch.loc[s, "trend"]
            assert final.loc[s, "fc_1"] == batch.loc[s, "fc_1"]
        # pre-init rows carry NaN level/trend (first observation only)
        firsts = got.groupby("series_id").head(1)
        assert firsts["level"].isna().all()


class TestStreamEwma:
    """streaming/anomaly_stream.py::stream_ewma — the streaming twin of
    functions/stats.ewma; values bit-equal on power-of-two decay."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import ewma
        from dtaidistance_spark.streaming.anomaly_stream import ewma_step

        y = [int(v) for v in rng.integers(0, 100, size=40)]
        rows = [("a", i, v) for i, v in enumerate(y)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        batch = (ewma(df, alpha=0.5, window=16, order_col="bucket_ts")
                 .orderBy("bucket_ts").toPandas())
        got = ewma_step([], y, alpha=0.5, window=16)
        assert len(got) == len(batch) == len(y)
        for (i, yy, n, e), (_, brow) in zip(got, batch.iterrows()):
            assert n == brow["n_obs"]
            assert e == brow["ewma"]          # bit-equal

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import ewma_step

        y = [int(v) for v in rng.integers(0, 50, size=33)]
        a_state, b_state = [], []
        whole = ewma_step(a_state, y, 0.5, 16)
        chunks, off = [], 0
        for size in (2, 9, 11, 11):
            got = ewma_step(b_state, y[off:off + size], 0.5, 16)
            chunks += [(i + off, yy, n, e) for (i, yy, n, e) in got]
            off += size
        assert a_state == b_state and whole == chunks

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.stats import ewma
        from dtaidistance_spark.streaming.anomaly_stream import stream_ewma

        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(3):
            y = rng.integers(0, 200, size=30)
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), int(v))
                     for i, v in enumerate(y)]
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir, out_dir, ck_dir = (str(tmp_path / d)
                                    for d in ("e_src", "e_out", "e_ck"))
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_ewma(src, alpha=0.5, window=16)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        batch = (ewma(spark.createDataFrame(pdf), alpha=0.5, window=16,
                      order_col="ts")
                 .orderBy("series_id", "ts").toPandas())
        assert len(got) == len(batch) == len(pdf)
        assert list(got["n_obs"]) == list(batch["n_obs"])
        assert list(got["ewma"]) == list(batch["ewma"])   # bit-equal

    def test_validation(self):
        from dtaidistance_spark.streaming.anomaly_stream import stream_ewma
        import pytest as _pt
        with _pt.raises(ValueError):
            stream_ewma(None, alpha=0.0)
        with _pt.raises(ValueError):
            stream_ewma(None, window=0)


class TestStreamCusum:
    """streaming/anomaly_stream.py::stream_cusum — Page's sequential
    two-sided test (textbook fold reference + stream end-to-end)."""

    @staticmethod
    def _numpy_cusum(y, mu0, k, h):
        s_hi = s_lo = 0.0
        n = 0
        alarms = []
        for i, v in enumerate(y):
            s_hi = max(0.0, s_hi + (float(v) - mu0 - k))
            s_lo = max(0.0, s_lo + (mu0 - float(v) - k))
            n += 1
            if s_hi > h or s_lo > h:
                d = "up" if s_hi > h else "down"
                alarms.append((i, int(v), d,
                               s_hi if d == "up" else s_lo, n))
                s_hi = s_lo = 0.0
                n = 0
        return alarms

    def test_step_matches_reference(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import cusum_step
        y = [int(v) for v in rng.integers(8, 13, size=200)]
        y[80:] = [v + 6 for v in y[80:]]      # upward shift at 80
        st = [0.0, 0.0, 0]
        got = cusum_step(st, y, mu0=10.0, k=1.0, h=8.0)
        want = self._numpy_cusum(y, 10.0, 1.0, 8.0)
        assert got == want
        assert got and got[0][2] == "up" and 80 <= got[0][0] <= 90

    def test_down_shift_and_restart(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import cusum_step
        y = [20] * 30 + [10] * 30 + [20] * 30 + [10] * 30
        st = [0.0, 0.0, 0]
        got = cusum_step(st, y, mu0=20.0, k=2.0, h=10.0)
        dirs = [d for (_, _, d, _, _) in got]
        assert dirs.count("down") >= 2        # re-fires after restart
        assert all(d == "down" for d in dirs)

    def test_stationary_no_alarm(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import cusum_step
        y = [int(v) for v in rng.integers(9, 12, size=300)]
        st = [0.0, 0.0, 0]
        assert cusum_step(st, y, mu0=10.0, k=2.0, h=25.0) == []

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import cusum_step
        y = [int(v) for v in rng.integers(0, 30, size=120)]
        a, b = [0.0, 0.0, 0], [0.0, 0.0, 0]
        whole = cusum_step(a, y, 15.0, 1.0, 12.0)
        chunks, off = [], 0
        for size in (3, 17, 40, 60):
            got = cusum_step(b, y[off:off + size], 15.0, 1.0, 12.0)
            chunks += [(i + off, yy, d, s, n)
                       for (i, yy, d, s, n) in got]
            off += size
        assert a == b and whole == chunks

    def test_stream_matches_reference(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.streaming.anomaly_stream import stream_cusum

        t0 = pd.Timestamp("2024-01-01")
        rows, want = [], {}
        for s in range(3):
            y = [int(v) for v in rng.integers(8, 13, size=60)]
            y[30:] = [v + 7 for v in y[30:]]
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), v)
                     for i, v in enumerate(y)]
            want[f"s{s}"] = self._numpy_cusum(y, 10.0, 1.0, 9.0)
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir, out_dir, ck_dir = (str(tmp_path / d)
                                    for d in ("c_src", "c_out", "c_ck"))
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_cusum(src, mu0=10.0, k=1.0, h=9.0)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        for s, alarms in want.items():
            sub = got[got["series_id"] == s].reset_index(drop=True)
            assert len(sub) == len(alarms) > 0
            for (i, yy, d, stat, n), (_, row) in zip(alarms,
                                                     sub.iterrows()):
                assert row["ts"] == t0 + pd.Timedelta(hours=i)
                assert row["y"] == yy and row["direction"] == d
                assert row["stat"] == stat        # bit-equal
                assert row["n_since_reset"] == n

    def test_validation(self):
        from dtaidistance_spark.streaming.anomaly_stream import stream_cusum
        import pytest as _pt
        with _pt.raises(ValueError):
            stream_cusum(None, mu0=0.0, k=-1.0, h=5.0)
        with _pt.raises(ValueError):
            stream_cusum(None, mu0=0.0, k=1.0, h=0.0)


class TestStreamKalman:
    """streaming/anomaly_stream.py::stream_kalman_level — the streaming
    twin of functions/stats.kalman_level; states bit-equal to the
    batch fold at every prefix."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import kalman_level
        from dtaidistance_spark.streaming.anomaly_stream import kalman_step

        y = [int(v) for v in rng.integers(0, 1000, size=50)]
        rows = [("a", i, v) for i, v in enumerate(y)]
        df = spark.createDataFrame(rows, ["series_id", "bucket_ts", "y"])
        batch = (kalman_level(df, q=0.25, r=1.0, order_col="bucket_ts")
                 .toPandas().iloc[0])
        st = [0, float("nan"), float("nan")]
        out = kalman_step(st, y, q=0.25, r=1.0)
        assert out[-1][2] == 50
        assert st[1] == batch["level"]        # bit-equal
        assert st[2] == batch["var_p"]
        assert ((st[2] + 0.25) / ((st[2] + 0.25) + 1.0)
                == batch["gain_next"])

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import kalman_step

        y = [int(v) for v in rng.integers(0, 100, size=37)]
        a = [0, float("nan"), float("nan")]
        kalman_step(a, y)
        b = [0, float("nan"), float("nan")]
        for lo in range(0, 37, 5):
            kalman_step(b, y[lo:lo + 5])
        assert a == b

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.stats import kalman_level
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_kalman_level)

        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(3):
            y = rng.integers(0, 500, size=40)
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), int(v))
                     for i, v in enumerate(y)]
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir = str(tmp_path / "k_src")
        out_dir = str(tmp_path / "k_out")
        ck_dir = str(tmp_path / "k_ck")
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_kalman_level(src)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        assert len(got) == len(pdf)
        final = got.groupby("series_id").tail(1).set_index("series_id")
        batch = (kalman_level(spark.createDataFrame(pdf), order_col="ts")
                 .toPandas().set_index("series_id"))
        for s in batch.index:
            assert final.loc[s, "level"] == batch.loc[s, "level"]
            assert final.loc[s, "var_p"] == batch.loc[s, "var_p"]
        # the init observation receives no gain; later rows do
        firsts = got.groupby("series_id").head(1)
        assert firsts["gain"].isna().all()
        assert got.groupby("series_id").tail(1)["gain"].notna().all()


class TestStreamSloBurn:
    """streaming/anomaly_stream.py::stream_slo_burn — the streaming
    twin of functions/timeagg.slo_burn_rate; burn rates and alert
    flags bit-equal to the batch RANGE-frame scan."""

    def _rows(self, rng, n=40, gap_at=(17, 18, 19)):
        rows = []
        idx = 0
        for i in range(n):
            idx += 3 if i in gap_at else 1      # real index gaps
            if i == 11:                         # zero-traffic bucket:
                rows.append((idx, 0, 0))        # burn NULL both sides
                continue
            good = int(rng.integers(0, 50))
            bad = int(rng.integers(0, 12))
            rows.append((idx, good, bad))
        return rows

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.timeagg import slo_burn_rate
        from dtaidistance_spark.streaming.anomaly_stream import (
            slo_burn_step)

        rows = self._rows(rng)
        df = spark.createDataFrame(rows, ["idx", "good", "bad"])
        batch = (slo_burn_rate(df, slo=0.8, long_window=6,
                               short_window=1, threshold=1.5)
                 .toPandas().set_index("idx").sort_index())
        st = [[], [], []]
        got = slo_burn_step(st, rows, 0.8, 6, 1, 1.5)
        assert len(got) == len(batch)

        def same(a, b):                        # None/NaN == NULL/NaN
            if a is None or a != a:
                return b is None or b != b
            return a == b

        saw_null = False
        for idx, good, bad, bl, bs, alert in got:
            b = batch.loc[idx]
            assert same(bl, b["burn_long"])    # bit-equal or both null
            assert same(bs, b["burn_short"])
            assert alert == bool(b["alert"])
            saw_null = saw_null or bs is None
        assert saw_null                        # the planted zero bucket

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import (
            slo_burn_step)
        rows = self._rows(rng)
        a = [[], [], []]
        ga = slo_burn_step(a, rows, 0.9, 6, 1, 2.0)
        b = [[], [], []]
        gb = []
        for lo in range(0, len(rows), 7):
            gb += slo_burn_step(b, rows[lo:lo + 7], 0.9, 6, 1, 2.0)
        assert ga == gb and a == b

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.timeagg import slo_burn_rate
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_slo_burn)

        rows = []
        for s in range(3):
            for idx, good, bad in self._rows(rng, n=30):
                rows.append((f"svc{s}", idx, good, bad))
        pdf = pd.DataFrame(rows, columns=["series_id", "idx", "good",
                                          "bad"])
        src_dir, out_dir, ck_dir = (str(tmp_path / d)
                                    for d in ("s_src", "s_out", "s_ck"))
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, idx long, good long, bad long"
        ).parquet(src_dir)
        q = (stream_slo_burn(src, slo=0.8, long_window=6,
                             short_window=1, threshold=1.5)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "idx").toPandas()
               .set_index(["series_id", "idx"]))
        batch = (slo_burn_rate(spark.createDataFrame(pdf), slo=0.8,
                               long_window=6, short_window=1,
                               threshold=1.5, series_col="series_id")
                 .toPandas().set_index(["series_id", "idx"]))
        assert len(got) == len(batch)
        for k in batch.index:
            assert got.loc[k, "burn_long"] == batch.loc[k, "burn_long"]
            assert bool(got.loc[k, "alert"]) == bool(
                batch.loc[k, "alert"])


class TestStreamHoltWinters:
    """streaming/anomaly_stream.py::stream_holt_winters — the
    streaming twin of functions/stats.holt_winters; post-warmup
    states bit-equal to the batch fold at every prefix."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import holt_winters
        from dtaidistance_spark.streaming.anomaly_stream import (
            holt_winters_step)

        m = 6
        y = [int(v) for v in rng.integers(0, 400, size=40)]
        for prefix in (2 * m, 2 * m + 1, 30, 40):
            df = spark.createDataFrame(
                [("a", i, v) for i, v in enumerate(y[:prefix])],
                ["series_id", "bucket_ts", "y"])
            batch = (holt_winters(df, season=m, horizons=(1,))
                     .toPandas().iloc[0])
            st = [0, [], float("nan"), float("nan"), []]
            out = holt_winters_step(st, y[:prefix], m)
            assert out[-1][1] == prefix
            assert st[2] == batch["level"]        # bit-equal
            assert st[3] == batch["trend"]
            assert out[-1][4] == batch["fc_1"]

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import (
            holt_winters_step)
        y = [int(v) for v in rng.integers(0, 100, size=37)]
        a = [0, [], float("nan"), float("nan"), []]
        ga = holt_winters_step(a, y, 5)
        b = [0, [], float("nan"), float("nan"), []]
        gb = []
        for lo in range(0, 37, 4):
            gb += holt_winters_step(b, y[lo:lo + 4], 5)
        assert a[0] == b[0] and a[2] == b[2] and a[3] == b[3]
        assert a[4] == b[4]
        assert len(ga) == len(gb)
        for ra, rb in zip(ga, gb):            # NaN-aware equality
            for va, vb in zip(ra, rb):
                assert va == vb or (va != va and vb != vb)

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.stats import holt_winters
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_holt_winters)

        m = 6
        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(3):
            y = rng.integers(0, 300, size=30)
            rows += [(f"s{s}", t0 + pd.Timedelta(hours=int(i)), int(v))
                     for i, v in enumerate(y)]
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir, out_dir, ck_dir = (str(tmp_path / d)
                                    for d in ("hw_src", "hw_out",
                                              "hw_ck"))
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_holt_winters(src, season=m)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        assert len(got) == len(pdf)
        final = got.groupby("series_id").tail(1).set_index("series_id")
        batch = (holt_winters(spark.createDataFrame(pdf), season=m,
                              horizons=(1,), order_col="ts")
                 .toPandas().set_index("series_id"))
        for s in batch.index:
            assert final.loc[s, "level"] == batch.loc[s, "level"]
            assert final.loc[s, "trend"] == batch.loc[s, "trend"]
            assert final.loc[s, "fc_1"] == batch.loc[s, "fc_1"]
        # warmup rows (first 2m-1 per series) carry NaN level
        firsts = got.groupby("series_id").head(2 * m - 1)
        assert firsts["level"].isna().all()


class TestStreamCroston:
    """streaming/anomaly_stream.py::stream_croston — the streaming
    twin of functions/stats.croston; states bit-equal at every
    prefix."""

    def test_step_matches_batch_exact(self, spark, rng):
        from dtaidistance_spark.functions.stats import croston
        from dtaidistance_spark.streaming.anomaly_stream import (
            croston_step)

        y = [int(v) if rng.random() < 0.25 else 0
             for v in rng.integers(1, 9, size=60)]
        df = spark.createDataFrame(
            [("a", i, v) for i, v in enumerate(y)],
            ["series_id", "bucket_ts", "y"])
        batch = croston(df).toPandas().iloc[0]
        st = [0, 0, 0.0, 0.0, 1.0]
        out = croston_step(st, y)
        assert out[-1][1] == 60
        assert st[1] == batch["n_demands"]
        if st[1] > 0:
            assert st[2] == batch["z"] and st[3] == batch["p"]
            assert out[-1][3] == batch["forecast"]
            assert out[-1][4] == batch["fc_sba"]

    def test_chunking_invariance(self, rng):
        from dtaidistance_spark.streaming.anomaly_stream import (
            croston_step)
        y = [int(v) if rng.random() < 0.3 else 0
             for v in rng.integers(1, 9, size=41)]
        a = [0, 0, 0.0, 0.0, 1.0]
        ga = croston_step(a, y)
        b = [0, 0, 0.0, 0.0, 1.0]
        gb = []
        for lo in range(0, 41, 6):
            gb += croston_step(b, y[lo:lo + 6])
        assert a == b
        for ra, rb in zip(ga, gb):
            for va, vb in zip(ra, rb):
                assert va == vb or (va != va and vb != vb)

    def test_stream_matches_batch(self, spark, tmp_path, rng):
        import pandas as pd

        from dtaidistance_spark.functions.stats import croston
        from dtaidistance_spark.streaming.anomaly_stream import (
            stream_croston)

        t0 = pd.Timestamp("2024-01-01")
        rows = []
        for s in range(3):
            for i in range(40):
                v = int(rng.integers(1, 9)) if rng.random() < 0.2 else 0
                rows.append((f"s{s}", t0 + pd.Timedelta(hours=i), v))
        pdf = pd.DataFrame(rows, columns=["series_id", "ts", "y"])
        src_dir, out_dir, ck_dir = (str(tmp_path / d)
                                    for d in ("c_src", "c_out", "c_ck"))
        spark.createDataFrame(pdf).write.parquet(src_dir)
        src = spark.readStream.schema(
            "series_id string, ts timestamp, y long").parquet(src_dir)
        q = (stream_croston(src)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ck_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        got = (spark.read.parquet(out_dir)
               .orderBy("series_id", "ts").toPandas())
        assert len(got) == len(pdf)
        final = got.groupby("series_id").tail(1).set_index("series_id")
        batch = (croston(spark.createDataFrame(pdf), order_col="ts")
                 .toPandas().set_index("series_id"))
        for s in batch.index:
            assert final.loc[s, "n_demands"] == batch.loc[s, "n_demands"]
            if batch.loc[s, "n_demands"] > 0:
                assert final.loc[s, "forecast"] == batch.loc[s,
                                                             "forecast"]
