package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  // doc 2 payload: 42 bytes, every position distinct enough to pin windows
  private lazy val docs = Seq(
    (1L, "abcd"), (2L, "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcdef"), (3L, "x")
  ).toDF("doc_id", "text")
  private lazy val media = Multimodal.fromDocuments(docs)

  test("fromDocuments: binary payload with typed metadata") {
    val r = media.schema
    assert(r("payload").dataType.typeName === "binary")
    assert(media.count() === 3)
  }

  test("extractMeta: byte length + header hex without decoding") {
    val m = Multimodal.extractMeta(media)
      .filter(col("media_id") === 1).collect()(0)
    assert(m.getAs[Long]("n_bytes") === 4L)
    assert(m.getAs[String]("header_hex") === "61626364") // 'abcd' in hex
  }

  test("decodeFeatures: stub histogram is normalized and deterministic") {
    val f = Multimodal.decodeFeatures(spark, media, dim = 8)
      .filter(col("media_id") === 1).collect()(0)
    assert(f.features.length === 8)
    assert(math.abs(f.features.sum - 1.0f) < 1e-5, "histogram sums to 1")
    val f2 = Multimodal.decodeFeatures(spark, media, dim = 8)
      .filter(col("media_id") === 1).collect()(0)
    assert(f.features.toSeq === f2.features.toSeq)
  }

  test("sampleFrames: strided fixed-width byte windows") {
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 8, stride = 2)
      .filter(col("media_id") === 2).collect().sortBy(_.frame_idx)
    // 42 bytes → 6 windows of 8; stride 2 → indices 0, 2, 4
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4))
    assert(new String(frames(0).frame) === "ABCDEFGH")
    assert(new String(frames(1).frame) === "QRSTUVWX")
    assert(new String(frames(2).frame) === "6789abcd")
  }

  test("embedBatched: batch size and partitioning do not change results") {
    val base = Multimodal.embedBatched(spark, media, dim = 8, batchSize = 64)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val tiny = Multimodal.embedBatched(spark, media, dim = 8, batchSize = 1)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val repart = Multimodal.embedBatched(spark, media.repartition(7),
        dim = 8, batchSize = 2)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(base === tiny && base === repart)
    // batched embedding agrees with the per-row decode path (same stub model)
    val perRow = Multimodal.decodeFeatures(spark, media, dim = 8)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    assert(base === perRow)
  }

  test("resizePayload: strided down-sampling to at most targetBytes") {
    val out = Multimodal.resizePayload(media, targetBytes = 4)
      .filter(col("media_id") === 2)
      .select(col("payload")).as[Array[Byte]].collect()(0)
    assert(out.length <= 4)
    // 42 bytes, step = max(42/4,1) = 10 → positions 1, 11, 21, 31 (1-based)
    assert(new String(out) === "AKU4")
  }

  test("mediaSimhash: equal distinct window sets give equal signatures; " +
       "disjoint sets differ") {
    // pattern repeated k times with window 8 / stride 4: distinct window
    // set = {P, rot4(P)} independent of k
    val m = Seq(
      (1L, "ABCDEFGH" * 2), (2L, "ABCDEFGH" * 5), (3L, "ZYXWVUTS" * 3)
    ).toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    val sh = Multimodal.mediaSimhash(m).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(2L),
      "same window set, different byte strings → identical signature")
    assert(sh(1L) !== sh(3L))
  }

  test("mediaNearDups: planted near-duplicates pair at hamming 0, " +
       "banded pipeline finds them and nothing else") {
    val m = Seq(
      (1L, "ABCDEFGH" * 2), (2L, "ABCDEFGH" * 4), (3L, "ABCDEFGH" * 5),
      (4L, "QRSTUVWX" * 3), (5L, "QRSTUVWX" * 2), (6L, "07162534" * 3)
    ).toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    val pairs = Multimodal.mediaNearDups(m)
      .as[(Long, Long, Int)].collect().toSet
    assert(pairs === Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0),
      (4L, 5L, 0)))
    // a single-byte corruption of a LARGE shared-window payload stays
    // within a few bits: most windows survive, so the signature moves
    // little — the perceptual property. 64 repeats = 127 windows, a
    // 1-byte edit corrupts ≤ 3 of them (plus ≤ 3 novel windows).
    val big = Seq(
      (10L, "ABCDEFGH" * 64),
      (11L, "ABCDEFGH" * 31 + "ABCDEFGX" + "ABCDEFGH" * 32)
    ).toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    val h = Multimodal.mediaSimhash(big).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(h(10L) ^ h(11L)) <= 16,
      "one corrupted byte must not rewrite the perceptual signature")
  }

  test("mediaDedupAgainstIndex: batch rows matching the standing index " +
       "die, new rows survive; extending the index catches re-ingests") {
    val corpus = Seq((1L, "ABCDEFGH" * 4), (2L, "QRSTUVWX" * 3))
      .toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    val index = Multimodal.mediaSimhash(corpus)
    // batch: 10 duplicates corpus 1 (same window set, different repeat
    // count), 11 is new, 12 duplicates corpus 2
    val batch = Seq((10L, "ABCDEFGH" * 2), (11L, "13572468" * 3),
        (12L, "QRSTUVWX" * 5))
      .toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    val surv = Multimodal.mediaDedupAgainstIndex(batch, index)
      .select("media_id").as[Long].collect().toSet
    assert(surv === Set(11L), s"only the new payload survives, got $surv")
    // extend the index with the survivor's signatures: a re-ingest of
    // the survivor (different repeat count) is now caught too
    val extended = index.unionByName(Multimodal.mediaSimhash(
      batch.filter(col("media_id") === 11L)))
    val reingest = Seq((20L, "13572468" * 6)).toDF("media_id", "t")
      .select(col("media_id"), col("t").cast("binary").as("payload"))
    assert(Multimodal.mediaDedupAgainstIndex(reingest, extended)
      .count() === 0, "extended index must catch the re-ingest")
  }
}
