package graft

import org.apache.spark.sql.functions._

/** Incremental substring-index probe at scale (VERDICT r18 item 3): the
  * claim that matters at 100 TB is a SMALL batch against a LARGE
  * standing index — build the distinct window-hash index over a corpus,
  * commit it through the paged ManifestTable, EXTEND it with a small
  * batch (counting pages rewritten vs total pages), then probe a small
  * batch against the read-back artifact, with shuffle-byte telemetry
  * per phase. Run once against the sf0.1 corpus and once against a
  * 100× corpus with the SAME batch: probe bytes should be ~flat
  * (O(batch), the two-step semi-join broadcasts the batch side) and
  * extend-commit page rewrites should track the batch's touched
  * buckets, not the index width.
  *
  * Usage: `sbt "runMain graft.ProbeSubstrIndex <corpusDocsParquet>
  * <batchDocsParquet> [workDir] [n] [nBuckets] [pageBuckets]"` —
  * prints one JSON line. Harness utility like [[StressProbe]].
  */
object ProbeSubstrIndex {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProbeSubstrIndex <corpusDocs> <batchDocs> [extendDocs]" +
        " [workDir] [n] [nBuckets] [pageBuckets]")
    val corpusPath = args(0)
    val batchPath = args(1)
    // the EXTEND commit models "ingest a handful of documents": its
    // windows hash uniformly, so page-rewrite locality only shows when
    // the batch's window count sits well under the bucket count —
    // default to the probe batch when no separate small batch is given
    val extendPath = args.lift(2).filter(_ != "-").getOrElse(batchPath)
    val work = args.lift(3).getOrElse("/tmp/graft-substrprobe")
    val n = args.lift(4).map(_.toInt).getOrElse(8)
    val nBuckets = args.lift(5).map(_.toInt).getOrElse(4096)
    val pageB = args.lift(6).map(_.toInt).getOrElse(64)
    val spark = SparkSessionFactory.create(appName = "graft-substr")
    val sc = spark.sparkContext
    import graft.sources.ManifestTable
    import graft.operators.Dedup
    val read = new java.util.concurrent.atomic.AtomicLong
    val written = new java.util.concurrent.atomic.AtomicLong
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          ev: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val m = ev.stageInfo.taskMetrics
        if (m != null) {
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def mb(l: Long): Double = math.round(l / 1048.576) / 1000.0
    def phase[A](body: => A): (A, Double, Double, Double) = {
      read.set(0); written.set(0)
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerDrain.drain(sc)
      (r, sec, mb(read.get), mb(written.get))
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(sc.hadoopConfiguration)
    val idxPath = s"$work/substr_index"
    fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
    val corpus = spark.read.parquet(corpusPath).select("doc_id", "text")
    val batch = spark.read.parquet(batchPath).select("doc_id", "text")

    // 1. build + commit the standing index (one-time cost, amortized)
    val (_, buildSec, buildRd, buildWr) = phase {
      ManifestTable.upsertBatch(
        Dedup.substrIndex(corpus, "doc_id", "text", n = n),
        idxPath, Seq("wh1", "wh2"), nBuckets = nBuckets, batchId = 0L,
        pageBuckets = pageB)
    }
    val idxRows = ManifestTable.read(spark, idxPath).count()
    // 2. EXTEND with a small ingest's windows (the per-ingest commit)
    val extend = spark.read.parquet(extendPath).select("doc_id", "text")
    val (_, extSec, extRd, extWr) = phase {
      ManifestTable.upsertBatch(
        Dedup.substrIndex(extend, "doc_id", "text", n = n),
        idxPath, Seq("wh1", "wh2"), batchId = 1L, nBuckets = nBuckets)
    }
    val pdir = new org.apache.hadoop.fs.Path(s"$idxPath/_manifests/pages")
    val pageFiles = fs.listStatus(pdir).map(_.getPath.getName)
    val pagesV2 = pageFiles.count(_.endsWith("-v2.txt"))
    val totalPages = pageFiles.map(_.split("-v")(0)).distinct.length
    // 3. probe a small batch against the read-back standing artifact
    val idx = ManifestTable.read(spark, idxPath)
    val (probeRows, probeSec, probeRd, probeWr) = phase {
      Dedup.substringSpansAgainstIndex(batch, idx, "doc_id", "text",
          n = n)
        .queryExecution.executedPlan.execute().count()
    }
    println(s"""{"corpus":"$corpusPath","batch":"$batchPath",""" +
      s""""index_rows":$idxRows,"n_buckets":$nBuckets,""" +
      s""""page_buckets":$pageB,"total_pages":$totalPages,""" +
      s""""build":{"sec":${f"$buildSec%.1f"},"rd_mb":$buildRd,"wr_mb":$buildWr},""" +
      s""""extend":{"sec":${f"$extSec%.1f"},"rd_mb":$extRd,"wr_mb":$extWr,"pages_rewritten":$pagesV2},""" +
      s""""probe":{"sec":${f"$probeSec%.1f"},"rd_mb":$probeRd,"wr_mb":$probeWr,"rows":$probeRows}}""")
    spark.stop()
  }
}
