package graft

import org.apache.spark.sql.functions._

/** Manifest-width commit probe (VERDICT r18 item 6): measure that a
  * paged table's one-bucket commit cost is O(touched pages + root) —
  * i.e. FLAT in table width — while the inline layout's grows with the
  * full (bucket, file) list. Builds a wide table (default 200k buckets,
  * ~95% non-empty) once per layout, then times single-key upserts and
  * accounts the MANIFEST I/O of the last commit exactly: page files
  * (re)written at that version, their byte size, and the root's line
  * count/bytes — wall time has data-side noise (both layouts pay the
  * same one-bucket parquet read/merge/write), the I/O accounting is
  * decisive.
  *
  * Usage: `sbt "runMain graft.ProbeManifestWidth [workDir] [nBuckets]
  * [pageBuckets]"` — prints one JSON line per layout. A harness
  * utility like [[StressProbe]], not part of the library surface.
  */
object ProbeManifestWidth {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft-widthprobe")
    val nBuckets = args.lift(1).map(_.toInt).getOrElse(200000)
    val pageB = args.lift(2).map(_.toInt).getOrElse(1000)
    val spark = SparkSessionFactory.create(appName = "graft-width")
    import spark.implicits._
    import graft.sources.ManifestTable
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    for (layout <- Seq("paged", "inline")) {
      val table = s"$base/$layout-$nBuckets"
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      // ~3 keys per bucket -> ~95% of buckets non-empty, 1 file each
      val wide = spark.range(0L, nBuckets.toLong * 3)
        .select(col("id").as("k"), lit("x").as("v"))
      val b0 = System.nanoTime()
      ManifestTable.upsertBatch(wide, table, Seq("k"), None,
        nBuckets = nBuckets, batchId = 0L,
        pageBuckets = if (layout == "paged") pageB else 0)
      val buildSec = (System.nanoTime() - b0) / 1e9
      val width = ManifestTable.currentFiles(spark, table).size
      // five single-key upserts (one touched bucket each), timed
      val times = (1 to 5).map { i =>
        val one = Seq((7L + i, s"u$i")).toDF("k", "v")
        val t0 = System.nanoTime()
        ManifestTable.upsertBatch(one, table, Seq("k"), None,
          nBuckets = nBuckets, batchId = i.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      // exact manifest I/O of the LAST commit: files written at v6
      val mdir = new org.apache.hadoop.fs.Path(table, "_manifests")
      val lastV = 6
      def ls(p: org.apache.hadoop.fs.Path) =
        if (fs.exists(p)) fs.listStatus(p).toSeq else Seq.empty
      val rootF = ls(mdir).filter(_.getPath.getName == s"v$lastV.txt")
      val pagesAll = ls(new org.apache.hadoop.fs.Path(mdir, "pages"))
      val pagesAtV = pagesAll.filter(_.getPath.getName.endsWith(s"-v$lastV.txt"))
      val rootBytes = rootF.map(_.getLen).sum
      val rootLines = rootF.headOption.map { f =>
        scala.io.Source.fromInputStream(fs.open(f.getPath)).getLines().size
      }.getOrElse(0)
      println(s"""{"layout":"$layout","n_buckets":$nBuckets,""" +
        s""""page_buckets":${if (layout == "paged") pageB else 0},""" +
        s""""manifest_width":$width,"build_sec":${f"$buildSec%.1f"},""" +
        s""""upsert_sec":[${times.map(t => f"$t%.3f").mkString(",")}],""" +
        s""""last_commit_pages_written":${pagesAtV.size},""" +
        s""""last_commit_page_bytes":${pagesAtV.map(_.getLen).sum},""" +
        s""""total_pages":${pagesAll.map(_.getPath.getName)
          .map(_.split("-v")(0)).distinct.size},""" +
        s""""root_lines":$rootLines,"root_bytes":$rootBytes}""")
    }
    spark.stop()
  }
}
