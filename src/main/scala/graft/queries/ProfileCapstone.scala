package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** TEMP (r11 optimization round): time the capstone's stages in
  * isolation — quality head, minhash pairs, anti-join, substring, pack
  * — to attribute pipeline_pretrain_corpus's bench cost. Not part of
  * the driver contract; delete when the round's plan work is done.
  */
object ProfileCapstone {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val base = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val seeded0 = DedupOps.seedMarkerDups(base)
    val hdr = "standard corpus licence header text repeated across every seventh document intake here"
    val seeded = seeded0.withColumn("text",
      when(pmod(col("doc_id"), lit(7)) === 0,
        concat(lit(hdr + " "), col("text"))).otherwise(col("text")))

    (1 to 2).foreach { pass =>
      println(s"=== pass $pass ===")
      spark.sharedState.cacheManager.clearCache()
      val q = PipelineOps.pretrainQuality(seeded)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("quality (q materialize)") { noop(q) }
      val pairs = graft.ops.Dedup.minhashLshPairs(q, "doc_id", "clean",
        n = PipelineOps.pretrainShingleN,
        numHashes = PipelineOps.pretrainNumHashes,
        bands = PipelineOps.pretrainBands,
        threshold = PipelineOps.pretrainThreshold,
        family = PipelineOps.pretrainMinhashFamily)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("minhash pairs") { noop(pairs) }
      val kept = q.join(pairs.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("kept anti-join") { noop(kept) }
      val sub = graft.ops.Dedup.substringDedup(kept, "doc_id", "clean",
        k = PipelineOps.pretrainK,
        family = PipelineOps.pretrainSubstringFamily)
        .persist(StorageLevel.MEMORY_AND_DISK)
      time("substring dedup") { noop(sub) }
      val packed = PipelineOps.pretrainPack(
        PipelineOps.pretrainManifest(sub))
      time("manifest+pack") { noop(packed) }
      Seq(q, pairs, kept, sub).foreach(_.unpersist())
      // Whole query, unprofiled, for the end-to-end number.
      time("FULL capstone") {
        noop(graft.SparkEntry.queries("pipeline_pretrain_corpus")(spark, sfDir))
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
