package graft.load

import graft.collect.{Phenopacket, PhenopacketJson}
import org.apache.spark.sql.Dataset

/** S6 — one pretty-printed `<packet id>.json` per phenopacket into a
  * directory (reference `phenoxtract/src/load/file_system_loader.rs:50-100`).
  *
  * Spark shape: `foreachPartition` writer — each executor writes its own
  * partition's packets directly (one small file per document is the
  * contract, same as the reference; at real scale you'd point this at
  * an object store and/or switch to `write.json` row files — provided
  * here as `writeJsonl`).
  */
object FileSystemLoader {

  def load(packets: Dataset[Phenopacket], outDir: String, createDir: Boolean = true): Unit = {
    if (createDir) new java.io.File(outDir).mkdirs()
    val dir = outDir
    packets.foreachPartition { (it: Iterator[Phenopacket]) =>
      it.foreach { p =>
        val path = java.nio.file.Paths.get(dir, s"${sanitize(p.id)}.json")
        java.nio.file.Files.writeString(path, PhenopacketJson.render(p))
      }
    }
  }

  /** Scale-path alternative: one JSON document per line, written by
    * Spark's distributed writer (no per-file overhead at 10^8 packets).
    */
  def writeJsonl(packets: Dataset[Phenopacket], outDir: String): Unit = {
    val spark = packets.sparkSession
    import spark.implicits._
    packets.map(p => PhenopacketJson.render(p, pretty = false))
      .write.mode("overwrite").text(outDir)
  }

  private def sanitize(id: String): String = id.replaceAll("[^A-Za-z0-9._-]", "_")
}
