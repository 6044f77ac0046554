package graft.load

import graft.SparkSpec
import graft.collect.{Individual, MetaData, Phenopacket}

class FileSystemLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("sanitized filenames cannot collide across distinct packet ids") {
    // "site/001" and "site_001" both sanitize to site_001 — previously
    // the last partition to flush silently overwrote the other packet
    val packets = Seq(
      Phenopacket(id = "site/001", subject = Individual("P1"),
        metaData = MetaData("2024-01-01T00:00:00Z", "graft")),
      Phenopacket(id = "site_001", subject = Individual("P2"),
        metaData = MetaData("2024-01-01T00:00:00Z", "graft"))).toDS()
    val dir = java.nio.file.Files.createTempDirectory("fsl_").toString
    FileSystemLoader.load(packets, dir)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.length === 2, s"both packets must survive, got ${files.mkString(", ")}")
    // the already-safe id keeps its exact reference-contract name
    assert(files.contains("site_001.json"))
    assert(files.exists(f => f.startsWith("site_001-") && f.endsWith(".json")))
  }
}
