package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Golden-file end-to-end test (the Spark twin of the reference's
  * integration suite, FIXTURES.md §A): the full config-driven pipeline
  * over the checked-in fixture tables must reproduce the frozen packet
  * JSONs byte-for-byte after normalizing `metaData.created`.
  *
  * Regenerate goldens (after reviewing the diff!) with
  * GOLDEN_RECORD=1 sbt "testOnly graft.GoldenE2eSpec".
  */
class GoldenE2eSpec extends SparkSpec {

  private val goldenDir = Paths.get("src/test/resources/golden").toAbsolutePath

  private def normalize(json: String): String =
    json.replaceAll("\"created\": \"[^\"]*\"", "\"created\": \"<CREATED>\"")

  test("config-driven pipeline reproduces the frozen golden packets") {
    val outDir = Files.createTempDirectory("golden_out")
    val raw = Files.readString(goldenDir.resolve("config.yaml"))
      .replace("${GOLDEN_DIR}", goldenDir.toString)
      .replace("${GOLDEN_OUT}", outDir.toString)
    val cfgPath = Files.createTempFile("golden_cfg", ".yaml")
    Files.writeString(cfgPath, raw)

    graft.config.ConfigRunner.run(spark, cfgPath.toString)

    val produced = Files.list(outDir).iterator().asScala.toSeq
      .map(_.getFileName.toString).sorted
    assert(produced == Seq("G-P001.json", "G-P002.json", "G-P003.json"))

    val expectedDir = goldenDir.resolve("expected")
    if (sys.env.contains("GOLDEN_RECORD")) {
      Files.createDirectories(expectedDir)
      produced.foreach { f =>
        Files.writeString(expectedDir.resolve(f),
          normalize(Files.readString(outDir.resolve(f))))
      }
      info(s"recorded ${produced.size} goldens to $expectedDir")
    } else {
      produced.foreach { f =>
        val actual = normalize(Files.readString(outDir.resolve(f)))
        val expected = Files.readString(expectedDir.resolve(f))
        assert(actual == expected, s"packet $f diverges from golden")
      }
    }
  }
}
