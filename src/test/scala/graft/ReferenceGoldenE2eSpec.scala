package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** THE functional baseline (BASELINE.md): the reference's own 8-packet
  * integration fixture — its 6 checked-in inputs
  * (`integration_tests/tests/assets/integration_test/input_data/`)
  * through the config-driven pipeline must reproduce its 8
  * independently-authored `expected_P00{1..8}.json`, after the
  * reference's own comparison normalizations
  * (`integration_tests/src/lib.rs:76-135`):
  *
  *   - `metaData.created` removed (run-time stamp);
  *   - `variationDescriptor.id` → TEST_ID (reference draws random UUIDs);
  *   - loinc resource version → "-" (client-version dependent);
  *   - `survivalTimeInDays` re-inserted as 0 where the loader
  *     suppressed it (`ensure_survival_time`).
  *
  * Unlike `GoldenE2eSpec` (self-recorded regression goldens), these
  * expected files were authored by the reference project — divergence
  * here is real semantic divergence.
  */
class ReferenceGoldenE2eSpec extends SparkSpec {

  private val fixtureDir = Paths.get("src/test/resources/refgolden").toAbsolutePath
  private val mapper = new ObjectMapper()

  test("reference integration fixture: all 8 expected packets reproduced") {
    val outDir = Files.createTempDirectory("refgolden_out")
    val raw = Files.readString(fixtureDir.resolve("config.yaml"))
      .replace("${REFGOLDEN_DIR}", fixtureDir.toString)
      .replace("${REFGOLDEN_OUT}", outDir.toString)
    val cfgPath = Files.createTempFile("refgolden_cfg", ".yaml")
    Files.writeString(cfgPath, raw)

    graft.config.ConfigRunner.run(spark, cfgPath.toString)

    val produced: Map[String, JsonNode] =
      Files.list(outDir).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".json"))
        .map(p => mapper.readTree(Files.readString(p)))
        .map(n => n.get("id").asText() -> n).toMap
    val expected: Map[String, JsonNode] =
      Files.list(fixtureDir.resolve("expected")).iterator().asScala.toSeq
        .filter(_.toString.endsWith(".json"))
        .map(p => mapper.readTree(Files.readString(p)))
        .map(n => n.get("id").asText() -> n).toMap

    assert(produced.keySet == expected.keySet,
      s"packet id sets differ: produced ${produced.keySet.toSeq.sorted}, " +
        s"expected ${expected.keySet.toSeq.sorted}")

    val failures = expected.keys.toSeq.sorted.flatMap { id =>
      val diffs = scala.collection.mutable.ArrayBuffer.empty[String]
      diff("$", normalize(expected(id)), normalize(produced(id)), diffs)
      if (diffs.isEmpty) Nil else Seq(s"== $id ==\n" + diffs.take(25).mkString("\n"))
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  // --- the reference's comparison normalizations ----------------------

  private def normalize(root: JsonNode): JsonNode = {
    val n = root.deepCopy[JsonNode]()
    // remove created
    Option(n.get("metaData")).foreach {
      case o: ObjectNode => o.remove("created")
      case _ => ()
    }
    // variationDescriptor ids → TEST_ID
    for {
      interp <- Option(n.get("interpretations")).toSeq.flatMap(_.elements().asScala)
      diag <- Option(interp.get("diagnosis"))
      gi <- Option(diag.get("genomicInterpretations")).toSeq.flatMap(_.elements().asScala)
      vi <- Option(gi.get("variantInterpretation"))
      vd <- Option(vi.get("variationDescriptor"))
    } vd.asInstanceOf[ObjectNode].put("id", "TEST_ID")
    // loinc version → "-"
    for {
      md <- Option(n.get("metaData"))
      rs <- Option(md.get("resources")).toSeq.flatMap(_.elements().asScala)
      if rs.get("id").asText() == "loinc"
    } rs.asInstanceOf[ObjectNode].put("version", "-")
    // ensure survivalTimeInDays (the loader suppresses 0)
    for {
      subj <- Option(n.get("subject"))
      vs <- Option(subj.get("vitalStatus"))
      if !vs.has("survivalTimeInDays")
    } vs.asInstanceOf[ObjectNode].put("survivalTimeInDays", 0)
    n
  }

  /** Recursive structural diff: object fields order-insensitive, arrays
    * order-sensitive, numbers compared by value (175 == 175.0).
    */
  private def diff(path: String, exp: JsonNode, act: JsonNode,
      out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    if (exp.isNumber && act.isNumber) {
      if (exp.doubleValue() != act.doubleValue())
        out += s"$path: expected ${exp.doubleValue()}, got ${act.doubleValue()}"
    } else if (exp.isObject && act.isObject) {
      val ek = exp.fieldNames().asScala.toSet
      val ak = act.fieldNames().asScala.toSet
      (ek -- ak).foreach(k => out += s"$path.$k: missing (expected ${exp.get(k)})")
      (ak -- ek).foreach(k => out += s"$path.$k: unexpected (got ${act.get(k)})")
      (ek intersect ak).foreach(k => diff(s"$path.$k", exp.get(k), act.get(k), out))
    } else if (exp.isArray && act.isArray) {
      if (exp.size() != act.size())
        out += s"$path: expected ${exp.size()} elements, got ${act.size()}"
      (0 until math.min(exp.size(), act.size())).foreach(i =>
        diff(s"$path[$i]", exp.get(i), act.get(i), out))
    } else if (exp != act) {
      out += s"$path: expected $exp, got $act"
    }
  }
}
