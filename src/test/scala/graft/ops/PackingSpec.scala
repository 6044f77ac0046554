package graft.ops

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packing: exclusive-prefix assignment, straddling docs stay in their first pack") {
    val docs = Seq((0L, 4L), (8L, 4L), (16L, 4L), (24L, 5L)).toDF("id", "toks")
    // one shard (ids all ≡ 0 mod 1): prefixes 0, 4, 8, 12 → packs 0, 0, 0, 1;
    // the id=16 doc spans tokens 8..12, straddling the budget-10 cut — pack 0.
    val out = Packing.packSequences(docs, "id", "toks", budget = 10L, shards = 1)
      .select("id", "pack").as[(Long, Long)].collect().toMap
    assert(out === Map(0L -> 0L, 8L -> 0L, 16L -> 0L, 24L -> 1L))
  }

  test("changelog compaction: latest version wins, latest-delete removes the id") {
    val log = Seq(
      (1L, 10L, "U", "v1"), (1L, 20L, "U", "v2"),            // → v2
      (2L, 10L, "U", "x1"), (2L, 30L, "D", "gone"),          // latest is delete → absent
      (3L, 5L, "D", "dead"), (3L, 9L, "U", "revived"),       // delete then re-insert → present
      (4L, 1L, "U", "only")).toDF("id", "seq", "op", "val")
    val out = Changelog.compact(log, "id", "seq", "op", Seq("val"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "v2", 3L -> "revived", 4L -> "only"))
  }

  test("packing rejects non-numeric ids eagerly; changelog keeps ids with null latest op") {
    val strIds = Seq(("u-1", 5L)).toDF("id", "toks")
    assertThrows[IllegalArgumentException] {
      Packing.packSequences(strIds, "id", "toks", 10L, 2)
    }
    val log = Seq((1L, 1L, Option("U"), "x"), (1L, 2L, None: Option[String], "y"))
      .toDF("id", "seq", "op", "val")
    val out = Changelog.compact(log, "id", "seq", "op", Seq("val"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "y"), "null op is not a delete")
  }

  test("changelog compaction: a null payload value on the winning version survives") {
    val log = Seq(
      (1L, 1L, "U", Some("old")), (1L, 2L, "U", None: Option[String]))
      .toDF("id", "seq", "op", "val")
    val out = Changelog.compact(log, "id", "seq", "op", Seq("val"))
      .as[(Long, Option[String])].collect().toMap
    assert(out === Map(1L -> None), "latest version's null must not fall back to v1")
  }

  test("snapshot diff classifies added/removed/changed/unchanged") {
    val vOld = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "de"))
      .toDF("id", "text", "lang")
    val vNew = Seq((2L, "b", "en"), (3L, "c CHANGED", "de"), (4L, "d", "fr"))
      .toDF("id", "text", "lang")
    val out = Changelog.snapshotDiff(vOld, vNew, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("snapshot diff: null-vs-value content changes, column boundary respected") {
    val vOld = Seq((1L, Option("x"), Option("y")), (2L, Option("xy"), None))
      .toDF("id", "a", "b")
    val vNew = Seq((1L, None: Option[String], Option("y")), (2L, Option("x"), Option("y")))
      .toDF("id", "a", "b")
    val out = Changelog.snapshotDiff(vOld, vNew, "id", Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    // (x, y) → (null, y) is a change; ("xy", null) vs ("x", "y") must
    // NOT collide via concatenation — the separator keeps columns apart
    assert(out == Map(1L -> "changed", 2L -> "changed"))
  }

  test("packing: shards are independent streams; every doc lands in exactly one pack") {
    val docs = (0L until 1000L).map(i => (i, 100L + i % 7)).toDF("id", "toks")
    val out = Packing.packSequences(docs, "id", "toks", budget = 512L, shards = 4)
    assert(out.count() === 1000L)
    val byShard = out.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet === Set(0L, 1L, 2L, 3L))
    assert(byShard.values.sum === 1000L)
    // reference recomputation: per shard, in id order, pack must equal
    // floor(exclusive-prefix / budget)
    val rows = out.select("id", "toks", "shard", "pack")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._3).foreach { case (s, docs) =>
      var prefix = 0L
      docs.sortBy(_._1).foreach { case (id, toks, _, pack) =>
        assert(pack === prefix / 512L, s"doc $id in shard $s: pack $pack, prefix $prefix")
        prefix += toks
      }
    }
    // determinism: re-run identical
    val again = Packing.packSequences(docs.repartition(13), "id", "toks", 512L, 4)
      .select("id", "pack").as[(Long, Long)].collect().toMap
    val first = out.select("id", "pack").as[(Long, Long)].collect().toMap
    assert(again === first, "packing must not depend on input partitioning")
  }
}
