package graft.ontology

import org.scalatest.funsuite.AnyFunSuite

/** A stand-in "remote" resolver for the reflective-load and fallback
  * tests: answers a fixed term, counts calls (what a cache must bound).
  */
class StubRemoteResolver(library: BiDictLibrary) extends TermResolver {
  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    if (value == "remote-only term") {
      StubRemoteResolver.calls.incrementAndGet()
      Some((OntologyClass("RT:1", "Remote Term"), StubRemoteResolver.res))
    } else {
      StubRemoteResolver.calls.incrementAndGet()
      None
    }
}
object StubRemoteResolver {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
  val res = Resource("rt", "Remote", "http://example.invalid", "1", "RT", "")
}

class TermResolverSpec extends AnyFunSuite {

  private val hpoRes = Resource("hp", "HPO", "http://example.invalid/hp", "1", "HP", "")
  private val lib = BiDictLibrary(Seq(BiDict.fromEntries(hpoRes, Seq(
    ("HP:0000001", "Seizure", Seq("fits")),
    ("HP:0000002", "Fever", Seq.empty)))))

  test("offline resolver delegates to the dictionary library") {
    val r = TermResolver.offline(lib)
    assert(r.resolveIn("hpo", "Seizure").map(_._1) == Some(OntologyClass("HP:0000001", "Seizure")))
    assert(r.resolveIn("hpo", "HP:0000002").map(_._1.label) == Some("Fever"))
    assert(r.resolveIn("hpo", "nope").isEmpty)
    val e = intercept[NoSuchElementException](r.resolveInOrThrow("hpo", "nope"))
    assert(e.getMessage.contains("nope") && e.getMessage.contains("hp"))
  }

  test("cached resolver memoizes hits AND misses per (scope, value)") {
    val counting = new TermResolver {
      val calls = new java.util.concurrent.atomic.AtomicInteger(0)
      def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] = {
        calls.incrementAndGet()
        lib.resolveIn(scope, value)
      }
    }
    val cached = CachedResolver(counting, maxEntries = 10)
    (1 to 100).foreach { _ =>
      assert(cached.resolveIn("hpo", "Seizure").nonEmpty)
      assert(cached.resolveIn("hpo", "unknown-term").isEmpty)
    }
    assert(counting.calls.get() == 2, "one base call per distinct key, hits and misses alike")
    // distinct scopes are distinct cache keys
    cached.resolveIn("other", "Seizure")
    assert(counting.calls.get() == 3)
  }

  test("cached resolver survives serialization with a fresh per-JVM cache") {
    val cached = CachedResolver(TermResolver.offline(lib), maxEntries = 10)
    cached.resolveIn("hpo", "Seizure") // warm the transient cache
    val bytes = new java.io.ByteArrayOutputStream()
    new java.io.ObjectOutputStream(bytes).writeObject(cached)
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
      .asInstanceOf[CachedResolver]
    assert(back.resolveIn("hpo", "fits").map(_._1.id) == Some("HP:0000001"))
  }

  test("rate-limited resolver blocks once the burst is spent") {
    val limited = RateLimitedResolver(TermResolver.offline(lib), permitsPerSecond = 50.0)
    val t0 = System.nanoTime()
    (1 to 60).foreach(_ => limited.resolveIn("hpo", "Seizure"))
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    // 50-token burst + 10 throttled calls at 50/s ≈ 200 ms of waiting
    assert(elapsedMs >= 150, s"expected throttling past the burst, took $elapsedMs ms")
  }

  test("wrapped stack: offline answers first, the remote side only sees unknowns") {
    StubRemoteResolver.calls.set(0)
    val stack = TermResolver.wrapped(new StubRemoteResolver(lib), offline = lib,
      cacheSize = 100)
    // dictionary hit: remote never called, no rate-limit token spent
    (1 to 50).foreach(_ =>
      assert(stack.resolveIn("hpo", "Seizure").map(_._2.id) == Some("hp")))
    assert(StubRemoteResolver.calls.get() == 0)
    // dictionary miss: remote called ONCE, then served from the cache
    (1 to 50).foreach(_ =>
      assert(stack.resolveIn("hpo", "remote-only term").map(_._1.id) == Some("RT:1")))
    assert(StubRemoteResolver.calls.get() == 1)
  }

  test("reflective construction loads a (BiDictLibrary) constructor class") {
    val r = TermResolver.custom("graft.ontology.StubRemoteResolver", lib)
    assert(r.resolveIn("hpo", "remote-only term").map(_._1.id) == Some("RT:1"))
    val bad = intercept[IllegalArgumentException](
      TermResolver.custom("java.lang.String", lib))
    assert(bad.getMessage.contains("TermResolver"))
  }

  test("assembly accepts a custom resolver and records its resource provenance") {
    import graft.collect._
    val facts = Seq(
      Fact(subject = "P1", src = 0, table = "t", seq = 0, idx = 0, block = "",
        kind = FactKinds.HpoCell, hpo = "remote-only term"))
    val stack = TermResolver.wrapped(new StubRemoteResolver(lib), offline = lib)
    val p = Assembler.assembleOne("P1", facts, lib, AssemblerConfig("c"),
      termResolver = Some(stack))
    assert(p.phenotypicFeatures.exists(_.`type`.id == "RT:1"))
    assert(p.metaData.resources.exists(_.id == "rt"))
  }

  test("BiDict rejects a normalized label mapping to two different term ids") {
    // 'Fever' and 'FEVER' collapse to one normalized key — toMap would
    // silently keep the last entry and resolve('Fever') could return
    // either term depending on load order
    val r = Resource("hp", "HPO", "u", "v", "HP", "i")
    val e = intercept[IllegalArgumentException] {
      BiDict.fromEntries(r, Seq(
        ("HP:1", "Fever", Seq.empty), ("HP:2", "FEVER", Seq.empty)))
    }
    assert(e.getMessage.contains("conflicting"))
    val e2 = intercept[IllegalArgumentException] {
      BiDict.fromEntries(r, Seq(
        ("HP:1", "Fever", Seq("pyrexia")), ("HP:2", "Chill", Seq("Pyrexia"))))
    }
    assert(e2.getMessage.contains("synonym"))
    // repeats of the SAME mapping are harmless
    val ok = BiDict.fromEntries(r, Seq(
      ("HP:1", "Fever", Seq("fever", "febrile")), ("HP:2", "Chill", Seq.empty)))
    assert(ok.resolve("FEVER").map(_.id).contains("HP:1"))
  }
}
