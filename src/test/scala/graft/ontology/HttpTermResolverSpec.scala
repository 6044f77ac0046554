package graft.ontology

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Integration tests for [[HttpTermResolver]] against a local mock
  * HTTP server (the reference integration-tests its clients against
  * HTTP mocks the same way, SURVEY §5.2) — zero egress: the server
  * binds 127.0.0.1 on an ephemeral port for the test's lifetime.
  */
class HttpTermResolverSpec extends AnyFunSuite {

  private val hits = new java.util.concurrent.atomic.AtomicInteger(0)

  /** scope=hpo knows one term; "flaky term" 500s; everything else 404s. */
  private def withServer(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/resolve", (x: HttpExchange) => {
      hits.incrementAndGet()
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
      val reply: (Int, String) =
        if (params.get("query").contains("flaky term")) (500, "transient blip")
        else if (auth.exists(_.startsWith("Basic ")) &&
            params.get("scope").contains("hpo") &&
            params.get("query").contains("remote seizure")) (200,
          """{"id": "HP:0001250", "label": "Seizure",
            | "resource": {"id": "hp", "name": "HPO",
            |   "url": "http://purl.example/hp.owl", "version": "2024-01-01",
            |   "namespace_prefix": "HP",
            |   "iri_prefix": "http://purl.example/HP_"}}""".stripMargin)
        else (404, """{"error": "not found"}""")
      val bytes = reply._2.getBytes("UTF-8")
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(reply._1, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/resolve")
    finally server.stop(0)
  }

  private val dictRes = Resource("hp", "HPO", "http://example.invalid/hp", "1", "HP", "")
  private val lib = BiDictLibrary(Seq(BiDict.fromEntries(dictRes, Seq(
    ("HP:0000001", "Known Term", Seq.empty)))))

  test("resolves 200 JSON, returns None on 404, THROWS on 5xx") {
    withServer { url =>
      val r = HttpTermResolver(url, user = Some("u"), password = Some("p"))
      val hit = r.resolveIn("hpo", "remote seizure")
      assert(hit.map(_._1) == Some(OntologyClass("HP:0001250", "Seizure")))
      assert(hit.map(_._2.version) == Some("2024-01-01"))
      assert(hit.map(_._2.namespacePrefix) == Some("HP"))
      assert(r.resolveIn("hpo", "no such term").isEmpty)
      val e = intercept[java.io.IOException](r.resolveIn("hpo", "flaky term"))
      assert(e.getMessage.contains("500"))
    }
  }

  test("without credentials the mock denies the term (auth header is sent only when configured)") {
    withServer { url =>
      assert(HttpTermResolver(url).resolveIn("hpo", "remote seizure").isEmpty)
    }
  }

  test("wrapped stack: offline-first, one HTTP call per distinct term, 5xx never poisons the cache") {
    withServer { url =>
      hits.set(0)
      val stack = TermResolver.wrapped(
        HttpTermResolver(url, user = Some("u"), password = Some("p")),
        offline = lib, cacheSize = 100)
      // dictionary term: zero network traffic
      (1 to 20).foreach(_ =>
        assert(stack.resolveIn("hpo", "Known Term").map(_._1.id) == Some("HP:0000001")))
      assert(hits.get() == 0)
      // unknown-to-dictionary term: exactly ONE request, then cached
      (1 to 20).foreach(_ =>
        assert(stack.resolveIn("hpo", "remote seizure").map(_._1.id) == Some("HP:0001250")))
      assert(hits.get() == 1)
      // 404 miss: memoized like the reference's NOT_FOUND cache entries
      (1 to 20).foreach(_ => assert(stack.resolveIn("hpo", "really unknown").isEmpty))
      assert(hits.get() == 2)
      // 5xx: throws through, and the NEXT call retries (not memoized)
      intercept[java.io.IOException](stack.resolveIn("hpo", "flaky term"))
      intercept[java.io.IOException](stack.resolveIn("hpo", "flaky term"))
      assert(hits.get() == 4, "transient failures must not be cached as misses")
    }
  }

  test("survives java serialization (ships in the assembly closure)") {
    withServer { url =>
      val r = HttpTermResolver(url, user = Some("u"), password = Some("p"))
      val bytes = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bytes).writeObject(r)
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
        .asInstanceOf[HttpTermResolver]
      assert(back.resolveIn("hpo", "remote seizure").map(_._1.id) == Some("HP:0001250"))
    }
  }

  test("config round-trip: resolver class 'http' builds the wrapped stack") {
    withServer { url =>
      val dir = java.nio.file.Files.createTempDirectory("graft_http_cfg")
      val terms = dir.resolve("terms.csv")
      java.nio.file.Files.writeString(terms, "id,label,synonyms\nHP:0000001,Known Term,\n")
      val cfg = dir.resolve("config.yaml")
      java.nio.file.Files.writeString(cfg,
        s"""pipeline:
           |  meta_data:
           |    created_by: test
           |    cohort_name: c
           |    hpo_resource:
           |      id: hp
           |      name: HPO
           |      url: http://example.invalid/hp
           |      version: "1"
           |      namespace_prefix: HP
           |      terms_file: ${terms.toString}
           |  resolver:
           |    class: http
           |    url: $url
           |    user: u
           |    password: p
           |    cache_size: 50
           |""".stripMargin)
      val loaded = graft.config.ConfigLoader.load(cfg.toString)
      assert(loaded.resolver.map(_.className) == Some("http"))
      val library = graft.config.ConfigRunner.buildLibrary(loaded)
      val stack = graft.config.ConfigRunner.buildResolver(loaded, library)
        .getOrElse(fail("resolver block must build a stack"))
      assert(stack.resolveIn("hpo", "Known Term").map(_._1.id) == Some("HP:0000001"))
      assert(stack.resolveIn("hpo", "remote seizure").map(_._1.id) == Some("HP:0001250"))
      // a missing url fails loudly at build time, not first use
      val noUrl = loaded.copy(resolver = loaded.resolver.map(_.copy(url = None)))
      val err = intercept[IllegalArgumentException](
        graft.config.ConfigRunner.buildResolver(noUrl, library))
      assert(err.getMessage.contains("url"))
    }
  }
}
