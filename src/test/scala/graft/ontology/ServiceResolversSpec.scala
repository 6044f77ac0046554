package graft.ontology

import java.net.InetSocketAddress
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** Mock-server specs for the per-service REST adapters, mirroring the
  * reference's own HTTP-mock tests (`loinc_client.rs:269-360`,
  * `bioportal_client.rs:347-520` use mockito the same way). Zero
  * egress: servers bind 127.0.0.1 ephemeral ports per test.
  */
class ServiceResolversSpec extends AnyFunSuite {

  private def serve(handler: HttpExchange => (Int, String))(body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (x: HttpExchange) => {
      val (code, payload) = handler(x)
      val bytes = payload.getBytes("UTF-8")
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(code, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  // ---- LOINC ----

  /** The reference's response envelope (`loinc_client.rs:32-102`):
    * PascalCase summary + SHOUTING result fields.
    */
  private def loincBody(results: String*) =
    s"""{"ResponseSummary": {"RecordsFound": ${results.size},
       |  "StartingOffset": 0, "RowsReturned": ${results.size},
       |  "LoincVersion": "2.77", "Copyright": "c", "QueryUrl": "q",
       |  "QueryExecutionTime": "1ms", "QueryDuration": 0.001},
       | "Results": [${results.mkString(",")}]}""".stripMargin

  private val glucoseResult =
    """{"LOINC_NUM": "2345-7", "COMPONENT": "Glucose", "PROPERTY": "MCnc",
      | "TIME_ASPCT": "Pt", "SYSTEM": "Ser/Plas", "SCALE_TYP": "Qn",
      | "CLASS": "CHEM", "VersionLastChanged": "2.50", "CHNG_TYPE": "MIN",
      | "STATUS": "ACTIVE", "CLASSTYPE": 1, "RELATEDNAMES2": "Gluc",
      | "SHORTNAME": "Glucose SerPl-mCnc",
      | "LONG_COMMON_NAME": "Glucose [Mass/volume] in Serum or Plasma",
      | "LHCForms": "", "FormalName": "Glucose:MCnc:Pt:Ser/Plas:Qn",
      | "Tags": [], "Link": "https://loinc.org/2345-7"}""".stripMargin

  private def loincHandler(x: HttpExchange): (Int, String) = {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
    val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "u:p".getBytes("UTF-8"))
    if (!auth.contains(expected)) (401, """{"error": "unauthorized"}""")
    else {
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      val query = q.split("&").collectFirst {
        case kv if kv.startsWith("query=") =>
          java.net.URLDecoder.decode(kv.drop(6), "UTF-8")
      }.getOrElse("")
      if (x.getRequestURI.getPath != "/loincs") (404, "{}")
      else if (query == "2345-7" || query == "LOINC:2345-7" ||
        query.equalsIgnoreCase("Glucose Massvolume in Serum or Plasma"))
        (200, loincBody(glucoseResult))
      else if (query == "boom") (500, """{"error": "blip"}""")
      else (200, loincBody()) // empty Results — authoritative miss
    }
  }

  test("loinc: id→label on bare and CURIE codes, version from the summary") {
    serve(loincHandler) { base =>
      val r = LoincResolver(base, "u", "p")
      for (in <- Seq("2345-7", "LOINC:2345-7")) {
        val hit = r.resolveIn("assay", in)
        assert(hit.map(_._1) == Some(OntologyClass("LOINC:2345-7",
          "Glucose [Mass/volume] in Serum or Plasma")), s"input $in")
        assert(hit.map(_._2.version) == Some("2.77"))
        assert(hit.map(_._2.namespacePrefix) == Some("LOINC"))
      }
    }
  }

  test("loinc: label→id strips punctuation and matches LONG_COMMON_NAME case-insensitively") {
    serve(loincHandler) { base =>
      val r = LoincResolver(base, "u", "p")
      // the mock only answers the CLEANED query (brackets/slash stripped),
      // proving the reference's punctuation-stripping step runs
      // (loinc_client.rs:224-229); the match is against the ORIGINAL label
      val hit = r.resolveIn("assay", "Glucose [Mass/volume] in Serum or Plasma")
      assert(hit.map(_._1.id) == Some("LOINC:2345-7"))
      // empty Results for the cleaned query → authoritative miss
      assert(r.resolveIn("assay", "Glucose").isEmpty)
      // NON-empty results with no exact LONG_COMMON_NAME match must
      // THROW, not miss: the true match may rank below the rows cap,
      // and a cached None would silently drop the term forever (the
      // reference raises a Caching error here, loinc_client.rs:245-249)
      intercept[java.io.IOException](
        r.resolveIn("assay", "Glucose Massvolume in Serum or Plasma"))
    }
  }

  test("resolver toString redacts credentials (logs, task-serialization errors)") {
    val loinc = LoincResolver("http://x", "alice", "S3cretPw")
    val bio = BioPortalResolver("http://y", "myApiKey", "OMIM")
    val scoped = ScopedResolver(Map("assay" -> loinc, "disease" -> bio))
    for (s <- Seq(loinc.toString, bio.toString, scoped.toString)) {
      assert(!s.contains("S3cretPw"), s)
      assert(!s.contains("myApiKey"), s)
      assert(!s.contains("alice"), s)
    }
  }

  test("bioportal: a space in the local id rides the PATH as %20, never '+'") {
    val handler: HttpExchange => (Int, String) = { x =>
      val raw = x.getRequestURI.getRawPath
      if (raw.contains("%2F") && raw.endsWith("some%20id"))
        (200, """{"prefLabel": "Spaced",
                | "@id": "http://purl.bioontology.org/ontology/OMIM/some id",
                | "synonym": []}""".stripMargin)
      // a literal '+' in the path means form encoding leaked into the
      // IRI — the service would look up the WRONG class; answer 404 so
      // the regression shows as a spurious miss
      else (404, "{}")
    }
    serve(handler) { base =>
      val r = BioPortalResolver(base, "TEST_KEY", "OMIM")
      val hit = r.resolveIn("disease", "OMIM:some id")
      assert(hit.map(_._1.label) == Some("Spaced"))
    }
  }

  test("loinc: empty Results is an authoritative miss; 5xx and bad auth throw") {
    serve(loincHandler) { base =>
      val r = LoincResolver(base, "u", "p")
      assert(r.resolveIn("assay", "no such code 9999-9").isEmpty)
      intercept[java.io.IOException](r.resolveIn("assay", "boom"))
      val bad = LoincResolver(base, "u", "WRONG")
      intercept[java.io.IOException](bad.resolveIn("assay", "2345-7"))
    }
  }

  // ---- BioPortal ----

  /** Mirrors `bioportal_client.rs` mock bodies: prefLabel/@id/synonym. */
  private def bioportalHandler(x: HttpExchange): (Int, String) = {
    val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
    if (!auth.contains("apikey token=TEST_KEY")) (401, """{"error": "unauthorized"}""")
    else {
      val path = java.net.URLDecoder.decode(x.getRequestURI.getPath, "UTF-8")
      val q = Option(x.getRequestURI.getRawQuery).getOrElse("")
      if (path.startsWith("/ontologies/OMIM/classes/")) {
        // class endpoint: the IRI must ride URL-ENCODED as ONE segment
        // (reference test_class_url_contains_encoded_iri) — an
        // unencoded IRI means extra path segments, rejected as 400
        val raw = x.getRequestURI.getRawPath.drop("/ontologies/OMIM/classes/".length)
        if (!raw.contains("%2F")) (400, """{"error": "IRI must be encoded"}""")
        else if (path.endsWith("/OMIM/147920"))
          (200, """{"prefLabel": "KABUKI SYNDROME 1",
                  | "@id": "http://purl.bioontology.org/ontology/OMIM/147920",
                  | "synonym": ["Kabuki syndrome type 1"]}""".stripMargin)
        else if (path.endsWith("/OMIM/500000")) (500, """{"error": "blip"}""")
        else if (path.endsWith("/OMIM/600000"))
          (200, """{"@id": "http://purl.bioontology.org/ontology/OMIM/600000",
                  | "synonym": []}""".stripMargin) // no prefLabel
        else (404, """{"error": "not found"}""")
      } else if (path == "/search") {
        if (!q.contains("ontologies=OMIM") || !q.contains("require_exact_match=true"))
          (400, """{"error": "bad query"}""")
        else if (q.contains("q=Kabuki+syndrome+1") || q.contains("q=Kabuki%20syndrome%201"))
          (200, """{"collection": [{"prefLabel": "KABUKI SYNDROME 1",
                  |  "@id": "http://purl.bioontology.org/ontology/OMIM/147920/",
                  |  "synonym": ["Kabuki syndrome type 1"]}]}""".stripMargin)
        else (200, """{"collection": []}""")
      } else (404, "{}")
    }
  }

  test("bioportal: CURIE routes to the class endpoint, case-insensitive prefix") {
    serve(bioportalHandler) { base =>
      val r = BioPortalResolver(base, "TEST_KEY", "OMIM")
      for (in <- Seq("OMIM:147920", "omim:147920")) {
        val hit = r.resolveIn("disease", in)
        assert(hit.map(_._1) == Some(OntologyClass("OMIM:147920", "KABUKI SYNDROME 1")),
          s"input $in")
        assert(hit.map(_._2.iriPrefix) ==
          Some("http://purl.bioontology.org/ontology/OMIM/"))
      }
      // wrong prefix is NOT an id — it falls to label search, which misses
      assert(r.resolveIn("disease", "HP:147920").isEmpty)
    }
  }

  test("bioportal: label→id via exact-match search, local id from trailing-slash IRI") {
    serve(bioportalHandler) { base =>
      val r = BioPortalResolver(base, "TEST_KEY", "OMIM")
      // the mock's @id carries a trailing slash — extraction must still
      // find 147920 (reference test_extract_local_id_from_iri)
      val hit = r.resolveIn("disease", "Kabuki syndrome 1")
      assert(hit.map(_._1) == Some(OntologyClass("OMIM:147920", "KABUKI SYNDROME 1")))
      assert(r.resolveIn("disease", "No Such Disease").isEmpty)
    }
  }

  test("bioportal: 404 class is a miss, empty prefLabel is a miss, 5xx throws") {
    serve(bioportalHandler) { base =>
      val r = BioPortalResolver(base, "TEST_KEY", "OMIM")
      assert(r.resolveIn("disease", "OMIM:999999").isEmpty)
      assert(r.resolveIn("disease", "OMIM:600000").isEmpty, "empty prefLabel → NotFound")
      intercept[java.io.IOException](r.resolveIn("disease", "OMIM:500000"))
      val bad = BioPortalResolver(base, "WRONG_KEY", "OMIM")
      intercept[java.io.IOException](bad.resolveIn("disease", "OMIM:147920"))
    }
  }

  test("bioportal: curie prefix may differ from the acronym (snomedct/SNOMEDCT)") {
    val handler: HttpExchange => (Int, String) = { x =>
      val path = java.net.URLDecoder.decode(x.getRequestURI.getPath, "UTF-8")
      if (path.startsWith("/ontologies/SNOMEDCT/classes/") &&
        path.endsWith("/SNOMEDCT/90391002"))
        (200, """{"prefLabel": "Pierre Robin syndrome",
                | "@id": "http://purl.bioontology.org/ontology/SNOMEDCT/90391002",
                | "synonym": []}""".stripMargin)
      else (404, "{}")
    }
    serve(handler) { base =>
      val r = BioPortalResolver(base, "TEST_KEY", "SNOMEDCT", curiePrefix = "snomedct")
      val hit = r.resolveIn("disease", "snomedct:90391002")
      assert(hit.map(_._1) ==
        Some(OntologyClass("snomedct:90391002", "Pierre Robin syndrome")))
      assert(hit.map(_._2.name) == Some("SNOMEDCT"))
    }
  }

  // ---- composition ----

  test("scoped routing + wrapped stack: assay→LOINC, disease→BioPortal, offline-first") {
    serve(loincHandler) { loincBase =>
      serve(bioportalHandler) { bpBase =>
        val scoped = ScopedResolver(Map(
          "assay" -> LoincResolver(loincBase, "u", "p"),
          "disease" -> BioPortalResolver(bpBase, "TEST_KEY", "OMIM")))
        val dictRes = Resource("hp", "HPO", "http://example.invalid/hp", "1", "HP", "")
        val lib = BiDictLibrary(Seq(BiDict.fromEntries(dictRes, Seq(
          ("HP:0000001", "Known Term", Seq.empty)))))
        val stack = TermResolver.wrapped(scoped, offline = lib, cacheSize = 100)
        assert(stack.resolveIn("hpo", "Known Term").map(_._1.id) == Some("HP:0000001"))
        assert(stack.resolveIn("assay", "2345-7").map(_._1.id) == Some("LOINC:2345-7"))
        assert(stack.resolveIn("disease", "OMIM:147920").map(_._1.label) ==
          Some("KABUKI SYNDROME 1"))
        // a scope with no route is unknown, not an error
        assert(stack.resolveIn("procedure", "anything").isEmpty)
      }
    }
  }

  test("adapters survive java serialization (they ship in the assembly closure)") {
    serve(loincHandler) { base =>
      val r = LoincResolver(base, "u", "p")
      val bytes = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bytes).writeObject(r)
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
        .asInstanceOf[LoincResolver]
      assert(back.resolveIn("assay", "2345-7").map(_._1.id) == Some("LOINC:2345-7"))
    }
  }
}
