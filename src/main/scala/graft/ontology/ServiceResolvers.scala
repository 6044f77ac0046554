package graft.ontology

import java.net.{HttpURLConnection, URI, URLEncoder}
import com.fasterxml.jackson.databind.JsonNode

/** Per-service REST adapters behind the [[TermResolver]] contract —
  * the response-shape mapping layer the generic [[HttpTermResolver]]
  * deliberately does not carry. Each live service speaks its own JSON:
  * the LOINC search API (reference
  * `/root/reference/phenoxtract/src/ontology/loinc_client.rs:129-160`:
  * basic-auth GET `loincs?query=…&rows=10`, PascalCase
  * `ResponseSummary`/`Results` envelope, `LOINC_NUM` /
  * `LONG_COMMON_NAME` fields) and the BioPortal API
  * (`bioportal_client.rs:53-99`: `apikey token=…` auth, class-by-IRI
  * GET + exact-match `/search`, `prefLabel` / `@id` / `synonym`).
  *
  * The composition stance is unchanged: these adapters carry NO cache,
  * rate limit or offline fallback of their own — deploy them behind
  * [[TermResolver.wrapped]], which supplies all three (the reference
  * builds the same stack INTO each client: `Cache::new(1500)` +
  * `Ratelimiter` per client struct; this engine keeps the stack
  * generic and the adapters thin). Transient failures (5xx, timeouts,
  * malformed JSON) THROW per the [[TermResolver.resolveIn]] contract;
  * only an authoritative miss returns `None`.
  */
private[ontology] object ServiceHttp {

  def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  /** Percent-encoding for URL PATH segments. [[enc]] is
    * application/x-www-form-urlencoded (space → '+'), which is only
    * correct in a query string; in a path a '+' is a literal plus
    * (RFC 3986), so a space must become %20 — the reference's
    * `Url::path_segments_mut().push()` does exactly that
    * (`bioportal_client.rs:181-185`).
    */
  def encPath(s: String): String = enc(s).replace("+", "%20")

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** GET `url` with `headers`; Right(json) on 200, Left(code) on the
    * codes in `missCodes` (the service's authoritative-unknown
    * signals), throw on anything else.
    */
  def getJson(url: String, headers: Seq[(String, String)],
      missCodes: Set[Int], connectTimeoutMs: Int,
      readTimeoutMs: Int): Either[Int, JsonNode] = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
      conn.getResponseCode match {
        case 200 =>
          val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
          Right(mapper.readTree(body))
        case miss if missCodes(miss) =>
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          Left(miss)
        case other =>
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          throw new java.io.IOException(
            s"term service returned HTTP $other for $url — transient failures " +
              "must throw, not resolve to unknown (see TermResolver.resolveIn)")
      }
    } finally conn.disconnect()
  }

  def text(n: JsonNode, field: String): String =
    Option(n.get(field)).filterNot(_.isNull).map(_.asText()).getOrElse("")
}

/** LOINC search-API adapter (reference `loinc_client.rs`). Lookup
  * semantics mirror the reference's `BiDict` impl exactly:
  *
  *  - an input shaped like a LOINC code (`LOINC:2345-7` or bare
  *    `2345-7`) resolves id→label: search `query=<input>` and accept
  *    the result whose `LOINC_NUM` (bare or CURIE-formatted) equals
  *    the input (`loinc_client.rs:199-213`);
  *  - anything else resolves label→id: ASCII punctuation is stripped
  *    from the query (`:224-229`), and a result matches on
  *    case-insensitive `LONG_COMMON_NAME` equality (`:236-243`).
  *
  * A 200 with no matching result is an authoritative miss (`None`) —
  * the reference caches `NOT_FOUND` for it. The resolved resource's
  * version carries the response's `LoincVersion` when present.
  * Credentials ride basic auth, sourced from config `${ENV}` expansion
  * (the reference reads LOINC_USERNAME/LOINC_PASSWORD from the
  * environment, `loinc_client.rs:167-176`).
  */
final case class LoincResolver(
    baseUrl: String,
    user: String,
    password: String,
    rows: Int = 10,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000) extends TermResolver {
  require(baseUrl.nonEmpty, "baseUrl must be non-empty")

  import ServiceHttp._

  private def authHeader: (String, String) = {
    val cred = java.util.Base64.getEncoder.encodeToString(
      s"$user:$password".getBytes("UTF-8"))
    "Authorization" -> s"Basic $cred"
  }

  /** `NNNN-N` check digit shape, with or without the CURIE prefix
    * (the reference validates via its LOINC curie regex).
    */
  private def isLoincCode(s: String): Boolean =
    s.matches("(?i)(LOINC:)?\\d+-\\d")

  /** (release version from the PascalCase ResponseSummary, results). */
  private def query(q: String): (String, Seq[JsonNode]) = {
    val url = s"${baseUrl.stripSuffix("/")}/loincs?query=${enc(q)}&rows=$rows"
    getJson(url, Seq(authHeader), missCodes = Set(404),
        connectTimeoutMs, readTimeoutMs) match {
      case Left(_) => ("", Seq.empty)
      case Right(n) =>
        val version = Option(n.get("ResponseSummary"))
          .map(s => text(s, "LoincVersion")).getOrElse("")
        val results = n.get("Results")
        if (results == null || !results.isArray) (version, Seq.empty)
        else (version, (0 until results.size()).map(results.get))
    }
  }

  private def mkResource(version: String): Resource =
    Resource("loinc", "LOINC", "https://loinc.org", version, "LOINC", "")

  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    if (isLoincCode(value)) {
      val bare = value.replaceFirst("(?i)^LOINC:", "")
      val curie = s"LOINC:$bare"
      val (version, results) = query(value)
      results.find(r => text(r, "LOINC_NUM") == bare)
        .map(r => (OntologyClass(curie, text(r, "LONG_COMMON_NAME")),
          mkResource(version)))
    } else {
      val cleaned = value.filterNot(c => c < 128 &&
        !c.isLetterOrDigit && !c.isWhitespace) // ASCII punctuation stripped
      val (version, results) = query(cleaned)
      val hit = results.find(r =>
          text(r, "LONG_COMMON_NAME").equalsIgnoreCase(value))
        .map(r => (OntologyClass(s"LOINC:${text(r, "LOINC_NUM")}",
          text(r, "LONG_COMMON_NAME")), mkResource(version)))
      // Only an EMPTY result set is an authoritative miss (the
      // reference caches NOT_FOUND for it, `loinc_client.rs:231-234`).
      // Non-empty results with no exact LONG_COMMON_NAME match mean
      // the true match may simply rank below the `rows` cap — the
      // reference raises a loud Caching error there (`:245-249`);
      // returning None would let CachedResolver memoize a silent,
      // permanent drop of the term.
      if (hit.isEmpty && results.nonEmpty)
        throw new java.io.IOException(
          s"LOINC search for '$value' returned ${results.size} results but " +
            s"none matched exactly (rows=$rows cap?) — refusing to treat a " +
            "possibly-truncated response as an authoritative miss")
      hit
    }

  // The auto-generated case-class toString would print `password`
  // verbatim into logs / task-serialization errors / ScopedResolver's
  // routes rendering; the reference redacts it in its Debug impl
  // (`loinc_client.rs:121`).
  override def toString: String = describe

  override def describe: String = s"loinc($baseUrl)"
}

/** BioPortal adapter (reference `bioportal_client.rs`). Two endpoints,
  * as the reference uses:
  *
  *  - id→label (`:215-234`): `GET {base}/ontologies/{acronym}/classes/
  *    {url-encoded class IRI}` where the IRI is
  *    `http://purl.bioontology.org/ontology/{acronym}/{localId}`;
  *    404 is an authoritative miss, an empty `prefLabel` too;
  *  - label→id (`:237-260`): `GET {base}/search?q={term}&ontologies=
  *    {acronym}&require_exact_match=true`, first `collection` element
  *    wins, the canonical local id is the last path segment of its
  *    `@id` IRI (`:208-213`).
  *
  * An input is treated as an id when it is a CURIE whose prefix
  * case-insensitively equals this client's `curiePrefix`
  * (`:72-84`) — which may differ from the BioPortal acronym
  * (SNOMEDCT hosted under acronym `SNOMEDCT`, curies written
  * `snomedct:`; `bioportal_client.rs:388-421`). Auth is the
  * `Authorization: apikey token={key}` header (`:224`).
  */
final case class BioPortalResolver(
    baseUrl: String,
    apiKey: String,
    acronym: String,
    curiePrefix: String = "",
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000) extends TermResolver {
  require(baseUrl.nonEmpty, "baseUrl must be non-empty")
  require(acronym.nonEmpty, "acronym must be non-empty")

  import ServiceHttp._

  private val prefix = if (curiePrefix.nonEmpty) curiePrefix else acronym
  private val iriPrefix = s"http://purl.bioontology.org/ontology/$acronym/"

  private def authHeader: (String, String) =
    "Authorization" -> s"apikey token=$apiKey"

  private def mkResource: Resource =
    Resource(prefix.toLowerCase, acronym, iriPrefix, "latest", prefix, iriPrefix)

  private def asCurieLocal(s: String): Option[String] = {
    val i = s.indexOf(':')
    if (i > 0 && s.substring(0, i).equalsIgnoreCase(prefix) && i + 1 < s.length)
      Some(s.substring(i + 1))
    else None
  }

  /** "http://…/OMIM/147920" → "147920" (trailing slash tolerated). */
  private def localIdFromIri(iri: String): Option[String] = {
    val trimmed = iri.reverse.dropWhile(_ == '/').reverse
    val seg = trimmed.substring(trimmed.lastIndexOf('/') + 1)
    if (seg.isEmpty) None else Some(seg)
  }

  private def byId(localId: String): Option[(OntologyClass, Resource)] = {
    val url = s"${baseUrl.stripSuffix("/")}/ontologies/${encPath(acronym)}/classes/" +
      encPath(s"$iriPrefix$localId")
    getJson(url, Seq(authHeader), missCodes = Set(404),
        connectTimeoutMs, readTimeoutMs) match {
      case Left(_) => None
      case Right(n) =>
        val label = text(n, "prefLabel")
        if (label.isEmpty) None // reference: empty label → NotFound
        else Some((OntologyClass(s"$prefix:$localId", label), mkResource))
    }
  }

  private def byLabel(term: String): Option[(OntologyClass, Resource)] = {
    val url = s"${baseUrl.stripSuffix("/")}/search?q=${enc(term)}" +
      s"&ontologies=${enc(acronym)}&require_exact_match=true"
    getJson(url, Seq(authHeader), missCodes = Set(404),
        connectTimeoutMs, readTimeoutMs) match {
      case Left(_) => None
      case Right(n) =>
        val coll = n.get("collection")
        if (coll == null || !coll.isArray || coll.size() == 0) None
        else {
          val first = coll.get(0)
          val label = text(first, "prefLabel")
          for {
            _ <- Option.when(label.nonEmpty)(())
            local <- localIdFromIri(text(first, "@id"))
          } yield (OntologyClass(s"$prefix:$local", label), mkResource)
        }
    }
  }

  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    asCurieLocal(value) match {
      case Some(local) => byId(local)
      case None        => byLabel(value)
    }

  // Redact `apiKey` from the auto-generated case-class toString (the
  // reference's Debug impl does the same, `bioportal_client.rs:27`).
  override def toString: String = describe

  override def describe: String = s"bioportal($baseUrl/$acronym)"
}

/** Route resolution by scope to per-service adapters — the engine-side
  * composition for "assay terms go to LOINC, disease terms to
  * BioPortal/OMIM" (the reference wires one client per strategy
  * instead; a scope router keeps the assembly seam single-valued).
  * Unrouted scopes are authoritatively unknown to this resolver
  * (`None`), which lets a [[FallbackResolver]] chain carry on.
  */
final case class ScopedResolver(routes: Map[String, TermResolver])
    extends TermResolver {
  require(routes.nonEmpty, "routes must be non-empty")
  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    routes.get(scope).flatMap(_.resolveIn(scope, value))
  override def describe: String =
    routes.map { case (s, r) => s"$s→${r.describe}" }.mkString("scoped(", ", ", ")")
}
