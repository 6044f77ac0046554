package graft.ontology

import java.net.{HttpURLConnection, URI, URLEncoder}

/** A concrete HTTP [[TermResolver]] — the live-lookup leg the reference
  * implements per service (LOINC
  * `/root/reference/phenoxtract/src/ontology/loinc_client.rs:129-160`:
  * blocking GET + basic auth + query params; BioPortal
  * `bioportal_client.rs:53-99`: same shape behind cache + rate limit).
  * This engine keeps ONE generic client because caching, rate limiting
  * and offline-first fallback live in the [[TermResolver.wrapped]]
  * composition, not in each service client — always deploy it behind
  * that stack, never bare.
  *
  * Request: `GET {baseUrl}?scope={scope}&query={term}` (URL-encoded),
  * `Accept: application/json`, optional basic auth. Response contract:
  *  - 200 with a JSON object
  *    `{"id", "label", "resource": {"id", "name", "url", "version",
  *    "namespace_prefix", "iri_prefix"}}` → resolved;
  *  - 404 → the term is AUTHORITATIVELY unknown (`None`, which the
  *    cache stack memoizes — the reference caches NOT_FOUND the same
  *    way, loinc_client.rs test `test_get_label_empty_cache`);
  *  - anything else (5xx, timeouts, malformed JSON) THROWS, honoring
  *    the [[TermResolver.resolveIn]] contract that transient failures
  *    must never be memoized as misses.
  *
  * Serializable by construction: fields are strings/ints; the Jackson
  * mapper is per-JVM `@transient lazy`. Credentials ride the closure —
  * source them from `${ENV}` config expansion (the reference reads
  * LOINC credentials from the environment too).
  */
final case class HttpTermResolver(
    baseUrl: String,
    user: Option[String] = None,
    password: Option[String] = None,
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000) extends TermResolver {
  require(baseUrl.nonEmpty, "baseUrl must be non-empty")

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8")

  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] = {
    val url = s"$baseUrl?scope=${enc(scope)}&query=${enc(value)}"
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    locally {
      conn.setRequestMethod("GET")
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      conn.setRequestProperty("Accept", "application/json")
      for (u <- user) {
        val cred = java.util.Base64.getEncoder.encodeToString(
          s"$u:${password.getOrElse("")}".getBytes("UTF-8"))
        conn.setRequestProperty("Authorization", s"Basic $cred")
      }
      // Streams are CLOSED (draining first) but the connection is NOT
      // disconnect()ed: disconnect tears down the socket and defeats
      // HttpURLConnection keep-alive pooling — with thousands of
      // distinct terms per executor that would pay a TCP+TLS handshake
      // per lookup.
      conn.getResponseCode match {
        case 200 =>
          val in = conn.getInputStream
          val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
          Some(parse(body, url))
        case 404 =>
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          None // authoritative unknown — safe for the cache to memoize
        case other =>
          Option(conn.getErrorStream).foreach(s => { s.readAllBytes(); s.close() })
          throw new java.io.IOException(
            s"term service returned HTTP $other for $url — transient failures " +
              "must throw, not resolve to unknown (see TermResolver.resolveIn)")
      }
    }
  }

  private def parse(body: String, url: String): (OntologyClass, Resource) = {
    val n = mapper.readTree(body)
    def req(node: com.fasterxml.jackson.databind.JsonNode, field: String): String = {
      val v = node.get(field)
      require(v != null && !v.isNull,
        s"term service response from $url is missing '$field': $body")
      v.asText()
    }
    def opt(node: com.fasterxml.jackson.databind.JsonNode, field: String): String =
      Option(node.get(field)).filterNot(_.isNull).map(_.asText()).getOrElse("")
    val r = n.get("resource")
    require(r != null && !r.isNull,
      s"term service response from $url is missing 'resource': $body")
    (OntologyClass(req(n, "id"), req(n, "label")),
      Resource(req(r, "id"), req(r, "name"), opt(r, "url"),
        opt(r, "version"), opt(r, "namespace_prefix"), opt(r, "iri_prefix")))
  }

  override def describe: String = s"http($baseUrl)"
}
