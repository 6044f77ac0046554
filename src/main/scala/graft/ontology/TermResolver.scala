package graft.ontology

/** Pluggable scoped term resolution — the seam where the reference
  * talks to live ontology services (LOINC
  * `/root/reference/phenoxtract/src/ontology/loinc_client.rs:106`,
  * BioPortal `/root/reference/phenoxtract/src/ontology/
  * bioportal_client.rs:53-99` — both cached and rate-limited, HGNC /
  * VariantValidator similarly) and this engine, by default, does not:
  * the deterministic default is [[OfflineResolver]] over broadcast
  * [[BiDictLibrary]] dictionaries (SURVEY §3.4), and anything live is
  * an explicit, config-gated opt-in.
  *
  * A resolver is SERIALIZED INTO THE ASSEMBLY CLOSURE and called on
  * executors (one call per term occurrence inside `mapGroups`), so
  * implementations must be `Serializable` and any mutable state —
  * caches, rate-limiter buckets — must be `@transient lazy`, giving
  * each executor JVM its own instance (exactly the reference's
  * per-client `Cache` + `Ratelimiter`, multiplied by executors; size
  * rate limits accordingly: a 10-executor cluster with
  * `rate_limit_per_sec = 5` makes ≤ 50 requests/s fleet-wide).
  *
  * Composition mirrors the reference client stack:
  * {{{
  *   TermResolver.wrapped(new MyRestResolver(...), offline = library,
  *     cacheSize = 100000, ratePerSec = 5.0)
  * }}}
  * — offline dictionaries answer first (broadcast lookup, no I/O, no
  * rate-limit token), the remote resolver only sees genuinely unknown
  * terms, its answers are memoized per executor, and calls are
  * token-bucket throttled. Tests and the golden e2e never construct a
  * remote resolver, so determinism is untouched by default.
  */
trait TermResolver extends Serializable {

  /** Resolve a CURIE-or-label within a resolution class ("hpo",
    * "disease", "assay", …). `None` = unknown term.
    *
    * CONTRACT: `None` means the term is AUTHORITATIVELY unknown.
    * Transient failures (network errors, timeouts, 5xx) must THROW,
    * never return `None` — [[CachedResolver]] memoizes misses for the
    * executor's lifetime, so a `None` returned on a flaky request
    * would poison the cache and silently drop that term from every
    * subsequent packet built on that executor.
    */
  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)]

  final def resolveInOrThrow(scope: String, value: String): (OntologyClass, Resource) =
    resolveIn(scope, value).getOrElse(throw new NoSuchElementException(
      s"term '$value' not found in scope '$scope' by $describe"))

  /** Human-readable identity for error messages. */
  def describe: String = getClass.getSimpleName
}

/** The deterministic default: broadcast dictionary lookup, no I/O. */
final case class OfflineResolver(library: BiDictLibrary) extends TermResolver {
  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    library.resolveIn(scope, value)
  override def describe: String =
    s"offline dictionaries [${library.dicts.map(_.resource.id).mkString(", ")}]"
}

/** Per-executor memoization of an inner resolver (the reference's
  * `Cache<String, String>` in bioportal_client.rs:62). Caches hits AND
  * misses — an unknown term asked 10⁶ times must not make 10⁶ calls.
  * LRU (access-order) eviction at `maxEntries`, so a hot term stays
  * resident however many distinct terms pass through (the cache is per
  * executor JVM and rebuilt on executor loss — a working set, not a
  * store).
  */
final case class CachedResolver(base: TermResolver, maxEntries: Int = 100000)
    extends TermResolver {
  require(maxEntries > 0, "maxEntries must be positive")

  @transient private lazy val cache =
    new java.util.LinkedHashMap[(String, String), Option[(OntologyClass, Resource)]](
      16, 0.75f, /* accessOrder = */ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Option[(OntologyClass, Resource)]]) =
        size() > maxEntries
    }

  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] = {
    val k = (scope, value)
    val hit = cache.synchronized(cache.get(k))
    if (hit != null) hit
    else {
      // Compute OUTSIDE the monitor: the base may rate-limit-sleep and
      // do network IO — holding the lock there would convoy every
      // resolution thread on the executor (including pure cache hits)
      // behind one slow lookup. Concurrent misses of the same key may
      // duplicate the remote call (both write the same value; last put
      // wins) — strictly cheaper than the convoy.
      val computed = base.resolveIn(scope, value)
      cache.synchronized { cache.put(k, computed); () }
      computed
    }
  }
  override def describe: String = s"cached(${base.describe})"
}

/** Blocking token-bucket throttle around an inner resolver — the
  * reference's `wait_for_rate_limit` loop (bioportal_client.rs:91-99):
  * a call with no token available sleeps until one accrues. State is
  * per executor JVM (`@transient`); see the class doc of
  * [[TermResolver]] for fleet-wide sizing.
  */
final case class RateLimitedResolver(base: TermResolver, permitsPerSecond: Double)
    extends TermResolver {
  require(permitsPerSecond > 0, "permitsPerSecond must be positive")

  @transient private lazy val state =
    new RateLimitedResolver.Bucket(permitsPerSecond)

  private def acquire(): Unit = {
    var waitNanos = 0L
    state.synchronized {
      val now = System.nanoTime()
      state.available = math.min(permitsPerSecond,
        state.available + (now - state.lastRefillNanos) / 1e9 * permitsPerSecond)
      state.lastRefillNanos = now
      if (state.available >= 1.0) state.available -= 1.0
      else {
        waitNanos = ((1.0 - state.available) / permitsPerSecond * 1e9).toLong
        state.available -= 1.0 // claim the token accruing during the sleep
      }
    }
    if (waitNanos > 0) {
      val deadline = System.nanoTime() + waitNanos
      var remaining = waitNanos
      while (remaining > 0) { // loop-until-token, like the reference
        Thread.sleep(remaining / 1000000L, (remaining % 1000000L).toInt)
        remaining = deadline - System.nanoTime()
      }
    }
  }

  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] = {
    acquire()
    base.resolveIn(scope, value)
  }
  override def describe: String = s"rateLimited(${base.describe})"
}

object RateLimitedResolver {
  /** Per-executor token-bucket state (held behind `@transient lazy`). */
  private[ontology] final class Bucket(burst: Double) {
    var available: Double = burst // start with one second's burst
    var lastRefillNanos: Long = System.nanoTime()
  }
}

/** Offline-first fallback chain: `primary` answers what it can (for
  * the intended stack: the broadcast dictionaries — free and exact);
  * only unresolved terms reach `secondary` (the remote client). This
  * is the reference's pre-resolution discipline made structural.
  */
final case class FallbackResolver(primary: TermResolver, secondary: TermResolver)
    extends TermResolver {
  def resolveIn(scope: String, value: String): Option[(OntologyClass, Resource)] =
    primary.resolveIn(scope, value).orElse(secondary.resolveIn(scope, value))
  override def describe: String = s"${primary.describe} then ${secondary.describe}"
}

object TermResolver {

  /** The default stack: dictionaries only. */
  def offline(library: BiDictLibrary): TermResolver = OfflineResolver(library)

  /** The live-resolver stack: offline dictionaries first, then the
    * custom resolver behind a per-executor cache and (optionally) a
    * token-bucket rate limit.
    */
  def wrapped(custom: TermResolver, offline: BiDictLibrary,
      cacheSize: Int = 100000, ratePerSec: Option[Double] = None): TermResolver = {
    val limited = ratePerSec.fold(custom)(RateLimitedResolver(custom, _))
    FallbackResolver(OfflineResolver(offline), CachedResolver(limited, cacheSize))
  }

  /** Reflectively instantiate a user resolver class — the config-file
    * opt-in (`pipeline.resolver.class`). The class must implement
    * [[TermResolver]] and expose either a `(BiDictLibrary)` constructor
    * (handed the loaded dictionaries, e.g. for prefix routing) or a
    * no-arg constructor.
    */
  def custom(className: String, library: BiDictLibrary): TermResolver = {
    val cls = Class.forName(className)
    require(classOf[TermResolver].isAssignableFrom(cls),
      s"$className does not implement graft.ontology.TermResolver")
    val viaLib = cls.getConstructors.find(
      c => c.getParameterTypes.toSeq == Seq(classOf[BiDictLibrary]))
    try viaLib match {
      case Some(c) => c.newInstance(library).asInstanceOf[TermResolver]
      case None    => cls.getDeclaredConstructor().newInstance().asInstanceOf[TermResolver]
    } catch {
      // A package-private constructor or a constructor that throws
      // otherwise surfaces as an opaque reflection error; name the
      // class and the expected shapes like the require()s above do.
      case e: ReflectiveOperationException => throw new IllegalArgumentException(
        s"could not instantiate resolver $className: it must expose a PUBLIC " +
          "(BiDictLibrary) or public no-arg constructor " +
          s"(${e.getClass.getSimpleName}: ${e.getMessage})", e)
    }
  }
}
