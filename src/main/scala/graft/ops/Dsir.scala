package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftExtensions.{lower_root => lowerRoot}

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * pick raw-corpus documents that look like a TARGET corpus by scoring
  * each document under a hashed-n-gram bag-of-features importance
  * model, then keeping the top of the importance ranking.
  *
  *  1. features: word unigrams AND bigrams, each md5-hashed into one
  *     of `buckets` counting buckets (the paper's hashed n-gram
  *     generative model — collisions are part of the model);
  *  2. per-bucket weight λ_b = log p_target(b) − log p_raw(b),
  *     carried as INTEGER MILLI-NATS (`Map[bucket, Long]`) — the same
  *     exactness contract as [[QualityModel]]: the document score
  *     Σ_occurrences λ_b is exact integer math, bit-identical on any
  *     engine/partitioning/run, because a float log-sum's low bits
  *     depend on summation order and the selection boundary sits
  *     exactly there;
  *  3. selection: [[resampleTopK]] keeps the k highest-scoring
  *     documents with an md5-of-id tiebreak — fully deterministic and
  *     oracle-checkable. [[resampleGumbel]] is the paper's stochastic
  *     variant: Gumbel noise derived from md5(id, seed), so it is
  *     reproducible across runs and partitionings, but it goes through
  *     `ln` (libm last-ulp territory) and is therefore NOT for
  *     cross-engine hash comparison.
  *
  * Scale shape: the weight table is `buckets`-sized and broadcast;
  * features explode into (doc, bucket) rows, the weight join is a
  * broadcast hash join, the per-doc sum is one map-side-combinable
  * doc-keyed aggregate, and top-k is Spark's TakeOrdered (per-partition
  * heaps, no global sort). Fitting reduces each corpus to ≤ `buckets`
  * counting cells before anything reaches the driver.
  */
object Dsir {

  /** Max bucket count [[fitWeightsMilli]] will bring to the driver. */
  val MaxBuckets: Int = 1 << 20

  /** md5 bucket of one n-gram — the engine-portable hash idiom
    * ([[Md5Family.hex60]] → mod).
    */
  def bucketOf(term: Column, buckets: Int): Column =
    pmod(Md5Family.hex60(term), lit(buckets.toLong))

  /** Word unigram + bigram feature terms of a text column (lowercased,
    * whitespace-tokenized; bigrams joined with one space). Null/blank
    * text → empty array.
    */
  def featureTerms(text: Column): Column = {
    val ts = coalesce(Dedup.tokens(lowerRoot(text)), array().cast("array<string>"))
    val bigrams = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat(element_at(ts, i), lit(" "), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ts, bigrams)
  }

  /** (id, __term) feature OCCURRENCE rows — the hot-path form of
    * [[featureTerms]]: tokens and bigrams are born ROW-LOCAL (native
    * tokenize + n-gram in the scan task; term text byte-identical).
    * The previous posexplode + window-lead spelling paid a doc-keyed
    * exchange + sort of every corpus token to build bigram adjacency;
    * no shuffle exists here at all.
    */
  def featureOccurrences(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tk = Dedup.tokens(lowerRoot(col(textCol)))
    df.select(col(idCol),
      explode(concat(tk,
        graft.functions.GraftExtensions.word_ngrams(tk, 2))).as("__term"))
  }

  /** Per-document exact integer importance score: `milli_weight` =
    * Σ over feature OCCURRENCES of the bucket's milli-nat weight
    * (buckets absent from the map weigh 0). Documents with no
    * features score 0.
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      milliWeights: Map[Int, Long], buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(milliWeights.keys.forall(b => b >= 0 && b < buckets),
      s"weight bucket out of range [0, $buckets)")
    val spark = df.sparkSession
    import spark.implicits._
    val w = broadcast(milliWeights.toSeq.toDF("__ds_b", "__ds_w"))
    val occ = featureOccurrences(df, idCol, textCol)
      .select(col(idCol), bucketOf(col("__term"), buckets).cast("int").as("__ds_b"))
    val sums = occ.join(w, Seq("__ds_b"))
      .groupBy(col(idCol))
      .agg(sum(col("__ds_w")).as("__ds_sum"))
    df.select(col(idCol))
      .join(sums, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("__ds_sum"), lit(0L)).as("milli_weight"))
  }

  /** Fit milli-nat bucket weights from a target and a raw corpus:
    * λ_b = 1000 · (ln p̂_target(b) − ln p̂_raw(b)), add-`alpha`
    * smoothed over `buckets` cells, rounded to the nearest milli-nat.
    * Both corpora reduce to ≤ `buckets` counting cells distributed-side
    * (`buckets ≤ MaxBuckets` keeps the driver map bounded); the log
    * ratio runs on the driver over exact counts, so refitting on the
    * same corpora always reproduces the same table — treat the result
    * as a model artifact, exactly like a [[Bpe]] merge table.
    */
  def fitWeightsMilli(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int, alpha: Double = 0.5): Map[Int, Long] = {
    require(buckets > 0 && buckets <= MaxBuckets,
      s"buckets must be in [1, $MaxBuckets] (driver holds one cell per bucket)")
    require(alpha > 0, "alpha must be positive (unseen buckets need mass)")
    def counts(df: DataFrame): Map[Int, Long] = {
      // synthetic per-row id: adjacency is per-document no matter what
      // columns the corpus carries
      val withId = df.select(col(textCol))
        .withColumn("__ds_id", monotonically_increasing_id())
      featureOccurrences(withId, "__ds_id", textCol)
        .select(bucketOf(col("__term"), buckets).cast("int").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    }
    val t = counts(target)
    val r = counts(raw)
    val tTot = t.values.sum + alpha * buckets
    val rTot = r.values.sum + alpha * buckets
    (0 until buckets).map { b =>
      val lp = StrictMath.log((t.getOrElse(b, 0L) + alpha) / tTot)
      val lq = StrictMath.log((r.getOrElse(b, 0L) + alpha) / rTot)
      b -> StrictMath.round((lp - lq) * 1000.0)
    }.filter(_._2 != 0L).toMap
  }

  /** Deterministic importance selection: the `k` highest-scoring
    * documents (ties broken by md5 of the id, then the id). Returns
    * (id, milli_weight) — semi-join back for payloads.
    */
  def resampleTopK(df: DataFrame, idCol: String, textCol: String,
      milliWeights: Map[Int, Long], buckets: Int, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    score(df, idCol, textCol, milliWeights, buckets)
      .orderBy(col("milli_weight").desc,
        md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
  }

  /** The paper's Gumbel-top-k resample (sampling without replacement
    * ∝ exp(weight)): score + Gumbel noise, noise derived from
    * md5(id ":" seed) so every run, partitioning and executor count
    * draws the SAME sample. Not cross-engine exact (`ln`); use
    * [[resampleTopK]] where an oracle must replay the choice.
    */
  def resampleGumbel(df: DataFrame, idCol: String, textCol: String,
      milliWeights: Map[Int, Long], buckets: Int, k: Int,
      seed: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    // both-endpoints-open uniform: the double log below never sees 0
    val u = Sampling.md5Uniform(
      concat(col(idCol).cast("string"), lit(":"), lit(seed.toString)),
      openTop = true)
    val gumbelMilli = (-log(-log(u)) * 1000.0).cast("long")
    score(df, idCol, textCol, milliWeights, buckets)
      .withColumn("milli_perturbed", col("milli_weight") + gumbelMilli)
      .orderBy(col("milli_perturbed").desc,
        md5(col(idCol).cast("string")), col(idCol))
      .limit(k)
  }
}
