package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy equi-join for entity resolution: pairs strings within
  * Levenshtein distance 1 WITHOUT the quadratic cross join.
  *
  * SymSpell's deletion-neighborhood trick: two strings at edit
  * distance ≤ 1 (insert / delete / substitute / equal) always share a
  * member of their delete-1 neighborhoods (the string itself plus
  * every single-character deletion) — substitutions share the
  * deletion at the edited position, insertions/deletions make one
  * side a deletion variant of the other. So: explode ≤ len+1 variant
  * keys per string, hash-join on the variant, dedup the candidate
  * pairs, and verify with one `levenshtein` pass. Work scales with
  * `rows × avg_len`, never `rows²` — the 100 TB-safe shape for alias
  * and label matching.
  */
object FuzzyJoin {

  /** @return (left key, right key, distance) for every cross-side pair
    *         within Levenshtein distance 1; exact-equal pairs included
    *         with distance 0.
    */
  def withinEditDistance1(
      left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    // explode an index and build each variant in a plain (codegen'd)
    // projection — the higher-order `transform` never enters
    // whole-stage codegen (the round-1 shingling lesson). Index 0 is
    // the string itself, index i > 0 deletes character i.
    def variants(df: DataFrame, key: String, out: String): DataFrame =
      df.select(col(key).as(out)).distinct()
        .select(col(out), explode(sequence(lit(0), length(col(out)))).as("__i"))
        .select(col(out),
          when(col("__i") === 0, col(out))
            .otherwise(concat(
              col(out).substr(lit(1), (col("__i") - 1).cast("int")),
              col(out).substr((col("__i") + 1).cast("int"), length(col(out)))))
            .as("__variant"))
    val lv = variants(left, leftKey, "__l")
    val rv = variants(right, rightKey, "__r")
    lv.join(rv, "__variant")
      .select(col("__l"), col("__r")).distinct()
      .withColumn("distance", levenshtein(col("__l"), col("__r")))
      .filter(col("distance") <= 1)
      .select(col("__l").as(leftKey + "_l"), col("__r").as(rightKey + "_r"), col("distance"))
  }
}
