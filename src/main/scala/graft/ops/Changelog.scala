package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC changelog compaction: collapse an upsert/delete event log into
  * the current snapshot (the lakehouse MERGE / "latest record wins"
  * primitive, computed from scratch without a table format).
  *
  * One hash aggregate keyed by record id — `max_by` carries the whole
  * latest row as a struct, so there is no per-key sort, the aggregate
  * partial-combines map-side, and ties are impossible by contract
  * (`seqCol` must be unique per id; a changelog with ambiguous
  * ordering has no well-defined snapshot). Deletes win like any other
  * version: if the LATEST event for an id is a delete, the id is
  * absent from the snapshot.
  */
object Changelog {

  /** @param opCol  event kind column; rows whose latest value equals
    *               `deleteOp` drop their id from the snapshot
    * @param payload columns of the snapshot row (must not include
    *                id/seq/op columns)
    */
  def compact(
      log: DataFrame,
      idCol: String,
      seqCol: String,
      opCol: String,
      payload: Seq[String],
      deleteOp: String = "D"): DataFrame = {
    require(payload.nonEmpty, "compact needs at least one payload column")
    val missing = (Seq(idCol, seqCol, opCol) ++ payload).filterNot(log.columns.contains)
    require(missing.isEmpty, s"changelog is missing column(s): ${missing.mkString(", ")}")
    require(!payload.contains(idCol) && !payload.contains(seqCol) && !payload.contains(opCol),
      "payload must not repeat the id/seq/op columns")
    // max_by SKIPS rows whose ordering value is null: a null-seq delete
    // would be silently dropped, and an id whose events ALL have null
    // seq would emit a phantom all-null snapshot row that exists in no
    // input event. An unordered event has no place in a changelog —
    // fail loudly (same stance as the SpanDedup duplicate-id guard).
    val seq = when(col(seqCol).isNull,
      raise_error(concat(lit(s"changelog compact: null $seqCol for id "),
        coalesce(col(idCol).cast("string"), lit("NULL")),
        lit(" — events must carry a total order")))).otherwise(col(seqCol))
    log.groupBy(col(idCol))
      .agg(max_by(struct((opCol +: payload).map(col): _*), seq).as("__last"))
      // null-safe: a NULL op is "not a delete", not "discard the id"
      .filter(!(col("__last").getField(opCol) <=> lit(deleteOp)))
      .select(col(idCol) +: payload.map(c => col("__last").getField(c).as(c)): _*)
  }

  /** Snapshot diff: classify every id across two dataset versions as
    * added / removed / changed / unchanged — the corpus-version audit
    * ("what did this recrawl actually change") and the precondition
    * for incremental reprocessing.
    *
    * Scale shape: each side reduces to (id, md5 digest of the content
    * columns) BEFORE the full-outer join, so the one shuffle carries
    * 16-byte digests, never bodies — same stance as [[Dedup]]. Ids
    * must be unique per side (it is a snapshot, not a log; pre-compact
    * with [[compact]] otherwise).
    *
    * Digest rule: each content column is md5'd SEPARATELY (null as the
    * empty string) and the fixed-width digests concat into the row
    * digest — unambiguous under any content (a separator-based concat
    * would let values containing the separator shift between columns
    * and collide, misclassifying changed rows as unchanged). (null)
    * and ("") still digest alike; callers needing null-vs-empty
    * distinction should add an indicator column.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff needs at least one content column")
    // eager validation, like every sibling op here — a typo'd column
    // must not surface as a deep Catalyst UNRESOLVED_COLUMN error
    for ((df, side) <- Seq(oldDf -> "old", newDf -> "new")) {
      val missing = (idCol +: contentCols).filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"$side snapshot is missing column(s): ${missing.mkString(", ")}")
    }
    require(idCol != "__old_fp" && idCol != "__new_fp",
      "reserved column name collision (__old_fp/__new_fp)")
    // Per-column digest by TYPE: a string cast of an array/map/struct
    // is ambiguous (Array("a, b") and Array("a","b") both render
    // "[a, b]") and an invalid-UTF8 binary is lossy — either would let
    // distinct values collide and classify a changed row "unchanged".
    // Binary digests directly; complex types digest their JSON
    // rendering (element-exact); atomics keep the string cast.
    def colDigest(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.BinaryType =>
          md5(coalesce(col(c), lit(Array.emptyByteArray)))
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             _: org.apache.spark.sql.types.StructType =>
          md5(coalesce(to_json(col(c)), lit("")))
        case _ =>
          md5(coalesce(col(c).cast("string"), lit("")))
      }
    def digested(df: DataFrame, name: String) = df.select(
      col(idCol),
      md5(concat(contentCols.map(c => colDigest(df, c)): _*)).as(name))
    val o = digested(oldDf, "__old_fp")
    val n = digested(newDf, "__new_fp")
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__old_fp").isNull, "added")
          .when(col("__new_fp").isNull, "removed")
          .when(col("__old_fp") =!= col("__new_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
