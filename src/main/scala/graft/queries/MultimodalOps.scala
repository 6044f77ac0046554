package graft.queries

import graft.Tables
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries: document text doubles as the opaque binary
  * payload (the testdata has no real media); metadata extraction is
  * oracle-checked, the stubbed decode path is rows-only + spec-checked.
  */
object MultimodalOps {
  import Catalog.{Entry, Q}

  private val meta: Q = (s, dir) =>
    Multimodal.binaryMeta(Tables.load(s, dir, "documents"), "doc_id", "text")
  private val metaSql =
    """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  private val decode: Q = (s, dir) =>
    Multimodal.decodeFeatures(Tables.load(s, dir, "documents"), "doc_id", "text").toDF()

  val entries: Seq[Entry] = Seq(
    Entry("mm_binary_meta", meta, Some(metaSql)),
    Entry("mm_decode_stub", decode, None),
  )
}
