package graft.extract

import graft.SparkSpec

/** Conditional transpose (reference `data_source.rs:37-77`) — the
  * duplicate-field divergence made loud. The reference emits duplicate
  * output columns when the first column repeats a field name; Spark's
  * pivot would silently collapse them under `first` (silent data
  * loss), so the engine fails with the divergence message instead.
  */
class TransposeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private lazy val sql = spark
  import sql.implicits._

  test("patients-in-columns transpose flips orientation") {
    // columns carry the engine's default numeric names — CsvSource
    // never honors a header in this orientation (useHeader requires
    // patientsAreRows), so "0","1",… is the only name shape that
    // reaches the transpose
    val df = Seq(
      ("Patient ID", "P001", "P002"),
      ("Sex", "m", "f"),
      ("HPO", "Fever", "Chills")).toDF("0", "1", "2")
    val out = Transpose.conditional(df, patientsAreRows = false, hasHeaders = true)
    assert(out.columns.sorted.toSeq == Seq("HPO", "Patient ID", "Sex"))
    val rows = out.select("Patient ID", "Sex", "HPO").as[(String, String, String)]
      .collect().toSet
    assert(rows == Set(("P001", "m", "Fever"), ("P002", "f", "Chills")))
  }

  test("duplicate field names fail loudly instead of silently collapsing") {
    val df = Seq(
      ("Patient ID", "P001", "P002"),
      ("HPO", "Fever", "Chills"),
      ("HPO", "Cough", "Rash")).toDF("0", "1", "2")
    val e = intercept[IllegalArgumentException] {
      Transpose.conditional(df, patientsAreRows = false, hasHeaders = true)
    }
    assert(e.getMessage.contains("duplicate field name"), e.getMessage)
    assert(e.getMessage.contains("HPO"), e.getMessage)
    assert(e.getMessage.contains("data_source.rs"), e.getMessage)
  }

  test("patients-as-rows input passes through untouched, no dup scan") {
    // patientsAreRows short-circuits BEFORE the duplicate check — a
    // normal-orientation table may of course repeat VALUES anywhere
    val df = Seq(("P001", "Fever"), ("P001", "Fever")).toDF("id", "hpo")
    assert(Transpose.conditional(df, patientsAreRows = true, hasHeaders = true)
      .collect().length == 2)
  }
}
