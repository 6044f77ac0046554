package graft.extract

import graft.SparkSpec

import java.nio.file.{Files, Paths, StandardCopyOption}

/** The distributed (DataSource V2) Excel reader: a DIRECTORY of
  * workbooks becomes one input partition per file, decoded on
  * executors; column pruning reaches the reader.
  */
class ExcelDataSourceV2Spec extends SparkSpec {

  private val fixture =
    Paths.get("src/test/resources/refgolden/input_data/excel_data.xlsx").toAbsolutePath

  test("directory of workbooks: one partition per file, rows unioned") {
    val dir = Files.createTempDirectory("xlsx_v2_")
    Files.copy(fixture, dir.resolve("a.xlsx"), StandardCopyOption.REPLACE_EXISTING)
    Files.copy(fixture, dir.resolve("b.xlsx"), StandardCopyOption.REPLACE_EXISTING)

    val df = spark.read.format("graft.extract.v2.ExcelDataSourceV2")
      .option("path", dir.toString)
      .option("sheet", "basic info")
      .load()
    assert(df.columns.take(3).toSeq == Seq("Patient ID", "Sex", "Living"))
    assert(df.rdd.getNumPartitions == 2) // one per workbook file
    assert(df.count() == 14)             // 7 data rows × 2 files
    // same cell content as the driver-side reader (dates decoded etc.)
    val dobs = df.select("DOB").where("`Patient ID` = 'P001'")
      .collect().map(_.getString(0)).toSeq
    assert(dobs == Seq("1956-06-03", "1956-06-03"))
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("graft.extract.v2.ExcelDataSourceV2")
      .option("path", fixture.toString)
      .option("sheet", "basic info")
      .load()
      .select("Sex")
    val plan = df.queryExecution.executedPlan.toString
    // the scan description lists only the pruned column set
    assert(plan.contains("columns=Sex"), s"expected pruned scan in:\n$plan")
    assert(df.collect().flatMap(r => Option(r.getString(0))).contains("female"))
  }

  test("columns resolve against each file's OWN header (reordered workbooks read correctly)") {
    // Simulate a reordered second workbook by reading the same file but
    // verifying resolution is name-based: prune to a column that is NOT
    // first in the sheet and check the values are that column's.
    val df = spark.read.format("graft.extract.v2.ExcelDataSourceV2")
      .option("path", fixture.toString)
      .option("sheet", "basic info")
      .load()
      .select("Living")
    val values = df.collect().flatMap(r => Option(r.getString(0))).toSet
    assert(values == Set("Yes", "No")) // Living values, not Patient IDs
  }

  test("duplicate header names fail loudly instead of serving the first column twice") {
    // header [id, v, v], row [1, a, b] — an indexOf-based ordinal map
    // previously served column 2's data ("a") for BOTH v columns, and
    // Spark itself cannot bind duplicate attribute names in a V2 scan
    // schema (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND deep in planning)
    val dir = Files.createTempDirectory("xlsx_dup_")
    val path = dir.resolve("dup.xlsx")
    val zos = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Target="worksheets/sheet1.xml" Type="w"/></Relationships>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c>
        |  <c r="B1" t="inlineStr"><is><t>v</t></is></c>
        |  <c r="C1" t="inlineStr"><is><t>v</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>1</t></is></c>
        |  <c r="B2" t="inlineStr"><is><t>a</t></is></c>
        |  <c r="C2" t="inlineStr"><is><t>b</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.extract.v2.ExcelDataSourceV2")
        .option("path", path.toString).option("sheet", "s").load()
    }
    assert(e.getMessage.contains("duplicate header name"), e.getMessage)
  }

  test("missing sheet errors with the file name") {
    val e = intercept[Exception] {
      spark.read.format("graft.extract.v2.ExcelDataSourceV2")
        .option("path", fixture.toString)
        .option("sheet", "nope")
        .load().collect()
    }
    assert(e.getMessage.contains("nope") || e.getCause.getMessage.contains("nope"))
  }
}
