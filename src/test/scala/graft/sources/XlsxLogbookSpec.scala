package graft.sources

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.pipeline.{Fixtures, Stages}

/** S9: Excel logbook ingestion — a genuine zip/XML workbook (written here
  * with ZipOutputStream, ECMA-376 part names) through the JDK-only reader
  * into the typed logbook dimension and the metadata_update stage. */
class XlsxLogbookSpec extends SparkSpec {

  private val header = Seq("ymd", "batchnum", "proposal", "user", "sampleid",
    "sampleName", "composition", "density", "samplethickness",
    "bgymd", "bgnumber", "dbgymd", "dbgnumber", "overallMu", "matrixfraction")

  // shared-string table: every string cell goes through the indirection
  private val strings = Seq("20240115", "prop1", "user1", "s1", "sample one",
    "SiO2", "", "None") ++ header

  private def col(i: Int) = ('A' + i).toChar.toString

  private def sharedCell(row: Int, c: Int, s: String) =
    s"""<c r="${col(c)}$row" t="s"><v>${strings.indexOf(s)}</v></c>"""

  private def numCell(row: Int, c: Int, v: String) =
    s"""<c r="${col(c)}$row"><v>$v</v></c>"""

  private def sheet(cols: Int): String = {
    val hdr = header.take(cols)
    val headerRow = hdr.indices.map(i => sharedCell(1, i, hdr(i))).mkString
    // row 2: batch 1 (derive thickness); dbgymd cell OMITTED -> null
    val r2 = Seq(
      sharedCell(2, 0, "20240115"), numCell(2, 1, "1"), sharedCell(2, 2, "prop1"),
      sharedCell(2, 3, "user1"), sharedCell(2, 4, "s1"), sharedCell(2, 5, "sample one"),
      sharedCell(2, 6, "SiO2"), numCell(2, 7, "2.2"), numCell(2, 8, "-1"),
      sharedCell(2, 9, "20240115"), numCell(2, 10, "2"),
      numCell(2, 12, "0"), numCell(2, 13, "100"), numCell(2, 14, "1.0"))
      .take(if (cols > 14) 14 else 13).mkString // legacy layout drops the MF cell
    // row 3: 'None' dispersant sentinel, inline string for the sample name
    val r3 = Seq(
      sharedCell(3, 0, "20240115"), numCell(3, 1, "2"), sharedCell(3, 2, "prop1"),
      sharedCell(3, 3, "user1"), sharedCell(3, 4, "s1"),
      s"""<c r="F3" t="inlineStr"><is><t>background</t></is></c>""",
      sharedCell(3, 6, "SiO2"), numCell(3, 7, "1.0"), numCell(3, 8, "0.001"),
      sharedCell(3, 9, "20240115"), numCell(3, 10, "2"),
      sharedCell(3, 11, "None"), numCell(3, 12, "0"), numCell(3, 13, "100"),
      numCell(3, 14, "0.9")).take(if (cols > 14) 15 else 14).mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<sheetData><row r="1">$headerRow</row><row r="2">$r2</row><row r="3">$r3</row>
       |</sheetData></worksheet>""".stripMargin
  }

  private lazy val xlsxPath: String = makeXlsx(header.size)
  // the pre-matrixfraction logbook layout: 14 columns, no optional fields
  private lazy val legacyXlsxPath: String = makeXlsx(14)

  private def makeXlsx(cols: Int): String = {
    val sst = {
      val items = strings.map(s => s"<si><t>$s</t></si>").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
         | count="${strings.size}" uniqueCount="${strings.size}">$items</sst>""".stripMargin
    }
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<sheets><sheet name="logbook" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets>
          |</workbook>""".stripMargin,
      "xl/sharedStrings.xml" -> sst,
      "xl/worksheets/sheet1.xml" -> sheet(cols))
    val f = Files.createTempDirectory("xlsx").resolve("logbook.xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    f.getAbsolutePath
  }

  test("raw read: header names, shared/inline/number cells, null gaps") {
    val raw = XlsxLogbook.readRaw(spark, xlsxPath)
    assert(raw.columns.toSeq == header)
    val rows = raw.orderBy("batchnum").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("sampleName") == "sample one")
    assert(rows(1).getAs[String]("sampleName") == "background") // inlineStr
    assert(rows(0).getAs[String]("dbgymd") == null) // omitted cell
    assert(rows(1).getAs[String]("dbgymd") == "None")
  }

  test("typed logbook: LogbookEntry schema, usable by metadata_update (S9/J1)") {
    val lb = XlsxLogbook.logbook(spark, xlsxPath)
    val expected = org.apache.spark.sql.Encoders.product[
      graft.pipeline.Model.LogbookEntry].schema
    assert(lb.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      expected.fields.map(f => (f.name, f.dataType)).toSeq)

    val ctx = Stages.Context(logbook = lb, masks = Fixtures.masks(spark))
    val out = Stages.metadataUpdate(Fixtures.repetitions(spark), ctx)
    assert(out.count() == 12)
    val ids = out.select("collection_identifier").distinct()
      .collect().map(_.getString(0)).toSet
    assert(ids == Set("20240115_1", "20240115_2"))
  }

  test("legacy workbooks without matrixfraction load with the 1.0 default") {
    val lb = XlsxLogbook.logbook(spark, legacyXlsxPath)
    val mf = lb.orderBy("batchnum").collect().map(_.getAs[Double]("matrixfraction"))
    assert(mf.toSeq == Seq(1.0, 1.0))
  }

  test("first sheet resolves via workbook.xml rels, not part-name sort") {
    // sheet10.xml sorts lexicographically before sheet2.xml, but the
    // workbook declares the sheet stored in sheet2.xml as its first sheet —
    // the reader must follow workbook.xml + rels, not the zip listing.
    val decoy =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>wrong</t></is></c></row>
        |<row r="2"><c r="A2"><v>999</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val real =
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>ymd</t></is></c></row>
        |<row r="2"><c r="A2"><v>20240101</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val parts = Seq(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="real" sheetId="1" r:id="rId7"/><sheet name="decoy" sheetId="2" r:id="rId8"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId8" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet10.xml"/>
          |<Relationship Id="rId7" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet10.xml" -> decoy,
      "xl/worksheets/sheet2.xml" -> real)
    val f = Files.createTempDirectory("xlsx3").resolve("multi.xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    val raw = XlsxLogbook.readRaw(spark, f.getAbsolutePath)
    assert(raw.columns.toSeq == Seq("ymd"))
    assert(raw.collect().map(_.getString(0)).toSeq == Seq("20240101"))
  }

  test("a cell reference beyond column XFD fails loudly, never an " +
      "unbounded null-fill") {
    val f = Files.createTempDirectory("xlsx4").resolve("wide.xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(
      """<?xml version="1.0"?><worksheet><sheetData>
        |<row r="1"><c r="AAAA1" t="inlineStr"><is><t>x</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val e = intercept[IllegalArgumentException] {
      XlsxLogbook.readRaw(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("XFD"))
  }

  test("a part decompressing past the bound fails loudly (deflate bomb)") {
    val f = Files.createTempDirectory("xlsx5").resolve("bomb.xlsx").toFile
    val zos = new ZipOutputStream(new FileOutputStream(f))
    zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write("""<?xml version="1.0"?><worksheet><sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>""".getBytes("UTF-8"))
    val mb = new Array[Byte](1 << 20)
    java.util.Arrays.fill(mb, ' '.toByte)
    for (_ <- 1 to 33) zos.write(mb) // 33 MB of spaces: ~40 KB zipped
    zos.write("</t></is></c></row></sheetData></worksheet>".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val e = intercept[Exception] { XlsxLogbook.readRaw(spark, f.getAbsolutePath) }
    // the counter fires mid-parse; the DOM may wrap it, so match the text
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("deflate bomb")), msgs(e).mkString(" | "))
  }

  test("missing logbook columns fail loudly") {
    val e = intercept[IllegalArgumentException] {
      // point the typed reader at a workbook whose header lacks the fields
      val f = Files.createTempDirectory("xlsx2").resolve("bad.xlsx").toFile
      val zos = new ZipOutputStream(new FileOutputStream(f))
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      zos.write(
        """<?xml version="1.0"?><worksheet><sheetData>
          |<row r="1"><c r="A1" t="inlineStr"><is><t>ymd</t></is></c></row>
          |<row r="2"><c r="A2"><v>20240101</v></c></row>
          |</sheetData></worksheet>""".stripMargin.getBytes("UTF-8"))
      zos.closeEntry()
      zos.close()
      XlsxLogbook.logbook(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("columns missing"))
  }
}
