package graft.sources

import java.io.File
import java.util.zip.ZipFile

import scala.collection.mutable

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.pipeline.Model

/** S9: the Excel logbook source. The reference ingests its experiment
  * logbook from an `.xlsx` workbook (`Logbook2MouseReader(defaults
  * .logbook_file)`, `/root/reference/src/directory_processor.py:30-33`);
  * this reads the same container with the JDK only — an `.xlsx` is a zip of
  * XML parts (ECMA-376): `xl/worksheets/sheet1.xml` for cells,
  * `xl/sharedStrings.xml` for the string table.
  *
  * The logbook is a small dimension (thousands of rows, far below broadcast
  * threshold), so it is parsed driver-side and handed to Spark as a local
  * relation — the same treatment `Stages.Context` gives every dimension
  * table; the 100 TB side is always the repetition/fact frame.
  *
  * Supported cell forms: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula-cached strings (`t="str"`), booleans, and
  * numbers; blank cells become nulls. Row 1 is the header.
  */
object XlsxLogbook {

  /** All-string DataFrame of the first worksheet, header row as names. */
  def readRaw(spark: SparkSession, path: String): DataFrame = {
    val rows = parseSheet(new File(path))
    require(rows.nonEmpty, s"$path: empty worksheet")
    val header = rows.head.map(c => Option(c).getOrElse("").trim)
    require(header.forall(_.nonEmpty), s"$path: blank header cell")
    val width = header.length
    val data = rows.tail.map { r =>
      Row.fromSeq((0 until width).map(i => if (i < r.length) r(i) else null))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
  }

  /** Columns newer than the original logbook layout, filled with their
    * defaults when an older workbook omits them (case-class defaults are
    * invisible to the encoder schema, so the fallback lives here). */
  private val optionalColumns: Map[String, org.apache.spark.sql.Column] =
    Map("matrixfraction" -> org.apache.spark.sql.functions.lit(1.0))

  /** The typed logbook dimension: header names must match
    * [[Model.LogbookEntry]] fields; cells are cast to the field types.
    * Extra workbook columns are ignored, missing REQUIRED ones are an
    * error; missing optional ones take their documented defaults. */
  def logbook(spark: SparkSession, path: String): DataFrame = {
    val raw0 = readRaw(spark, path)
    val raw = optionalColumns.foldLeft(raw0) { case (df, (name, default)) =>
      if (df.columns.contains(name)) df else df.withColumn(name, default)
    }
    val target = org.apache.spark.sql.Encoders.product[Model.LogbookEntry].schema
    val missing = target.fields.map(_.name).filterNot(raw.columns.contains)
    require(missing.isEmpty, s"$path: logbook columns missing: ${missing.mkString(", ")}")
    raw.select(target.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
  }

  // ----------------------------------------------------------- xlsx parts --

  private def parseSheet(file: File): Seq[Array[String]] = {
    val zip = new ZipFile(file)
    try {
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseShared(zip, e)).getOrElse(IndexedSeq.empty)
      val sheetName = firstSheetPart(zip, file)
      val doc = newBuilder.parse(boundedStream(zip, zip.getEntry(sheetName)))
      val rows = doc.getElementsByTagName("row")
      (0 until rows.getLength).map { i =>
        val row = rows.item(i).asInstanceOf[Element]
        val cells = row.getElementsByTagName("c")
        val out = mutable.ArrayBuffer.empty[String]
        (0 until cells.getLength).foreach { j =>
          val c = cells.item(j).asInstanceOf[Element]
          val idx = colIndex(c.getAttribute("r"), fallback = out.length)
          while (out.length <= idx) out += null
          out(idx) = cellValue(c, shared)
        }
        out.toArray
      }
    } finally zip.close()
  }

  /** The workbook's FIRST worksheet, resolved the way a spreadsheet app
    * does: `xl/workbook.xml`'s first `<sheet>` carries an `r:id`, and
    * `xl/_rels/workbook.xml.rels` maps that id to the sheet part. Zip entry
    * order and part-name sort are both unreliable proxies (`sheet10.xml`
    * sorts before `sheet2.xml`); when the workbook/rels parts are absent
    * (minimal hand-built containers), fall back to the smallest NUMERIC
    * suffix of the part names. */
  private def firstSheetPart(zip: ZipFile, file: File): String = {
    val relNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val viaWorkbook = Option(zip.getEntry("xl/workbook.xml")).flatMap { wb =>
      val doc = newBuilder.parse(boundedStream(zip, wb))
      val sheets = doc.getElementsByTagName("sheet")
      if (sheets.getLength == 0) None
      else {
        val first = sheets.item(0).asInstanceOf[Element]
        val rid = Option(first.getAttributeNS(relNs, "id")).filter(_.nonEmpty)
          .orElse(Option(first.getAttribute("r:id")).filter(_.nonEmpty))
        rid.flatMap { id =>
          Option(zip.getEntry("xl/_rels/workbook.xml.rels")).flatMap { re =>
            val rels = newBuilder.parse(boundedStream(zip, re))
              .getElementsByTagName("Relationship")
            (0 until rels.getLength).map(rels.item(_).asInstanceOf[Element])
              .find(_.getAttribute("Id") == id)
              .map(_.getAttribute("Target"))
              .map(t => if (t.startsWith("/")) t.stripPrefix("/") else s"xl/$t")
              .filter(t => zip.getEntry(t) != null)
          }
        }
      }
    }
    viaWorkbook.getOrElse {
      import scala.jdk.CollectionConverters._
      val sheets = zip.entries().asScala.map(_.getName)
        .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
        .toSeq
      require(sheets.nonEmpty, s"$file: no worksheets")
      sheets.minBy { n =>
        val digits = n.stripPrefix("xl/worksheets/sheet").takeWhile(_.isDigit)
        if (digits.isEmpty) Long.MaxValue else digits.toLong
      }
    }
  }

  private def parseShared(zip: ZipFile, e: java.util.zip.ZipEntry): IndexedSeq[String] = {
    val doc = newBuilder.parse(boundedStream(zip, e))
    val items = doc.getElementsByTagName("si")
    (0 until items.getLength).map { i =>
      // concatenate every <t> descendant — plain and rich-text runs alike
      val ts = items.item(i).asInstanceOf[Element].getElementsByTagName("t")
      (0 until ts.getLength).map(ts.item(_).getTextContent).mkString
    }
  }

  private def cellValue(c: Element, shared: IndexedSeq[String]): String = {
    val vs = c.getElementsByTagName("v")
    val is = c.getElementsByTagName("is")
    c.getAttribute("t") match {
      case "s" if vs.getLength > 0 => shared(vs.item(0).getTextContent.trim.toInt)
      case "inlineStr" if is.getLength > 0 => is.item(0).getTextContent
      case _ if vs.getLength > 0 => vs.item(0).getTextContent
      case _ => null
    }
  }

  /** ECMA-376's hard sheet bound: columns run A..XFD (16384, 3 letters).
    * Also the guard that a malformed cell reference cannot drive the
    * null-fill loop into an unbounded allocation. */
  private val MaxCols = 16384

  /** "C7" -> 2; cells lacking the reference attribute fall back to append. */
  private def colIndex(ref: String, fallback: Int): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) fallback
    else {
      require(letters.length <= 3,
        s"cell reference '$ref' beyond the XFD column bound")
      val idx = letters.foldLeft(0)((acc, ch) =>
        acc * 26 + (ch.toUpper - 'A' + 1)) - 1
      require(idx < MaxCols, s"cell reference '$ref' beyond column XFD")
      idx
    }
  }

  /** The logbook is thousands of rows (single-digit MBs of XML); a part
    * decompressing past this bound is a deflate bomb, not a logbook —
    * fail loudly rather than let the DOM balloon the driver heap. Zip
    * size fields can lie, so the cap counts ACTUAL decompressed bytes.
    * 32 MB is ~10x the largest plausible logbook part while keeping the
    * worst-case transient DOM (UTF-16 doubles it) well under 100 MB. */
  private val MaxPartBytes = 32L << 20

  private def boundedStream(zip: ZipFile,
      e: java.util.zip.ZipEntry): java.io.InputStream =
    new java.io.FilterInputStream(zip.getInputStream(e)) {
      private var n = 0L
      private def count(k: Int): Int = {
        if (k > 0) {
          n += k
          require(n <= MaxPartBytes,
            s"${e.getName}: decompressed past $MaxPartBytes bytes " +
              "(deflate bomb?)")
        }
        k
      }
      override def read(): Int = {
        val b = in.read(); if (b >= 0) count(1); b
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        count(in.read(b, off, len))
      // FilterInputStream.skip would delegate to the inflater stream and
      // the skipped DECOMPRESSED bytes would bypass the bomb counter —
      // route them through read() so every byte is counted.
      override def skip(k: Long): Long = {
        val buf = new Array[Byte](8192)
        var done = 0L
        var eof = false
        while (done < k && !eof) {
          val r = read(buf, 0, math.min(buf.length.toLong, k - done).toInt)
          if (r < 0) eof = true else done += r
        }
        done
      }
    }

  private def newBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.setNamespaceAware(true) // r:id on <sheet> resolves via getAttributeNS
    f.newDocumentBuilder()
  }
}
