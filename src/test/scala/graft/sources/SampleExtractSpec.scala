package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SampleExtract's safety surface (ADVICE r19): the write-time rate
  * marker, the non-divisor refusal in [[SampleExtract.read]], the
  * fall-back-on-anything contract of [[SampleExtract.detectionDocs]]
  * (unreadable dir, junk content, missing columns, rate mismatch), and
  * key-named conf validation for `spark.graft.d04.salt.sampleInv`. */
class SampleExtractSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0 until 512).map(i => (i.toLong, s"text of doc $i"))
    .toDF("doc_id", "text")

  private def withTmp[T](f: java.io.File => T): T = {
    val tmp = Files.createTempDirectory("graft-se").toFile
    def rmTree(x: java.io.File): Unit = {
      Option(x.listFiles).foreach(_.foreach(rmTree)); x.delete(): Unit
    }
    try f(tmp) finally rmTree(tmp)
  }

  private def withConfs[T](kv: (String, String)*)(f: => T): T =
    try { kv.foreach { case (k, v) => spark.conf.set(k, v) }; f }
    finally kv.foreach { case (k, _) => spark.conf.unset(k) }

  test("write persists the rate marker; read refuses a non-divisor rate") {
    withTmp { tmp =>
      val out = new java.io.File(tmp, "x").getAbsolutePath
      SampleExtract.write(docs, out, 8)
      assert(SampleExtract.writeTimeInv(spark, out).contains(8))
      // divisor rates read fine (8 itself, and a coarser multiple)
      assert(SampleExtract.read(spark, out, 8).count() > 0)
      SampleExtract.read(spark, out, 16).collect()
      // a non-divisor live rate would collapse density to 1/lcm — refused
      val e = intercept[IllegalArgumentException] {
        SampleExtract.read(spark, out, 12)
      }
      assert(e.getMessage.contains("does not divide") &&
        e.getMessage.contains("1/8"), e.getMessage)
    }
  }

  test("detectionDocs falls back to in-plan sampling (None, not an error) " +
      "on junk dirs, missing columns, and rate mismatch") {
    withTmp { tmp =>
      // dir exists but holds no parquet
      val junk = new java.io.File(tmp, "junk"); junk.mkdirs()
      Files.write(junk.toPath.resolve("readme.txt"), "not parquet".getBytes)
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> junk.getAbsolutePath) {
        assert(SampleExtract.detectionDocs(spark).isEmpty,
          "junk dir must fall back, not throw")
      }
      // parquet readable but lacks the text column
      val noText = new java.io.File(tmp, "notext").getAbsolutePath
      docs.select("doc_id").write.parquet(noText)
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> noText) {
        assert(SampleExtract.detectionDocs(spark).isEmpty,
          "schema-less extract must fall back, not fail later at analysis")
      }
      // rate mismatch: extract written at 1/8, conf asks 1/12
      val mm = new java.io.File(tmp, "mm").getAbsolutePath
      SampleExtract.write(docs, mm, 8)
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> mm,
          "spark.graft.d04.salt.sampleInv" -> "12") {
        assert(SampleExtract.detectionDocs(spark).isEmpty,
          "non-divisor extract must fall back (in-plan has correct density)")
      }
      // and the good case still resolves
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> mm,
          "spark.graft.d04.salt.sampleInv" -> "16") {
        val got = SampleExtract.detectionDocs(spark)
        assert(got.isDefined && got.get.count() > 0)
      }
    }
  }

  test("sampleInv conf validation names the key (no bare " +
      "NumberFormatException, no pmod-by-zero)") {
    withTmp { tmp =>
      val out = new java.io.File(tmp, "v").getAbsolutePath
      SampleExtract.write(docs, out, 8)
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> out,
          "spark.graft.d04.salt.sampleInv" -> "not-a-number") {
        val e = intercept[IllegalArgumentException] {
          SampleExtract.detectionDocs(spark)
        }
        assert(e.getMessage.contains("spark.graft.d04.salt.sampleInv"),
          e.getMessage)
      }
      withConfs("spark.graft.d04.salt" -> "4",
          "spark.graft.d04.salt.sampleDir" -> out,
          "spark.graft.d04.salt.sampleInv" -> "0") {
        val e = intercept[IllegalArgumentException] {
          SampleExtract.detectionDocs(spark)
        }
        assert(e.getMessage.contains("spark.graft.d04.salt.sampleInv"),
          e.getMessage)
      }
    }
  }
}
