package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.functions.TextFns

object D04Piece {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val shingleK = graft.functions.MinHashSigF.ShingleK
    def docs = Tables.loadSpread(spark, dir, "documents")
    def shOld = docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shingles(col("text"), shingleK))).as("s"))
      .select(col("doc_id"), TextFns.md5Hash60(col("s")).as("s"))
    def shNew = docs
      .select(col("doc_id"), graft.functions.PushdownBarrierF.pushdownBarrier(
        array_distinct(TextFns.shingles(col("text"), shingleK))).as("sarr"))
      .select(col("doc_id"), size(col("sarr")).as("c"), explode(col("sarr")).as("sraw"))
      .select(col("doc_id"), col("c"), TextFns.md5Hash60(col("sraw")).as("s"))
    def joinOld = shOld.as("a").join(shOld.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    def joinNew = shNew.as("a").join(shNew.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"), max(col("a.c")).as("ca"), max(col("b.c")).as("cb"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[piece] $label%-12s min=${ts.min}%.3f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    time("shOld")(shOld); time("shNew")(shNew)
    time("joinOld")(joinOld); time("joinNew")(joinNew)
    time("joinNewNoCa")(shNew.as("a").join(shNew.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i")))
    spark.stop()
  }
}
