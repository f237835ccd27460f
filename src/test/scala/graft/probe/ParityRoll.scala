import org.apache.spark.sql.functions._
object ParityRoll {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[2]", 2).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val df = Seq("a b c d e f g h x").toDF("text")
    val r = df.select(
      expr("aggregate(slice(transform(split(trim(text), '\\\\s+'), t -> " +
        "cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)), 1, 8), 0L, " +
        s"(acc, x) -> (acc * 131 + x) % ${1L << 55})").as("gh"))
      .head().getLong(0)
    println("SPARK_GH=" + r)
    // and via TextFns.md5Hash32
    val r2 = df.select(
      aggregate(slice(transform(split(trim(col("text")), "\\s+"),
        t => graft.functions.TextFns.md5Hash32(t)), 1, 8), lit(0L),
        (acc, x) => (acc * 131 + x) % (1L << 55)).as("gh")).head().getLong(0)
    println("SPARK_GH2=" + r2)
    s.stop()
  }
}
