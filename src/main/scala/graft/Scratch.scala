package graft

import org.apache.spark.sql.functions._

/** Throwaway parity probe (deleted before final round). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"

    val ev = Tables.load(spark, sf, "events")
    ev.printSchema()
    ev.select(min($"ts"), max($"ts")).show(false)

    // split semantics
    Seq("abc").toDF("s").select(split($"s", "").as("chars"), split(lit("a b  c"), "\\s+").as("toks")).show(false)
    // hex parse parity: duckdb ('0x'||substr(md5('abc'),1,8))::BIGINT = 2416005272
    Seq("abc").toDF("s").select(md5($"s"), conv(substring(md5($"s"), 1, 8), 16, 10).cast("long")).show(false)
    // window + session_window in batch
    ev.groupBy(window($"ts", "10 minutes"), $"event_type").count().show(3, false)
    ev.groupBy(session_window($"ts", "30 minutes"), $"user_id").count().show(3, false)
    // cosine: pair (0,1) in double
    val emb = Tables.load(spark, sf, "embeddings")
    val a = emb.filter($"vec_id" === 0).select($"embedding").as[Array[Float]].head()
    val b = emb.filter($"vec_id" === 1).select($"embedding").as[Array[Float]].head()
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    println(s"cosine01=${dot / (na * nb)}")
    spark.stop()
  }
}
