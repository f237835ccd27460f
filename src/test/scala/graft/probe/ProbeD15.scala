import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

object ProbeD15 {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/sfprobe100"
    val n = 8
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val r = f
      println(f"$label%-28s ${(System.nanoTime - t0) / 1e9}%.2f s  rows=$r")
    }
    val docs = Tables.loadSpread(s, dir, "documents")
      .select(col("doc_id"), col("source"), TextFns.tokens(col("text")).as("toks"))
    time("tokenize+count")(docs.select(sum(size(col("toks")))).head().getLong(0))
    val gramsStr = docs.select(col("doc_id"),
        explode(when(size(col("toks")) >= n,
          expr(s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))"))
          .otherwise(array().cast("array<string>"))).as("gram"))
    time("gram strings only")(gramsStr.select(count(lit(1))).head().getLong(0))
    val gramsHashed = gramsStr.select(col("doc_id"), TextFns.md5Hash32(col("gram")).as("gh"))
    time("gram strings + md5")(gramsHashed.select(sum(col("gh") % 97)).head().getLong(0))
    time("pairs agg")(gramsHashed.groupBy(col("gh"), col("doc_id")).agg(count(lit(1)).as("occ"))
      .select(count(lit(1))).head().getLong(0))
    // arithmetic rolling hash alternative: per-token md5 then 8-window combine
    val th = docs.select(col("doc_id"),
      transform(col("toks"), t => TextFns.md5Hash32(t)).as("hs"))
    val rolled = th.select(col("doc_id"),
      explode(when(size(col("hs")) >= n,
        expr(s"transform(sequence(1, size(hs) - ${n - 1}), " +
          s"i -> aggregate(slice(hs, i, $n), 0L, (acc, x) -> (acc * 131 + x) % ${1L << 55}))"))
        .otherwise(array().cast("array<long>"))).as("gh"))
    time("rolling-hash grams")(rolled.select(sum(col("gh") % 97)).head().getLong(0))
    time("rolling pairs agg")(rolled.groupBy(col("gh"), col("doc_id")).agg(count(lit(1)).as("occ"))
      .select(count(lit(1))).head().getLong(0))
    s.stop()
  }
}
