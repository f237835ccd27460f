package graft.pipeline

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Runnable demonstration of the SAXS pipeline surface: synthetic Gaussian
  * repetitions through the full stage chain + stacker + flux table, printing
  * the derived physics. (Fixture generation lives in test scope; this main
  * builds an equivalent tiny frame inline.)
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import Model._

    val h = 64; val w = 64
    def gaussian(scale: Double): Array[Float] = {
      val out = new Array[Float](h * w)
      for (y <- 0 until h; x <- 0 until w) {
        val dy = y - 32.0; val dx = x - 31.5
        out(y * w + x) = (scale * 1000 * math.exp(-(dy * dy + dx * dx) / 18.0)).toFloat
      }
      out
    }
    val reps = (for {
      batch <- Seq(1, 2); r <- Seq(1, 2, 3)
    } yield Repetition("20240115", batch, r, 1,
      gaussian(1.0), h, w, 1.0,
      gaussian(if (batch == 1) 0.56 else 0.8), h, w, 1.0,
      0.0, 1.0, Quantity(1.54, "angstrom"), Quantity(2.5, "m"),
      Quantity(500.0, "mm"),
      java.sql.Timestamp.valueOf("2024-01-15 12:00:00"))).toDS().toDF()

    val logbook = Seq(
      LogbookEntry("20240115", 1, "p", "u", "s1", "sample", "SiO2", 2.2, -1.0,
        "20240115", 2, "", 0, 100.0),
      LogbookEntry("20240115", 2, "p", "u", "s2", "bg", "H2O", 1.0, 0.001,
        "20240115", 2, "None", 0, 100.0)).toDS().toDF()
    val masks = Seq(
      MaskEntry("20240101", 1, Array.fill(h * w)(1f), h, w, "Masks/20240101_1.nxs"))
      .toDS().toDF()

    val ctx = Stages.Context(logbook, masks)
    val processed = Stages.run(reps, ctx)
    println("== processed repetitions ==")
    processed.select(col("ymd"), col("batch"), col("repetition"), col("mask_path"),
      col("beam_center")(0).as("cy"), col("beam_center")(1).as("cx"),
      col("transmission"), col("thickness"), col("energy_kev")).show(false)
    println("== stacked ==")
    Stages.registry("stacker")(processed, ctx)
      .select("ymd", "batch", "configuration", "n_repetitions",
        "mean_transmission", "std_transmission", "template_mask_path")
      .show(false)
    println("== plan (stacker) ==")
    Stages.registry("stacker")(processed, ctx).explain("formatted")
    spark.stop()
  }
}
