package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import Model._

/** Synthetic repetition fixtures (FIXTURES.md §A): Gaussian beams with known
  * center/width so kernel outputs have analytic expectations. */
object Fixtures {

  val H = 64
  val W = 64
  val CY = 32.0
  val CX = 31.5
  val Sigma = 3.0

  /** 2-D Gaussian beam, amplitude `amp`, on a zero background. */
  def gaussian(h: Int = H, w: Int = W, cy: Double = CY, cx: Double = CX,
      sigma: Double = Sigma, amp: Double = 1000.0): Array[Float] = {
    val out = new Array[Float](h * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val dy = y - cy; val dx = x - cx
        out(y * w + x) = (amp * math.exp(-(dy * dy + dx * dx) / (2 * sigma * sigma))).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  private def rep(batch: Int, repetition: Int, configuration: Int,
      sampleScale: Double): Repetition = {
    val direct = gaussian()
    val sample = direct.map(v => (v * sampleScale).toFloat)
    Repetition(
      ymd = "20240115", batch = batch, repetition = repetition,
      configuration = configuration,
      directBeam = direct, directH = H, directW = W, directFrameTime = 1.0,
      sampleBeam = sample, sampleH = H, sampleW = W, sampleFrameTime = 1.0,
      darkcurrent = 0.0, averagedNumberOfFrames = 1.0,
      incidentWavelength = Quantity(1.54, "angstrom"),
      detX = Quantity(2.5, "m"), sampleX = Quantity(500.0, "mm"),
      modificationTime = Timestamp.valueOf("2024-01-15 12:00:00"))
  }

  /** 2 batches x 2 configurations x 3 repetitions.
    * Batch 1 transmits 0.56, batch 2 (its background) 0.8 — so the
    * bg-corrected sample transmission is exactly 0.7. */
  def repetitions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows =
      for {
        batch <- Seq(1, 2)
        config <- Seq(1, 2)
        r <- Seq(1, 2, 3)
      } yield rep(batch, r, config, if (batch == 1) 0.56 else 0.8)
    rows.toDS().toDF()
  }

  def logbook(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      // batch 1: thickness unknown (derive from absorption), bg = batch 2
      LogbookEntry("20240115", 1, "prop1", "user1", "s1", "sample one", "SiO2",
        2.2, -1.0, "20240115", 2, "", 0, 100.0),
      // batch 2: logbook thickness wins; background = itself (short-circuit)
      LogbookEntry("20240115", 2, "prop1", "user1", "s2", "background", "H2O",
        1.0, 0.001, "20240115", 2, "None", 0, 100.0)
    ).toDS().toDF()
  }

  def masks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val m = Array.fill(H * W)(1f)
    Seq(
      MaskEntry("20240101", 1, m, H, W, "Masks/20240101_1.nxs"), // chosen for config 1
      MaskEntry("20240201", 1, m, H, W, "Masks/20240201_1.nxs"), // future -> never
      MaskEntry("20231201", 2, m, H, W, "Masks/20231201_2.nxs") // chosen for config 2
    ).toDS().toDF()
  }

  def context(spark: SparkSession): Stages.Context =
    Stages.Context(logbook(spark), masks(spark))
}
