package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (see repo:TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. `events.ts` is physically
  * TIMESTAMP(NANOS) which Spark's vectorized reader cannot represent as
  * TimestampType (micros); we read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` session conf set in
  * [[GraftSession]] and normalize to a micros TimestampType column here so
  * every downstream operator (and the DuckDB oracle, which truncates
  * ns -> us on cast) sees identical values.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-(session, dir, table) memo of the loaded DataFrame — PLAN reuse,
    * never data reuse. Round-21 measurement: every `spark.read.parquet`
    * call pays ~80–100 ms of DRIVER work (file listing + footer schema
    * inference), and the suite re-loads the same ten immutable tables a
    * few hundred times per bench pass — ~20% of suite wall was Catalyst/
    * metadata, not execution (PlanCostProbe). The cached object is a lazy
    * logical plan: every action on it still scans the parquet files, so
    * bench/oracle runs keep computing from the inputs. The file LISTING is
    * snapshotted at first load per session — the same semantics any caller
    * holding a DataFrame reference already had; these test dirs are
    * immutable for a session's lifetime. Entries are keyed on the session
    * object, so a new session (or a different dir) re-lists.
    */
  private val dfMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    dfMemo.computeIfAbsent((spark, sfDir, name), { _ =>
      // Set here (not only in GraftSession) so driver-created sessions that
      // didn't go through our builder still read events.parquet correctly.
      if (name == "events")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (name == "events") normalizeEventTs(df) else df
    })

  /** ts read as LongType (nanos) under nanosAsLong=true -> micros timestamp.
    * Integer division truncates exactly like DuckDB's TIMESTAMP_NS->TIMESTAMP
    * cast, keeping oracle parity bit-exact.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      // `ts div 1000`, NOT `ts / 1000`: `/` on longs is double division in
      // Spark and doubles cannot represent ns epochs (~1.7e18 > 2^53), which
      // silently shifts timestamps by ±1 us.
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // micros parquet WITHOUT the UTC-adjusted flag (DuckDB and many
      // writers) arrives as TIMESTAMP_NTZ; the session tz is pinned to UTC
      // so the cast is value-preserving and every downstream time function
      // sees one type regardless of which writer produced the file
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Load with an explicit repartition when (and ONLY when) the scan is
    * under-split: the small dimension parquet files arrive as a single
    * input split, which would serialize any compute-heavy downstream
    * (hashing, dot products, codecs) onto one task; the tiny shuffle buys
    * full-cluster parallelism for the expensive part. Round 21 makes the
    * documented "at real scale this becomes a no-op decision" TRUE IN THE
    * PLAN: when the scan already carries >= defaultParallelism splits the
    * repartition node is not added at all — the unconditional form
    * re-shuffled the ENTIRE corpus (text payloads included) at 100 TB for
    * nothing (guide §2.4: remove shuffles outright). The split count comes
    * from the scan's own RDD (no jobs run); memoized with the table since
    * it is stable per (session, dir, table). */
  private val spreadMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def loadSpread(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spreadMemo.computeIfAbsent((spark, sfDir, name), { _ =>
      val df = load(spark, sfDir, name)
      val target = spark.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    })

  /** Register all tables as temp views for `spark.sql` queries. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
