package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.pipeline.TreeTable.TreeRow

/** S3–S6 end to end: distributed `.nxs`/`.h5` parsing into the long-format
  * tree table ([[graft.pipeline.TreeTable]]).
  *
  * `binaryFile` lists and reads the measurement tree with one task per file;
  * [[Hdf5.toTreeRows]] runs inside the executors, so a 100 TB corpus of
  * instrument files parallelizes by file count with no driver involvement.
  * The output feeds `TreeTable.readF64/readStr/readQuantity` and
  * `TreeTable.translate` — the reference's `utilities.py` read semantics
  * (missing path -> typed default) happen relationally downstream, so a file
  * missing a dataset never fails the scan.
  */
object Hdf5Source {

  /** Parse every matching file under `path` into TreeRows. */
  def treeTable(spark: SparkSession, path: String, glob: String = "*.h5"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => Hdf5.toTreeRows(file, bytes) }
      .toDF()
  }

  /** Streaming variant (§2.9): new `.h5`/`.nxs` files appearing under
    * `path` arrive as micro-batches of TreeRows — the same per-file parse as
    * [[treeTable]], so the batch pipeline stages run unchanged downstream
    * (stream/batch DAG reuse). Pair with the [[graft.streaming.Watcher]]
    * completeness gate for the reference's poll-until-stable semantics. */
  def treeStream(spark: SparkSession, path: String, glob: String = "*.h5"): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) => Hdf5.toTreeRows(file, bytes) }
      .toDF()
  }

  /** Parse one in-memory file (testing / driver-side spot reads). */
  def parse(file: String, bytes: Array[Byte]): Seq[TreeRow] =
    Hdf5.toTreeRows(file, bytes)
}
