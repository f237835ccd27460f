package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable carrier for a Hadoop [[Configuration]] so it can ride a
  * Spark broadcast to executors (object-store credentials, fs settings).
  * `Configuration` itself is `Writable` but not `java.io.Serializable`;
  * this wrapper delegates Java serialization to its Writable form.
  * Spark has an equivalent internally, but it is `private[spark]` in 4.x,
  * so we own these ~20 lines instead of reaching across the package seam.
  */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object SerializableHadoopConf {
  /** Broadcast the session's Hadoop conf once per source construction. */
  def broadcast(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[SerializableHadoopConf] =
    spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
}
