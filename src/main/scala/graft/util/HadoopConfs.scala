package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Ships the Spark session's Hadoop configuration to executor tasks.
  *
  * Constructing `new Configuration()` on an executor drops every
  * `spark.hadoop.*` session setting (s3a credentials, endpoints,
  * timeouts), so distributed reads/writes against object storage fail
  * auth on a real cluster even though local[] tests pass. The driver
  * captures a [[Shipped]] snapshot in the task closure; deserializing it
  * on the executor installs the conf JVM-wide, where [[get]] picks it up
  * for every downstream open/create.
  */
object HadoopConfs {

  @volatile private var installed: Configuration = _

  /** The shipped session conf when a task carries one, else a default. */
  def get: Configuration = {
    val c = installed
    if (c != null) c else new Configuration()
  }

  def install(conf: Configuration): Unit = { installed = conf }

  /** Driver-side snapshot for closure capture. */
  def ship(spark: SparkSession): Shipped =
    new Shipped(spark.sparkContext.hadoopConfiguration)

  /** Serializable Configuration carrier (Hadoop's Writable round-trip);
    * installs itself via [[install]] when deserialized in a task.
    */
  final class Shipped(@transient private var conf: Configuration)
      extends Serializable {

    def value: Configuration = conf

    /** Idempotent explicit install for same-JVM (local-mode) callers. */
    def installHere(): Unit = HadoopConfs.install(conf)

    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }

    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
      HadoopConfs.install(conf)
    }
  }
}
