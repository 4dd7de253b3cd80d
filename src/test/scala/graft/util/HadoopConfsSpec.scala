package graft.util

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.scalatest.funsuite.AnyFunSuite

class HadoopConfsSpec extends AnyFunSuite {

  test("Shipped conf survives Java serialization and installs on read") {
    // defaults + one session-style setting (what spark.hadoop.* becomes)
    val conf = new org.apache.hadoop.conf.Configuration()
    conf.set("fs.s3a.endpoint", "https://object.store.test")
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(new HadoopConfs.Shipped(conf))
    oos.close()
    // deserialization is what a task does with the captured closure —
    // it must both restore the value and install it JVM-wide
    val back = new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[HadoopConfs.Shipped]
    assert(back.value.get("fs.s3a.endpoint") == "https://object.store.test")
    assert(HadoopConfs.get.get("fs.s3a.endpoint") == "https://object.store.test")
    // and the installed conf still carries Hadoop defaults, so ordinary
    // file: FileSystem resolution keeps working after the install
    val p = new org.apache.hadoop.fs.Path("file:///tmp")
    assert(p.getFileSystem(HadoopConfs.get) != null)
  }
}
