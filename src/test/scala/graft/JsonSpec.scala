package graft

import graft.core.Json
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Pins Json.write's crash-protocol contract: atomic replace (no torn
  * in-place truncate), no leftover temp files, and — the r15 regression
  * fix — permissions that match what a plain umask-governed create would
  * produce (createTempFile's forced rw------- must NOT survive the rename
  * and lock out group/other readers of index metadata). */
case class JsonSpecBlob(name: String, n: Long)

class JsonSpec extends AnyFunSuite {
  type Blob = JsonSpecBlob
  def Blob(name: String, n: Long): Blob = JsonSpecBlob(name, n)

  test("write round-trips and replaces an existing file atomically") {
    val dir = Files.createTempDirectory("jsonspec")
    val p = dir.resolve("blob.json").toString
    Json.write(p, Blob("a", 1))
    assert(Json.read(p, classOf[JsonSpecBlob]) == Blob("a", 1))
    Json.write(p, Blob("b", 2)) // REPLACE_EXISTING path
    assert(Json.read(p, classOf[JsonSpecBlob]) == Blob("b", 2))
    // no temp residue
    val leftovers = Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(names.toSeq == Seq("blob.json"), s"temp residue: $names")
  }

  test("written file gets umask-default permissions, not temp-file 600") {
    assume(System.getProperty("os.name").toLowerCase.contains("linux"))
    val dir = Files.createTempDirectory("jsonperm")
    val viaJson = dir.resolve("meta.json")
    Json.write(viaJson.toString, Blob("x", 3))
    val plain = dir.resolve("plain.json")
    Files.write(plain, "{}".getBytes) // the umask baseline
    val got = Files.getPosixFilePermissions(viaJson)
    val want = Files.getPosixFilePermissions(plain)
    assert(got == want,
      s"Json.write perms $got differ from umask-default $want")
  }
}
