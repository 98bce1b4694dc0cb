package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.charset.StandardCharsets
import java.nio.file.{AtomicMoveNotSupportedException, Files, Path, Paths, StandardCopyOption}

/** Tiny JSON persistence util over the Jackson that ships with Spark.
  * Index metadata files are small (schema, field mapper, quantizer params,
  * centroid matrices for test-sized indexes) — driver-side IO only.
  */
object Json {
  val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Write-temp-fsync-then-atomic-rename, never truncate-in-place: several
    * callers key a crash protocol off ONE file's integrity — the
    * write-ahead journal (`pending.json` is rewritten in place at the
    * train stamped flip) and the snapshot floor — and a plain Files.write
    * is truncate-then-write, so a crash mid-rewrite would leave torn JSON
    * that recovery can only fail loudly on. The temp lives in the target's
    * own directory so the rename never crosses a filesystem; its data is
    * force(true)'d before the move and the directory entry is fsynced
    * after it (best-effort — not every FS lets a directory be opened), so
    * the renamed file can't reappear empty after power loss. The temp gets
    * a unique nanoTime suffix rather than createTempFile (whose forced
    * rw------- bits would survive the rename and lock out group/other
    * readers that the umask previously admitted); writers are already
    * serialized per index by the write lock. */
  def write[T](path: String, value: T): Unit = {
    val p = Paths.get(path)
    val dir = if (p.getParent != null) p.getParent else Paths.get(".")
    Files.createDirectories(dir)
    val tmp = dir.resolve(
      "." + p.getFileName.toString + "." + java.lang.Long.toHexString(
        System.nanoTime()) + ".tmp")
    try {
      val bytes = mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(value).getBytes(StandardCharsets.UTF_8)
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        // WritableByteChannel permits short writes — loop until drained, or
        // a short write would fsync + atomically rename a TRUNCATED temp
        // over the good file (the exact torn-JSON failure this exists to
        // prevent)
        val buf = java.nio.ByteBuffer.wrap(bytes)
        while (buf.hasRemaining) ch.write(buf)
        ch.force(true)
      } finally ch.close()
      try Files.move(tmp, p,
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: AtomicMoveNotSupportedException =>
          Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
      }
      // fsync the directory so the rename itself is durable
      try {
        val dch = java.nio.channels.FileChannel.open(dir,
          java.nio.file.StandardOpenOption.READ)
        try dch.force(true) finally dch.close()
      } catch { case _: Exception => () }
    } finally { Files.deleteIfExists(tmp); () }
  }

  def read[T](path: String, clazz: Class[T]): T =
    mapper.readValue(Files.readAllBytes(Paths.get(path)), clazz)

  def exists(path: String): Boolean = Files.exists(Paths.get(path))
}
