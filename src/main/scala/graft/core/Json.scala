package graft.core

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

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

  def write[T](path: String, value: T): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(value).getBytes(StandardCharsets.UTF_8))
  }

  def read[T](path: String, clazz: Class[T]): T =
    mapper.readValue(Files.readAllBytes(Paths.get(path)), clazz)

  def exists(path: String): Boolean = Files.exists(Paths.get(path))
}
