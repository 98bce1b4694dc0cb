package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (test scope, not shipped): times phases of the
  * slow bench queries one by one. Run:
  * sbt -batch "Test/runMain graft.ProfMain <what>" */
object ProfMain {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val what = args.headOption.getOrElse("engine")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    what match {
      case "engine" => profEngine(spark, dir)
      case name =>
        // repeat a SparkEntry query 3x
        (1 to 3).foreach { i =>
          time(s"$name #$i")(SparkEntry.queries(name)(spark, dir).count())
        }
    }
    spark.stop()
  }

  def profEngine(spark: SparkSession, dir: String): Unit = {
    import graft.core._
    import graft.index.IndexIVF
    import graft.query._
    val e = graft.queries.Tables.t(spark, dir, "embeddings")
    val docs = time("build docs df") {
      val d = e.groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"),
          count(lit(1)).as("n_vecs"))
        .select(col("label").cast("long").as("id"),
          expr("transform(toks, t -> t.embedding)").as("colbert"),
          col("n_vecs"))
      d.count()
      d
    }
    val schema = GSchema(Seq(
      GField.colbert("colbert", dimensions = 64, numCentroids = 16,
        quantization = QuantizerKind.NONE, numIterations = 4, nbits = 2),
      GField(name = "n_vecs", dataType = GDataType.INTEGER.toString,
        roles = Seq(FieldRole.Stored.toString))))
    val path = java.nio.file.Files.createTempDirectory("prof_engine").toString
    val idx = IndexIVF.create(spark, path, schema)
    time("train")(idx.train(docs))
    time("add")(idx.add(1, docs))
    val query = time("query collect") {
      e.filter(col("vec_id") < 4).orderBy("vec_id").collect()
        .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray)
    }
    val res = time("search")(
      idx.search(1, VectorQuery("colbert", query), k = 5,
        SearchOptions(kTopCentroids = 4, nProbe = 8)))
    time("search collect")(res.collect())
  }
}
