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
      case "engine_noaqe" =>
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        profEngine(spark, dir)
      case "add" => profAdd(spark, dir)
      case "minhash" => profMinhash(spark, dir)
      case "minhash2" => profMinhash2(spark, dir)
      case "shingleudf" => profShingleUdf(spark, dir)
      case name =>
        // repeat a SparkEntry query 3x
        (1 to 3).foreach { i =>
          time(s"$name #$i")(SparkEntry.queries(name)(spark, dir).count())
        }
    }
    spark.stop()
  }

  /** Mirrors the round-4 minhash pipeline stage by stage. */
  def profMinhash2(spark: SparkSession, dir: String): Unit = {
    val d0 = graft.queries.Tables.t(spark, dir, "documents")
    val d = if (d0.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
      d0.repartition(spark.sparkContext.defaultParallelism) else d0
    val arrs = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t) - 3), i -> xxhash64(concat_ws(' ', slice(t, i + 1, 3))))"))
        .as("shs"))
      .persist()
    time("arrs build+persist")(arrs.count())
    val sh = arrs.select(col("doc_id"), explode(col("shs")).as("sh"))
    val sigCols = (0 until 16).map(i =>
      array_min(transform(col("shs"), x => xxhash64(lit(i), x))).as(s"h$i"))
    val sigs = arrs.select(col("doc_id") +: sigCols :+
      size(col("shs")).cast("long").as("cnt"): _*).persist()
    time("sigs project+persist")(sigs.count())
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))): _*)).as(Seq("band", "bucket")))
    val hotB = bands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > 128)
      .select(col("band"), col("bucket"))
    val pruned = bands.join(broadcast(hotB), Seq("band", "bucket"), "left_anti").persist()
    time("pruned build+persist")(pruned.count())
    val candPairs = pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    time("band self-join distinct")(candPairs.count())
    val common = candPairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("common"))
    time("verify re-join")(common.count())
  }

  /** HOF chain vs one-pass UDF for the shingle-array build. */
  def profShingleUdf(spark: SparkSession, dir: String): Unit = {
    val d0 = graft.queries.Tables.t(spark, dir, "documents")
    val d = d0.repartition(spark.sparkContext.defaultParallelism)
      .persist()
    d.count()
    val hof = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), array_distinct(expr(
        "transform(sequence(0, size(t) - 3), i -> xxhash64(concat_ws(' ', slice(t, i + 1, 3))))"))
        .as("shs"))
    (1 to 3).foreach(i => time(s"HOF chain #$i")(hof.select(sum(size(col("shs")))).collect()))
    val shingleU = udf { (text: String) =>
      val t = text.split(' ')
      if (t.length < 3) null
      else {
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var i = 0
        while (i + 2 < t.length) {
          val s = org.apache.spark.unsafe.types.UTF8String.fromString(
            t(i) + " " + t(i + 1) + " " + t(i + 2))
          seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L))
          i += 1
        }
        val out = new Array[Long](seen.size)
        val it = seen.iterator(); var j = 0
        while (it.hasNext) { out(j) = it.next(); j += 1 }
        out
      }
    }
    val viaUdf = d.select(col("doc_id"), shingleU(col("text")).as("shs"))
      .filter(col("shs").isNotNull)
    (1 to 3).foreach(i => time(s"one-pass UDF #$i")(viaUdf.select(sum(size(col("shs")))).collect()))
    // parity: same totals and same per-doc sets
    val a = hof.select(col("doc_id"), col("shs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val b = viaUdf.select(col("doc_id"), col("shs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    println(s"[prof] parity: ${a == b} (docs ${a.size})")
  }

  def profMinhash(spark: SparkSession, dir: String): Unit = {
    // mirrors TextPipeline's spread(): parallelize the single-split scan
    val d0 = graft.queries.Tables.t(spark, dir, "documents")
    val d = if (d0.rdd.getNumPartitions < spark.sparkContext.defaultParallelism)
      d0.repartition(spark.sparkContext.defaultParallelism) else d0
    val sh0 = d.select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(t) - 3), i -> concat_ws(' ', slice(t, i + 1, 3)))")).as("s"))
    time("explode only")(sh0.count())
    val sh = sh0.distinct().select(col("doc_id"), xxhash64(col("s")).as("sh"))
      .persist()
    time("distinct+hash+persist")(sh.count())
    val sigCols = (0 until 16).map(i => min(xxhash64(lit(i), col("sh"))).as(s"h$i"))
    val sigs = sh.groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail :+ count(lit(1)).as("cnt"): _*).persist()
    time("sigs agg")(sigs.count())
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 8).map(b =>
        xxhash64(col(s"h${2 * b}"), col(s"h${2 * b + 1}"))): _*)).as(Seq("band", "bucket")))
      .persist()
    time("bands")(bands.count())
    val hotB = bands.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("bc")).filter(col("bc") > 128)
      .select(col("band"), col("bucket"))
    time("hot bucket count")(hotB.count())
    val pruned = bands.join(broadcast(hotB), Seq("band", "bucket"), "left_anti")
    val candPairs = pruned.as("x").join(pruned.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct().persist()
    time("band self-join distinct")(candPairs.count())
    val common = candPairs
      .join(sh.select(col("doc_id").as("a_id"), col("sh")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("sh")), Seq("b_id", "sh"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("common"))
    time("verify re-join")(common.count())
  }

  /** Replicates IndexIVF.add's internal phases with separate timing. */
  def profAdd(spark: SparkSession, dir: String): Unit = {
    import graft.core._
    import graft.index.IndexIVF
    val e = graft.queries.Tables.t(spark, dir, "embeddings")
    val docs = e.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"),
        count(lit(1)).as("n_vecs"))
      .select(col("label").cast("long").as("id"),
        expr("transform(toks, t -> t.embedding)").as("colbert"),
        col("n_vecs"))
    docs.count()
    val schema = GSchema(Seq(
      GField.colbert("colbert", dimensions = 64, numCentroids = 16,
        quantization = QuantizerKind.NONE, numIterations = 4, nbits = 2),
      GField(name = "n_vecs", dataType = GDataType.INTEGER.toString,
        roles = Seq(FieldRole.Stored.toString))))
    val path = java.nio.file.Files.createTempDirectory("prof_add").toString
    val idx = IndexIVF.create(spark, path, schema)
    time("train")(idx.train(docs))

    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })
    def jobs[A](label: String)(f: => A): A = {
      val before = jobCounter.get()
      val r = time(label)(f)
      println(s"[prof] $label jobs=${jobCounter.get() - before}")
      r
    }

    val f = schema.tensorFields.head
    val fid = idx.mapper.id(f.name)
    val bc = spark.sparkContext.broadcast(idx.coarse(f.name))
    val bq = spark.sparkContext.broadcast(idx.quantizers(f.name))
    val assignUdf = udf((vec: Seq[Float]) => bc.value.assign(vec.toArray).toLong)
    val encodeUdf = udf((vec: Seq[Float]) => bq.value.encode(vec.toArray))
    val assigned = docs
      .select(col("id").as("doc_id"), posexplode(col(f.name)).as(Seq("pos", "vec")))
      .select(col("doc_id"), col("pos"),
        assignUdf(col("vec")).as("centroid"), encodeUdf(col("vec")).as("code"))
    val concatBytes = udf((arr: Seq[Array[Byte]]) => arr.flatten.toArray)
    val ctx = assigned
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("centroid"), col("code"))))
        .as("toks"))
      .select(
        lit(1L).as("tenant"), lit(fid).as("field"), col("doc_id"),
        expr("transform(toks, t -> t.centroid)").as("doc_codes"),
        concatBytes(expr("transform(toks, t -> t.code)")).as("doc_residuals"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    jobs("ctx write") {
      ctx.write.mode("append").partitionBy("tenant", "field").parquet(s"$path/context")
    }
    jobs("postings write") {
      ctx.select(lit(1L).as("tenant"), lit(fid).as("field"),
        explode(array_distinct(col("doc_codes"))).as("centroid"), col("doc_id"))
        .withColumn("centroid_bucket", IndexIVF.centroidBucket(col("centroid")))
        .repartition(col("tenant"), col("field"), col("centroid_bucket"))
        .sortWithinPartitions("centroid")
        .write.mode("append").partitionBy("tenant", "field", "centroid_bucket")
        .parquet(s"$path/postings")
    }
    ctx.unpersist()
    jobs("docs write") {
      docs.select(lit(1L).as("tenant"), col("id").as("doc_id"), col("n_vecs"))
        .write.mode("append").partitionBy("tenant").parquet(s"$path/docs")
    }
  }

  def profEngine(spark: SparkSession, dir: String): Unit = {
    import graft.core._
    import graft.index.IndexIVF
    import graft.query._
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val sites = scala.collection.concurrent.TrieMap[Int, String]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        starts(js.jobId) = js.time
        sites(js.jobId) = js.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
        ()
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val dur = (je.time - starts.getOrElse(je.jobId, je.time)) / 1e3
        println(f"[prof]   job ${je.jobId}%3d ${dur}%7.3f s  ${sites.getOrElse(je.jobId, "?")}")
      }
    })
    val e = graft.queries.Tables.t(spark, dir, "embeddings")
    val docs = time("build docs df") {
      val d = e.groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"),
          count(lit(1)).as("n_vecs"))
        .select(col("label").cast("long").as("id"),
          expr("transform(toks, t -> t.embedding)").as("colbert"),
          col("n_vecs"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
