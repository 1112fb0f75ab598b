package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: one JSON line of per-query wall times at the target
  * scale factor. A warm-up pass at the smallest SF first absorbs JVM/codegen
  * /classloading cost so the timed pass measures the queries, not the
  * first query's startup tax.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.ts (Tables.events)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = {
      val w = "/root/testdata/sf0.001"
      if (new java.io.File(w).isDirectory) w else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache() // drop warm-up persists; keep JIT/codegen

    // Per query: min over 2 rounds × 2 back-to-back reps. The box shares
    // CPU with co-tenant load (observed 2-10x outliers, including
    // multi-second stalls), and the driver runs Bench once per round.
    // Back-to-back reps keep page cache/JIT warm for the low-noise floor;
    // the second ROUND separates repeats by minutes, so a stall that
    // swallowed a query's adjacent reps has to recur at the same query
    // next round to survive the min.
    val names = SparkEntry.queries.keys.toSeq
    val timed = (1 to 2).map { _ =>
      names.map { name =>
        val sec = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { SparkEntry.queries(name)(spark, sfDir).count() } catch { case _: Throwable => -1L }
          val s = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          s
        }.min
        name -> sec
      }.toMap
    }
    val results = names.map(n => n -> timed.map(_(n)).min).toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // n_queries contextualizes the total: the registry grows round over
    // round, so the sum is only comparable per-query or per-count.
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
