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
    // SPARK_GRAFT_BENCH_QUERIES narrows the board to a comma-separated
    // subset (full names or qNN short ids) — the 30x tail probe runs only
    // the data-bound queries, where a full-board pass would be wall-clock
    // prohibitive at that corpus size.
    val names = {
      val all = SparkEntry.queries.keys.toSeq
      sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
        case Some(list) if list.trim.nonEmpty =>
          val want = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
          all.filter(n => want.contains(n) || want.contains(n.takeWhile(_ != '_')))
        case _ => all
      }
    }
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache() // drop warm-up persists; keep JIT/codegen

    // Pre-materialize the session memos for the TIMED dir before any timed
    // rep: the warm-up above runs at sf0.001, so without this the first
    // consumer of each memo family absorbs the entire build into its timed
    // row — invisible under the 2x2 min protocol (later reps read the
    // memo) but a 10-100x artifact under the single-rep deep-scale tail
    // (round 8's q155 published 110.7x at 30x for a ~1x steady-state
    // query). Builds are timed separately by graft.ScaleBuilds.
    // SPARK_GRAFT_BENCH_PREBUILD: "1" (default, all families), "0" (none),
    // or a comma list from {dedup, kmeans, kmeans_adaptive, pca, stream}
    // for probes where an unused memo's build is wall-clock prohibitive.
    val prebuild = sys.env.getOrElse("SPARK_GRAFT_BENCH_PREBUILD", "1")
    val allFamilies = Set("dedup", "kmeans", "kmeans_adaptive", "pca", "stream")
    val families = prebuild match {
      case "0" => Set.empty[String]
      case "1" => allFamilies
      case list =>
        val asked = list.split(",").map(_.trim).filter(_.nonEmpty).toSet
        val bad   = asked.diff(allFamilies)
        // a silently-dropped typo ("kmeans_adptive") would quietly
        // reintroduce the memo-fold artifact this protocol exists to
        // eliminate — fail loudly instead
        require(bad.isEmpty,
          s"SPARK_GRAFT_BENCH_PREBUILD: unknown families ${bad.mkString(",")} " +
            s"(valid: ${allFamilies.mkString(",")}, or 0/1)")
        asked
    }
    if (families("dedup")) graft.queries.DedupQueries.prebuildMemo(spark, sfDir)
    graft.queries.SimilarityQueries.prebuildMemos(spark, sfDir, families)
    if (families("stream")) graft.queries.StreamQueries.prebuildMemos(spark, sfDir)
    spark.catalog.clearCache()

    // Per query: min over 2 rounds × 2 back-to-back reps. The box shares
    // CPU with co-tenant load (observed 2-10x outliers, including
    // multi-second stalls), and the driver runs Bench once per round.
    // Back-to-back reps keep page cache/JIT warm for the low-noise floor;
    // the second ROUND separates repeats by minutes, so a stall that
    // swallowed a query's adjacent reps has to recur at the same query
    // next round to survive the min.
    // A rep that THROWS contributes no time: folding a fast failure into the
    // min would silently deflate the total, so failed queries are excluded
    // from `queries`/total and reported by name in `failed` instead.
    // SPARK_GRAFT_BENCH_ROUNDS/REPS shrink the protocol for deep-scale
    // probes (30x+), where per-query times are 10-300 s — large enough to
    // dwarf rep noise — and the full 2x2 protocol would cost hours.
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "2").toInt
    val reps   = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val timed: Seq[Map[String, Double]] = (1 to rounds).map { _ =>
      names.flatMap { name =>
        val okReps = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          val ok =
            try { SparkEntry.queries(name)(spark, sfDir).count(); true }
            catch { case scala.util.control.NonFatal(_) => false }
          val s = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          if (ok) Some(s) else None
        }
        okReps.minOption.map(name -> _)
      }.toMap
    }
    val results = names.flatMap(n => timed.flatMap(_.get(n)).minOption.map(n -> _)).toMap
    val failed  = names.filterNot(results.contains).sorted
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def csec(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    // Cap the printed failure list: round 7's 35-name array pushed the line
    // past the harness tail window and the whole bench went unparsed.
    // n_failed always carries the true count; full names go to stderr.
    val failedJson = failed.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")
    if (failed.nonEmpty) System.err.println(s"[bench] failed: ${failed.mkString(",")}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The harness captures only the LAST 2000 chars of stdout (sbt's own
    // trailing "[success]" line eats ~70 of them) and json-parses the metric
    // line, so the PRINTED line must stay short: per-query keys are the qNN
    // id (unique by construction), printed times are centisecond-rounded,
    // sf is the basename, and a line-budget guard below drops the cheapest
    // entries if the board outgrows the window.
    val shortIds = names.map(n => n -> n.takeWhile(_ != '_')).toMap
    val ids = // collision guard: fall back to full names if ids ever clash
      if (shortIds.values.toSet.size == names.size) shortIds
      else names.map(n => n -> n).toMap
    val qsFull = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sfShort = sfDir.stripSuffix("/").split('/').last
    // The printed line must stay inside the harness tail window no matter
    // how large the board grows (155 entries already sit ~40 chars from the
    // edge; round 7's overflow went unparsed). Self-guard: if the line would
    // exceed the budget, drop the FASTEST per-query entries until it fits —
    // the expensive queries the grading reads survive, "q_omitted" counts
    // the dropped cheap ones, and the full-precision full-name map is always
    // in bench_full.json.
    val lineBudget = sys.env.getOrElse("SPARK_GRAFT_BENCH_LINE_BUDGET", "1850").toInt
    def line(kept: Seq[(String, Double)], omitted: Int): String = {
      val qs = kept.sortBy(_._1)
        .map { case (k, v) => "\"" + ids(k) + "\":" + csec(v) }
        .mkString("{", ",", "}")
      val omit = if (omitted > 0) s""","q_omitted":$omitted""" else ""
      // n_queries contextualizes the total: the registry grows round over
      // round, so the sum is only comparable per-query or per-count.
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson$omit,"queries":$qs,"sf":"$sfShort"}"""
    }
    val byCost = results.toSeq.sortBy { case (_, v) => -v } // keep slowest first
    // bounded: dropRight(1) on an empty Seq is a fixed point, so an
    // unbounded iterate would spin forever when even the zero-entry line
    // exceeds a (pathologically small) budget — take() makes the fallback
    // reachable
    val printed = Iterator.iterate(byCost)(_.dropRight(1))
      .take(results.size + 1)
      .map(kept => line(kept, results.size - kept.size))
      .find(_.length <= lineBudget)
      .getOrElse(line(Seq.empty, results.size))
    val headFull = s""""metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson"""
    // Default dump path is UNTRACKED (target/): driver re-runs must not
    // dirty the committed canonical bench_full.json — promoting a cohesive
    // run to the repo root is a deliberate copy, never a side effect.
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/target/bench_full.json"))
    try {
      Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(outPath,
        s"""{$headFull,"queries":$qsFull,"sf":"$sfDir"}\n""".getBytes("UTF-8")
      )
      ()
    } catch { case scala.util.control.NonFatal(e) => System.err.println(s"[bench] detail write failed: $e") }
    println(printed)
    spark.stop()
  }
}
