package graft.queries

import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k as the exact baseline, within-cluster near-dup
  * mining, and an IVF-style two-stage ANN (coarse quantizer → probe → exact
  * re-rank) — all expressed as DataFrame plans with DuckDB oracles running
  * the identical algorithm.
  *
  * Scale design (100 TB):
  *   - q50 broadcast-joins the (tiny) query set against the corpus — the
  *     corpus never shuffles; scoring is a narrow map. At 1000 executors
  *     this is the canonical "score every row, keep top-k per query" plan
  *     (partial top-k per partition via the window rank would become a
  *     `mapPartitions` heap at the physical layer; Catalyst's WindowExec
  *     already does partial filtering through the rank predicate).
  *   - q45 blocks the quadratic near-dup join by LEARNED cluster — the
  *     adaptive assignment memo (q129's build, k = ⌈n/B⌉) is the blocking
  *     structure, so Σ block² ≈ n·B pairs instead of n² at every corpus
  *     size (q124 keeps the fixed-label blocking as the measured control).
  *   - q51 is the real ANN path: centroids (here: per-label means, the
  *     k-means E-step output) are broadcast-sized; each query probes its
  *     `nprobe` nearest centroids and scores only those clusters.
  *   - Vector folds are order-deterministic (see
  *     [[graft.functions.VectorFunctions]]); centroids fold rows sorted by
  *     vec_id so both engines accumulate identically.
  */
object SimilarityQueries {

  private val Dim          = 64
  private val TopK         = 5
  private val NProbe       = 2
  private val NearDupCos   = 0.3
  private val QuerySetSize = 5 // vec_id < 5 plays the "incoming queries"
  private val NumPlanes    = 8 // SRP-LSH signature bits
  private val RangeTau     = 0.25 // q53 similarity-threshold radius
  private val QuantScale   = 16777216.0 // 2^24 — exact float-mantissa shift (q51 centroids)
  private val KmeansIters  = 2 // q116 Lloyd refinement rounds (fixed — no driver convergence loop)
  private val SemDedupCos  = 0.35 // q124 within-cluster semantic-dup threshold
  private val AdaptiveBlock = 50 // q129 target rows per learned cluster (k = ceil(n/B))
  private val AdaptiveProbe = 2 // probe top-p cells per vector (the IVF-assign fan-in)

  /** Hyperplane p as a literal ±1 array — the identical md5-parity formula
    * the oracle evaluates in SQL, here over literals so Catalyst constant-
    * folds the whole array at plan time.
    */
  private def planeLit(p: Int): org.apache.spark.sql.Column =
    array((0 until Dim).map { i =>
      (((instr(
        lit("0123456789abcdef"),
        substring(md5(lit(s"$p:$i")), 1, 1)
      ) - 1) % 2) * 2 - 1).cast("double")
    }: _*)

  private def scored(queries: DataFrame, corpus: DataFrame): DataFrame =
    Tables
      .spread(corpus, col("vec_id")) // parallelize scoring (see Tables.spread)
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosineFast(col("q_emb"), col("embedding")), 6))

  private def topkRank: org.apache.spark.sql.Column =
    row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("vec_id"))
    )

  /** The FULL Lloyd refinement DAG — q116's algorithm, un-memoized: label
    * init, then [[KmeansIters]] rounds of quantized-mean centroids + max-
    * cosine reassignment. Public so plan audits gate the real iterative
    * machinery (the registered q116 reads the memoized table, whose scan
    * plan would trivially satisfy any gate) — the dedup family's
    * `memoBuildPlan` pattern.
    */
  /** Quantized-mean centroids of `assignment` over `e` — exact
    * order-independent BIGINT sums (the 2^24 mantissa shift) so both
    * engines accumulate identically.
    */
  private def centroidsOf(e: DataFrame, assignment: DataFrame): DataFrame =
    e.join(assignment, Seq("vec_id"))
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * QuantScale)).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", col("sq").cast("double") / QuantScale / col("n"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cluster"), transform(col("pc"), _.getField("c")).as("centroid"))

  /** Max-cosine re-assignment of every vector to the broadcast centroid
    * set (ties to the least cluster id) — one argmax row per vector BEFORE
    * the exchange, so the fan-out collapses map-side.
    */
  private def assignTo(e: DataFrame, cents: DataFrame): DataFrame =
    Tables
      .spread(e, col("vec_id"))
      .crossJoin(broadcast(cents))
      .withColumn("cos", round(cosineFast(col("embedding"), col("centroid")), 6))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cluster")).cast("long").as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cluster"))

  /** `iters` Lloyd rounds from `init` (vec_id, cluster). */
  private def lloyd(e: DataFrame, init: DataFrame, iters: Int): DataFrame = {
    var asg = init
    for (_ <- 1 to iters) asg = assignTo(e, centroidsOf(e, asg))
    asg
  }

  /** The CELL TABLE of a centroid set — the coarse structure the adaptive
    * assign probes instead of scoring all k centroids per vector. Centroids
    * bucket by `nbits` SRP sign bits (q52's engine-portable md5-parity
    * planes — nearby centroids share signs, so buckets are spatially
    * coherent), then each bucket sub-splits into ≤`bcap`-member cells by a
    * keyed row_number. The sub-split is what makes the fan-in BOUNDED BY
    * CONSTRUCTION: even when the geometry degenerates (iteration 1 of the
    * mod-k init has near-identical centroids, so every centroid lands in
    * ONE bucket), no cell ever exceeds bcap members — the probe can never
    * silently fall back to dense n×k work.
    */
  private def centroidCells(cents: DataFrame, bcap: Long, nbits: Int): DataFrame =
    cents
      .withColumn(
        "_bkt",
        concat((0 until nbits).map { p =>
          when(dotFast(col("centroid"), planeLit(p)) >= 0, lit("1")).otherwise(lit("0"))
        }: _*))
      .withColumn(
        "_rn",
        row_number().over(Window.partitionBy(col("_bkt")).orderBy(col("cluster"))) - 1)
      .withColumn("_cell", concat(col("_bkt"), lit("#"), expr(s"CAST(_rn div ${bcap}L AS STRING)")))
      .select(col("_cell"), col("cluster"), col("centroid"))

  /** Max-cosine re-assignment through the TWO-LEVEL probe — the IVF-assign
    * shape that replaces the dense n×k crossJoin when k ∝ n: quantized-mean
    * cell centroids (≤ ~2·⌈k/bcap⌉ rows — broadcast-sized two decades past
    * the point where k itself is not), each vector ranks the cells and keeps
    * its top-[[AdaptiveProbe]] (WindowGroupLimit collapses the fan-out to
    * p rows per vector map-side), then candidates come from an EQUI join on
    * the cell id — the centroid table shuffles by cell, never broadcasts,
    * so the join scales past broadcast-able k. Exact argmax (round 6, ties
    * to the least cluster id) within the ≤ p·bcap candidates. Per-vector
    * work: m cell scores + p·bcap candidate scores ≈ (1+p)·√k instead of k.
    */
  private def probeAssign(e: DataFrame, cents: DataFrame, bcap: Long, nbits: Int): DataFrame = {
    val cells = centroidCells(cents, bcap, nbits)
    val cellCents = cells
      .select(col("_cell"), posexplode(col("centroid")).as(Seq("pos", "v")))
      .groupBy(col("_cell"), col("pos"))
      .agg(sum(floor(col("v") * QuantScale)).as("sq"), count(lit(1)).as("n"))
      .withColumn("c", col("sq").cast("double") / QuantScale / col("n"))
      .groupBy(col("_cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("_cell"), transform(col("pc"), _.getField("c")).as("ccent"))
    val probes = Tables
      .spread(e.select(col("vec_id"), col("embedding")), col("vec_id"))
      .crossJoin(broadcast(cellCents))
      .withColumn("pcos", round(cosineFast(col("embedding"), col("ccent")), 6))
      .withColumn(
        "crnk",
        row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("pcos").desc, col("_cell"))))
      .filter(col("crnk") <= AdaptiveProbe)
      .select(col("vec_id"), col("embedding"), col("_cell"))
    probes
      .join(cells.select(col("_cell"), col("cluster"), col("centroid")), Seq("_cell"))
      .withColumn("cos", round(cosineFast(col("embedding"), col("centroid")), 6))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("cluster")).cast("long").as("nc"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).as("cluster"))
  }

  /** `iters` probe-assigned Lloyd rounds — the adaptive (k ∝ n) path.
    * bcap = ⌈√k⌉ balances the two levels (probe cost m ≈ √k vs candidate
    * cost p·bcap ≈ p·√k), so assign work is Θ(n·√k) instead of Θ(n·k); the
    * third level arrives when √k itself outgrows a broadcast, with the same
    * construction applied to the cell centroids.
    */
  private def adaptiveLloyd(e: DataFrame, init: DataFrame, iters: Int, k: Long): DataFrame = {
    val bcap  = math.ceil(math.sqrt(k.toDouble)).toLong
    val m     = (k + bcap - 1) / bcap
    val nbits = math.max(1L, 64L - java.lang.Long.numberOfLeadingZeros(math.max(1L, m - 1))).toInt
    var asg   = init
    for (_ <- 1 to iters) asg = probeAssign(e, centroidsOf(e, asg), bcap, nbits)
    asg
  }

  def refineBuildPlan(s: SparkSession, dir: String): DataFrame = {
    val e   = Tables.embeddings(s, dir).select(col("vec_id"), col("label"), col("embedding"))
    val asg = lloyd(e, e.select(col("vec_id"), col("label").cast("long").as("cluster")), KmeansIters)
    e.select(col("vec_id"), col("label").cast("long").as("init_label"))
      .join(asg, Seq("vec_id"))
      .select(col("vec_id"), col("init_label"), col("cluster"))
  }

  /** The SCALE-ADAPTIVE refinement DAG — the production remedy for the
    * fixed-k quadratic SCALE.md documents on q124/q45: those block on the
    * corpus's FIXED label set, so 10× rows means 10× per block and ~100×
    * candidate pairs. Here k = ⌈n / [[AdaptiveBlock]]⌉ GROWS with the
    * corpus (init: vec_id mod k — deterministic, oracle-replayable), then
    * the same Lloyd rounds learn real cluster structure, so within-cluster
    * pair cost stays Σ block² ≈ n · B — linear in n at every scale. The
    * single driver touchpoint is one bounded `count()` scalar (the RankOps
    * pattern). The assign step itself rides [[probeAssign]]'s two-level
    * probe — with k ∝ n a dense n×k assign would be ~n²/B cosines, the
    * very quadratic this build exists to remove downstream; the probe
    * bounds it at Θ(n·√k).
    */
  def adaptiveBuildPlan(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"), col("embedding"))
    val n = e.count() // bounded driver scalar: one long, any corpus size
    val k = math.max(1L, (n + AdaptiveBlock - 1) / AdaptiveBlock)
    adaptiveLloyd(
      e, e.select(col("vec_id"), (col("vec_id") % k).cast("long").as("cluster")), KmeansIters, k)
  }

  /** SESSION MEMO of the refined assignment table (vec_id, init_label,
    * cluster) — the table a curation run materializes once per corpus
    * snapshot and every downstream consumer (q116's report, q124's
    * SemDeDup prune) reads, instead of re-running the full Lloyd
    * iteration inline per consumer (the dedup family's memo treatment;
    * see [[graft.sources.SessionMemo]]).
    */
  private def refinedAssignment(s: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.SessionMemo.dir(s, "kmeans", dir) { b =>
      refineBuildPlan(s, dir).write.parquet(s"$b/asg")
    }
    s.read.parquet(s"$base/asg")
  }

  /** Session memo of [[adaptiveBuildPlan]]'s (vec_id, cluster) table —
    * same treatment as the label-seeded refinement.
    */
  private def adaptiveAssignment(s: SparkSession, dir: String): DataFrame = {
    val base = graft.sources.SessionMemo.dir(s, "kmeans_adaptive", dir) { b =>
      adaptiveBuildPlan(s, dir).write.parquet(s"$b/asg")
    }
    s.read.parquet(s"$base/asg")
  }

  /** Force this family's session memos for (session, `dir`) — the
    * bench/SCALE protocol pre-materializes memos BEFORE the timed pass so
    * every timed row measures its query's steady state (the memoized READ)
    * and the builds are reported only in the [[graft.ScaleBuilds]] table,
    * never folded into whichever consumer happens to run first.
    * `families` narrows the set for deep-scale probes where an unused
    * memo's build would be wall-clock prohibitive.
    */
  def prebuildMemos(s: SparkSession, dir: String, families: Set[String]): Unit = {
    if (families("kmeans")) { refinedAssignment(s, dir); () }
    if (families("kmeans_adaptive")) { adaptiveAssignment(s, dir); () }
    if (families("pca")) { pcaTrained(s, dir); () }
  }

  /** The SemDeDup prune shared by q124/q129: exact within-cluster cosine
    * over `asg`'s blocks, drop the higher vec_id of every pair above
    * threshold, return the keep-list.
    */
  private def semanticPrune(e: DataFrame, asg: DataFrame): DataFrame = {
    val withC = e.join(asg, Seq("vec_id")).select(col("cluster"), col("vec_id"), col("embedding"))
    val losers = withC
      .select(col("cluster"), col("vec_id").as("ia"), col("embedding").as("ea"))
      .join(
        withC.select(col("cluster"), col("vec_id").as("ib"), col("embedding").as("eb")),
        Seq("cluster"))
      .filter(col("ia") < col("ib"))
      .repartition(col("ia"), col("ib")) // spread pair scoring beyond n_clusters partitions
      .filter(round(cosineFast(col("ea"), col("eb")), 6) >= SemDedupCos)
      .select(col("ib").as("vec_id"))
      .distinct()
    e.select(col("vec_id"), col("label"))
      .join(losers, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Embedding near-dup pairs: exact cosine within LEARNED cluster blocks
    // — the adaptive assignment memo (q129's build) is the blocking
    // structure, so block count grows as ⌈n/B⌉ and the pair scan stays
    // Σ block² ≈ n·B at every corpus size. (Through round 6 this blocked
    // on the FIXED stored label — the same quadratic as q124, which
    // remains on the board as the deliberate control; the learned-block
    // routing is the production shape.)
    "q45_embedding_neardup" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val withC = e
        .join(adaptiveAssignment(s, dir).select(col("vec_id"), col("cluster")), Seq("vec_id"))
        .select(col("cluster"), col("vec_id"), col("embedding"))
      withC
        .select(col("cluster"), col("vec_id").as("ia"), col("embedding").as("ea"))
        .join(
          withC.select(col("cluster"), col("vec_id").as("ib"), col("embedding").as("eb")),
          Seq("cluster"))
        .filter(col("ia") < col("ib"))
        // the cluster join leaves ≤ n_clusters partitions busy; spread the
        // pair-scoring (the expensive part) across all cores — needed at
        // ANY scale when clusters ≪ cores, unlike the scan-side spreads
        .repartition(col("ia"), col("ib"))
        .withColumn("cos", round(cosineFast(col("ea"), col("eb")), 6))
        .filter(col("cos") >= NearDupCos)
        .select(col("ia"), col("ib"), col("cos"))
        .orderBy(col("ia"), col("ib"))
    }),

    // Brute-force cosine top-k: exact kNN baseline for the ANN path.
    "q50_cosine_topk" -> ((s, dir) => {
      val e  = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      scored(qs, e)
        .withColumn("rnk", topkRank)
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // The SAME brute-force top-k computed through the PHYSICAL shape the
    // scale notes promise at 100 TB: the query set rides a broadcast
    // variable, each corpus partition is scored in a tight JVM loop (the
    // BLAS-batch stand-in — a production build hands the batch to gemm
    // with the identical numeric contract), and a bounded per-query heap
    // per partition means only queries×k candidate rows ever transit an
    // exchange — the partial-top-k that q50 gets from WindowGroupLimit,
    // here made explicit at the partition level. Accumulation order,
    // HALF_UP 6dp rounding, and the (cos DESC, id ASC) tie-break replicate
    // q50's declarative plan bit-for-bit — hash-checked against the SAME
    // oracle.
    "q102_topk_mappartitions" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.embeddings(s, dir)
      // this collect IS the broadcast build: bounded by QuerySetSize by
      // construction (the identical rows q50 wraps in broadcast()); the
      // CORPUS never leaves the executors
      val qs: Array[(Long, Array[Float])] = e
        .filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .collect()
        .sortBy(_._1)
      val qb = s.sparkContext.broadcast(qs)
      val candidates = Tables
        .spread(e, col("vec_id"))
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val queries = qb.value
          def better(a: (Double, Long), b: (Double, Long)): Boolean =
            a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
          // PriorityQueue dequeues its max; under (-cos, id) the max is the
          // WORST candidate (lowest cos, then highest id) — an O(log k)
          // replace-worst bound per accepted row
          val worstFirst: Ordering[(Double, Long)] =
            Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))
          val heaps = Array.fill(queries.length)(
            scala.collection.mutable.PriorityQueue.empty[(Double, Long)](worstFirst)
          )
          it.foreach { case (id, emb) =>
            var qi = 0
            while (qi < queries.length) {
              val (qid, qemb) = queries(qi)
              if (qid != id) {
                // single-pass dot + norms, left-to-right — the exact
                // accumulation of expressions.VectorCosine.nullSafeEval
                var dot = 0.0; var na = 0.0; var nb = 0.0
                val n = math.min(qemb.length, emb.length)
                var i = 0
                while (i < n) {
                  val x = qemb(i).toDouble; val y = emb(i).toDouble
                  dot += x * y; na += x * x; nb += y * y; i += 1
                }
                // Spark's Round(double, 6): BigDecimal.valueOf + HALF_UP.
                // Guard the degenerate vectors first: a zero-norm or
                // NaN-containing embedding makes `raw` NaN/±Inf, which
                // BigDecimal rejects — pass it through unrounded instead,
                // exactly what VectorCosine and Spark's round() do (round
                // of NaN/Inf is identity), so the two q50/q102 plans stay
                // result-identical even on degenerate inputs.
                val raw = dot / (math.sqrt(na) * math.sqrt(nb))
                val cos =
                  if (java.lang.Double.isFinite(raw))
                    BigDecimal(raw)
                      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
                      .toDouble
                  else raw
                val cand = (cos, id)
                val h = heaps(qi)
                if (h.size < TopK) h.enqueue(cand)
                else if (better(cand, h.head)) { h.dequeue(); h.enqueue(cand) }
              }
              qi += 1
            }
          }
          heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
            val qid = queries(qi)._1
            h.iterator.map { case (cos, id) => (qid, id, cos) }
          }
        }
        .toDF("query_id", "neighbor_id", "cos")
      candidates
        .withColumn(
          "rnk",
          row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
          )
        )
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // Range search: every corpus vector within a similarity radius of each
    // query — the other standard ANN primitive (top-k's sibling). Same
    // broadcast-scoring plan as q50, but the aggregates are COUNT/MAX/MIN of
    // the rounded score, all order-free, so the result is partitioning-
    // independent (an AVG of raw doubles would not be).
    "q53_range_search" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e.filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      scored(qs, e)
        .filter(col("cos") >= RangeTau)
        .groupBy(col("query_id"))
        .agg(
          count(lit(1)).as("n_neighbors"),
          max(col("cos")).as("max_cos"),
          min(col("cos")).as("min_cos")
        )
        .orderBy(col("query_id"))
    }),

    // Vector normalization audit: L2 norm + first unit-vector component per
    // embedding — the projection every cosine-ANN ingest runs (store unit
    // vectors ⇒ cosine becomes a plain dot at query time). Narrow, no
    // shuffle; the fold order is the array order on both engines.
    "q54_normalize" -> ((s, dir) =>
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), norm(col("embedding")).as("l2"), asDouble(col("embedding")).getItem(0).as("x0"))
        .select(
          col("vec_id"),
          round(col("l2"), 6).as("l2"),
          round(col("x0") / col("l2"), 6).as("u0")
        )
        .orderBy(col("vec_id"))),

    // Scalar int8 quantization: per-vector min/max affine codes (the
    // memory-4x step every large ANN index takes before sharding), plus the
    // reconstruction-error audit. Narrow per-row work — codes never leave
    // their row; output is an exact integer checksum + rounded error stats.
    // Guarded for degenerate constant vectors (scale 0 ⇒ code 0, error 0).
    "q55_quantize_int8" -> ((s, dir) =>
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("x"))
        .withColumn("mn", array_min(col("x")))
        .withColumn("scale", (array_max(col("x")) - col("mn")) / lit(255.0))
        .withColumn(
          "codes",
          when(col("scale") === 0.0, transform(col("x"), _ => lit(0.0)))
            .otherwise(transform(col("x"), v => round((v - col("mn")) / col("scale"))))
        )
        .withColumn(
          "errs",
          zip_with(col("x"), col("codes"), (v, c) => abs(v - (col("mn") + c * col("scale"))))
        )
        .select(
          col("vec_id"),
          aggregate(col("codes"), lit(0.0), _ + _).cast("long").as("code_sum"),
          round(aggregate(col("errs"), lit(0.0), _ + _) / lit(Dim.toDouble), 6).as("mean_abs_err"),
          round(array_max(col("errs")), 6).as("max_abs_err")
        )
        .orderBy(col("vec_id"))),

    // IVF-style ANN: per-label centroids (coarse quantizer), probe the
    // nprobe nearest centroids per query, exact re-rank within probed cells.
    "q51_ann_ivf" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)

      // Coarse quantizer: per-dimension mean via posexplode + groupBy(label,
      // pos) — scalars shuffle (map-side partial sums reduce each partition
      // to ≤ labels × Dim rows before the exchange), never whole clusters.
      // Float sums are order-dependent, so the centroid is DEFINED over
      // quantized components: scale by 2^24 (a power of two only shifts the
      // float's exponent — exact), floor to BIGINT, sum exactly in any
      // order. The oracle computes the identical quantization, so both
      // engines agree bit-for-bit regardless of partitioning; the ~6e-8
      // quantization error is irrelevant to a coarse quantizer. The final
      // collect_list holds exactly Dim (pos, value) scalars per label —
      // bounded by dimensionality, not by cluster size.
      val centroids = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * QuantScale)).as("sq"), count(lit(1)).as("n"))
        .withColumn("c", col("sq").cast("double") / QuantScale / col("n"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("label"), transform(col("pc"), _.getField("c")).as("centroid"))

      val qs = e.filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

      // Probe: nprobe nearest centroids per query (tiny cross join).
      val probes = qs
        .crossJoin(broadcast(centroids))
        .withColumn("ccos", round(cosineFast(col("q_emb"), col("centroid")), 6))
        .withColumn(
          "crnk",
          row_number().over(Window.partitionBy(col("query_id")).orderBy(col("ccos").desc, col("label")))
        )
        .filter(col("crnk") <= NProbe)
        .select(col("query_id"), col("q_emb"), col("label"))

      // Exact re-rank within the probed cells only.
      e.join(broadcast(probes), Seq("label"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("cos", round(cosineFast(col("q_emb"), col("embedding")), 6))
        .withColumn("rnk", topkRank)
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // IVF RECALL AUDIT — the report a production ANN deployment ships
    // with: per query vector, how many of the EXACT top-k (q50's
    // brute-force baseline) the centroid-probe search (q51's IVF path)
    // actually returned — i.e. recall@k as a function of nprobe. Both
    // sides are fully deterministic (quantized centroids, rounded cosines,
    // id tie-breaks), so the recall table itself is hash-checked. The
    // exact side is the expensive one — at 100 TB this audit runs on a
    // sampled query set, which is precisely what QuerySetSize models.
    "q127_ivf_recall" -> ((s, dir) => {
      val exact = queries("q50_cosine_topk")(s, dir)
        .select(col("query_id"), col("neighbor_id"))
      val ann = queries("q51_ann_ivf")(s, dir)
        .select(col("query_id"), col("neighbor_id"))
      val ks = exact.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      val hits = exact
        .join(ann, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hit"))
      ks.join(hits, Seq("query_id"), "left")
        .select(
          col("query_id"),
          col("k"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k"), 4).as("recall")
        )
        .orderBy(col("query_id"))
    }),

    // INT8 QUANTIZED-INDEX RECALL AUDIT — the "can the index serve from
    // int8 codes" report (q55 asks what quantization costs per vector;
    // this asks what it costs the RANKING, which is what an ANN service
    // actually pays): every vector quantizes to symmetric int8 codes
    // under ONE global scale (a 1-row broadcast max|v|, so code dot
    // products are comparable across vectors — per-vector affine scales
    // would not be), top-k runs on code-space cosine, and recall@k is
    // measured against q50's exact float ranking. The code dot and code
    // norms are EXACT integer sums (≤ 64·127² per term — order-independent,
    // no float fold anywhere in scoring); one round-6 division ranks.
    // At 100 TB the int8 index is 4× smaller and the scoring integer —
    // this query is the gate that says the cheap index is good enough.
    "q163_int8_recall" -> ((s, dir) => {
      val e  = Tables.embeddings(s, dir)
      val mx = e.agg(max(array_max(transform(asDouble(col("embedding")), v => abs(v)))).as("s"))
      val codes = Tables
        .spread(e, col("vec_id"))
        .crossJoin(broadcast(mx))
        .select(
          col("vec_id"),
          transform(asDouble(col("embedding")), v => round(v * lit(127.0) / col("s")))
            .cast("array<long>").as("codes"))
        .withColumn("qn", aggregate(col("codes"), lit(0L), (a, c) => a + c * c))
      val qs = codes
        .filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id").as("query_id"), col("codes").as("q_codes"), col("qn").as("q_qn"))
      val quantTop = codes
        .join(broadcast(qs), col("vec_id") =!= col("query_id"))
        .withColumn(
          "qdot",
          aggregate(zip_with(col("q_codes"), col("codes"), (a, b) => a * b), lit(0L), _ + _))
        .withColumn(
          "qcos",
          round(
            col("qdot").cast("double") /
              (sqrt(col("q_qn").cast("double")) * sqrt(col("qn").cast("double"))),
            6))
        .withColumn(
          "rnk",
          row_number().over(
            Window.partitionBy(col("query_id")).orderBy(col("qcos").desc, col("vec_id"))))
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"))
      val exact = queries("q50_cosine_topk")(s, dir).select(col("query_id"), col("neighbor_id"))
      val ks    = exact.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      val hits = exact
        .join(quantTop, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_hit"))
      ks.join(hits, Seq("query_id"), "left")
        .select(
          col("query_id"),
          col("k"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k"), 4).as("recall")
        )
        .orderBy(col("query_id"))
    }),

    // HARD-NEGATIVE MINING — the contrastive-training data op: for each
    // query, the most-similar corpus vectors with a DIFFERENT label
    // (similar-but-wrong examples are what trains a discriminative
    // embedding). Same broadcast + narrow-scoring + partial-top-k shape as
    // q50; the label inequality rides the broadcast join condition, so
    // negatives are filtered before scoring ever shuffles.
    "q120_hard_negatives" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val qs = e
        .filter(col("vec_id") < QuerySetSize)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("label").as("q_label"))
      Tables
        .spread(e, col("vec_id"))
        .join(broadcast(qs), col("vec_id") =!= col("query_id") && col("label") =!= col("q_label"))
        .withColumn("cos", round(cosineFast(col("q_emb"), col("embedding")), 6))
        .withColumn("rnk", topkRank)
        .filter(col("rnk") <= TopK)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cos"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("query_id"), col("rnk"))
    }),

    // ITERATED K-MEANS (Lloyd) REFINEMENT — the clustering core of
    // SemDeDup-style semantic dedup and IVF index builds: start from the
    // stored label assignment (q51's coarse quantizer = iteration 0) and
    // run KmeansIters full Lloyd iterations: per-cluster quantized-mean
    // centroids (exact order-independent BIGINT sums, q51's 2^24 trick),
    // then re-assign every vector to its max-cosine centroid (round 6,
    // ties to the least cluster id). Output: each vector's initial label
    // next to its refined cluster — the assignment table a curation run
    // materializes before within-cluster near-dup pruning (q45's blocking
    // with learned blocks).
    //
    // Scale shape per iteration: centroids are broadcast (k×Dim scalars);
    // scoring is a fan-out over the broadcast followed by a
    // map-side-combined struct-max groupBy — the fan-out rows for a vector
    // collapse to ONE argmax row per vector BEFORE the exchange (partial
    // aggregation), so each iteration shuffles n single-struct rows plus
    // clusters×Dim centroid scalars, never n×k. The driver holds NOTHING:
    // the iteration count is fixed (a production run adds a moved-count
    // scalar as its convergence check, the GraphOps pattern).
    "q116_kmeans_refine" -> ((s, dir) =>
      refinedAssignment(s, dir).orderBy(col("vec_id"))),

    // SEMANTIC DEDUP end-to-end (SemDeDup): q116's REFINED clusters as the
    // blocking structure, exact within-cluster cosine, drop the higher
    // vec_id of every pair above threshold — the keep-list a semantic
    // pruning run materializes. Composes the learned-cluster assignment
    // (not the stored label — the refinement is the point: vectors that
    // moved now block with their true neighbors) with q45's bounded
    // Σ cluster² pair scan.
    "q124_semantic_dedup" -> ((s, dir) =>
      semanticPrune(
        Tables.embeddings(s, dir),
        refinedAssignment(s, dir).select(col("vec_id"), col("cluster")))),

    // SCALE-ADAPTIVE SemDeDup — the k ∝ n remedy for the fixed-k
    // quadratic (SCALE.md findings): cluster count grows as ⌈n/B⌉, so the
    // within-cluster pair scan stays linear in corpus size while the
    // Lloyd rounds still learn real structure from the hash-seeded init.
    // Same prune, same output contract as q124 — only the blocking
    // structure scales.
    "q129_semantic_dedup_adaptive" -> ((s, dir) =>
      semanticPrune(
        Tables.embeddings(s, dir),
        adaptiveAssignment(s, dir).select(col("vec_id"), col("cluster")))),

    // Sign-random-projection LSH near-dup: 8 deterministic ±1 hyperplanes
    // (md5-derived, engine-portable), bucket by the 8-bit sign signature,
    // verify candidates with exact cosine. This is the O(n) blocking that
    // replaces q45's label blocking when no cluster assignment exists.
    //
    // The planes are CONSTANTS (md5 of "p:i" literals), so they are embedded
    // as literal arrays and constant-folded: the 8 projections are 8
    // codegen'd vector_dot columns in one narrow Project — no crossJoin
    // against a plane table, no per-(vec, plane) rows, no groupBy to
    // re-assemble the signature. Candidate pairs come from an equi SELF-JOIN
    // on the bucket string (carrying the embeddings through, so verification
    // needs no join-back): individual rows shuffle, never whole buckets —
    // a degenerate bucket (e.g. all-zero region of the space) is split
    // across tasks by the join instead of landing in one collect_list row.
    "q52_srp_lsh" -> ((s, dir) => graft.plans.CacheScope.scoped(s) { keep =>
      val e = Tables.spread(Tables.embeddings(s, dir), col("vec_id"))
      val bucketed = keep(e
        .select(
          col("vec_id"),
          col("embedding"),
          concat((0 until NumPlanes).map { p =>
            when(dotFast(col("embedding"), planeLit(p)) >= 0, lit("1")).otherwise(lit("0"))
          }: _*).as("bucket")
        )
      ) // feeds BOTH self-join sides — one signature build, not two
      bucketed
        .select(col("bucket"), col("vec_id").as("ia"), col("embedding").as("ea"))
        .join(
          bucketed.select(col("bucket"), col("vec_id").as("ib"), col("embedding").as("eb")),
          Seq("bucket")
        )
        .filter(col("ia") < col("ib"))
        .withColumn("cos", round(cosineFast(col("ea"), col("eb")), 6))
        .filter(col("cos") >= NearDupCos)
        .select(col("ia"), col("ib"), col("cos"))
        .orderBy(col("ia"), col("ib"))
    }),

    // EXACT-INTEGER PCA POWER ITERATION — the embedding-whitening /
    // dimensionality-reduction primitive (SemDeDup and quality-filter
    // pipelines project embeddings onto principal directions before
    // clustering). The q131 treatment applied to linear algebra: vectors
    // quantize at 2^20, the CENTERED scatter matrix is the exact integer
    // M = n·Σxxᵀ − (Σx)(Σx)ᵀ in DECIMAL(38,0)/HUGEINT (no mean division,
    // no float subtraction), and PcaRounds power-iteration rounds renormalize
    // through integer max-|·| division (truncating division — identical
    // in both engines), so the learned direction is hash-checked
    // BIT-FOR-BIT against the unrolled CTE chain. The Rayleigh quotient
    // rides along as the eigenvalue estimate (one int→double cast per
    // side of one division).
    //
    // Scale shape: ALL sufficient statistics (scatter + linear sums +
    // count) come from ONE narrow pass — each vector appends a constant
    // 1 and explodes its (d+1)² outer product locally; map-side combine
    // collapses a partition to (d+1)² partial cells, so the exchange
    // carries the dimension, never data; every iteration after that
    // joins 64-row/4096-row DIMENSION tables (localCheckpoint-pinned).
    // The corpus is touched exactly twice end-to-end: once to train (the
    // cells pass), once to apply (q155's projections).
    "q154_pca_power" -> ((s, dir) => {
      val (v3, m) = pcaTrained(s, dir)
      val mv = m
        .join(v3.select(col("d").as("j"), col("v")), Seq("j"))
        .groupBy(col("i").as("d"))
        .agg(sum(col("m") * col("v")).as("w"))
      val ray = v3
        .join(mv, Seq("d"))
        .agg(
          round(
            sum(col("v") * col("w")).cast("double") / sum(col("v") * col("v")).cast("double"),
            4
          ).as("eigenvalue")
        )
      v3.crossJoin(broadcast(ray))
        .select(col("d").cast("long").as("d"), col("v"), col("eigenvalue"))
        .orderBy(col("d"))
    }),

    // PCA APPLY — project every vector onto the learned direction (the
    // second pass of the train/apply pair): one broadcast of the 64-row
    // eigenvector onto the narrow (vec_id, d, xq) stream, one
    // map-side-combined per-vector sum. Exact integers end to end; the
    // display score divides once by 2^40 (both quantization scales).
    "q155_pca_project" -> ((s, dir) => {
      val (v3, _) = pcaTrained(s, dir)
      pcaX(s, dir)
        .join(broadcast(v3), Seq("d"))
        .groupBy(col("vec_id"))
        .agg(sum(col("xq") * col("v")).as("proj_q"))
        .select(
          col("vec_id"),
          col("proj_q"),
          round(col("proj_q").cast("double") / lit(PScaleD), 4).as("proj")
        )
        .orderBy(col("vec_id"))
    })
  )

  private val PcaQuant  = 1048576.0      // 2^20 — vector quantization (exact exponent shift)
  private val PcaNorm   = 1048576L       // per-round renormalization target
  private val PcaRounds = 6              // unrolled power-iteration rounds (the q131 contract)
  private val PScaleD   = 1099511627776.0 // 2^40 = PcaQuant² — q155's display divisor

  /** The narrow quantized (vec_id, d, xq) stream — q154's train pass and
    * q155's apply pass both start here (two corpus scans total, by design).
    */
  private def pcaX(s: SparkSession, dir: String): DataFrame =
    Tables
      .spread(Tables.embeddings(s, dir), col("vec_id"))
      .select(
        col("vec_id"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQuant) AS BIGINT))").as("xqa")
      )
      .select(
        col("vec_id"),
        explode(expr(s"transform(sequence(0, ${Dim - 1}), d -> struct(d AS d, element_at(xqa, d + 1) AS xq))")).as("e")
      )
      .select(col("vec_id"), col("e.d").as("d"), col("e.xq").as("xq"))

  /** The single-scan sufficient-statistics aggregate behind the scatter
    * matrix, via homogeneous coordinates: append a constant 1 to every
    * quantized vector, and ONE (Dim+1)×(Dim+1) outer-product aggregate
    * yields the scatter sums (i, j < Dim), the linear sums (j = Dim:
    * xq_i·1), AND the row count (the (Dim, Dim) cell: 1·1 summed) — the
    * corpus is scanned exactly once to train. Cell products accumulate in
    * DECIMAL(38,0) (a LongType sum would wrap silently past ~2^63 total
    * while the oracle's HUGEINT stays exact — the cross-engine contract
    * must not depend on corpus size).
    */
  def pcaCellsPlan(s: SparkSession, dir: String): DataFrame =
    Tables
      .spread(Tables.embeddings(s, dir), col("vec_id"))
      .select(
        expr(s"concat(transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $PcaQuant) AS BIGINT)), array(1L))")
          .as("ya")
      )
      // narrow per-row outer product, map-side combined to (Dim+1)² cells
      // before the only data-dependent exchange
      .select(explode(expr(
        s"""flatten(transform(sequence(0, $Dim), i -> transform(sequence(0, $Dim), j ->
           |  struct(i AS i, j AS j, element_at(ya, i + 1) * element_at(ya, j + 1) AS p))))""".stripMargin)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p").cast("decimal(38,0)")).as("s"))

  /** Centered scatter matrix M = n·Σxxᵀ − (Σx)(Σx)ᵀ assembled from the
    * sufficient-statistic cells (pure dimension-table joins).
    */
  private def scatterFromCells(cells: DataFrame): DataFrame = {
    val sums = cells.filter(col("j") === Dim && col("i") < Dim).select(col("i").as("d"), col("s").as("sd"))
    val n    = cells.filter(col("i") === Dim && col("j") === Dim).select(col("s").as("n"))
    cells
      .filter(col("i") < Dim && col("j") < Dim)
      .join(broadcast(sums.select(col("d").as("i"), col("sd").as("si"))), Seq("i"))
      .join(broadcast(sums.select(col("d").as("j"), col("sd").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), (col("n") * col("s") - col("si") * col("sj")).as("m"))
  }

  /** The un-pinned scatter-matrix DAG — exposed so plan audits
    * (graft.Plans, PlanQualitySpec) keep gating the REAL machinery: the
    * registered q154/q155 read the session memo, whose scan plans would
    * trivially satisfy any gate (the `memoBuildPlan` treatment).
    */
  def pcaScatterPlan(s: SparkSession, dir: String): DataFrame =
    scatterFromCells(pcaCellsPlan(s, dir))

  /** The full train chain (scatter + [[PcaRounds]] renormalized power
    * rounds) — `ScaleBuilds` times this as `pca_build`. Returns
    * (v: (d, v), M: (i, j, m)), both localCheckpoint-pinned dimension
    * tables (M feeds four consumers; unpinned it would re-aggregate the
    * corpus per round).
    */
  private def pcaChain(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // pin the single-scan sufficient statistics FIRST — m references the
    // cells three ways (scatter, linear sums, n), and unpinned each
    // reference would re-scan the corpus
    val cells = pcaCellsPlan(s, dir).localCheckpoint()
    val m = scatterFromCells(cells)
      .localCheckpoint() // 4096-row dimension, read by every round + the Rayleigh pass
    val v0 = s.range(0, Dim).select(col("id").cast("int").as("d"), lit(PcaNorm).as("v"))
    val vN = (1 to PcaRounds).foldLeft(v0) { case (v, _) =>
      val w = m
        .join(v.select(col("d").as("j"), col("v")), Seq("j"))
        .groupBy(col("i").as("d"))
        .agg(sum(col("m") * col("v")).as("w"))
      val mx = w.agg(greatest(max(abs(col("w"))), lit(1).cast("decimal(38,0)")).as("mx"))
      w.crossJoin(broadcast(mx))
        .select(col("d"), expr(s"(w * $PcaNorm) div mx").as("v"))
        .localCheckpoint() // 64 rows — keeps the per-round plan flat
    }
    (vN, m)
  }

  /** ScaleBuilds' `pca_build` entry point: runs the whole train chain. */
  def pcaBuildPlan(s: SparkSession, dir: String): DataFrame = pcaChain(s, dir)._1

  /** Session memo of the trained (direction, scatter) pair — the
    * production shape: PCA trains ONCE per corpus snapshot and every
    * consumer (the q154 report, q155's projection pass, any downstream
    * whitening) reads the materialized tables (the dedup-family memo
    * treatment; see [[graft.sources.SessionMemo]]). Before the memo the
    * two registered queries re-ran the full chain each — 4.9 + 5.6 s at
    * sf0.1, the slowest entries on the board; after, each reads 64/4096
    * rows.
    */
  private def pcaTrained(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val base = graft.sources.SessionMemo.dir(s, "pca", dir) { b =>
      val (v, m) = pcaChain(s, dir)
      v.write.parquet(s"$b/v")
      m.write.parquet(s"$b/m")
    }
    (s.read.parquet(s"$base/v"), s.read.parquet(s"$base/m"))
  }

  // Oracle twins — identical algorithm in DuckDB SQL. The dot product is
  // the canonical OracleSql.dot (fold order of Spark's `aggregate`), shared
  // with the q159/q169 fused-ranking oracles in TextQueries.
  private val dotSql: (String, String) => String = OracleSql.dot(Dim)

  private val vecCte =
    s"""WITH v AS (SELECT vec_id, label, embedding,
       |  sqrt(${dotSql("embedding", "embedding")}) AS nrm FROM embeddings)
       |""".stripMargin

  /** One unrolled Lloyd iteration for q116's oracle: quantized-mean
    * centroids from assignment `$in`, then max-cosine re-assignment into
    * `$out` (round 6, ties to the least cluster) — the exact algorithm the
    * Spark side iterates.
    */
  private def kmeansIterSql(in: String, out: String): String =
    s""" sums_$out AS (
       |  SELECT a.cluster, pos, sum(CAST(floor(e.embedding[pos + 1]::DOUBLE * $QuantScale) AS BIGINT)) AS sq,
       |    count(*) AS n
       |  FROM embeddings e JOIN $in a USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range($Dim)) AS pos)
       |  GROUP BY 1, 2),
       | cent_$out AS (
       |  SELECT cluster, centroid, sqrt(${dotSql("centroid", "centroid")}) AS cnrm FROM (
       |    SELECT cluster, list(sq::DOUBLE / $QuantScale / n ORDER BY pos) AS centroid
       |    FROM sums_$out GROUP BY cluster)),
       | $out AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT v.vec_id, c.cluster,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        round(${dotSql("v.embedding", "c.centroid")} / (v.nrm * c.cnrm), 6) DESC, c.cluster) AS rnk
       |    FROM v CROSS JOIN cent_$out c) WHERE rnk = 1)""".stripMargin

  /** One probe-assigned Lloyd iteration for the adaptive oracle — the exact
    * algorithm [[probeAssign]] runs: centroids from `$in`, SRP-bucketed
    * ≤bcap-member cells, quantized-mean cell centroids, top-p cell probe
    * per vector, exact argmax within candidate members. Requires the `kb`
    * (k, bcap, nbits) and `aplanes` CTEs in scope.
    */
  private def adaptiveIterSql(in: String, out: String): String =
    s""" sums_$out AS (
       |  SELECT a.cluster, pos, sum(CAST(floor(e.embedding[pos + 1]::DOUBLE * $QuantScale) AS BIGINT)) AS sq,
       |    count(*) AS n
       |  FROM embeddings e JOIN $in a USING (vec_id)
       |  CROSS JOIN (SELECT unnest(range($Dim)) AS pos)
       |  GROUP BY 1, 2),
       | cent_$out AS (
       |  SELECT cluster, centroid, sqrt(${dotSql("centroid", "centroid")}) AS cnrm FROM (
       |    SELECT cluster, list(sq::DOUBLE / $QuantScale / n ORDER BY pos) AS centroid
       |    FROM sums_$out GROUP BY cluster)),
       | cbkt_$out AS (
       |  SELECT c.cluster,
       |    coalesce(string_agg(CASE WHEN ${dotSql("c.centroid", "pl.warr")} >= 0 THEN '1' ELSE '0' END, '' ORDER BY pl.p), '') AS bkt
       |  FROM cent_$out c CROSS JOIN aplanes pl GROUP BY c.cluster),
       | cells_$out AS (
       |  SELECT c.cluster, c.centroid, c.cnrm,
       |    b.bkt || '#' || CAST(((row_number() OVER (PARTITION BY b.bkt ORDER BY c.cluster)) - 1) // (SELECT bcap FROM kb) AS VARCHAR) AS cell
       |  FROM cent_$out c JOIN cbkt_$out b USING (cluster)),
       | csum_$out AS (
       |  SELECT cell, pos, sum(CAST(floor(centroid[pos + 1] * $QuantScale) AS BIGINT)) AS sq, count(*) AS n
       |  FROM cells_$out CROSS JOIN (SELECT unnest(range($Dim)) AS pos)
       |  GROUP BY 1, 2),
       | ccent_$out AS (
       |  SELECT cell, ccent, sqrt(${dotSql("ccent", "ccent")}) AS ccnrm FROM (
       |    SELECT cell, list(sq::DOUBLE / $QuantScale / n ORDER BY pos) AS ccent
       |    FROM csum_$out GROUP BY cell)),
       | probe_$out AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT v.vec_id, cc.cell,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        round(${dotSql("v.embedding", "cc.ccent")} / (v.nrm * cc.ccnrm), 6) DESC, cc.cell) AS crnk
       |    FROM v CROSS JOIN ccent_$out cc) WHERE crnk <= $AdaptiveProbe),
       | $out AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT v.vec_id, ce.cluster,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY
       |        round(${dotSql("v.embedding", "ce.centroid")} / (v.nrm * ce.cnrm), 6) DESC, ce.cluster) AS rnk
       |    FROM v JOIN probe_$out p ON p.vec_id = v.vec_id
       |    JOIN cells_$out ce ON ce.cell = p.cell) WHERE rnk = 1)""".stripMargin

  /** The full adaptive-assignment CTE chain (a2 = final (vec_id, cluster)):
    * k/bcap/nbits from the corpus size exactly as the Spark driver scalars,
    * SRP planes, mod-k init, two probe-assigned Lloyd iterations. Shared by
    * the q45 pair miner and the q129 keep-list.
    */
  private def adaptiveChainSql: String =
    s""" kb AS (
       |  SELECT k, bcap,
       |    greatest(1, (SELECT min(i) FROM (SELECT unnest(range(0, 63)) AS i)
       |                 WHERE (1::BIGINT << CAST(i AS INT)) >= (k + bcap - 1) // bcap)) AS nbits
       |  FROM (SELECT k, CAST(ceil(sqrt(k::DOUBLE)) AS BIGINT) AS bcap
       |        FROM (SELECT greatest(1, (count(*) + ${AdaptiveBlock - 1}) // $AdaptiveBlock) AS k FROM embeddings))),
       | aplanes AS (
       |  SELECT p, list_transform(range(0, $Dim),
       |    i -> (((strpos('0123456789abcdef', substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 1)) - 1) % 2) * 2 - 1)::DOUBLE) AS warr
       |  FROM (SELECT unnest(range(0, (SELECT nbits FROM kb))) AS p)),
       | a0 AS (
       |  SELECT vec_id, vec_id % (SELECT k FROM kb) AS cluster FROM embeddings),
       |${adaptiveIterSql("a0", "a1")},
       |${adaptiveIterSql("a1", "a2")}""".stripMargin

  /** Shared by q50 and q102: one top-k contract, two physical plans. */
  private val topkOracle: String =
    vecCte +
      s""", scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
         |  FROM v q JOIN v c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, cos, rnk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
         |  FROM scored) WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin

  val oracles: Map[String, String] = Map(
    // The adaptive chain replayed, then exact cosine pairs within the
    // learned blocks — q45's blocking is the a2 assignment, not the label.
    "q45_embedding_neardup" ->
      (vecCte + "," + adaptiveChainSql +
        s"""
           |SELECT a.vec_id AS ia, b.vec_id AS ib,
           |  round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
           |FROM v a
           |JOIN a2 ca ON ca.vec_id = a.vec_id
           |JOIN a2 cb ON cb.cluster = ca.cluster
           |JOIN v b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
           |WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $NearDupCos
           |ORDER BY ia, ib""".stripMargin),
    "q50_cosine_topk" -> topkOracle,
    // q102 computes the identical result through the mapPartitions physical
    // shape — same oracle on purpose (the point is result identity).
    "q102_topk_mappartitions" -> topkOracle,
    "q53_range_search" ->
      (vecCte +
        s"""SELECT q.vec_id AS query_id, count(*) AS n_neighbors,
           |  max(round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6)) AS max_cos,
           |  min(round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6)) AS min_cos
           |FROM v q JOIN v c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id
           |WHERE round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) >= $RangeTau
           |GROUP BY 1 ORDER BY query_id""".stripMargin),
    "q54_normalize" ->
      (vecCte +
        "SELECT vec_id, round(nrm, 6) AS l2, round(embedding[1]::DOUBLE / nrm, 6) AS u0 FROM v ORDER BY vec_id"),
    "q55_quantize_int8" ->
      s"""WITH d AS (SELECT vec_id, list_transform(embedding, v -> v::DOUBLE) AS x FROM embeddings),
         | p AS (SELECT vec_id, x, list_min(x) AS mn,
         |              (list_max(x) - list_min(x)) / 255.0 AS scale FROM d),
         | c AS (SELECT vec_id, x, mn, scale,
         |         CASE WHEN scale = 0 THEN list_transform(x, v -> 0.0::DOUBLE)
         |              ELSE list_transform(x, v -> round((v - mn) / scale)) END AS codes
         |       FROM p),
         | e AS (SELECT vec_id, codes,
         |         list_transform(range(1, ${Dim + 1}), i -> abs(x[i] - (mn + codes[i] * scale))) AS errs
         |       FROM c)
         |SELECT vec_id,
         |  list_reduce(list_prepend(0.0::DOUBLE, codes), (a, b) -> a + b)::BIGINT AS code_sum,
         |  round(list_reduce(list_prepend(0.0::DOUBLE, errs), (a, b) -> a + b) / ${Dim}.0, 6) AS mean_abs_err,
         |  round(list_max(errs), 6) AS max_abs_err
         |FROM e ORDER BY vec_id""".stripMargin,
    "q51_ann_ivf" ->
      (vecCte +
        s""", expl AS (
           |  SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS v
           |  FROM embeddings CROSS JOIN (SELECT unnest(range($Dim)) AS i)),
           | dimsum AS (
           |  SELECT label, pos, sum(CAST(floor(v * $QuantScale) AS BIGINT)) AS sq, count(*) AS n
           |  FROM expl GROUP BY 1, 2),
           | cent AS (
           |  SELECT label, list(sq::DOUBLE / $QuantScale / n ORDER BY pos) AS centroid
           |  FROM dimsum GROUP BY label),
           | cn AS (SELECT label, centroid, sqrt(${dotSql("centroid", "centroid")}) AS cnrm FROM cent),
           | probes AS (
           |  SELECT query_id, label FROM (
           |    SELECT q.vec_id AS query_id, cn.label,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        round(${dotSql("q.embedding", "cn.centroid")} / (q.nrm * cn.cnrm), 6) DESC, cn.label) AS crnk
           |    FROM v q CROSS JOIN cn WHERE q.vec_id < $QuerySetSize)
           |  WHERE crnk <= $NProbe),
           | scored AS (
           |  SELECT p.query_id, c.vec_id AS neighbor_id,
           |    round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
           |  FROM probes p JOIN v c ON c.label = p.label AND c.vec_id <> p.query_id
           |  JOIN v q ON q.vec_id = p.query_id)
           |SELECT query_id, neighbor_id, cos, rnk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |  FROM scored) WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin),
    "q52_srp_lsh" ->
      (vecCte +
        s""", planes AS (
           |  SELECT p, list_transform(range(0, $Dim),
           |    i -> (((strpos('0123456789abcdef', substr(md5(p::VARCHAR || ':' || i::VARCHAR), 1, 1)) - 1) % 2) * 2 - 1)::DOUBLE) AS warr
           |  FROM (SELECT unnest(range(0, $NumPlanes)) AS p)),
           | proj AS (
           |  SELECT vec_id, p,
           |    list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${Dim + 1}), i -> embedding[i]::DOUBLE * warr[i])), (x, y) -> x + y) AS pr
           |  FROM embeddings CROSS JOIN planes),
           | buckets AS (
           |  SELECT vec_id, string_agg(CASE WHEN pr >= 0 THEN '1' ELSE '0' END, '' ORDER BY p) AS bucket
           |  FROM proj GROUP BY vec_id),
           | cand AS (
           |  SELECT a.vec_id AS ia, b.vec_id AS ib
           |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
           |SELECT c.ia, c.ib,
           |  round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) AS cos
           |FROM cand c JOIN v a ON a.vec_id = c.ia JOIN v b ON b.vec_id = c.ib
           |WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $NearDupCos
           |ORDER BY ia, ib""".stripMargin),
    // The q50 and q51 pipelines replayed side by side, then set-intersected
    // per query — recall@k of the probe search against the exact baseline.
    "q127_ivf_recall" ->
      (vecCte +
        s""", exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
           |    FROM v q JOIN v c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id)
           |  WHERE rnk <= $TopK),
           | expl AS (
           |  SELECT label, i AS pos, embedding[i + 1]::DOUBLE AS v
           |  FROM embeddings CROSS JOIN (SELECT unnest(range($Dim)) AS i)),
           | dimsum AS (
           |  SELECT label, pos, sum(CAST(floor(v * $QuantScale) AS BIGINT)) AS sq, count(*) AS n
           |  FROM expl GROUP BY 1, 2),
           | cent AS (
           |  SELECT label, list(sq::DOUBLE / $QuantScale / n ORDER BY pos) AS centroid
           |  FROM dimsum GROUP BY label),
           | cn AS (SELECT label, centroid, sqrt(${dotSql("centroid", "centroid")}) AS cnrm FROM cent),
           | probes AS (
           |  SELECT query_id, label FROM (
           |    SELECT q.vec_id AS query_id, cn.label,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        round(${dotSql("q.embedding", "cn.centroid")} / (q.nrm * cn.cnrm), 6) DESC, cn.label) AS crnk
           |    FROM v q CROSS JOIN cn WHERE q.vec_id < $QuerySetSize)
           |  WHERE crnk <= $NProbe),
           | ann AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT p.query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY p.query_id ORDER BY
           |        round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
           |    FROM probes p JOIN v c ON c.label = p.label AND c.vec_id <> p.query_id
           |    JOIN v q ON q.vec_id = p.query_id)
           |  WHERE rnk <= $TopK),
           | ks AS (SELECT query_id, count(*) AS k FROM exact GROUP BY 1),
           | hits AS (
           |  SELECT e.query_id, count(*) AS n_hit
           |  FROM exact e JOIN ann a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY 1)
           |SELECT ks.query_id, ks.k, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
           |  round(coalesce(h.n_hit, 0)::DOUBLE / ks.k, 4) AS recall
           |FROM ks LEFT JOIN hits h ON ks.query_id = h.query_id
           |ORDER BY ks.query_id""".stripMargin),
    // The same global symmetric int8 quantization, exact-integer code
    // dots/norms, round-6 code-space ranking, recall vs the float ranks.
    "q163_int8_recall" ->
      (vecCte +
        s""", exact AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rnk
           |    FROM v q JOIN v c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id)
           |  WHERE rnk <= $TopK),
           | mx AS (SELECT max(list_max(list_transform(embedding, x -> abs(x::DOUBLE)))) AS s FROM embeddings),
           | co AS (
           |  SELECT vec_id, list_transform(embedding, x -> CAST(round(x::DOUBLE * 127.0 / s) AS BIGINT)) AS codes
           |  FROM embeddings CROSS JOIN mx),
           | cq AS (
           |  SELECT vec_id, codes,
           |    list_reduce(list_prepend(0::BIGINT, list_transform(codes, x -> x * x)), (a, b) -> a + b) AS qn
           |  FROM co),
           | qr AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
           |        round(list_reduce(list_prepend(0::BIGINT, list_transform(range(1, ${Dim + 1}), i -> q.codes[i] * c.codes[i])), (a, b) -> a + b)::DOUBLE
           |          / (sqrt(q.qn::DOUBLE) * sqrt(c.qn::DOUBLE)), 6) DESC, c.vec_id) AS rnk
           |    FROM cq q JOIN cq c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id)
           |  WHERE rnk <= $TopK),
           | ks AS (SELECT query_id, count(*)::BIGINT AS k FROM exact GROUP BY 1),
           | hits AS (
           |  SELECT e.query_id, count(*)::BIGINT AS n_hit
           |  FROM exact e JOIN qr ON qr.query_id = e.query_id AND qr.neighbor_id = e.neighbor_id
           |  GROUP BY 1)
           |SELECT ks.query_id, ks.k, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
           |  round(coalesce(h.n_hit, 0)::DOUBLE / ks.k, 4) AS recall
           |FROM ks LEFT JOIN hits h ON ks.query_id = h.query_id
           |ORDER BY ks.query_id""".stripMargin),
    "q120_hard_negatives" ->
      (vecCte +
        s""", scored AS (
           |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           |    round(${dotSql("q.embedding", "c.embedding")} / (q.nrm * c.nrm), 6) AS cos
           |  FROM v q JOIN v c ON q.vec_id < $QuerySetSize AND c.vec_id <> q.vec_id
           |    AND c.label <> q.label)
           |SELECT query_id, neighbor_id, cos, rnk FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
           |  FROM scored) WHERE rnk <= $TopK ORDER BY query_id, rnk""".stripMargin),
    // The q116 CTE chain plus the within-cluster pair prune — losers are
    // the higher vec_id of every above-threshold same-cluster pair.
    "q124_semantic_dedup" ->
      (vecCte +
        s""", a0 AS (SELECT vec_id, label::BIGINT AS cluster FROM embeddings),
           |${kmeansIterSql("a0", "a1")},
           |${kmeansIterSql("a1", "a2")},
           | losers AS (
           |  SELECT DISTINCT b.vec_id FROM v a
           |  JOIN a2 ca ON ca.vec_id = a.vec_id
           |  JOIN a2 cb ON cb.cluster = ca.cluster
           |  JOIN v b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
           |  WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $SemDedupCos)
           |SELECT vec_id, label FROM v
           |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
           |ORDER BY vec_id""".stripMargin),
    // The adaptive chain: k/bcap/nbits computed from the corpus size in
    // SQL exactly as the Spark side's bounded driver scalars, mod-k init,
    // then two PROBE-ASSIGNED Lloyd iterations (the two-level IVF assign
    // [[probeAssign]] runs) and the same pair prune as q124.
    "q129_semantic_dedup_adaptive" ->
      (vecCte + "," + adaptiveChainSql +
        s""",
           | losers AS (
           |  SELECT DISTINCT b.vec_id FROM v a
           |  JOIN a2 ca ON ca.vec_id = a.vec_id
           |  JOIN a2 cb ON cb.cluster = ca.cluster
           |  JOIN v b ON b.vec_id = cb.vec_id AND a.vec_id < b.vec_id
           |  WHERE round(${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm), 6) >= $SemDedupCos)
           |SELECT vec_id, label FROM v
           |WHERE vec_id NOT IN (SELECT vec_id FROM losers)
           |ORDER BY vec_id""".stripMargin),
    // Two unrolled Lloyd iterations, chained CTEs — identical quantized
    // centroids + rounded-cosine argmax as the Spark loop.
    "q116_kmeans_refine" ->
      (vecCte +
        s""", a0 AS (SELECT vec_id, label::BIGINT AS cluster FROM embeddings),
           |${kmeansIterSql("a0", "a1")},
           |${kmeansIterSql("a1", "a2")}
           |SELECT v.vec_id, v.label::BIGINT AS init_label, a2.cluster
           |FROM v JOIN a2 USING (vec_id) ORDER BY vec_id""".stripMargin),
    // The identical exact-integer chain: HUGEINT scatter matrix, the same
    // truncating renormalized power rounds, one int→double cast per side
    // of the Rayleigh division.
    "q154_pca_power" ->
      (pcaOracleCte +
        s"""SELECT vf.d::BIGINT AS d, CAST(vf.v AS BIGINT) AS v, ray.eigenvalue
           |FROM v$PcaRounds vf CROSS JOIN ray ORDER BY d""".stripMargin),
    "q155_pca_project" ->
      (pcaOracleCte +
        s"""SELECT x.vec_id, CAST(sum(x.xq * vf.v) AS BIGINT) AS proj_q,
           |  round(CAST(sum(x.xq * vf.v) AS DOUBLE) / $PScaleD, 4) AS proj
           |FROM x JOIN v$PcaRounds vf USING (d) GROUP BY x.vec_id ORDER BY x.vec_id""".stripMargin)
  )

  /** q154/q155's oracle chain: quantize → exact HUGEINT scatter matrix →
    * PcaRounds renormalized power rounds (truncating integer division matches
    * Spark's `div` on both engines) → Rayleigh quotient.
    */
  private lazy val pcaOracleCte: String = {
    def round_(i: Int) =
      s""" w$i AS (SELECT m.i AS d, sum(m.m * v${i - 1}.v) AS w FROM m JOIN v${i - 1} ON m.j = v${i - 1}.d GROUP BY 1),
         | x$i AS (SELECT greatest(max(abs(w)), 1) AS mx FROM w$i),
         | v$i AS (SELECT d, (w * $PcaNorm) // mx AS v FROM w$i CROSS JOIN x$i)""".stripMargin
    s"""WITH x AS (
       |  SELECT vec_id, d, CAST(floor(embedding[d + 1]::DOUBLE * $PcaQuant) AS BIGINT) AS xq
       |  FROM embeddings CROSS JOIN (SELECT unnest(range($Dim))::INT AS d)),
       | nn AS (SELECT count(DISTINCT vec_id) AS n FROM x),
       | s AS (SELECT d, CAST(sum(xq) AS HUGEINT) AS sd FROM x GROUP BY d),
       | p AS (SELECT a.d AS i, b.d AS j, CAST(sum(a.xq * b.xq) AS HUGEINT) AS sxx
       |       FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
       | m AS (SELECT i, j, nn.n * p.sxx - si.sd * sj.sd AS m
       |       FROM p CROSS JOIN nn JOIN s si ON si.d = p.i JOIN s sj ON sj.d = p.j),
       | v0 AS (SELECT unnest(range($Dim))::INT AS d, CAST($PcaNorm AS HUGEINT) AS v),
       |${(1 to PcaRounds).map(round_).mkString(",\n")},
       | mv AS (SELECT m.i AS d, sum(m.m * v$PcaRounds.v) AS w FROM m JOIN v$PcaRounds ON m.j = v$PcaRounds.d GROUP BY 1),
       | ray AS (SELECT round(CAST(sum(v$PcaRounds.v * mv.w) AS DOUBLE) / CAST(sum(v$PcaRounds.v * v$PcaRounds.v) AS DOUBLE), 4) AS eigenvalue
       |         FROM v$PcaRounds JOIN mv USING (d))
       |""".stripMargin
  }
}
