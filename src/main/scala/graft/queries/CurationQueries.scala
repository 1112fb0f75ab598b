package graft.queries

import graft.functions.TextFunctions
import graft.plans.CacheScope
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-curation queries combining modalities — the selection/statistics
  * layer of a training-data pipeline: cross-modal joins (text quality ×
  * embedding cluster), exact distribution statistics, stratified sampling.
  */
object CurationQueries {

  /** First 16 bits of an md5 hex column as an integer bucket in [0, 2^16) —
    * the shared uniform for the deterministic samplers (q64, q66); one
    * definition so the formula (and its DuckDB mirrors) cannot drift apart.
    */
  private def md5Bucket16(h: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 4)
      .map(i =>
        (instr(lit("0123456789abcdef"), substring(h, i + 1, 1)) - 1)
          * lit(math.pow(16, 3 - i).toLong)
      )
      .reduce(_ + _)

  private val SourceCap = 5 // q121: max docs kept per source

  /** q190: total documents the temperature mix allocates across languages
    * (`private[graft]` — the spec asserts the seat total and flattening
    * against it).
    */
  private[graft] val MixBudget = 100L

  /** q164 stride table: language mixture weights {en:4, de:2, fr:2, es:1,
    * zh:1} expressed as integer STRIDES L/w with L = lcm(weights) = 4, so
    * virtual times (2k−1)·stride stay exact integers. Unlisted languages
    * ride the weight-1 default stride.
    */
  private val StrideByLang  = Seq("en" -> 1L, "de" -> 2L, "fr" -> 2L, "es" -> 4L, "zh" -> 4L)
  private val StrideDefault = 4L

  private val PerceptronBuckets = 64 // q160: hashed feature buckets (bias rides bucket B)
  private val PerceptronRounds  = 3  // q160: fixed unrolled training rounds

  private val MaxBatchTokens = 512L // q168: padded-token capacity per inference batch

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Cross-modal: join documents to their embedding rows (doc_id = vec_id)
    // and profile text quality per embedding cluster — the "which clusters
    // hold low-quality text" curation question.
    "q62_crossmodal_quality" -> ((s, dir) => {
      val docs = Tables
        .documents(s, dir)
        .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      Tables
        .embeddings(s, dir)
        .select(col("vec_id"), col("label"))
        .join(docs, col("vec_id") === col("doc_id"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), round(avg(col("q")), 4).as("avg_quality"))
        .orderBy(col("label"))
    }),

    // STRATIFIED sample, deterministic per-stratum form — q64's
    // md5-bucket-threshold trick with a DIFFERENT rate per (lang) stratum:
    // downsample the dominant language to 10%, keep 30% of the rest (the
    // "rebalance by language" curation move). The stratum key is part of
    // the hash input, so re-stratifying cannot silently reuse the q64
    // uniform. Membership is a pure row function — stable across engines,
    // runs, retries, and repartitioning; a narrow filter; the exact member
    // set is oracle-checked (unlike an engine-RNG `sampleBy`, which is the
    // API demo in CurationSpec). Thresholds are integers (rate × 2^16) so
    // the comparison has no float boundary.
    "q63_stratified_sample" -> ((s, dir) =>
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          col("lang"),
          md5(concat_ws(":", lit("ss"), col("lang"), col("doc_id"))).as("h")
        )
        .select(
          col("doc_id"),
          col("lang"),
          md5Bucket16(col("h")).as("bucket"),
          when(col("lang") === "en", lit(6554)).otherwise(lit(19661)).as("thr") // 0.1 / 0.3 × 2^16
        )
        .filter(col("bucket") < col("thr"))
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))),

    // Deterministic hash sample: keep a row iff the first 16 bits of
    // md5("label:vec_id") fall under rate × 2^16 — ~20% per stratum with a
    // membership decision that is a pure row function. This is the form a
    // 100 TB curation run actually ships: resampling is STABLE across
    // engines, runs, retries, and repartitioning (no RNG state), the sample
    // is a narrow filter (never materializes the stratum), and the exact
    // member set is oracle-checkable.
    "q64_hash_sample" -> ((s, dir) =>
      Tables
        .embeddings(s, dir)
        .select(
          col("vec_id"),
          col("label"),
          md5(concat_ws(":", col("label"), col("vec_id"))).as("h")
        )
        .select(col("vec_id"), col("label"), md5Bucket16(col("h")).as("bucket"))
        .filter(col("bucket") < 13107) // 0.2 * 2^16
        .select(col("vec_id"), col("label"))
        .orderBy(col("vec_id"))),

    // Deterministic WEIGHTED sample: keep a document with probability
    // proportional to its quality score — the "sample good data harder"
    // curation primitive — with the same hash-uniform trick as q64, so
    // membership is a pure row function (stable across engines, runs and
    // repartitioning; a narrow filter, no RNG state, oracle-checkable).
    // Exactness at the boundary: quality is a round(·,4) double computed
    // identically on both engines, and the threshold multiplier 2^15 is a
    // POWER OF TWO — scaling a double by 2^15 is exact in IEEE — so
    // `bucket < quality * 32768` compares the same two numbers everywhere.
    "q66_weighted_sample" -> ((s, dir) =>
      Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          col("lang"),
          col("source"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          md5(concat_ws(":", lit("ws"), col("doc_id"))).as("h")
        )
        .select(
          col("doc_id"),
          col("lang"),
          col("source"),
          col("quality"),
          md5Bucket16(col("h")).as("bucket")
        )
        // acceptance probability = quality / 2 (scale 2^16 buckets by 2^15)
        .filter(col("bucket") < col("quality") * lit(32768.0))
        .select(col("doc_id"), col("lang"), col("source"), col("quality"))
        .orderBy(col("doc_id"))),

    // Source-mixture REWEIGHTING: per-source acceptance weights that move
    // the corpus toward a target mixture (uniform here) without
    // upsampling — weight_s = min(1, target_share·N / n_s), the standard
    // data-mixing computation (composable with q64/q66: accept doc iff
    // md5-bucket < weight·2^16). Exact: weights derive from integer counts
    // by one IEEE division + round, identical in both engines.
    "q69_mixture_weights" -> ((s, dir) => {
      val perSource = Tables
        .documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val totals = broadcast(
        perSource.agg(sum(col("n_docs")).as("n_total"), count(lit(1)).as("n_sources"))
      )
      perSource
        .crossJoin(totals) // 1 row
        .select(
          col("source"),
          col("n_docs"),
          round(
            least(
              lit(1.0),
              col("n_total").cast("double") /
                (col("n_sources") * col("n_docs")).cast("double")
            ),
            6
          ).as("weight")
        )
        .withColumn("expected_n", round(col("n_docs") * col("weight"), 2))
        .orderBy(col("source"))
    }),

    // PER-SOURCE CAP — "at most N documents per source, best quality
    // first": the anti-domination rule a web-scale mixture applies so one
    // crawl cannot flood the corpus. A per-source top-N window (partial
    // top-k: WindowGroupLimit discards below-rank rows before the full
    // sort at scale), quality ties broken by doc_id for determinism.
    // Composes with q69's mixture weights (cap first, reweight after).
    "q121_source_cap" -> ((s, dir) =>
      Tables
        .documents(s, dir)
        .select(col("doc_id"), col("source"), TextFunctions.qualityScore(col("text")).as("quality"))
        .withColumn(
          "rnk",
          row_number().over(Window.partitionBy(col("source")).orderBy(col("quality").desc, col("doc_id"))))
        .filter(col("rnk") <= SourceCap)
        .select(col("source"), col("doc_id"), col("quality"), col("rnk").cast("long").as("rnk"))
        .orderBy(col("source"), col("rnk"))),

    // TEMPERATURE-BASED MIXTURE SAMPLING — the multilingual rebalancing
    // rule (XLM-R/mBERT α-sampling: p_l ∝ n_l^α, α = 1/2): high-resource
    // languages are down-weighted, the tail up-weighted. Exact and
    // bit-portable end to end: α = 1/2 is chosen deliberately because
    // sqrt is the ONE power IEEE 754 requires correctly rounded (ln/exp
    // powers are libm-dependent), so the weight w_l = floor(sqrt(n_l)·2^20)
    // is a BIGINT both engines agree on; the budget (MixBudget docs) is
    // then allocated by the largest-remainder (Hamilton) method in pure
    // integer arithmetic (base = B·w DIV W, leftover seats by remainder
    // DESC with a lang tie-break), and each language's quota is filled by
    // deterministic md5-rank selection — a reproducible sample, no RNG.
    // Plan shape (plan-gated): the count aggregate map-side combines; every
    // mixture computation after it runs on the LANGUAGE dimension (a
    // handful of rows — the dim-sized window rule, q150's); the per-doc
    // rank window carries a FOLDABLE budget bound so a WindowGroupLimit
    // forwards at most MixBudget rows per language out of each partition
    // (partial top-k, the q121 shape), and the allocation broadcasts onto
    // the survivors. NULL-lang documents are excluded up front: an inner
    // join would drop their filled seats AFTER allocation, silently
    // shrinking the seat total. A language smaller than its quota just
    // fills what it has — both engines rank-filter the same rows.
    "q190_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).filter(col("lang").isNotNull)
      // every mixture computation after the count runs on the LANGUAGE
      // dimension — a handful of rows, so the empty-partition windows are
      // the dim-sized-window rule (q150's), and the whole allocation is
      // ONE pass over one counts frame (no self-joins, no re-aggregation)
      val dim = Window.partitionBy()
      val alloc = docs
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("wq", expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT)"))
        .withColumn("tw", sum(col("wq")).over(dim))
        .withColumn("base", expr(s"($MixBudget * wq) DIV tw"))
        .withColumn("rem", expr(s"($MixBudget * wq) % tw"))
        .withColumn("extra", lit(MixBudget) - sum(col("base")).over(dim))
        .withColumn("rr", row_number().over(Window.orderBy(col("rem").desc, col("lang"))))
        .select(
          col("lang"),
          (col("base") + when(col("rr") <= col("extra"), 1L).otherwise(0L)).as("alloc"))
      docs
        .select(col("doc_id"), col("lang"), md5(col("doc_id").cast("string")).as("h"))
        .withColumn(
          "rk",
          row_number().over(Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))).cast("long"))
        .filter(col("rk") <= lit(MixBudget)) // foldable bound → WindowGroupLimit partial top-k
        .join(broadcast(alloc), Seq("lang"))
        .filter(col("rk") <= col("alloc"))
        .select(col("lang"), col("rk"), col("doc_id"), col("alloc"))
        .orderBy(col("lang"), col("rk"))
    }),

    // GLOBAL QUALITY RANKING at scale — every document's corpus-wide rank
    // by quality, via [[graft.operators.RankOps.globalRowNumber]]: range
    // partition + parallel per-partition windows + bounded offset collect,
    // NEVER the single-task empty-partition window (the ordering includes
    // doc_id, so it is total and the rank deterministic). The "take the
    // global top-X% of the corpus" curation primitive.
    "q125_global_rank" -> ((s, dir) =>
      graft.operators.RankOps
        .globalRowNumber(
          Tables
            .documents(s, dir)
            .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality")),
          Seq(col("quality").desc, col("doc_id")))
        .select(col("doc_id"), col("quality"), col("rank"))
        .orderBy(col("rank"))),

    // ONE-PASS COLUMN PROFILING (ProfileOps) — the ingestion health report:
    // per column, rows / nulls / EXACT distincts / lexicographic min-max /
    // total value length, all from one scan and two keyed exchanges
    // regardless of column count. `lang_non_en` (nullif) puts real nulls
    // under the gate — the base corpus is null-free.
    "q132_profile" -> ((s, dir) =>
      graft.operators.ProfileOps.profile(
        Tables
          .documents(s, dir)
          .withColumn("lang_non_en", when(col("lang") =!= "en", col("lang"))),
        Seq("doc_id", "lang", "source", "n_chars", "lang_non_en"))),

    // ORDER-INVARIANT TABLE CHECKSUMS — the anti-entropy primitive for
    // replica/version reconciliation at 100 TB: one (n_rows, checksum)
    // row per table, where the checksum is an additive fold of per-row
    // 60-bit md5 digests of a CANONICAL row serialization (dates as
    // ISO strings, money as exact cents, text by content digest) — a
    // commutative sum, so partition order, file order, and shuffle
    // nondeterminism cannot change it, and two replicas compare whole
    // tables by exchanging three numbers. Digests ride mod 2^31−1 so the
    // running Long sum stays exact to ~4e9 rows (a production combine
    // folds the modulus into the partial merge).
    "q141_table_checksum" -> ((s, dir) => {
      val M = 2147483647L
      // every field rides through coalesce to a sentinel: concat_ws would
      // silently SKIP a NULL field (row still hashed, differently) while
      // the oracle's || chain would NULL the whole row out of the checksum
      // but not n_rows — the sentinel makes NULL-bearing rows serialize
      // identically in both formulations (the anti-entropy contract)
      def f(c: org.apache.spark.sql.Column) = coalesce(c.cast("string"), lit("␀"))
      def sums(df: DataFrame, name: String): DataFrame =
        df.select(
            (expr("CAST(conv(substr(md5(_c), 1, 15), 16, 10) AS BIGINT)") % M).as("h"))
          .select(lit(name).as("table_name"), col("h"))
          .groupBy(col("table_name"))
          .agg(count(lit(1)).as("n_rows"), (sum(col("h")) % M).as("checksum"))
      val o = Tables.orders(s, dir).select(concat_ws("|",
        f(col("o_orderkey")), f(col("o_custkey")), f(col("o_orderstatus")),
        f(round(col("o_totalprice") * 100).cast("long")),
        f(date_format(to_date(col("o_orderdate")), "yyyy-MM-dd")),
        f(col("o_orderpriority"))).as("_c"))
      val l = Tables.lineitem(s, dir).select(concat_ws("|",
        f(col("l_orderkey")), f(col("l_linenumber")), f(col("l_partkey")), f(col("l_suppkey")),
        f(round(col("l_quantity") * 100).cast("long")),
        f(round(col("l_extendedprice") * 100).cast("long")),
        f(col("l_returnflag")),
        f(date_format(to_date(col("l_shipdate")), "yyyy-MM-dd"))).as("_c"))
      val d = Tables.documents(s, dir).select(concat_ws("|",
        f(col("doc_id")), f(col("lang")), f(col("source")), f(col("n_chars")), f(md5(col("text")))).as("_c"))
      sums(o, "orders")
        .union(sums(l, "lineitem"))
        .union(sums(d, "documents"))
        .orderBy(col("table_name"))
    }),

    // BUCKET-LEVEL SNAPSHOT DIFF — q141 answers "are two replicas equal"
    // with three numbers; this LOCALIZES the damage when they are not
    // (the Merkle move): rows hash-partition into 256 buckets, each
    // bucket carries (n_rows, additive mod-sum checksum), and only
    // buckets whose summaries differ surface — at 100 TB the repair job
    // re-reads 1/256th of the table per flagged bucket instead of all of
    // it, and the exchange carries 256 summary rows per side, never
    // data. Snapshot B is a deterministic mutation of the corpus
    // (≈2% md5-selected deletes + ≈2% rewrites — derived purely from the
    // given table, so the oracle replays it bit-for-bit); the report is
    // exactly the buckets touched by a delete or rewrite.
    "q166_bucket_diff" -> ((s, dir) => {
      val M   = 2147483647L
      val thr = 1311L // ceil(0.02 · 2^16) — the 2% selection threshold
      def h16(prefix: String) = expr(
        s"CAST(conv(substr(md5(CAST(concat('$prefix', CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10) AS BIGINT)")
      val base = Tables
        .documents(s, dir)
        .select(col("doc_id"), col("text"), h16("del:").as("hd"), h16("mut:").as("hm"))
      val snapB = base
        .filter(col("hd") >= thr)
        .select(col("doc_id"),
          when(col("hm") < thr, upper(col("text"))).otherwise(col("text")).as("text"))
      def bucketSums(df: DataFrame, nCol: String, cCol: String): DataFrame =
        df.select(
            (col("doc_id") % 256).as("bucket"),
            (expr("CAST(conv(substr(md5(concat_ws('|', CAST(doc_id AS STRING), md5(text))), 1, 15), 16, 10) AS BIGINT)") % M)
              .as("h"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as(nCol), (sum(col("h")) % M).as(cCol))
      bucketSums(base.select(col("doc_id"), col("text")), "n_a", "chk_a")
        .join(bucketSums(snapB, "n_b", "chk_b"), Seq("bucket"), "full_outer")
        .filter(!(col("n_a") <=> col("n_b")) || !(col("chk_a") <=> col("chk_b")))
        .select(col("bucket"), col("n_a"), col("chk_a"), col("n_b"), col("chk_b"))
        .orderBy(col("bucket"))
    }),

    // MERGEABLE QUANTILE SKETCH — the missing member of the sketch family
    // (count-min q108, HLL q59/q126, KMV q110): per group, keep the
    // bottom-K rows by a uniform content hash (md5 of the unique event id)
    // — an order-invariant, union-mergeable sample, unlike KLL whose
    // compactions depend on merge order — and read quantiles off the
    // sorted sample by integer rank ceil(p·n) (no engine percentile
    // semantics in play). The estimate sits NEXT TO the exact rank pick
    // from the full data, q100's estimate-vs-exact audit shape, so the
    // "is K big enough" report ships with the sketch. Deterministic end
    // to end ⇒ fully hash-checked (the family's engine-private member,
    // q59, stays rows-only; this one needn't).
    "q133_quantile_sketch" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 64 // sample size per group — est error O(1/sqrt(k)) per rank
      val ev = Tables
        .events(s, dir)
        .select(col("event_type"), col("value"),
          md5(col("event_id").cast("string").cast("binary")).as("h"))
      val byHash = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val byVal  = Window.partitionBy(col("event_type")).orderBy(col("value"), col("h"))
      // rank over the bounded sample (≤ K rows per group)
      val samp = ev
        .withColumn("rn", row_number().over(byHash))
        .filter(col("rn") <= k)
        .withColumn("sr", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      // rank over the full data (the exact side of the audit)
      val full = ev
        .withColumn("sr", row_number().over(byVal))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      def pick(df: DataFrame, num: Int, den: Int, as: String) =
        df.filter(col("sr") === expr(s"(($num * n) + $den - 1) div $den"))
          .groupBy(col("event_type"))
          .agg(round(min(col("value")), 4).as(as), min(col("n")).as(s"_n_$as"))
      Seq(
        pick(samp, 1, 2, "est_p50"), pick(samp, 9, 10, "est_p90"), pick(samp, 99, 100, "est_p99"),
        pick(full, 1, 2, "ex_p50"), pick(full, 9, 10, "ex_p90"), pick(full, 99, 100, "ex_p99"))
        .reduce(_.join(_, Seq("event_type")))
        .select(
          col("event_type"), col("_n_ex_p50").as("n"), col("_n_est_p50").as("n_samp"),
          col("est_p50"), col("est_p90"), col("est_p99"),
          col("ex_p50"), col("ex_p90"), col("ex_p99"))
        .orderBy(col("event_type"))
    }),

    // Exact interpolated percentiles per event type (Spark `percentile` ==
    // DuckDB `quantile_cont`, both linear interpolation over sorted values).
    "q36_percentiles" -> ((s, dir) =>
      Tables
        .events(s, dir)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99")
        )
        .orderBy(col("event_type")))
,
    // SEQUENCE PACKING — the GPT-style concat-and-chunk step a pretraining
    // pipeline runs last: documents concatenate in a deterministic order
    // (doc_id) into one token stream, the stream chunks into fixed
    // SeqLen-token training blocks, and each document's placement is a pure
    // function of the running token total BEFORE it. Per doc: its token
    // start offset, the first/last block it lands in, and how many block
    // boundaries it straddles — the packing manifest a sharded tokenizer
    // job emits. The cumulative sum rides
    // [[graft.operators.RankOps.globalRunningSums]] (range partition +
    // parallel per-partition windows + broadcast offsets), NEVER a
    // single-task empty-partition window — the oracle computes the same
    // prefix sum with the naive window, proving the two-phase form exact.
    "q148_seq_packing" -> ((s, dir) => {
      val docs = Tables
        .documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      graft.operators.RankOps
        .globalRunningSums(docs, Seq(col("doc_id")), Seq("n_tokens"))
        .select(
          col("doc_id"),
          col("n_tokens"),
          (col("cum_n_tokens") - col("n_tokens")).as("start_off"),
          expr(s"(cum_n_tokens - n_tokens) DIV $PackSeqLen").as("first_blk"),
          expr(s"(cum_n_tokens - 1) DIV $PackSeqLen").as("last_blk"),
          (expr(s"(cum_n_tokens - 1) DIV $PackSeqLen")
            - expr(s"(cum_n_tokens - n_tokens) DIV $PackSeqLen") + lit(1)).as("n_blocks")
        )
        .orderBy(col("doc_id"))
    }),

    // ADAPTIVE PER-LANGUAGE QUALITY THRESHOLD — keep the top 20% of each
    // language by quality score (the FineWeb/CCNet move: a global
    // threshold over-prunes low-resource languages; rank within the
    // stratum instead). Exact selection without a corpus-wide sort, in
    // TWO histogram levels: scores quantize to integers (the score is
    // round(·,4), so ×10^4 is exact) and a per-(lang, score) histogram
    // (map-side combined, bounded by lang × 10001) locates each
    // language's threshold bucket — everything strictly above it passes.
    // Ties AT the threshold are broken by a 16-bit md5 hash of the doc id
    // (unbiased tie selection — ranking tied docs by id would favor old
    // documents), and that hash order enables a SECOND histogram over
    // (lang, h16) to cut the boundary bucket the same way — essential
    // when the score DEGENERATES (a saturating quality function can put
    // 40% of a language at the top score; a doc_id rank over that set
    // would be the corpus-scale single-task window this query exists to
    // avoid). The final row_number touches only the single (lang, score,
    // hash-bucket) slice — expected boundary/2^16. The oracle is the
    // naive corpus-wide rank over the identical (isc DESC, h16, doc_id)
    // order — proving the two-level selection picks the same set.
    "q150_adaptive_quality" -> ((s, dir) => CacheScope.scoped(s) { keep =>
      // persist the scored rows: the selection reads them from FIVE
      // consumers (histogram chain, above/boundary/at-cut branches) and
      // the quality expression re-tokenizes the text on every evaluation —
      // one cached (doc_id, lang, isc, h16) projection ends that
      val base = keep(Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          col("lang"),
          round(TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc"),
          expr("CAST(conv(substr(md5(CAST(concat('aq:', CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10) AS BIGINT)")
            .as("h16")
        )
      )
      val hist = base.groupBy(col("lang"), col("isc")).agg(count(lit(1)).as("c"))
      val quota = hist
        .groupBy(col("lang"))
        .agg(sum(col("c")).as("n"))
        .select(col("lang"), expr("(n + 4) DIV 5").as("k")) // ceil(0.2·n), integer arithmetic
      val wTop = Window.partitionBy(col("lang")).orderBy(col("isc").desc)
      val thr = hist
        .withColumn("cum", sum(col("c")).over(wTop)) // histogram-sized window, not corpus
        .join(quota, Seq("lang"))
        .filter(col("cum") >= col("k"))
        .groupBy(col("lang"))
        .agg(max(struct(col("isc"), col("c"), col("cum"), col("k"))).as("t")) // max isc = boundary bucket
        .select(
          col("lang"),
          col("t.isc").as("thr"),
          (col("t.k") - (col("t.cum") - col("t.c"))).as("need") // quota minus docs strictly above
        )
      val above = base
        .join(broadcast(thr), Seq("lang"))
        .filter(col("isc") > col("thr"))
      val bdocs = base
        .join(broadcast(thr), Seq("lang"))
        .filter(col("isc") === col("thr"))
      // level 2: hash histogram over the boundary bucket (≤ lang × 2^16
      // cells), threshold hash cell, rank only within THAT cell
      val wH = Window.partitionBy(col("lang")).orderBy(col("h16"))
      val thr2 = bdocs
        .groupBy(col("lang"), col("h16")).agg(count(lit(1)).as("c2"))
        .withColumn("cum2", sum(col("c2")).over(wH))
        .join(broadcast(thr.select(col("lang"), col("need"))), Seq("lang"))
        .filter(col("cum2") >= col("need"))
        .groupBy(col("lang"))
        .agg(min(struct(col("h16"), col("c2"), col("cum2"), col("need"))).as("t")) // min h16 = cut cell
        .select(
          col("lang"),
          col("t.h16").as("hcut"),
          (col("t.need") - (col("t.cum2") - col("t.c2"))).as("need2")
        )
      val hashBelow = bdocs
        .join(broadcast(thr2), Seq("lang"))
        .filter(col("h16") < col("hcut"))
      val atCut = bdocs
        .join(broadcast(thr2), Seq("lang"))
        .filter(col("h16") === col("hcut"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
        .filter(col("rn") <= col("need2"))
        .drop("rn")
      Seq(above, hashBelow, atCut)
        .map(_.select(col("lang"), col("doc_id"), round(col("isc") / 10000.0, 4).as("quality")))
        .reduce(_ unionByName _)
        .orderBy(col("lang"), col("doc_id"))
    }),

    // DETERMINISTIC EPOCH SHUFFLE — the data-ordering step of a training
    // run: each epoch is an independent, reproducible global permutation
    // (rank by md5 of epoch‖doc_id), so any worker can recompute any
    // epoch's order from the key alone — no materialized shuffle files,
    // no RNG state, identical across engines/runs/retries. The global
    // position rides `RankOps.globalRowNumber` (range partition +
    // parallel per-partition windows + broadcast offsets), never the
    // single-task empty-partition window; the oracle computes the same
    // rank with the naive window, proving the two-phase form exact.
    "q156_epoch_shuffle" -> ((s, dir) =>
      ShuffleEpochs
        .map { e =>
          val keyed = Tables
            .documents(s, dir)
            .select(
              col("doc_id"),
              md5(concat(lit(s"epoch:$e:"), col("doc_id").cast("string")).cast("binary")).as("k")
            )
          graft.operators.RankOps
            .globalRowNumber(keyed, Seq(col("k"), col("doc_id")), "pos")
            .select(lit(e.toLong).as("epoch"), col("doc_id"), col("pos"))
        }
        .reduce(_ unionByName _)
        .orderBy(col("epoch"), col("doc_id"))),

    // TOKEN-BUDGET MIXTURE FILL — allocation by TOKENS, not documents
    // (the unit a pretraining mixture is actually specified in): each
    // source gets an equal share of a global token budget (half the
    // corpus average per source, computed from the data so the cut is
    // exercised at every SF) and fills it greedily best-quality-first;
    // the first document that would overflow the share ends the source's
    // intake (prefix rule — the running sum is monotone). Per-source
    // window prefix sums (the q121 per-source shape); budgets derive
    // from one 1-row broadcast aggregate; integer token arithmetic
    // throughout.
    "q157_token_budget_mix" -> ((s, dir) => {
      val docs = Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          col("source"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          round(TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc")
        )
      val budget = docs
        .agg(sum(col("n_tokens")).as("st"), countDistinct(col("source")).as("ns"))
        .select(expr("st DIV (ns * 2)").as("src_budget")) // integer division — same truncation both engines
      val w = Window.partitionBy(col("source")).orderBy(col("isc").desc, col("doc_id"))
      docs
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .crossJoin(broadcast(budget))
        .filter(col("cum") <= col("src_budget"))
        .select(col("source"), col("doc_id"), col("n_tokens"), col("cum"),
          round(col("isc") / 10000.0, 4).as("quality"))
        .orderBy(col("source"), col("doc_id"))
    }),

    // LENGTH-BUCKETED INFERENCE BATCHING — the static-batching manifest a
    // GPU inference run wants: documents bucket by padded length (next
    // power of two ≥ token count — computed by INTEGER bit-length
    // arithmetic, `shiftleft(1, length(bin(n-1)))`, never a float log2
    // whose ulps could flip a boundary), and each bucket packs
    // fixed-capacity batches of ⌊MaxBatchTokens/bucket⌋ equal-cost slots
    // (docs longer than the budget get singleton batches). Per doc: its
    // bucket, batch index and slot — a pure function of the per-bucket
    // rank, so any worker materializes any batch independently. Windows
    // are per-bucket (parallel strata, log₂-many of them).
    "q168_length_batching" -> ((s, dir) => {
      val docs = Tables
        .documents(s, dir)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .filter(col("n_tokens") > 0)
      docs
        .withColumn(
          "bucket",
          when(col("n_tokens") <= 1, lit(1L))
            .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1)))")))
        .withColumn(
          "k",
          (row_number().over(Window.partitionBy(col("bucket")).orderBy(col("doc_id"))) - 1).cast("long"))
        .withColumn("slots", greatest(lit(1L), expr(s"$MaxBatchTokens DIV bucket")))
        .select(col("bucket"), col("doc_id"), col("n_tokens"),
          expr("k DIV slots").as("batch"), (col("k") % col("slots")).as("slot"))
        .orderBy(col("bucket"), col("batch"), col("slot"))
    }),

    // EXACT ROC-AUC PER SOURCE — the eval primitive behind every "does
    // this scorer separate good from bad" question a curation pipeline
    // asks (here: does the quality score separate English from
    // non-English per source, the proxy-label audit run before a scorer
    // gates real data). Mann-Whitney rank form, computed ENTIRELY from
    // the per-(source, score) histogram: with cum_lt docs below a score
    // bucket and c in it, each of its cp positives has doubled average
    // rank 2·cum_lt + c + 1 (2× keeps tie-averaged ranks integer), so
    // AUC = (Σ cp·(2·cum_lt+c+1) − n⁺(n⁺+1)) / (2·n⁺·n⁻) — exact
    // integers until one final IEEE division. The corpus is never
    // windowed: scores quantize to 10^4 ints (q150), the histogram is
    // map-side combined and bounded by source × 10001 cells, and the
    // cumulative window touches only the histogram.
    "q161_auc_quality" -> ((s, dir) => {
      val base = Tables
        .documents(s, dir)
        .select(
          col("source"),
          round(TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc"),
          (col("lang") === "en").cast("long").as("y")
        )
      val hist = base
        .groupBy(col("source"), col("isc"))
        .agg(count(lit(1)).as("c"), sum(col("y")).as("cp"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("isc"))
      hist
        .withColumn("cum_le", sum(col("c")).over(wCum)) // histogram-sized window
        .withColumn("s2c", col("cp") * (lit(2) * (col("cum_le") - col("c")) + col("c") + lit(1)))
        .groupBy(col("source"))
        .agg(sum(col("cp")).as("n_pos"), sum(col("c") - col("cp")).as("n_neg"), sum(col("s2c")).as("s2"))
        .filter(col("n_pos") > 0 && col("n_neg") > 0)
        .select(
          col("source"),
          col("n_pos"),
          col("n_neg"),
          round(
            (col("s2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
              (lit(2.0) * col("n_pos") * col("n_neg")),
            6
          ).as("auc")
        )
        .orderBy(col("source"))
    }),

    // CURRICULUM INTERLEAVE (stride scheduling) — the deterministic
    // data-ORDERING step a mixture-weighted training run wants: each
    // language emits its documents best-quality-first, and languages
    // interleave proportionally to mixture weight via stride scheduling
    // (Waldspurger's lottery-stride algorithm): the k-th doc of a
    // weight-w language runs at virtual time (2k−1)/w, so over any
    // window of the schedule each language holds ≈ its weight share —
    // no RNG, no materialized shuffle, any worker recomputes any slice
    // from the key alone. Virtual times stay EXACT integers by scaling
    // with L/w (L = lcm of the weight table): vt = (2k−1)·(L/w). The
    // per-language rank is a parallel per-stratum window; the global
    // position rides `RankOps.globalRowNumber` (range partition + offset
    // broadcast), never a single-task window.
    "q164_curriculum_interleave" -> ((s, dir) => {
      val stride = coalesce(
        element_at(
          map(StrideByLang.flatMap { case (l, st) => Seq(lit(l), lit(st)) }: _*),
          col("lang")),
        lit(StrideDefault))
      val ranked = Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          col("lang"),
          round(TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc")
        )
        .withColumn(
          "k",
          row_number().over(Window.partitionBy(col("lang")).orderBy(col("isc").desc, col("doc_id"))))
        // 2k−1 in 64-bit from the start: row_number() is IntegerType, and a
        // 32-bit 2*k would wrap for a ≥2^30-document language
        .withColumn("vt", (lit(2L) * col("k").cast("long") - 1L) * stride)
      graft.operators.RankOps
        .globalRowNumber(ranked, Seq(col("vt"), col("lang"), col("doc_id")), "pos")
        .select(col("pos"), col("lang"), col("doc_id"), col("vt"))
        .orderBy(col("pos"))
    }),

    // BATCH PERCEPTRON QUALITY/LANGUAGE CLASSIFIER — a linear classifier
    // TRAINED on-corpus with zero transcendentals: hashed bag-of-words
    // features (md5 buckets, the q149 fold) with integer counts, labels
    // y = ±1 (en vs rest), and the batch perceptron update
    // w ← w + Σ_misclassified y·x — an order-independent INTEGER sum, so
    // unlike logistic regression (whose sigmoid would drag libm exp()
    // ulps into the weights) every round is bit-exact on any engine.
    // Three unrolled rounds (the q151 BPE shape: fixed iteration count,
    // no driver convergence loop); sign(0) counts as misclassified, so
    // round 1 (w = 0) trains on every document. Output: per-round
    // misclassified count and the post-update |w| mass — any drift in
    // stats, margins, or updates in any round shifts all later rounds.
    //
    // Scale shape per round: the feature table builds ONCE as one row per
    // document carrying its ≤ B+1 (bucket, count) pairs (the q51
    // dimension-bounded collect_list — B is a constant, never corpus-
    // sized), persisted; the weight vector broadcasts as ONE map row, so
    // the margin pass is a NARROW map over cached doc rows — zero corpus
    // shuffle per round. Only the misclassified docs explode back to
    // (bucket, count) pairs for the update aggregate, and the weight join
    // is B+1 rows. Per round the exchanges carry miss-features and
    // buckets, never the corpus.
    "q160_perceptron_lid" -> ((s, dir) => CacheScope.scoped(s) { keep =>
      val docs = Tables
        .documents(s, dir)
        .select(
          col("doc_id"),
          when(col("lang") === "en", lit(1L)).otherwise(lit(-1L)).as("y"),
          TextFunctions.tokens(lower(col("text"))).as("ws"))
      val featRows = Tables
        .spread(docs, col("doc_id"))
        .select(col("doc_id"), col("y"), explode(col("ws")).as("t"))
        .withColumn(
          "b",
          expr(s"CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % $PerceptronBuckets"))
        .groupBy(col("doc_id"), col("y"), col("b"))
        .agg(count(lit(1)).as("x"))
        .unionByName(docs.select(col("doc_id"), col("y"),
          lit(PerceptronBuckets.toLong).as("b"), lit(1L).as("x"))) // bias feature
      val docFeat = keep(featRows
        .groupBy(col("doc_id"), col("y"))
        .agg(array_sort(collect_list(struct(col("b"), col("x")))).as("fs")) // ≤ B+1 entries
      ) // feeds every round's margin pass and update pass
      var w = docFeat
        .select(explode(expr("transform(fs, f -> f.b)")).as("b"))
        .distinct()
        .withColumn("w", lit(0L))
      val stats = (1 to PerceptronRounds).map { r =>
        val wm = w.agg(map_from_entries(collect_list(struct(col("b"), col("w")))).as("wm")) // 1 row
        val miss = docFeat
          .crossJoin(broadcast(wm))
          .withColumn(
            "m",
            aggregate(col("fs"), lit(0L),
              (acc, f) => acc + f.getField("x") * element_at(col("wm"), f.getField("b"))))
          .filter(col("y") * col("m") <= 0)
          .select(col("doc_id"), col("y"), col("fs"))
        // ONE margin pass per round (r17): delta carries a per-bucket row
        // count alongside the update sum, and n_miss is read off the BIAS
        // bucket's count — every doc's fs holds exactly one bias entry
        // (b = PerceptronBuckets, outside the 0..B-1 hash range), so its
        // row count in the explode IS the misclassified-doc count. The
        // unpinned form ran the margin filter twice per round (once for
        // the update aggregate, once for the stats count) — 2R passes over
        // the corpus-sized cached features instead of R.
        val delta = keep(miss
          .select(col("y"), explode(col("fs")).as("f"))
          .groupBy(col("f.b").as("b"))
          .agg(sum(col("y") * col("f.x")).as("dw"), count(lit(1)).as("nb"))
        ) // ≤ B+2 rows — feeds the w update AND the stats row
        // w feeds the next round's map, the update join, and the stats
        // mass — persist the ≤ B+1 rows so round r's margin pass computes
        // once, not once per downstream consumer (the unpinned DAG
        // re-derived every earlier round per stats row — O(R²) passes)
        w = keep(w
          .join(delta.select(col("b"), col("dw")), Seq("b"), "left")
          .select(col("b"), (col("w") + coalesce(col("dw"), lit(0L))).as("w"))
        )
        delta
          .filter(col("b") === lit(PerceptronBuckets.toLong))
          .agg(coalesce(sum(col("nb")), lit(0L)).as("n_miss")) // 0 misses → empty delta → still one row
          .crossJoin(w.agg(sum(abs(col("w"))).as("w_abs_sum")))
          .select(lit(r.toLong).as("round"), col("n_miss"), col("w_abs_sum"))
      }
      stats.reduce(_ unionByName _).orderBy(col("round"))
    }),

    // EXACT DISTRIBUTED QUANTILES — per-language p50/p90/p99 of document
    // length with NO global sort of the corpus: quantile thresholds are
    // the backbone of curation gates (length cutoffs, token budgets), and
    // at 100 TB a sort-based exact percentile is a non-starter. The
    // classic value-frequency rewrite: one hash aggregate collapses the
    // corpus to its (lang, value) frequency table — bounded by the VALUE
    // DOMAIN (≤ max document length), not the row count — then a per-lang
    // running sum over those distinct values reads each quantile off the
    // CDF. quantile_disc semantics: the smallest v whose cumulative count
    // c reaches ceil(q·n/100), tested in pure integers as 100·c ≥ q·n (no
    // ceil, no floats — the result can't flip on ulps on any engine). The
    // only sort anywhere runs per-lang over ≤|domain| frequency rows — at
    // 1000 executors the corpus scan parallelizes fully and the window
    // input is a few thousand rows per language.
    "q209_exact_quantiles" -> ((s, dir) => {
      val freq = Tables.documents(s, dir)
        .groupBy(col("lang"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("f"))
      val byLang = Window.partitionBy(col("lang"))
      val cum = freq
        .withColumn("c", sum(col("f")).over(byLang.orderBy(col("v"))))
        .withColumn("n", sum(col("f")).over(byLang))
      def q(p: Int) = min(when(col("c") * 100 >= col("n") * p, col("v"))).as(s"p$p")
      cum.groupBy(col("lang")).agg(q(50), q(90), q(99)).orderBy(col("lang"))
    }),

    // DISTRIBUTION DRIFT — two-sample Kolmogorov–Smirnov distance between
    // every pair of sources over the document-length distribution: the
    // "did this crawl's shape move" monitor a recurring ingestion pipeline
    // runs before mixing a new snapshot in. Exact ECDFs come from the same
    // value-frequency rewrite as q209 (one aggregate over the corpus, then
    // a per-source running sum over the distinct-value grid so every
    // source's CDF is defined at every observed value); the KS statistic
    // is the max absolute ECDF gap. Fractions are quantized to a 2^20
    // integer grid by floor division (⌊c·2^20/n⌋ — identical integers on
    // any engine, error ≤ 2·2^-20, and c·2^20 holds to ~8.8e12 rows per
    // source before BIGINT overflow: trillion-row sources fit). Join
    // volume is |values|·|sources|² — domain-bounded, never corpus-bounded.
    "q210_ks_drift" -> ((s, dir) => graft.plans.CacheScope.scoped(s) { keep =>
      // freq feeds the two grid distincts AND the left join. Measured r15:
      // persisting it COSTS more than it saves (0.46 → 1.04 s at sf0.1 —
      // the cache materialization is pure overhead when Spark's exchange
      // reuse already dedupes the corpus aggregate), so the build-once
      // guarantee is enforced by the PlanQualitySpec ReusedExchange gate
      // instead of a keep().
      val freq = Tables.documents(s, dir)
        .groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("f"))
      val grid = freq.select(col("v")).distinct()
        .crossJoin(freq.select(col("source")).distinct())
      val bySrc = Window.partitionBy(col("source"))
      // ecdf feeds BOTH sides of the pair join — build once
      val ecdf = keep(grid
        .join(freq, Seq("source", "v"), "left")
        .withColumn("fz", coalesce(col("f"), lit(0L)))
        .withColumn("c", sum(col("fz")).over(bySrc.orderBy(col("v"))))
        .withColumn("n", sum(col("fz")).over(bySrc))
        .select(col("source"), col("v"), expr("c * 1048576 div n").as("q")))
      ecdf.select(col("v"), col("source").as("source_a"), col("q").as("fa"))
        .join(ecdf.select(col("v"), col("source").as("source_b"), col("q").as("fb")), Seq("v"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(max(abs(col("fa") - col("fb"))).as("ks_q20"))
        .orderBy(col("source_a"), col("source_b"))
    }),

    // CATEGORICAL DRIFT — Population Stability Index per source against
    // the pooled corpus over the `lang` category distribution: the third
    // axis of the distribution-monitor family (q210 watches numeric SHAPE
    // via KS, q158/q171 the vocabulary via KL — this watches the
    // categorical mix an ingestion pipeline alarms on before blending a
    // snapshot). PSI = Σ_cat (p_src − p_corpus)·ln(p_src/p_corpus) with
    // add-one smoothing over the corpus category domain, every category of
    // the (source × lang) grid contributing — including zero-count cells,
    // whose smoothed mass is exactly where departure shows. Portability
    // AND overflow discipline: both proportions are quantized FIRST onto
    // the 2^20 integer grid (⌊(c+1)·2^20/(n+K)⌋, clamped to ≥1 so a
    // vanishing cell stays on the grid), the log-ratio is floored ONCE at
    // 2^20 (the q158 treatment — but over exact small-integer ratios, so
    // libm sees the identical double on any engine), and the sum is a pure
    // integer Σ(psq−pcq)·lr with BOTH factors grid-bounded (|Δp| ≤ 2^20,
    // |lr| ≤ ln(2^20)·2^20 < 2^24): per-cell products stay under 2^44
    // REGARDLESS of corpus row count — safe at any scale, a strictly
    // better bound than q158's count-weighted summands. One display
    // division by 2^40. 100 TB shape: ONE map-side-combined hash aggregate
    // collapses the corpus to the (source, lang) frequency table; all else
    // is category-domain-bounded with no window anywhere.
    "q212_psi_drift" -> ((s, dir) => graft.plans.CacheScope.scoped(s) { keep =>
      // freq feeds the source totals, the category totals, and the grid
      // join — persist the domain-bounded table (the q210 convention)
      val freq = keep(Tables.documents(s, dir)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c")))
      val ct = freq.groupBy(col("lang")).agg(sum(col("c")).as("ct"))
      val ts = freq.groupBy(col("source")).agg(sum(col("c")).as("ts"))
      val tk = ct.agg(sum(col("ct")).as("t"), count(lit(1)).as("k")) // 1 row
      ts.select(col("source"), col("ts"))
        .crossJoin(broadcast(ct.select(col("lang"), col("ct"))))
        .join(broadcast(freq), Seq("source", "lang"), "left")
        .na.fill(0L, Seq("c"))
        .crossJoin(broadcast(tk))
        .select(
          col("source"),
          col("ts"),
          expr("greatest((c + 1) * 1048576 div (ts + k), 1)").as("psq"),
          expr("greatest((ct + 1) * 1048576 div (t + k), 1)").as("pcq"))
        .withColumn(
          "term",
          (col("psq") - col("pcq")) *
            floor(log(col("psq").cast("double") / col("pcq")) * lit(1048576.0)).cast("long"))
        .groupBy(col("source"))
        .agg(
          min(col("ts")).as("n_docs"),
          round(sum(col("term")).cast("double") / lit(1099511627776.0), 6).as("psi"))
        .orderBy(col("source"))
    }),

    // ASSOCIATION / COLLECTION-BIAS REPORT — plug-in mutual information
    // between categorical axis pairs of the corpus: MI(lang, source)
    // answers "is language correlated with where we crawled?", and the
    // two MI(·, length-magnitude) rows answer "does document size depend
    // on source/language?" — the dependence audit a mixture designer runs
    // before treating axes as independent knobs. Categorical axes are the
    // lang/source columns plus an EXACT integer size bucket (the decimal
    // digit count of n_chars — order-of-magnitude, no float log at a
    // bucket boundary on either engine). One corpus scan melts the three
    // (pair, x, y) views via explode; one map-side-combined aggregate
    // collapses to the per-pair contingency table (domain-bounded); the
    // marginals and the MI reduction run on those cells only. Quantized
    // with the q212 discipline, quantize-FIRST so every product is
    // grid-bounded: a = ⌊c·2^20/n⌋ (joint), b = ⌊cx·2^20/n⌋·⌊cy·2^20/n⌋
    // (product of marginals, ≤ 2^40 — exact as a double), each clamped
    // ≥ 1, per-cell log-ratio ln(a·2^20/b) floored once at 2^20, pure
    // integer Σ a·lr over OBSERVED cells (the 0·ln0 = 0 convention),
    // one display division by 2^40. |a| ≤ 2^20 and |lr| < 2^25, so the
    // sum is BIGINT-safe at ANY corpus size. The contingency table feeds
    // four consumers needing DIFFERENT partitionings ((pair,x), (pair,y),
    // (pair), the cell join), so AQE stage reuse CANNOT dedupe the corpus
    // scan here (measured: nine single-use stages) — unlike q210 this is
    // the case keep() exists for: the cached table is a few hundred rows
    // while each avoided consumer re-runs a full corpus scan + 3× explode.
    // At the shipped corpora the two forms are within window noise of each
    // other (sf0.1: 0.64 no-keep vs ~1.1 keep window-adjusted; 100×: 2.00
    // vs ~1.1 window-adjusted — the pruned scan is simply cheap at these
    // sizes); the keep is kept for the 100 TB shape, where 4 corpus scans
    // lose to a KB-sized cache by construction. Plan-gated.
    "q215_mi_association" -> ((s, dir) => graft.plans.CacheScope.scoped(s) { keep =>
      val lenMag = length(col("n_chars").cast("string")).cast("string")
      val cells = keep(Tables.documents(s, dir)
        .select(explode(array(
          struct(lit("lang_lenmag").as("pair"), col("lang").as("x"), lenMag.as("y")),
          struct(lit("lang_source").as("pair"), col("lang").as("x"), col("source").as("y")),
          struct(lit("source_lenmag").as("pair"), col("source").as("x"), lenMag.as("y"))
        )).as("t"))
        .select(col("t.pair").as("pair"), col("t.x").as("x"), col("t.y").as("y"))
        .groupBy(col("pair"), col("x"), col("y"))
        .agg(count(lit(1)).as("c")))
      val cx = cells.groupBy(col("pair"), col("x")).agg(sum(col("c")).as("cx"))
      val cy = cells.groupBy(col("pair"), col("y")).agg(sum(col("c")).as("cy"))
      val nn = cells.groupBy(col("pair")).agg(sum(col("c")).as("n"))
      cells
        .join(broadcast(cx), Seq("pair", "x"))
        .join(broadcast(cy), Seq("pair", "y"))
        .join(broadcast(nn), Seq("pair"))
        .select(
          col("pair"),
          expr("greatest(c * 1048576 div n, 1)").as("a"),
          (expr("greatest(cx * 1048576 div n, 1)") *
            expr("greatest(cy * 1048576 div n, 1)")).as("b"))
        .withColumn(
          "term",
          col("a") *
            floor(log(col("a") * lit(1048576.0) / col("b")) * lit(1048576.0)).cast("long"))
        .groupBy(col("pair"))
        .agg(
          count(lit(1)).as("n_cells"),
          round(sum(col("term")).cast("double") / lit(1099511627776.0), 6).as("mi"))
        .orderBy(col("pair"))
    })
  )

  private val ShuffleEpochs = Seq(1, 2) // q156: reproducible training epochs

  private val PackSeqLen = 128L // q148: tokens per packed training block

  /** The DuckDB twin of [[TextFunctions.qualityScore]] — the shared
    * canonical definition ([[OracleSql.quality]]), so the formula cannot
    * drift between this registry's oracles (q62/q66/q121/q125/...) and the
    * Dedup/Text consumers of the same score.
    */
  private val qualitySql: String = OracleSql.quality

  /** One profile row in DuckDB for `expr` labeled `name` — the q132 twin
    * of a [[graft.operators.ProfileOps.profile]] column.
    */
  private def profileColSql(name: String, expr: String): String =
    s"""SELECT '$name' AS column_name, count(*)::BIGINT AS n_rows,
       |  (count(*) - count(v))::BIGINT AS n_null,
       |  count(DISTINCT v)::BIGINT AS n_distinct,
       |  min(v) AS min_v, max(v) AS max_v,
       |  coalesce(CAST(sum(length(v)) AS BIGINT), 0) AS total_len
       |FROM (SELECT CAST($expr AS VARCHAR) AS v FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    // Identical canonical serialization, 60-bit md5 fold, and commutative
    // mod-sum — three numbers per table, same on any engine.
    "q141_table_checksum" -> {
      val h60 =
        "list_reduce(list_transform(range(1, 16), i -> (strpos('0123456789abcdef', substr(md5(c), i::INT, 1)) - 1)::BIGINT), (a, x) -> a * 16 + x)"
      // each field coalesces to the Spark side's sentinel so NULL-bearing
      // rows are covered identically by both serializations (|| would
      // otherwise NULL the row out of the checksum but not n_rows)
      def nz(x: String) = s"coalesce(CAST($x AS VARCHAR), '␀')"
      raw"""WITH co AS (
           |  SELECT ${nz("o_orderkey")} || '|' || ${nz("o_custkey")} || '|' ||
           |         ${nz("o_orderstatus")} || '|' || ${nz("CAST(round(o_totalprice * 100) AS BIGINT)")} || '|' ||
           |         ${nz("o_orderdate::DATE")} || '|' || ${nz("o_orderpriority")} AS c
           |  FROM orders),
           | cl AS (
           |  SELECT ${nz("l_orderkey")} || '|' || ${nz("l_linenumber")} || '|' ||
           |         ${nz("l_partkey")} || '|' || ${nz("l_suppkey")} || '|' ||
           |         ${nz("CAST(round(l_quantity * 100) AS BIGINT)")} || '|' ||
           |         ${nz("CAST(round(l_extendedprice * 100) AS BIGINT)")} || '|' ||
           |         ${nz("l_returnflag")} || '|' || ${nz("l_shipdate::DATE")} AS c
           |  FROM lineitem),
           | cd AS (
           |  SELECT ${nz("doc_id")} || '|' || ${nz("lang")} || '|' || ${nz("source")} || '|' ||
           |         ${nz("n_chars")} || '|' || ${nz("md5(text)")} AS c
           |  FROM documents)
           |SELECT 'documents' AS table_name, count(*)::BIGINT AS n_rows,
           |  CAST(sum($h60 % 2147483647) % 2147483647 AS BIGINT) AS checksum FROM cd
           |UNION ALL
           |SELECT 'lineitem', count(*)::BIGINT, CAST(sum($h60 % 2147483647) % 2147483647 AS BIGINT) FROM cl
           |UNION ALL
           |SELECT 'orders', count(*)::BIGINT, CAST(sum($h60 % 2147483647) % 2147483647 AS BIGINT) FROM co
           |ORDER BY table_name""".stripMargin
    },
    // Identical bottom-K-by-md5 sample and integer rank picks, joined wide.
    "q133_quantile_sketch" -> {
      def pickSql(src: String, num: Int, den: Int, as: String): String =
        s""" $as AS (
           |  SELECT event_type, round(min(value), 4) AS $as, min(n)::BIGINT AS n_$as
           |  FROM $src WHERE sr = ($num * n + $den - 1) // $den GROUP BY 1)""".stripMargin
      s"""WITH ev AS (
         |  SELECT event_type, value, md5(CAST(event_id AS VARCHAR)) AS h FROM events),
         | samp AS (
         |  SELECT event_type, value, h FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM ev)
         |  WHERE rn <= 64),
         | sr AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, h) AS sr,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM samp),
         | fr AS (
         |  SELECT event_type, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, h) AS sr,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM ev),
         |${pickSql("sr", 1, 2, "est_p50")},
         |${pickSql("sr", 9, 10, "est_p90")},
         |${pickSql("sr", 99, 100, "est_p99")},
         |${pickSql("fr", 1, 2, "ex_p50")},
         |${pickSql("fr", 9, 10, "ex_p90")},
         |${pickSql("fr", 99, 100, "ex_p99")}
         |SELECT event_type, n_ex_p50 AS n, n_est_p50 AS n_samp,
         |  est_p50, est_p90, est_p99, ex_p50, ex_p90, ex_p99
         |FROM est_p50 JOIN est_p90 USING (event_type) JOIN est_p99 USING (event_type)
         |  JOIN ex_p50 USING (event_type) JOIN ex_p90 USING (event_type)
         |  JOIN ex_p99 USING (event_type)
         |ORDER BY event_type""".stripMargin
    },
    "q132_profile" ->
      (Seq(
        "doc_id"      -> "doc_id",
        "lang"        -> "lang",
        "source"      -> "source",
        "n_chars"     -> "n_chars",
        "lang_non_en" -> "nullif(lang, 'en')"
      ).map { case (n, e) => profileColSql(n, e) }
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")),
    "q62_crossmodal_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id, $qualitySql AS q
         |  FROM documents)
         |SELECT label, count(*) AS n, round(avg(q.q), 4) AS avg_quality
         |FROM embeddings JOIN q ON vec_id = doc_id
         |GROUP BY label ORDER BY label""".stripMargin,
    "q36_percentiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q63_stratified_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang, md5('ss:' || lang || ':' || doc_id::VARCHAR) AS h FROM documents)
        |SELECT doc_id, lang FROM h
        |WHERE (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)
        |    < CASE WHEN lang = 'en' THEN 6554 ELSE 19661 END
        |ORDER BY doc_id""".stripMargin,
    "q64_hash_sample" ->
      """WITH h AS (
        |  SELECT vec_id, label, md5(label::VARCHAR || ':' || vec_id::VARCHAR) AS h FROM embeddings)
        |SELECT vec_id, label FROM h
        |WHERE (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) < 13107
        |ORDER BY vec_id""".stripMargin,
    "q69_mixture_weights" ->
      """WITH s AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        | t AS (SELECT sum(n_docs) AS n_total, count(*) AS n_sources FROM s)
        |SELECT source, n_docs,
        |  round(least(1.0, CAST(n_total AS DOUBLE) / CAST(n_sources * n_docs AS DOUBLE)), 6) AS weight,
        |  round(n_docs * round(least(1.0, CAST(n_total AS DOUBLE) / CAST(n_sources * n_docs AS DOUBLE)), 6), 2) AS expected_n
        |FROM s, t ORDER BY source""".stripMargin,
    "q125_global_rank" ->
      s"""WITH q AS (
         |  SELECT doc_id, $qualitySql AS quality
         |  FROM documents)
         |SELECT doc_id, quality,
         |  row_number() OVER (ORDER BY quality DESC, doc_id) AS rank
         |FROM q ORDER BY rank""".stripMargin,
    "q121_source_cap" ->
      s"""WITH q AS (
         |  SELECT doc_id, source, $qualitySql AS quality
         |  FROM documents)
         |SELECT source, doc_id, quality, rnk FROM (
         |  SELECT source, doc_id, quality,
         |    row_number() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rnk
         |  FROM q)
         |WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    // Identical α = 1/2 mixture chain: IEEE-correctly-rounded sqrt → 2^20
    // floor quantization, Hamilton allocation in BIGINT `//`/`%` with the
    // remainder-DESC/lang tie-break, md5-rank quota fill.
    "q190_temperature_mix" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS n FROM documents WHERE lang IS NOT NULL GROUP BY lang),
         | w AS (
         |  SELECT lang, n,
         |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT) AS wq
         |  FROM c),
         | t AS (SELECT sum(wq) AS tw FROM w),
         | a AS (
         |  SELECT lang, n, ($MixBudget * wq) // tw AS base, ($MixBudget * wq) % tw AS rem
         |  FROM w CROSS JOIN t),
         | e AS (SELECT $MixBudget - sum(base) AS extra FROM a),
         | r AS (
         |  SELECT lang,
         |    base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang) <= extra
         |                THEN 1 ELSE 0 END AS alloc
         |  FROM a CROSS JOIN e),
         | s AS (
         |  SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         |  FROM documents WHERE lang IS NOT NULL)
         |SELECT s.lang, CAST(s.rk AS BIGINT) AS rk, s.doc_id, CAST(r.alloc AS BIGINT) AS alloc
         |FROM s JOIN r USING (lang) WHERE s.rk <= r.alloc
         |ORDER BY lang, rk""".stripMargin,

    "q66_weighted_sample" ->
      s"""WITH q AS (
         |  SELECT doc_id, lang, source, $qualitySql AS quality,
         |    md5('ws:' || doc_id::VARCHAR) AS h
         |  FROM documents)
           |SELECT doc_id, lang, source, quality FROM q
           |WHERE (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
           |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
           |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
           |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) < quality * 32768
           |ORDER BY doc_id""".stripMargin,
    // The same concat-and-chunk placement, cumulated with the NAIVE
    // single-task window — proving the two-phase globalRunningSums exact.
    "q148_seq_packing" ->
      raw"""WITH d AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tokens FROM documents),
           | f AS (SELECT * FROM d WHERE n_tokens > 0),
           | c AS (SELECT doc_id, n_tokens, CAST(sum(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM f)
           |SELECT doc_id, n_tokens, (cum - n_tokens) AS start_off,
           |  (cum - n_tokens) // $PackSeqLen AS first_blk,
           |  (cum - 1) // $PackSeqLen AS last_blk,
           |  ((cum - 1) // $PackSeqLen - (cum - n_tokens) // $PackSeqLen + 1) AS n_blocks
           |FROM c ORDER BY doc_id""".stripMargin,
    // The naive corpus-wide rank the two-level histogram selection must
    // reproduce: top ceil(n/5) per language by (quantized score DESC,
    // 16-bit md5 hash of the doc id, doc_id) — the identical tie order.
    "q150_adaptive_quality" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, CAST(round(($qualitySql) * 10000) AS BIGINT) AS isc,
         |    (strpos('0123456789abcdef', substr(md5('aq:' || doc_id::VARCHAR), 1, 1)) - 1) * 4096
         |    + (strpos('0123456789abcdef', substr(md5('aq:' || doc_id::VARCHAR), 2, 1)) - 1) * 256
         |    + (strpos('0123456789abcdef', substr(md5('aq:' || doc_id::VARCHAR), 3, 1)) - 1) * 16
         |    + (strpos('0123456789abcdef', substr(md5('aq:' || doc_id::VARCHAR), 4, 1)) - 1) AS h16
         |  FROM documents),
         | n AS (SELECT lang, (count(*) + 4) // 5 AS k FROM d GROUP BY 1),
         | r AS (SELECT d.*, row_number() OVER (PARTITION BY lang ORDER BY isc DESC, h16, doc_id) AS rn FROM d)
         |SELECT lang, doc_id, round(isc / 10000.0, 4) AS quality
         |FROM r JOIN n USING (lang) WHERE rn <= k ORDER BY lang, doc_id""".stripMargin,
    // The same md5-keyed permutations ranked with the naive window.
    "q156_epoch_shuffle" ->
      raw"""WITH e AS (SELECT 1::BIGINT AS epoch UNION ALL SELECT 2),
           | k AS (SELECT epoch, doc_id,
           |         md5('epoch:' || epoch::VARCHAR || ':' || doc_id::VARCHAR) AS k
           |       FROM documents CROSS JOIN e)
           |SELECT epoch, doc_id,
           |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) AS BIGINT) AS pos
           |FROM k ORDER BY epoch, doc_id""".stripMargin,
    // Same greedy budget fill: equal integer token share per source
    // (truncating division both engines), best-quality-first prefix.
    "q157_token_budget_mix" ->
      s"""WITH d AS (SELECT doc_id, source, len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tokens,
         |             CAST(round(($qualitySql) * 10000) AS BIGINT) AS isc FROM documents),
         | b AS (SELECT CAST(sum(n_tokens) AS BIGINT) // (count(DISTINCT source) * 2) AS src_budget FROM d),
         | c AS (SELECT d.*, CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY isc DESC, doc_id) AS BIGINT) AS cum FROM d)
         |SELECT source, doc_id, n_tokens, cum, round(isc / 10000.0, 4) AS quality
         |FROM c CROSS JOIN b WHERE cum <= src_budget ORDER BY source, doc_id""".stripMargin,

    // The same bit-length bucketing and per-bucket slot arithmetic.
    "q168_length_batching" ->
      raw"""WITH d AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tokens
           |           FROM documents),
           | b AS (SELECT doc_id, n_tokens,
           |         CASE WHEN n_tokens <= 1 THEN 1::BIGINT
           |              ELSE (1::BIGINT << strlen(bin(n_tokens - 1))) END AS bucket
           |       FROM d WHERE n_tokens > 0),
           | k AS (SELECT *, CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1 AS BIGINT) AS k,
           |         greatest(1::BIGINT, 512 // bucket) AS slots FROM b)
           |SELECT bucket, doc_id, n_tokens, k // slots AS batch, k % slots AS slot
           |FROM k ORDER BY bucket, batch, slot""".stripMargin,

    // The identical histogram-form Mann-Whitney statistic: doubled
    // tie-averaged ranks keep everything integer until the final division.
    "q161_auc_quality" ->
      s"""WITH d AS (SELECT source, CAST(round(($qualitySql) * 10000) AS BIGINT) AS isc,
         |             (CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS y FROM documents),
         | h AS (SELECT source, isc, count(*)::BIGINT AS c, CAST(sum(y) AS BIGINT) AS cp FROM d GROUP BY 1, 2),
         | cu AS (SELECT *, CAST(sum(c) OVER (PARTITION BY source ORDER BY isc) AS BIGINT) AS cum_le FROM h),
         | a AS (SELECT source, CAST(sum(cp) AS BIGINT) AS n_pos, CAST(sum(c - cp) AS BIGINT) AS n_neg,
         |         CAST(sum(cp * (2 * (cum_le - c) + c + 1)) AS BIGINT) AS s2
         |       FROM cu GROUP BY 1)
         |SELECT source, n_pos, n_neg,
         |  round((s2 - n_pos * (n_pos + 1))::DOUBLE / (2.0 * n_pos * n_neg), 6) AS auc
         |FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY source""".stripMargin,

    // The same stride schedule ranked with the naive global window.
    "q164_curriculum_interleave" ->
      s"""WITH d AS (SELECT doc_id, lang, CAST(round(($qualitySql) * 10000) AS BIGINT) AS isc FROM documents),
         | k AS (SELECT doc_id, lang,
         |         CAST(row_number() OVER (PARTITION BY lang ORDER BY isc DESC, doc_id) AS BIGINT) AS k
         |       FROM d),
         | v AS (SELECT doc_id, lang,
         |         (2 * k - 1) * (CASE ${StrideByLang.map { case (l, st) => s"WHEN lang = '$l' THEN $st" }.mkString(" ")} ELSE $StrideDefault END)::BIGINT AS vt
         |       FROM k)
         |SELECT CAST(row_number() OVER (ORDER BY vt, lang, doc_id) AS BIGINT) AS pos, lang, doc_id, vt
         |FROM v ORDER BY pos""".stripMargin,

    // The same deterministic mutation replayed, the same per-bucket
    // additive summaries, differing buckets via IS DISTINCT FROM.
    "q166_bucket_diff" -> {
      def h16(prefix: String) =
        (1 to 4)
          .map(i =>
            s"(strpos('0123456789abcdef', substr(md5('$prefix' || doc_id::VARCHAR), $i, 1)) - 1)::BIGINT * ${math.pow(16, 4 - i).toLong}")
          .mkString("(", " + ", ")")
      s"""WITH base AS (SELECT doc_id, text, ${h16("del:")} AS hd, ${h16("mut:")} AS hm FROM documents),
         | bsnap AS (SELECT doc_id, CASE WHEN hm < 1311 THEN upper(text) ELSE text END AS text
         |           FROM base WHERE hd >= 1311),
         | da AS (SELECT doc_id % 256 AS bucket,
         |          list_reduce(list_transform(range(1, 16), i -> (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || '|' || md5(text)), i::INT, 1)) - 1)::BIGINT), (a, c) -> a * 16 + c) % 2147483647 AS h
         |        FROM base),
         | db AS (SELECT doc_id % 256 AS bucket,
         |          list_reduce(list_transform(range(1, 16), i -> (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR || '|' || md5(text)), i::INT, 1)) - 1)::BIGINT), (a, c) -> a * 16 + c) % 2147483647 AS h
         |        FROM bsnap),
         | sa AS (SELECT bucket, count(*)::BIGINT AS n_a, CAST(sum(h) % 2147483647 AS BIGINT) AS chk_a FROM da GROUP BY 1),
         | sb AS (SELECT bucket, count(*)::BIGINT AS n_b, CAST(sum(h) % 2147483647 AS BIGINT) AS chk_b FROM db GROUP BY 1)
         |SELECT coalesce(sa.bucket, sb.bucket) AS bucket, n_a, chk_a, n_b, chk_b
         |FROM sa FULL JOIN sb ON sa.bucket = sb.bucket
         |WHERE n_a IS DISTINCT FROM n_b OR chk_a IS DISTINCT FROM chk_b
         |ORDER BY bucket""".stripMargin
    },

    // The identical unrolled batch-perceptron chain — integer feature
    // counts, integer weight updates, sign(0) misclassified.
    "q160_perceptron_lid" ->
      (raw"""WITH dy AS (SELECT doc_id, (CASE WHEN lang = 'en' THEN 1 ELSE -1 END)::BIGINT AS y,
           |              regexp_split_to_array(trim(lower(text)), '\s+') AS ws FROM documents),
           | tk AS (SELECT doc_id, y, unnest(ws) AS t FROM dy),
           | f0 AS (SELECT doc_id, y,
           |          list_reduce(list_transform(range(1, 16), i -> (strpos('0123456789abcdef', substr(md5(t), i::INT, 1)) - 1)::BIGINT), (a, c) -> a * 16 + c) % $PerceptronBuckets AS b,
           |          count(*)::BIGINT AS x
           |        FROM tk GROUP BY 1, 2, 3),
           | feat AS (SELECT * FROM f0
           |          UNION ALL SELECT doc_id, y, $PerceptronBuckets::BIGINT AS b, 1::BIGINT AS x FROM dy),
           | w0 AS (SELECT DISTINCT b, 0::BIGINT AS w FROM feat),
           |""".stripMargin
        + (1 to PerceptronRounds).map(perceptronRoundSql).mkString(",\n") + "\n"
        + (1 to PerceptronRounds).map(r => s"SELECT * FROM s$r").mkString(" UNION ALL ")
        + " ORDER BY round"),

    // Identical value-frequency rewrite: per-lang CDF over distinct
    // lengths, quantile = smallest v with 100·c ≥ p·n (pure-integer
    // quantile_disc — no ceil, no floats).
    "q209_exact_quantiles" ->
      """WITH freq AS (SELECT lang, n_chars AS v, count(*)::BIGINT AS f
        |              FROM documents GROUP BY 1, 2),
        | cum AS (SELECT lang, v,
        |   CAST(sum(f) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS c,
        |   CAST(sum(f) OVER (PARTITION BY lang) AS BIGINT) AS n FROM freq)
        |SELECT lang,
        |  min(CASE WHEN c * 100 >= n * 50 THEN v END) AS p50,
        |  min(CASE WHEN c * 100 >= n * 90 THEN v END) AS p90,
        |  min(CASE WHEN c * 100 >= n * 99 THEN v END) AS p99
        |FROM cum GROUP BY lang ORDER BY lang""".stripMargin,

    // Identical ECDF grid (every source × every observed value), the same
    // ⌊c·2^20/n⌋ quantization, max absolute gap per ordered source pair.
    "q210_ks_drift" ->
      """WITH freq AS (SELECT source, n_chars AS v, count(*)::BIGINT AS f
        |              FROM documents GROUP BY 1, 2),
        | grid AS (SELECT s.source, vv.v
        |          FROM (SELECT DISTINCT source FROM freq) s
        |          CROSS JOIN (SELECT DISTINCT v FROM freq) vv),
        | cum AS (SELECT g.source, g.v,
        |   CAST(sum(coalesce(f.f, 0)) OVER (PARTITION BY g.source ORDER BY g.v) AS BIGINT) AS c,
        |   CAST(sum(coalesce(f.f, 0)) OVER (PARTITION BY g.source) AS BIGINT) AS n
        |   FROM grid g LEFT JOIN freq f ON f.source = g.source AND f.v = g.v),
        | ecdf AS (SELECT source, v, (c * 1048576) // n AS q FROM cum)
        |SELECT a.source AS source_a, b.source AS source_b,
        |  CAST(max(abs(a.q - b.q)) AS BIGINT) AS ks_q20
        |FROM ecdf a JOIN ecdf b ON a.v = b.v AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The identical quantize-first PSI: proportions floored onto the 2^20
    // grid (clamped ≥ 1), per-cell log-ratio floored once at 2^20, pure
    // integer sum, one display division by 2^40.
    "q212_psi_drift" ->
      """WITH freq AS (SELECT source, lang, count(*)::BIGINT AS c
        |              FROM documents GROUP BY 1, 2),
        | ct AS (SELECT lang, sum(c)::BIGINT AS ct FROM freq GROUP BY 1),
        | ts AS (SELECT source, sum(c)::BIGINT AS ts FROM freq GROUP BY 1),
        | tk AS (SELECT sum(ct)::BIGINT AS t, count(*)::BIGINT AS k FROM ct),
        | cells AS (SELECT s.source, s.ts,
        |     greatest(((coalesce(f.c, 0) + 1) * 1048576) // (s.ts + tk.k), 1) AS psq,
        |     greatest(((l.ct + 1) * 1048576) // (tk.t + tk.k), 1) AS pcq
        |   FROM ts s CROSS JOIN ct l
        |   LEFT JOIN freq f ON f.source = s.source AND f.lang = l.lang
        |   CROSS JOIN tk),
        | dim AS (SELECT source, ts,
        |     (psq - pcq) * CAST(floor(ln(psq * 1.0 / pcq) * 1048576.0) AS BIGINT) AS term
        |   FROM cells)
        |SELECT source, min(ts)::BIGINT AS n_docs,
        |  round(sum(term)::DOUBLE / 1099511627776.0, 6) AS psi
        |FROM dim GROUP BY 1 ORDER BY 1""".stripMargin,

    // The identical quantize-first plug-in MI over observed cells: joint
    // and marginal proportions floored onto the 2^20 grid (clamped ≥ 1),
    // per-cell log-ratio floored once at 2^20, integer sum, one display
    // division by 2^40. The size axis is the exact decimal digit count.
    "q215_mi_association" ->
      """WITH m AS (
        |  SELECT 'lang_lenmag' AS pair, lang AS x,
        |    CAST(length(CAST(n_chars AS VARCHAR)) AS VARCHAR) AS y FROM documents
        |  UNION ALL SELECT 'lang_source', lang, source FROM documents
        |  UNION ALL SELECT 'source_lenmag', source,
        |    CAST(length(CAST(n_chars AS VARCHAR)) AS VARCHAR) FROM documents),
        | f AS (SELECT pair, x, y, count(*)::BIGINT AS c FROM m GROUP BY 1, 2, 3),
        | cx AS (SELECT pair, x, sum(c)::BIGINT AS cx FROM f GROUP BY 1, 2),
        | cy AS (SELECT pair, y, sum(c)::BIGINT AS cy FROM f GROUP BY 1, 2),
        | nn AS (SELECT pair, sum(c)::BIGINT AS n FROM f GROUP BY 1),
        | cells AS (SELECT f.pair,
        |     greatest((f.c * 1048576) // nn.n, 1) AS a,
        |     greatest((cx.cx * 1048576) // nn.n, 1)
        |       * greatest((cy.cy * 1048576) // nn.n, 1) AS b
        |   FROM f JOIN cx USING (pair, x) JOIN cy USING (pair, y) JOIN nn USING (pair))
        |SELECT pair, count(*)::BIGINT AS n_cells,
        |  round(sum(a * CAST(floor(ln(a * 1048576.0 / b) * 1048576.0) AS BIGINT))::DOUBLE
        |    / 1099511627776.0, 6) AS mi
        |FROM cells GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** One unrolled batch-perceptron round for q160's oracle: margins under
    * the incoming weights `w{r-1}`, misclassified set, integer update,
    * post-update stats row `s$r`.
    */
  private def perceptronRoundSql(r: Int): String = {
    val (win, wout) = (s"w${r - 1}", s"w$r")
    s""" m$r AS (SELECT f.doc_id, f.y, CAST(sum(f.x * w.w) AS BIGINT) AS m
       |   FROM feat f JOIN $win w USING (b) GROUP BY 1, 2),
       | x$r AS (SELECT doc_id FROM m$r WHERE y * m <= 0),
       | d$r AS (SELECT f.b, CAST(sum(f.y * f.x) AS BIGINT) AS dw
       |   FROM feat f JOIN x$r USING (doc_id) GROUP BY 1),
       | $wout AS (SELECT p.b, p.w + coalesce(d.dw, 0) AS w FROM $win p LEFT JOIN d$r d USING (b)),
       | s$r AS (SELECT $r::BIGINT AS round, (SELECT count(*) FROM x$r)::BIGINT AS n_miss,
       |   (SELECT CAST(sum(abs(w)) AS BIGINT) FROM $wout) AS w_abs_sum)""".stripMargin
  }
}
