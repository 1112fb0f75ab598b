package graft.queries

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` — exact, MinHash+LSH, exact
  * n-gram Jaccard, and SimHash — each a driver-verifiable batch query with a
  * DuckDB oracle computing the *identical* algorithm (md5-based hashing, see
  * [[graft.functions.TextFunctions]]).
  *
  * Scale design (100 TB):
  *   - Exact dedup: hash-groupBy on the normalized text — one shuffle keyed
  *     on content, the canonical map-reduce dedup.
  *   - MinHash+LSH: per-doc signatures (narrow), then band-bucket join —
  *     candidate generation cost is Σ bucket², never n². The exact-Jaccard
  *     verification join runs only on LSH candidates.
  *   - Exact Jaccard (q43) is the *audit baseline*: an inverted-index
  *     self-join on shingles. Quadratic in bucket sizes — at 100 TB you run
  *     q42 (LSH) and sample-audit with q43; kept here because the driver's
  *     correctness gate needs the exact answer.
  *   - SimHash: corpus vocabulary is orders of magnitude smaller than the
  *     corpus, so bit contributions are computed once per distinct token
  *     (a broadcast-sized dict joined back to the doc-term table), not per
  *     occurrence.
  */
object DedupQueries {

  private val JaccardThreshold = 0.5
  private val NumHashes        = 8 // MinHash signature length
  private val RowsPerBand      = 2 // → 4 bands; P(candidate | j=0.9) ≈ 0.999

  /** Distinct word-3-shingles per document. Callers that consume this more
    * than once (the LSH and Jaccard joins) persist it — the 100 TB analogue
    * is materializing the shingle index once per dedup run instead of
    * re-exploding the corpus per join side.
    */
  private def shingleSet(s: SparkSession, dir: String): DataFrame =
    shingleMultiset(s, dir).distinct()

  /** Shingles WITH duplicates — enough for MinHash (min is idempotent), so
    * q41 skips the distinct's shuffle entirely.
    */
  private def shingleMultiset(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      // The raw table is one small parquet split; without this, the whole
      // shingle explosion runs in ONE task. At 100 TB the input arrives in
      // thousands of splits and this repartition is a no-op to remove —
      // here it buys full-core parallelism for ~1 MB of shuffle.
      .repartition(col("doc_id"))
      // materialize the token array BEFORE shingling (see shinglesOf docs)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(shinglesOf(col("w"))).as("shingle"))

  /** MinHash signatures: (doc_id, seed ∈ [0,k), mh = min md5("seed:shingle")).
    * All k mins are computed in ONE groupBy pass (k agg columns, map-side
    * partial min ⇒ the shuffle carries k values per doc, not k× the shingle
    * count), then unpivoted to the (doc_id, seed, mh) shape.
    */
  private def signatures(sh: DataFrame): DataFrame = {
    val mins = (0 until NumHashes).map(i => minhashAgg(i, col("shingle")).as(s"mh$i"))
    val stackExpr = (0 until NumHashes).map(i => s"$i, mh$i").mkString(", ")
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .selectExpr("doc_id", s"stack($NumHashes, $stackExpr) AS (seed, mh)")
  }

  /** Candidate pairs: docs sharing any (band, sig) LSH bucket; a < b,
    * distinct. Band signatures come straight off the wide one-row-per-doc
    * minhash frame (columns are already in seed order), so there is no
    * unpivot, no per-(doc,band) shuffle, and no sort — one groupBy for the
    * mins, one for the buckets. Bucket pair expansion is Σ bucket², never a
    * full self-join re-computation.
    */
  private def lshCandidates(sh: DataFrame): DataFrame = {
    val mins  = (0 until NumHashes).map(i => minhashAgg(i, col("shingle")).as(s"mh$i"))
    val bands = (0 until NumHashes / RowsPerBand).map { b =>
      val cols = (0 until RowsPerBand).map(r => col(s"mh${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), concat_ws("|", cols: _*).as("sig"))
    }
    sh.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
      .groupBy(col("band"), col("sig"))
      .agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(
        explode(
          expr("flatten(transform(ds, a -> transform(filter(ds, b -> b > a), b -> struct(a AS ia, b AS ib))))")
        ).as("p")
      )
      .select(col("p.ia").as("ia"), col("p.ib").as("ib"))
      .distinct()
  }

  /** Exact Jaccard for a pair frame (ia, ib): intersection via the shingle
    * inverted index, union by inclusion–exclusion.
    */
  private def jaccardOf(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.select(col("doc_id").as("ia"), col("shingle")), Seq("ia"))
      .join(sh.select(col("doc_id").as("ib"), col("shingle")), Seq("ib", "shingle"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
      .join(sizes.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
      .select(
        col("ia"),
        col("ib"),
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4).as("jac")
      )
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on normalized content, keep the min doc_id.
    "q40_dedup_exact" -> ((s, dir) =>
      Tables
        .documents(s, dir)
        .groupBy(lower(trim(col("text"))).as("norm_text"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
        .orderBy(col("keep_id"))),

    // MinHash signatures (k=8, md5-based — engine-portable). Runs on the
    // shingle MULTISET: min is idempotent, so the distinct shuffle is waste.
    "q41_minhash_sig" -> ((s, dir) =>
      signatures(shingleMultiset(s, dir)).orderBy(col("doc_id"), col("seed"))),

    // MinHash + LSH near-dup detection: banded candidates, then exact
    // Jaccard verification on candidates only. The shingle index is
    // persisted: signatures, candidate verification, and set sizes all
    // reuse one materialization.
    "q42_minhash_lsh" -> ((s, dir) => {
      val sh = shingleSet(s, dir).persist()
      jaccardOf(lshCandidates(sh), sh)
        .filter(col("jac") >= JaccardThreshold)
        .orderBy(col("ia"), col("ib"))
    }),

    // Exact n-gram Jaccard near-dup pairs (the audit baseline for q42).
    // The inverted-index self-join yields intersection counts directly
    // (groupBy pair + count) — no separate candidate pass.
    "q43_ngram_jaccard" -> ((s, dir) => {
      val sh = shingleSet(s, dir).persist()
      val inter = sh
        .select(col("doc_id").as("ia"), col("shingle"))
        .join(sh.select(col("doc_id").as("ib"), col("shingle")), Seq("shingle"))
        .filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib"))
        .agg(count(lit(1)).as("c"))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      inter
        .join(sizes.select(col("doc_id").as("ia"), col("n").as("na")), Seq("ia"))
        .join(sizes.select(col("doc_id").as("ib"), col("n").as("nb")), Seq("ib"))
        .select(
          col("ia"),
          col("ib"),
          round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 4).as("jac")
        )
        .filter(col("jac") >= JaccardThreshold)
        .orderBy(col("ia"), col("ib"))
    }),

    // The composed curation pipeline: corpus minus near-duplicates (LSH
    // pairs, keep the lower doc_id of each pair — the standard one-pass
    // decision; full transitive closure would need iterative CC) minus
    // low-quality docs. This is the "output table" a training-data run
    // materializes.
    "q46_curated_corpus" -> ((s, dir) => {
      val sh = shingleSet(s, dir).persist()
      val dupLosers = jaccardOf(lshCandidates(sh), sh)
        .filter(col("jac") >= JaccardThreshold)
        .select(col("ib").as("doc_id"))
        .distinct()
      Tables
        .documents(s, dir)
        .join(dupLosers, Seq("doc_id"), "left_anti")
        .filter(graft.functions.TextFunctions.qualityScore(col("text")) >= 0.5)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // SimHash (32-bit, md5 bit source, term-frequency weighted) — near-dup
    // fingerprint whose Hamming distance approximates cosine similarity.
    "q44_simhash" -> ((s, dir) => {
      val docTerms = Tables
        .documents(s, dir)
        .repartition(col("doc_id")) // single-split input: parallelize tokenization
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("cnt"))
      // Bit contributions once per distinct token (vocab ≪ corpus), then a
      // broadcast join back — no per-occurrence hashing.
      val dict = docTerms
        .select(col("tok"))
        .distinct()
        .withColumn("h", md5(col("tok")))
        .select(col("tok"), explode(sequence(lit(0), lit(31))).as("b"), col("h"))
        // hex digit (4 bits) holding bit b, then the bit itself — portable
        // integer arithmetic only (same text in the DuckDB oracle).
        // NB: integer division must be explicit (DIV / //): DuckDB's
        // CAST(double AS INT) rounds where Spark's truncates.
        .withColumn("digit", expr("instr('0123456789abcdef', substr(h, (b DIV 4) + 1, 1)) - 1"))
        .withColumn(
          "bit",
          expr("(digit DIV (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)) % 2")
        )
        .select(col("tok"), col("b"), col("bit"))
      docTerms
        .join(broadcast(dict), Seq("tok"))
        .groupBy(col("doc_id"), col("b"))
        .agg(sum(col("cnt") * (col("bit") * 2 - 1)).as("sdir"))
        .groupBy(col("doc_id"))
        .agg(
          sum(
            when(col("sdir") >= 0, pow(lit(2), col("b")).cast("long")).otherwise(lit(0L))
          ).as("simhash")
        )
        .orderBy(col("doc_id"))
    })
  )

  // ---- oracles ------------------------------------------------------------

  /** Shared oracle CTEs: shingle sets, sizes, signatures, band buckets. */
  private val shingleCte =
    raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         | sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(ws)-1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingle FROM w),
         | sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         | sig AS (SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || shingle)) AS mh
         |         FROM sh CROSS JOIN (SELECT unnest(range(0, $NumHashes)) AS seed) GROUP BY doc_id, seed),
         | bands AS (SELECT doc_id, (seed // $RowsPerBand)::INT AS band, string_agg(mh, '|' ORDER BY seed) AS s
         |           FROM sig GROUP BY doc_id, 2),
         | cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
         |          FROM bands a JOIN bands b ON a.band = b.band AND a.s = b.s AND a.doc_id < b.doc_id),
         | inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |           FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1, 2),
         | jac AS (SELECT ia, ib, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jac
         |         FROM inter JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id)
         |""".stripMargin

  val oracles: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents
        |GROUP BY lower(trim(text)) ORDER BY keep_id""".stripMargin,
    "q41_minhash_sig" ->
      (shingleCte + "SELECT doc_id, seed::INT AS seed, mh FROM sig ORDER BY doc_id, seed"),
    "q42_minhash_lsh" ->
      (shingleCte +
        s"SELECT j.ia, j.ib, j.jac FROM jac j JOIN cand USING (ia, ib) WHERE j.jac >= $JaccardThreshold ORDER BY ia, ib"),
    "q43_ngram_jaccard" ->
      (shingleCte + s"SELECT ia, ib, jac FROM jac WHERE jac >= $JaccardThreshold ORDER BY ia, ib"),
    "q46_curated_corpus" ->
      (shingleCte +
        raw""", losers AS (
             |  SELECT DISTINCT j.ib AS doc_id FROM jac j JOIN cand USING (ia, ib)
             |  WHERE j.jac >= $JaccardThreshold),
             | quality AS (
             |  SELECT doc_id, lang, source,
             |    round(least(len(regexp_split_to_array(trim(text), '\s+')) / 50.0, 1.0) * 0.5 *
             |      (CASE WHEN (CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
             |                  ELSE list_reduce(list_prepend(0::BIGINT, list_transform(regexp_split_to_array(trim(text), '\s+'), t -> length(t)::BIGINT)), (a,b) -> a+b) * 1.0 / len(regexp_split_to_array(trim(text), '\s+')) END) > 12.0
             |            THEN 0.5 ELSE 1.0 END)
             |      + least((CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
             |               ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','to','in','is','it','on','for'))) * 1.0 / len(regexp_split_to_array(trim(text), '\s+')) END) / 0.05, 1.0) * 0.5, 4) AS q
             |  FROM documents)
             |SELECT doc_id, lang, source FROM quality
             |WHERE doc_id NOT IN (SELECT doc_id FROM losers) AND q >= 0.5
             |ORDER BY doc_id""".stripMargin),
    "q44_simhash" ->
      raw"""WITH toks AS (
           |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
           | dt AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
           | dict0 AS (SELECT DISTINCT tok FROM dt),
           | dict AS (SELECT tok, b,
           |            ((strpos('0123456789abcdef', substr(md5(tok), (b // 4) + 1, 1)) - 1)
           |              // (CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)) % 2 AS bit
           |          FROM dict0 CROSS JOIN (SELECT unnest(range(0, 32)) AS b)),
           | dirs AS (SELECT doc_id, b, sum(cnt * (bit * 2 - 1)) AS sdir
           |          FROM dt JOIN dict USING (tok) GROUP BY 1, 2)
           |SELECT doc_id,
           |  sum(CASE WHEN sdir >= 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END)::BIGINT AS simhash
           |FROM dirs GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
