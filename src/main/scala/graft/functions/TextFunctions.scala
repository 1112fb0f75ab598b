package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data pipelines:
  * tokenization, stopword/quality stats, language ID, shingling, rolling-hash
  * fingerprints and MinHash — the operations a user of the reference engine
  * would need next when the "payments" become documents.
  *
  * Design rules:
  *   - Everything is a Catalyst `Column` expression (built-in functions +
  *     higher-order functions) — no Scala UDFs, so Catalyst can prune/push
  *     and the driver's DuckDB oracle can mirror the exact formula.
  *   - Hash-sensitive operators (MinHash) use **md5**, which is identical
  *     across engines, rather than engine-private hashes (Spark's murmur3
  *     `hash()` vs DuckDB's `hash()` differ). A lexicographic min over md5
  *     hex digests is a valid MinHash: all that is required is a uniform
  *     hash with a total order. At 100 TB scale, swap in `xxhash64` (also
  *     codegen'd, cheaper) once cross-engine parity is not needed.
  */
object TextFunctions {

  /** Tiny English stopword list used by the language-ID heuristic and the
    * quality score. Deliberately short — it is a *feature extractor*, not a
    * linguistic resource; the formula is mirrored in the DuckDB oracles.
    */
  val StopwordsEn: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-style pre-tokenization pattern: letter runs, digit runs, and
    * punctuation runs as separate tokens (the split a byte-pair tokenizer
    * applies before merging). Kept to a dialect-portable character-class
    * form so the DuckDB oracle (RE2) matches Java regex exactly.
    */
  val BpeTokenPattern: String = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** BPE-ish token array (use [[bpeTokenCount]] for the count). */
  def bpeTokens(text: Column): Column = regexp_extract_all(text, lit(BpeTokenPattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(StopwordsEn)))

  /** Fraction of tokens that are stopwords — 0.0 when the doc is empty. */
  def stopwordRatio(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(stopwordCount(text).cast("double") / tokenCount(text).cast("double"))

  /** n-gram-heuristic language ID: English iff the stopword hit-ratio
    * clears a threshold. Multi-language support = more stopword columns and
    * a `greatest()` argmax — same shape, kept minimal here.
    */
  def langId(text: Column, threshold: Double = 0.02): Column =
    when(stopwordRatio(text) >= threshold, lit("en")).otherwise(lit("und"))

  /** Average token length in characters (0.0 for empty docs). */
  def avgTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, lit(0.0))
      .otherwise(
        aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)).cast("double")
          / tokenCount(text).cast("double")
      )

  /** Composite quality score in [0,1]: long-enough docs with natural
    * stopword density and mid-range token lengths score high. The exact
    * weights are arbitrary but deterministic and oracle-mirrored.
    */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCount(text).cast("double") / lit(50.0), lit(1.0))
    val stopTerm   = least(stopwordRatio(text) / lit(0.05), lit(1.0))
    val lenPenalty = when(avgTokenLen(text) > 12.0, lit(0.5)).otherwise(lit(1.0))
    round(lengthTerm * lit(0.5) * lenPenalty + stopTerm * lit(0.5), 4)
  }

  /** Polynomial rolling hash over the characters of `text`:
    * `h = (h*31 + ascii(c)) mod (2^31-1)` — the classic Karp–Rabin document
    * fingerprint, expressed as a higher-order `aggregate` so both engines
    * fold left-to-right over the same values.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(
      sequence(lit(1), length(text)),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(text.substr(i, lit(1)))) % 2147483647L
    )

  /** PII masking patterns — kept to RE2-safe syntax (character classes +
    * bounded repetition) so the Java-regex Spark side and the RE2 DuckDB
    * oracle match the same spans. A production pipeline would swap in its
    * compliance-approved pattern set; the operator shape (count + mask in
    * one projection pass) is what scales.
    */
  val EmailPattern: String   = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongNumPattern: String = "[0-9]{6,}" // account-number-ish digit runs

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  def longNumCount(text: Column): Column =
    size(regexp_extract_all(text, lit(LongNumPattern), lit(0)))

  /** Mask emails first, then residual long digit runs (a digit run inside an
    * already-masked email is not re-counted — the counts above are computed
    * on the RAW text, deliberately, as audit totals).
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"), LongNumPattern, "<NUM>")

  /** Word n-gram shingles: `["a b c", "b c d", ...]` from the token array.
    * Empty when the doc has fewer than n tokens.
    */
  def shingles(text: Column, n: Int = 3): Column = shinglesOf(tokens(text), n)

  /** Shingles from an ALREADY-MATERIALIZED token-array column. Performance
    * contract: pass a projected column reference, not an expression —
    * Catalyst does no common-subexpression elimination inside higher-order
    * lambdas, so an inline `split(...)` here would re-tokenize the document
    * for every element access (measured 10× slower).
    */
  def shinglesOf(ws: Column, n: Int = 3): Column =
    // NB: Spark's sequence(1, 0) counts DOWN — guard short docs explicitly.
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)
        )
      )

  /** Base hashes for the MinHash family: ONE md5 per shingle, split into
    * two independent 60-bit integers (hex digits 1–15 and 16–30). The k
    * minhash functions are then the double-hash family
    * `h_i(s) = h1(s) + i·h2(s)` (Dietzfelbinger et al.) — k multiply-adds
    * per shingle instead of k md5 invocations, an ~8× cut in the hashing
    * CPU of the 100 TB dedup hot path. No modulus: 60-bit operands keep
    * `h1 + 7·h2 < 2^63` (no signed overflow), and any strictly-monotone
    * range works for a MIN-hash. Engine-portable: the DuckDB oracle parses
    * the same hex digits to the same integers.
    *
    * Returns `array<struct<h1: long, h2: long>>` — materialize it ONCE as a
    * projected column and fan the k seeds out with [[minhashFromPairs]]
    * (the same CollapseProject contract as [[shinglesOf]]).
    */
  def minhashPairs(shingles: Column): Column =
    transform(
      shingles,
      s => {
        val h = md5(s)
        struct(
          conv(substring(h, 1, 15), 16, 10).cast("long").as("h1"),
          conv(substring(h, 16, 15), 16, 10).cast("long").as("h2")
        )
      }
    )

  /** MinHash value for one seed over a materialized [[minhashPairs]] array:
    * a narrow array fold — no explode, no aggregation, no shuffle. NULL for
    * an empty array — callers filter those rows.
    */
  def minhashFromPairs(seed: Int, pairs: Column): Column = {
    // the no-overflow bound is h1 + 7·h2 < 2^63: 60-bit operands admit
    // seeds 0–7 ONLY (beyond that Spark wraps negative while the DuckDB
    // oracle's BIGINT raises — engines would diverge silently)
    require(seed >= 0 && seed < 8, s"minhash double-hash family supports seeds 0-7, got $seed")
    array_min(transform(pairs, p => p.getField("h1") + lit(seed.toLong) * p.getField("h2")))
  }

  /** One MinHash value from the raw shingle array (computes the base hashes
    * in place — use [[minhashPairs]] + [[minhashFromPairs]] when several
    * seeds read the same array).
    */
  def minhashCol(seed: Int, shingles: Column): Column =
    minhashFromPairs(seed, minhashPairs(shingles))

  /** The same MinHash value as an AGGREGATE over exploded shingle rows
    * (equality with the narrow [[minhashCol]] fold is spec'd: min over the
    * multiset = min over the set).
    */
  def minhashAgg(seed: Int, shingle: Column): Column = {
    require(seed >= 0 && seed < 8, s"minhash double-hash family supports seeds 0-7, got $seed")
    val h = md5(shingle)
    min(
      conv(substring(h, 1, 15), 16, 10).cast("long")
        + lit(seed.toLong) * conv(substring(h, 16, 15), 16, 10).cast("long")
    )
  }
}
