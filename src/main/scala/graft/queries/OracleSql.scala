package graft.queries

/** Canonical DuckDB oracle fragments shared ACROSS query registries — one
  * definition per cross-family formula. The per-registry oracle helpers
  * stay private, but formulas consumed by more than one registry live here:
  * if the Spark-side semantics ever change, every consuming oracle
  * desynchronizes AT ONCE (loudly, in the driver's hash compare) instead of
  * one registry's private copy drifting in lockstep with nothing.
  */
private[queries] object OracleSql {

  /** The DuckDB twin of [[graft.functions.TextFunctions.qualityScore]] over
    * a `documents` row (`text` in scope) — consumed by the Curation
    * (q62/q66/q121/q125/q150/q161/q164), Dedup (q46/q99), and Text (q169
    * relevance grades) oracles.
    */
  val quality: String =
    raw"""round(least(len(regexp_split_to_array(trim(text), '\s+')) / 50.0, 1.0) * 0.5 *
         |      (CASE WHEN (CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
         |                  ELSE list_reduce(list_prepend(0::BIGINT, list_transform(regexp_split_to_array(trim(text), '\s+'), t -> length(t)::BIGINT)), (a,b) -> a+b) * 1.0 / len(regexp_split_to_array(trim(text), '\s+')) END) > 12.0
         |            THEN 0.5 ELSE 1.0 END)
         |      + least((CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) = 0 THEN 0.0
         |               ELSE len(list_filter(regexp_split_to_array(trim(text), '\s+'), t -> t IN ('the','a','of','and','to','in','is','it','on','for'))) * 1.0 / len(regexp_split_to_array(trim(text), '\s+')) END) / 0.05, 1.0) * 0.5, 4)""".stripMargin

  /** `dim`-length dot product with the exact fold order of Spark's
    * `aggregate` (left fold from a 0.0 accumulator) — consumed by the
    * Similarity oracles and the q159/q169 fused-ranking oracles.
    */
  def dot(dim: Int)(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)), (x, y) -> x + y)"
}
