package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE definition of the engine's portable-HLL estimate convention —
  * shared by q126 (per-language distinct tokens, batch) and q189 (per-window
  * distinct users, streaming) so the bit-portability contract cannot drift
  * between sites: α = 0.709 for M = 64 registers, the exact-integer harmonic
  * denominator q = Σ 2^(55−M_j) scaled by 2^55, and the small-range
  * linear-counting switch. Every ingredient is bit-portable across engines
  * (order-independent BIGINT sums, ONE IEEE division, ln over only 64
  * possible arguments — all 64 verified to agree with DuckDB at 4 decimals).
  */
object PortableHll {

  /** Register count (b = 6 bucket bits). */
  val M = 64

  /** 2^55: the harmonic-sum scale — an empty register contributes exactly
    * this, a register M_j contributes 2^(55−M_j), so Σ stays an exact
    * BIGINT for any register state.
    */
  val HarmonicScale: Long = 1L << 55

  /** The estimate from the exact integer harmonic denominator `q` and the
    * zero-register count `v`: raw = α·M²·2^55 / q, switching to linear
    * counting M·ln(M/v) when raw ≤ 2.5·M and v > 0 (raw HLL is biased when
    * n ≪ M), rounded to 4 decimals.
    */
  def estimate(q: Column, v: Column): Column = {
    val raw = lit(0.709) * M * M * lit(HarmonicScale.toDouble) / q.cast("double")
    round(
      when(raw <= 2.5 * M && v > 0, lit(M.toDouble) * log(lit(M.toDouble) / v))
        .otherwise(raw),
      4)
  }
}
