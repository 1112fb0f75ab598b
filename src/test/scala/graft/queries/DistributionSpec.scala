package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import org.scalatest.funsuite.AnyFunSuite

/** q209 exact quantiles / q210 KS drift — the oracles prove cross-engine
  * value parity; these specs pin the semantics the hash can't articulate:
  * the quantile really is the discrete quantile of the sorted multiset
  * (referee: sort the values and index), and the KS distance really is the
  * max ECDF gap (referee: brute-force ECDFs at every value), including the
  * quantization error bound.
  */
class DistributionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("q209: each p is the smallest value whose cumulative count reaches ceil(p*n/100)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").as[(String, Long)].collect()
    val byLang = docs.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).sorted }
    val got = SparkEntry.queries("q209_exact_quantiles")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty && got.length == byLang.size)
    got.foreach { case (lang, p50, p90, p99) =>
      val xs = byLang(lang)
      def ref(p: Int): Long = xs((math.ceil(p * xs.length / 100.0).toInt - 1).max(0))
      assert(p50 == ref(50), s"$lang p50: $p50 != ${ref(50)}")
      assert(p90 == ref(90), s"$lang p90: $p90 != ${ref(90)}")
      assert(p99 == ref(99), s"$lang p99: $p99 != ${ref(99)}")
      assert(p50 <= p90 && p90 <= p99, s"$lang quantiles must be monotone")
    }
  }

  test("q210: ks_q20 equals the brute-force max ECDF gap on the 2^20 grid, within quantization of the true KS") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "n_chars").as[(String, Long)].collect()
    val bySrc  = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sorted }
    val values = docs.map(_._2).distinct.sorted
    def cum(xs: Array[Long], v: Long): Long = {
      // count of elements <= v in a sorted array
      var lo = 0; var hi = xs.length
      while (lo < hi) { val m = (lo + hi) >>> 1; if (xs(m) <= v) lo = m + 1 else hi = m }
      lo.toLong
    }
    val got = SparkEntry.queries("q210_ks_drift")(spark, dir)
      .as[(String, String, Long)].collect()
      .map { case (a, b, d) => (a, b) -> d }.toMap
    val srcs = bySrc.keys.toSeq.sorted
    assert(got.size == srcs.size * (srcs.size - 1) / 2, "one row per unordered source pair")
    for (a <- srcs; b <- srcs if a < b) {
      val (xa, xb) = (bySrc(a), bySrc(b))
      val refQ = values.map { v =>
        math.abs(cum(xa, v) * 1048576L / xa.length - cum(xb, v) * 1048576L / xb.length)
      }.max
      assert(got((a, b)) == refQ, s"($a,$b): ${got((a, b))} != $refQ")
      // quantized distance sits within 2 grid cells of the exact rational KS
      val refExact = values.map { v =>
        math.abs(cum(xa, v).toDouble / xa.length - cum(xb, v).toDouble / xb.length)
      }.max
      assert(math.abs(got((a, b)).toDouble / 1048576.0 - refExact) <= 2.0 / 1048576.0)
    }
  }

  test("q212: psi equals the brute-force quantize-first PSI; every summand is non-negative") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "lang").as[(String, String)].collect()
    val langs = docs.map(_._2).distinct.sorted
    val srcs  = docs.map(_._1).distinct.sorted
    val k     = langs.length.toLong
    val t     = docs.length.toLong
    val ct    = docs.groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
    val got = SparkEntry.queries("q212_psi_drift")(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == srcs.toSet, s"one row per source: ${got.keySet}")
    srcs.foreach { src =>
      val byLang = docs.filter(_._1 == src).groupBy(_._2).map { case (l, xs) => l -> xs.length.toLong }
      val ts     = byLang.values.sum
      // the independent referee: the same quantize-first contract computed
      // cell by cell in plain Scala longs — exact integer equality expected
      val psiq = langs.map { l =>
        val psq  = math.max((byLang.getOrElse(l, 0L) + 1L) * 1048576L / (ts + k), 1L)
        val pcq  = math.max((ct(l) + 1L) * 1048576L / (t + k), 1L)
        val term = (psq - pcq) * math.floor(math.log(psq.toDouble / pcq) * 1048576.0).toLong
        assert(term >= 0L, s"$src/$l: PSI summand must be non-negative, got $term")
        term
      }.sum
      val refPsi = BigDecimal.valueOf(psiq.toDouble / 1099511627776.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(src) == ((ts, refPsi)), s"$src: ${got(src)} != ($ts, $refPsi)")
      // sanity vs the unquantized statistic: within a few grid cells × k
      val refExact = langs.map { l =>
        val ps = (byLang.getOrElse(l, 0L) + 1.0) / (ts + k)
        val pc = (ct(l) + 1.0) / (t + k)
        (ps - pc) * math.log(ps / pc)
      }.sum
      assert(math.abs(got(src)._2 - refExact) <= (k + 2.0) * 2.0 / 1048576.0,
        s"$src: quantized PSI ${got(src)._2} too far from exact $refExact")
    }
  }

  test("q215: each pair's mi equals the brute-force quantize-first plug-in MI over observed cells") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("lang", "source", "n_chars").as[(String, String, Long)].collect()
    def views(d: (String, String, Long)): Seq[(String, String, String)] = Seq(
      ("lang_lenmag", d._1, d._3.toString.length.toString),
      ("lang_source", d._1, d._2),
      ("source_lenmag", d._2, d._3.toString.length.toString))
    val got = SparkEntry.queries("q215_mi_association")(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set("lang_lenmag", "lang_source", "source_lenmag"))
    got.keySet.foreach { pair =>
      val xs = docs.flatMap(views).filter(_._1 == pair)
      val n  = xs.length.toLong
      val c  = xs.groupBy(v => (v._2, v._3)).map { case (k2, vs) => k2 -> vs.length.toLong }
      val cx = xs.groupBy(_._2).map { case (k2, vs) => k2 -> vs.length.toLong }
      val cy = xs.groupBy(_._3).map { case (k2, vs) => k2 -> vs.length.toLong }
      // the independent referee: identical integer contract in plain Scala
      val miq = c.map { case ((x, y), cc) =>
        val a = math.max(cc * 1048576L / n, 1L)
        val b = math.max(cx(x) * 1048576L / n, 1L) * math.max(cy(y) * 1048576L / n, 1L)
        a * math.floor(math.log(a * 1048576.0 / b) * 1048576.0).toLong
      }.sum
      val refMi = BigDecimal.valueOf(miq.toDouble / 1099511627776.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(pair) == ((c.size.toLong, refMi)), s"$pair: ${got(pair)} != (${c.size}, $refMi)")
      // sanity vs the exact plug-in MI (which is >= 0 by Jensen): the
      // quantized statistic sits within a few grid cells x cell count
      val refExact = c.map { case ((x, y), cc) =>
        val pxy = cc.toDouble / n
        pxy * math.log(pxy / ((cx(x).toDouble / n) * (cy(y).toDouble / n)))
      }.sum
      assert(refExact >= -1e-12, s"$pair: exact plug-in MI must be non-negative")
      assert(math.abs(got(pair)._2 - refExact) <= (c.size + 4.0) * 4.0 / 1048576.0,
        s"$pair: quantized MI ${got(pair)._2} too far from exact $refExact")
    }
  }
}
