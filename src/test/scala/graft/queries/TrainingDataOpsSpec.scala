package graft.queries

import graft.SparkSpec
import graft.SparkEntry
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 training-data-pipeline operators: sequence packing (q148), DSIR
  * importance weights (q149), adaptive per-language quality thresholds
  * (q150), and BPE merge learning (q151). The oracles prove cross-engine
  * value parity; these specs pin the SEMANTIC invariants the hash can't
  * articulate — contiguity of the packed stream, target-likeness ordering,
  * exact quota selection, and the greedy non-overlapping merge rule.
  */
class TrainingDataOpsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("q184 gopher gate: bitmask is consistent with its own counted inputs; keep iff no reason") {
    val rows = SparkEntry.queries("q184_gopher_rules")(spark, dir)
      .select("doc_id", "n_words", "n_chars", "alpha_words", "stop_words", "reasons", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, w, c, aw, sw, reasons, keep) =>
      val expect =
        (if (w < 50 || w > 100000) 1L else 0L) +
          (if (c < 3 * w || c > 10 * w) 2L else 0L) +
          (if (aw * 10 < w * 8) 4L else 0L) +
          (if (sw < 2) 8L else 0L)
      assert(reasons == expect, s"doc $id bitmask $reasons != recomputed $expect")
      assert(keep == (if (reasons == 0L) 1L else 0L), s"doc $id keep/reasons inconsistent")
      assert(aw <= w && sw <= w && c >= w, s"doc $id counts impossible (aw=$aw sw=$sw c=$c w=$w)")
    }
    // the corpus must exercise both outcomes and more than one reason bit
    assert(rows.exists(_._7 == 1L) && rows.exists(_._7 == 0L), "gate must both keep and drop")
    assert(rows.filter(_._6 != 0L).map(_._6).distinct.length > 1, "fixture should trip more than one rule")
  }

  test("q185 repetition signals: hand-computed fractions, struct-max tie rule, gate consistency") {
    val docs = Seq(
      (1L, "x x x x x y"),                       // dominated by one repeated word
      (2L, "a b c a"),                           // all 2-grams tied → greatest gram wins
      (3L, "p q r s t p q r s t p q r s t"),     // period-5 → heavy duplicate 5-grams
      (4L, "")                                   // empty → all-zero signals, keep
    ).toDF("doc_id", "text")
    val rows = TextQueries
      .repetitionSignals(docs)
      .select("doc_id", "n_words", "total_chars", "top2_q", "top3_q", "dup5_q", "reasons", "keep")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
      .sortBy(_._1)
    // doc 1: top 2-gram "x x" ×4 (2 chars) / 6 chars → floor(8e6/6); top
    // 3-gram "x x x" ×3 (3 chars) → floor(9e6/6); only 2 distinct 5-grams,
    // both unique → dup5 = 0. Both top-gram rules trip.
    assert(rows(0) == ((1L, 6L, 6L, 1333333L, 1500000L, 0L, 3L, 0L)))
    // doc 2: every 2-gram occurs once — the tie resolves to the
    // lexicographically greatest ("c a", 2 chars): floor(2e6/4) = 500000.
    assert(rows(1)._4 == 500000L)
    // doc 3: 11 sliding 5-grams, 5 distinct rotations → dup = 6 →
    // floor(6e6/11); the duplicate-5-gram rule trips.
    assert(rows(2)._6 == 545454L && (rows(2)._7 & 4L) == 4L)
    // doc 4: no tokens → every signal zero, gate keeps
    assert(rows(3) == ((4L, 0L, 0L, 0L, 0L, 0L, 0L, 1L)))
    // corpus-level: bitmask always equals its own thresholds; keep iff 0
    val corpus = SparkEntry.queries("q185_gopher_repetition")(spark, dir)
      .select("doc_id", "top2_q", "top3_q", "dup5_q", "reasons", "keep")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(corpus.nonEmpty)
    corpus.foreach { case (id, t2, t3, d5, reasons, keep) =>
      val expect = (if (t2 > 200000L) 1L else 0L) +
        (if (t3 > 180000L) 2L else 0L) + (if (d5 > 150000L) 4L else 0L)
      assert(reasons == expect, s"doc $id bitmask $reasons != recomputed $expect")
      assert(keep == (if (reasons == 0L) 1L else 0L), s"doc $id keep/reasons inconsistent")
    }
    assert(corpus.exists(_._6 == 1L) && corpus.exists(_._6 == 0L), "gate must both keep and drop")
  }

  test("q190 temperature mix: exact seat total, contiguous quotas, tail up-weighted") {
    val rows = SparkEntry.queries("q190_temperature_mix")(spark, dir)
      .select("lang", "rk", "doc_id", "alloc")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val counts = Tables.documents(spark, dir).filter(col("lang").isNotNull)
      .groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val total  = counts.values.sum
    val allocs = rows.map(r => r._1 -> r._4).toMap
    // the seat-total premise, asserted rather than assumed: every language
    // must be at least as large as its quota or seats go unfilled (a lang
    // with alloc = 0 would also be absent from the output entirely)
    counts.foreach { case (l, n) =>
      assert(n >= allocs.getOrElse(l, 0L), s"$l smaller than its quota: $n < ${allocs.get(l)}")
    }
    assert(counts.keySet == allocs.keySet, s"languages missing from the mix: ${counts.keySet -- allocs.keySet}")
    // Hamilton allocation: seats sum exactly to the budget
    assert(allocs.values.sum == CurationQueries.MixBudget, s"seat total ${allocs.values.sum}")
    // each language's selected ranks are a contiguous 1..alloc prefix
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to allocs(l)), s"$l quota not a contiguous prefix: $ranks")
    }
    // α = 1/2 flattening, the operator's point: the largest language's
    // allocation share sits BELOW its corpus share, the smallest ABOVE
    val (maxLang, maxN) = counts.maxBy(_._2)
    val (minLang, minN) = counts.minBy(_._2)
    assert(maxN > minN, "fixture must be skewed for the flattening check")
    val b = CurationQueries.MixBudget
    assert(allocs.getOrElse(maxLang, 0L) * total < maxN * b,
      s"$maxLang not down-weighted: ${allocs.get(maxLang)}/$b vs $maxN/$total")
    assert(allocs.getOrElse(minLang, 0L) * total > minN * b,
      s"$minLang not up-weighted: ${allocs.get(minLang)}/$b vs $minN/$total")
    // allocation is monotone in corpus size up to the ±1 Hamilton seat
    val byN = counts.toSeq.sortBy(_._2).map { case (l, _) => allocs(l) }
    byN.sliding(2).foreach {
      case Seq(a, bigger) => assert(a <= bigger + 1, s"allocation inversion: $byN")
      case _              =>
    }
  }

  test("q148 packing manifest is a contiguous chunking of the concatenated token stream") {
    val rows = SparkEntry.queries("q148_seq_packing")(spark, dir)
      .select("doc_id", "n_tokens", "start_off", "first_blk", "last_blk", "n_blocks")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // contiguity: each doc starts exactly where the previous one ended
    rows.sliding(2).foreach {
      case Array((_, n1, s1, _, _, _), (_, _, s2, _, _, _)) => assert(s2 == s1 + n1)
      case _ =>
    }
    assert(rows.head._3 == 0L, "first doc starts at offset 0")
    // block arithmetic: first/last/n_blocks are pure functions of the span
    rows.foreach { case (_, n, s, fb, lb, nb) =>
      assert(fb == s / 128 && lb == (s + n - 1) / 128 && nb == lb - fb + 1)
    }
    // the whole stream chunks into ceil(total/128) blocks
    val total = rows.map(_._2).sum
    assert(rows.last._5 == (total - 1) / 128)
  }

  test("q149 DSIR weights rank target-language documents above the rest") {
    val w = SparkEntry.queries("q149_dsir_weights")(spark, dir)
      .join(Tables.documents(spark, dir).select("doc_id", "lang"), Seq("doc_id"))
      .groupBy(col("lang")).agg(avg(col("log_weight")).as("aw"))
      .as[(String, Double)].collect().toMap
    val others = (w - "en").values
    assert(others.nonEmpty && w("en") > others.max,
      s"en must average above every other lang: $w")
    // importance weights are log-ratios of smoothed distributions — the
    // corpus-wide average is near zero only if target ≈ raw; here the en
    // slice genuinely differs, so en sits above zero, the rest below
    assert(w("en") > 0.0 && others.forall(_ < 0.0), s"sign structure: $w")
  }

  test("q150 histogram selection equals the naive per-language top-quota rank") {
    val got = SparkEntry.queries("q150_adaptive_quality")(spark, dir)
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    // brute-force twin: corpus-wide rank per lang over the same
    // (score DESC, hash, doc_id) tie order (fine at spec scale)
    val base = Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      round(graft.functions.TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc"),
      expr("CAST(conv(substr(md5(CAST(concat('aq:', CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10) AS BIGINT)")
        .as("h16"))
    val k = base.groupBy(col("lang")).agg(expr("(count(*) + 4) DIV 5").as("k"))
    val exp = base
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("isc").desc, col("h16"), col("doc_id"))))
      .join(k, Seq("lang")).filter(col("rn") <= col("k"))
      .select("lang", "doc_id").as[(String, Long)].collect().toSet
    assert(got == exp)
    // per-lang quota is exactly ceil(n/5)
    val quota = k.as[(String, Long)].collect().toMap
    val counts = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(counts == quota)
  }

  test("q151 bpeMerge fuses greedy left-to-right non-overlapping occurrences only") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a", Seq("aa", "a")),              // odd run: no overlap reuse
      (Seq("a", "b", "a", "b", "a", "b"), "a", "b", Seq("ab", "ab", "ab")),
      (Seq("a", "b", "b"), "a", "b", Seq("ab", "b")),              // merged tail can't re-match
      (Seq("x", "a", "b", "y"), "a", "b", Seq("x", "ab", "y")),
      (Seq("ab", "ab", "ab"), "ab", "ab", Seq("abab", "ab")),      // multi-char symbols
      (Seq("xa", "b"), "a", "b", Seq("xa", "b")),                  // suffix of a symbol is NOT the symbol
      (Seq("q"), "a", "b", Seq("q"))                               // single symbol untouched
    )
    cases.foreach { case (syms, l, r, expected) =>
      val out = Seq(syms).toDF("syms")
        .select(TextQueries.bpeMerge(col("syms"), lit(l), lit(r)).as("m"))
        .as[Seq[String]].head()
      assert(out == expected, s"merge($l,$r) on $syms")
    }
  }

  test("q151 report shape: one merge per round, counts ranked, merged pair consumed") {
    val rows = SparkEntry.queries("q151_bpe_merges")(spark, dir)
      .as[(Long, Long, String, String, Long, Int)].collect()
    val byRound = rows.groupBy(_._1)
    assert(byRound.keySet == Set(1L, 2L, 3L))
    byRound.values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      assert(rs.count(_._6 == 1) == 1 && rs.find(_._6 == 1).get._2 == 1L)
      // pair_count non-increasing down the rank order
      rs.sortBy(_._2).map(_._5).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b); case _ =>
      }
    }
    // each round's merged pair does not recur as a candidate with rank 1
    // in the next round (it was fused away; only re-formed occurrences of
    // the pair could reappear, with a strictly smaller count)
    val merges = rows.filter(_._6 == 1).sortBy(_._1).map(r => (r._3, r._4))
    assert(merges.distinct.length == merges.length, s"rounds re-learned a merge: $merges")
  }

  test("q152 fertility covers every language and averages at least one piece per token") {
    val rows = SparkEntry.queries("q152_bpe_fertility")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { case (lang, nTok, nPieces, fert) =>
      assert(nTok > 0 && nPieces >= nTok, s"$lang: pieces can only split tokens")
      assert(fert >= 1.0 && fert < 20.0, s"$lang fertility $fert")
    }
    // three merges must actually compress: fertility strictly below the
    // untrained char-level baseline (avg word length)
    val charLevel = Tables.documents(spark, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .agg((sum(length(col("w"))) / count(lit(1))).as("c")).as[Double].head()
    assert(rows.forall(_._4 < charLevel), s"fertility must sit below char-level $charLevel")
  }

  test("q153 split keeps every near-dup cluster on one side, near the 90/10 ratio") {
    val rows = SparkEntry.queries("q153_split_by_cluster")(spark, dir)
      .as[(Long, Long, String)].collect()
    assert(rows.length == Tables.documents(spark, dir).count())
    // cluster coherence BY CONSTRUCTION — but assert it anyway: one split
    // value per representative
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).distinct.length == 1, s"cluster $rep split across sides")
    }
    // ratio: representatives (the independent hash draws) land ~90/10
    val reps = rows.groupBy(_._2).map(_._2.head._3).toSeq
    val trainFrac = reps.count(_ == "train").toDouble / reps.size
    assert(trainFrac > 0.8 && trainFrac < 0.97, s"train fraction $trainFrac")
    // and both sides are non-empty at doc level
    assert(rows.exists(_._3 == "train") && rows.exists(_._3 == "heldout"))
  }

  test("q156 epoch shuffle: each epoch is a distinct, complete permutation") {
    val rows = SparkEntry.queries("q156_epoch_shuffle")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val n = Tables.documents(spark, dir).count()
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(1L, 2L))
    byEpoch.values.foreach { es =>
      assert(es.map(_._3).sorted.toSeq == (1L to n), "positions must be a bijection 1..n")
    }
    // the two epochs genuinely reorder: same docs, different positions
    val p1 = byEpoch(1L).map(r => r._2 -> r._3).toMap
    val p2 = byEpoch(2L).map(r => r._2 -> r._3).toMap
    assert(p1.keySet == p2.keySet)
    assert(p1.count { case (d, p) => p2(d) != p } > n / 2, "epochs should differ broadly")
  }

  test("q157 budget fill is a tight best-quality prefix per source") {
    val kept = SparkEntry.queries("q157_token_budget_mix")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    val all = Tables.documents(spark, dir).select(
      col("source"), col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n"),
      round(graft.functions.TextFunctions.qualityScore(col("text")) * 10000).cast("long").as("isc"))
      .as[(String, Long, Long, Long)].collect()
    val budget = all.map(_._3).sum / (all.map(_._1).distinct.length * 2)
    kept.groupBy(_._1).foreach { case (src, ks) =>
      val keptIds = ks.map(_._2).toSet
      val ranked  = all.filter(_._1 == src).sortBy(t => (-t._4, t._2))
      // kept = the ranked prefix: find the cut and check set equality + tightness
      val prefix = ranked.scanLeft(0L)(_ + _._3).tail.zip(ranked).takeWhile(_._1 <= budget)
      assert(prefix.map(_._2._2).toSet == keptIds, s"$src: not the greedy prefix")
      assert(ks.map(_._4).max <= budget, s"$src exceeded its share")
      // tightness: the first excluded doc (if any) would overflow
      if (prefix.length < ranked.length) {
        val nextCum = prefix.lastOption.map(_._1).getOrElse(0L) + ranked(prefix.length)._3
        assert(nextCum > budget, s"$src: stopped early at $nextCum <= $budget")
      }
    }
  }

  test("q158 drift report covers every source with small bounded divergence") {
    val rows = SparkEntry.queries("q158_vocab_drift")(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(rows.length == 20 && rows.map(_._1).distinct.length == 20)
    rows.foreach { case (src, n, kl) =>
      assert(n > 0 && !kl.isNaN && math.abs(kl) < 1.0, s"$src: kl=$kl")
    }
    // sources in this corpus share one generator — drift should sit near
    // zero but NOT identically zero (the report must measure something)
    assert(rows.exists(_._3 != 0.0))
  }

  test("q154 integer power iteration agrees with double-precision PCA") {
    val got = SparkEntry.queries("q154_pca_power")(spark, dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length == 64)
    // normalization invariant: max |component| is exactly the 2^20 target
    assert(got.map(r => math.abs(r._2)).max == 1048576L)
    assert(got.head._3 > 0.0, "dominant eigenvalue of a scatter matrix is positive")
    // reference: double-precision covariance + the SAME number of power
    // rounds, driver-side — the claim under test is that the quantized
    // integer arithmetic tracks the float algorithm, not that six rounds
    // fully converge (the eigengap decides that, fixed rounds are the
    // deterministic contract)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("embedding")).as[Seq[Float]].collect().map(_.map(_.toDouble).toArray)
    val n = vecs.length; val d = 64
    val mean = Array.tabulate(d)(j => vecs.map(_(j)).sum / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum)
    var v = Array.fill(d)(1.0)
    (1 to 6).foreach { _ =>
      val w  = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val nw = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nw)
    }
    val g    = got.map(_._2.toDouble)
    val gn   = math.sqrt(g.map(x => x * x).sum)
    val cosv = math.abs(g.zip(v).map { case (a, b) => a * b }.sum / gn)
    assert(cosv > 0.999, s"integer direction diverged from double power iteration: |cos| = $cosv")
  }

  test("q155 projections onto the learned direction carry more variance than any axis") {
    val proj = SparkEntry.queries("q155_pca_project")(spark, dir)
      .select(col("proj")).as[Double].collect()
    def variance(xs: Array[Double]) = {
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    // v3 has max-component 2^20, i.e. norm ≥ 2^20 — scale-compare against
    // raw axes through the same 2^20-ish scaling is apples-to-oranges, so
    // compare against the projection onto a unit AXIS direction instead:
    // normalize v3 to unit length and recompute the axis variance bound
    val v = SparkEntry.queries("q154_pca_power")(spark, dir)
      .select(col("v")).as[Long].collect().map(_.toDouble)
    val vn = math.sqrt(v.map(x => x * x).sum)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("embedding")).as[Seq[Float]].collect().map(_.map(_.toDouble).toArray)
    val unitProjVar = variance(vecs.map(x => x.zip(v).map { case (a, b) => a * b }.sum / vn))
    val axisVars = (0 until 64).map(j => variance(vecs.map(_(j))))
    assert(unitProjVar >= axisVars.max,
      s"principal direction variance $unitProjVar below best axis ${axisVars.max}")
    assert(proj.length == vecs.length)
  }
}
