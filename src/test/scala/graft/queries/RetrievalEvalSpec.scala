package graft.queries

import graft.SparkEntry
import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 retrieval/eval operators: RRF hybrid fusion (q159), batch
  * perceptron (q160), exact AUC (q161), source overlap matrix (q162),
  * int8 recall audit (q163), stride-schedule curriculum (q164). The
  * DuckDB oracles prove cross-engine value parity; these specs pin the
  * semantic invariants the hash can't articulate — the rank-statistic
  * identity, fusion arithmetic, schedule proportionality, and training
  * dynamics.
  */
class RetrievalEvalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q161 histogram AUC equals the brute-force pairwise probability") {
    val got = SparkEntry.queries("q161_auc_quality")(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, np, nn, auc) =>
      assert(np > 0 && nn > 0 && auc >= 0.0 && auc <= 1.0)
    }
    // brute force on one source: AUC = P(s+ > s-) + P(s+ = s-)/2 over all
    // (pos, neg) pairs — the definition the rank statistic must reproduce
    val src = got.head._1
    val rows = Tables.documents(spark, dir)
      .filter(col("source") === src)
      .select(
        round(graft.functions.TextFunctions.qualityScore(col("text")) * 10000).cast("long"),
        (col("lang") === "en").cast("boolean"))
      .as[(Long, Boolean)].collect()
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val pairs = for { p <- pos; n <- neg } yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val brute = pairs.sum / (pos.length.toLong * neg.length)
    val reported = got.find(_._1 == src).get._4
    assert(math.abs(brute - reported) < 1e-6, s"$src: brute $brute vs reported $reported")
  }

  test("q164 stride schedule is a bijection with weight-ordered emission rates") {
    val rows = SparkEntry.queries("q164_curriculum_interleave")(spark, dir)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    val n = Tables.documents(spark, dir).count()
    assert(rows.map(_._1).toSeq == (1L to n), "positions are exactly 1..n")
    assert(rows.map(_._3).distinct.length == n.toInt, "every doc scheduled once")
    // proportionality: in the first half of the schedule, a weight-4
    // language must emit at least as many docs as any weight-1 language
    // (strides 1 vs 4 — virtual time alone decides until a lang runs dry)
    val half   = rows.take(rows.length / 2)
    val counts = half.groupBy(_._2).view.mapValues(_.size).toMap.withDefaultValue(0)
    assert(counts("en") >= counts("es") && counts("en") >= counts("zh"),
      s"weight-4 en must outpace weight-1 langs in any prefix: $counts")
    // virtual times are non-decreasing along the schedule
    rows.sliding(2).foreach {
      case Array((_, _, _, v1), (_, _, _, v2)) => assert(v1 <= v2)
      case _ =>
    }
  }

  test("q160 perceptron round 1 trains on every document and then separates") {
    val stats = SparkEntry.queries("q160_perceptron_lid")(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.length == 3)
    val n = Tables.documents(spark, dir).count()
    // w=0 ⇒ every margin 0 ⇒ sign(0) misclassifies all docs
    assert(stats.head._2 == n, s"round 1 must update on all $n docs: ${stats.head}")
    // after one update the weights are non-trivial and later rounds train
    // on strictly fewer documents than the blank round
    assert(stats.forall(_._3 > 0), s"non-zero weight mass each round: ${stats.toSeq}")
    assert(stats.tail.forall(_._2 < n), s"rounds 2+ misclassify fewer than all: ${stats.toSeq}")
  }

  test("q159 fused score is exactly the integer RRF of the per-modality ranks") {
    val rows = SparkEntry.queries("q159_rrf_fusion")(spark, dir)
      .select("query_id", "rnk", "rrf_q", "lex_rnk", "vec_rnk")
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(rows.nonEmpty)
    def contrib(r: Option[Long]): Long = r.map(x => 1048576L / (60L + x)).getOrElse(0L)
    rows.foreach { case (_, _, rrf, lex, vec) =>
      assert(rrf == contrib(lex) + contrib(vec), s"rrf_q must be the exact integer fusion")
      assert(lex.nonEmpty || vec.nonEmpty, "a fused doc must come from at least one list")
    }
    // within a query, displayed rank follows rrf_q descending
    rows.groupBy(_._1).values.foreach { qs =>
      val byRank = qs.sortBy(_._2).map(_._3)
      assert(byRank.sameElements(byRank.sortBy(-(_: Long))), "rank order = fused score order")
    }
  }

  test("q163 recall audit is per-query complete and bounded") {
    val rows = SparkEntry.queries("q163_int8_recall")(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 5, "one row per query vector")
    rows.foreach { case (_, k, hit, recall) =>
      assert(k == 5 && hit >= 0 && hit <= k)
      assert(math.abs(recall - hit.toDouble / k) < 1e-9)
    }
  }

  test("q165 fanout histogram mass reconstructs each table's row and key counts") {
    val rows = SparkEntry.queries("q165_key_skew")(spark, dir)
      .as[(String, Long, Long)].collect()
    val byRel = rows.groupBy(_._1)
    assert(byRel.keySet == Set("lineitem.l_orderkey", "events.user_id", "orders.o_custkey"))
    def massOf(rel: String): (Long, Long) = {
      val h = byRel(rel)
      (h.map(r => r._2 * r._3).sum, h.map(_._3).sum) // (Σ fanout·n_keys, Σ n_keys)
    }
    assert(massOf("lineitem.l_orderkey")._1 == Tables.lineitem(spark, dir).count())
    assert(massOf("events.user_id")._1 == Tables.events(spark, dir).count())
    assert(massOf("orders.o_custkey")._2 ==
      Tables.orders(spark, dir).select("o_custkey").distinct().count())
  }

  test("q166 flags exactly the buckets touched by the deterministic mutation") {
    val flagged = SparkEntry.queries("q166_bucket_diff")(spark, dir)
      .select("bucket").as[Long].collect().toSet
    // expected: the bucket of every deleted doc, plus every rewritten doc
    // whose rewrite actually changes the text (upper() is the identity on
    // caseless text — such a "mutation" is invisible by design)
    val touched = Tables.documents(spark, dir)
      .select(
        (col("doc_id") % 256).as("bucket"),
        col("text"),
        expr("CAST(conv(substr(md5(CAST(concat('del:', CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10) AS BIGINT)").as("hd"),
        expr("CAST(conv(substr(md5(CAST(concat('mut:', CAST(doc_id AS STRING)) AS BINARY)), 1, 4), 16, 10) AS BIGINT)").as("hm"))
      .filter(col("hd") < 1311 ||
        (col("hd") >= 1311 && col("hm") < 1311 && upper(col("text")) =!= col("text")))
      .select("bucket").as[Long].collect().toSet
    assert(flagged == touched, s"flagged $flagged vs touched $touched")
    assert(flagged.nonEmpty, "the 2% mutation must touch at least one bucket")
  }

  test("q167 k-fold assignment never splits a near-dup cluster across folds") {
    val rows = SparkEntry.queries("q167_kfold_by_cluster")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == Tables.documents(spark, dir).count())
    rows.foreach { case (_, _, fold) => assert(fold >= 0 && fold < 5) }
    // leakage safety: one fold per component representative
    rows.groupBy(_._2).values.foreach { cluster =>
      assert(cluster.map(_._3).distinct.length == 1, "cluster straddles folds")
    }
    // the hash balances folds: no fold is empty at this corpus size
    assert(rows.map(_._3).distinct.length == 5)
  }

  test("q168 batches are tight equal-cost packings within each length bucket") {
    val rows = SparkEntry.queries("q168_length_batching")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, _, n, _, slot) =>
      // bucket is the tight power-of-two pad: n ≤ bucket < 2n
      assert(n <= bucket && (bucket == 1 || bucket < 2 * n), s"loose bucket $bucket for n=$n")
      val slots = math.max(1L, 512L / bucket)
      assert(slot >= 0 && slot < slots)
    }
    // within a bucket, every batch except the last is exactly full
    rows.groupBy(_._1).foreach { case (bucket, docs) =>
      val slots    = math.max(1L, 512L / bucket)
      val byBatch  = docs.groupBy(_._4)
      val lastIdx  = byBatch.keys.max
      byBatch.foreach { case (b, ds) =>
        if (b < lastIdx) assert(ds.length == slots, s"bucket $bucket batch $b underfull")
        else assert(ds.length <= slots)
      }
    }
  }

  test("q169 nDCG is bounded by the histogram ideal and covers both rankers") {
    val rows = SparkEntry.queries("q169_ndcg")(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet == Set("bm25", "rrf"))
    assert(rows.length == 10, "5 queries x 2 rankers")
    val idcg = rows.head._4
    rows.foreach { case (_, _, dcg, i, ndcg) =>
      assert(i == idcg, "ideal DCG is ranker- and query-independent here")
      assert(dcg > 0 && dcg <= idcg, s"dcg $dcg vs ideal $idcg")
      assert(math.abs(ndcg - dcg.toDouble / idcg) < 1e-6)
    }
  }

  test("q170 MAD outlier flags match a direct robust-z recomputation") {
    val got = SparkEntry.queries("q170_mad_outliers")(spark, dir)
      .as[(String, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val values = Tables.events(spark, dir)
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def medianOf(xs: Array[Double]): Double = {
      val n = xs.length
      val m = if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
      math.rint(m * 1e4) / 1e4
    }
    got.foreach { case (et, (_, n, med, mad, nOut, ratio)) =>
      val xs = values(et)
      assert(n == xs.length)
      assert(med == medianOf(xs), s"$et median")
      val devs = xs.map(v => math.abs(v - med)).sorted
      assert(mad == medianOf(devs), s"$et mad")
      val thr = math.rint(4.4478 * mad * 1e4) / 1e4
      val expOut = devs.count(d => math.rint(d * 1e4) / 1e4 > thr).toLong
      assert(nOut == expOut, s"$et outliers: $nOut vs $expOut")
      assert(math.abs(ratio - nOut.toDouble / n) < 1e-6)
    }
  }

  test("q162 overlap matrix covers every source pair with consistent estimates") {
    val rows = SparkEntry.queries("q162_source_overlap")(spark, dir)
      .select("src_a", "src_b", "jaccard", "kmv_jaccard", "abs_err")
      .as[(String, String, Double, Double, Double)].collect()
    val nSrc = Tables.documents(spark, dir).select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    rows.foreach { case (a, b, j, kj, err) =>
      assert(a < b, "canonical pair orientation")
      assert(j >= 0.0 && j <= 1.0 && kj >= 0.0 && kj <= 1.0)
      assert(math.abs(err - math.abs(j - kj)) < 1e-6)
    }
  }
}
