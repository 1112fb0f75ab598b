package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.sql.Timestamp

/** RANDOMIZED adversary for the distribution-monitor family (the bar rule:
  * every new stateful streaming row gets an adversary seat): the crafted
  * CurationStreamSpec fixtures pin known corners of each reduction, but
  * the monitors' real failure surface is COMPOSITION — which windows close
  * together in a micro-batch, which categories appear where, how the
  * watermark jumps. This suite generates a seeded-random multi-window doc
  * feed (random sources, langs INCLUDING an out-of-baseline one, random
  * token texts), chops it into random micro-batches (cut only between
  * distinct instants so nothing is late at the 0-second watermark), runs
  * the FOUR unified monitors — [[CurationStream.multiDrift]] (KS +
  * quantiles + PSI), [[CurationStream.fullDrift]] (+ vocabulary KL),
  * [[CurationStream.miDrift]] (3-pair plug-in MI) and
  * [[CurationStream.allDrift]] (all five axes in one pass) — over the
  * SAME feed,
  * and asserts every emitted row equals a PLAIN-SCALA integer referee
  * computed from the full per-window multiset: the quantized KS / discrete
  * quantile / PSI / smoothed-KL / plug-in-MI formulas over Longs, no
  * DataFrames, no shared code with the operators beyond the md5 bucket
  * fold (which is pinned by its own referee assert below).
  *
  * The feed deliberately produces multi-window-close batches (the
  * watermark routinely jumps several windows between chunks) — the exact
  * composition that exposed the psiOf batch-wide-grid bug the r16 fix
  * closed; a fixture-honesty assert keeps that pressure in place.
  */
class DriftMonitorAdversarySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Windows = 30
  private val WinSec  = 60L
  private val Q20     = 1048576L

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  /** Checkpoint scratch registered for JVM-exit cleanup — repeated runs
    * must not leak RocksDB checkpoint trees into /tmp (the
    * CdcScdAdversarySpec pattern).
    */
  private def ckpt(tag: String): String = {
    val p = Files.createTempDirectory(tag)
    graft.sources.SessionMemo.deleteOnExit(p)
    p.toString
  }

  // ---- generated feed ----------------------------------------------------

  /** One doc: (sec, source, lang, text). zz is OUT of the lang baseline. */
  private case class Doc(sec: Long, source: String, lang: String, text: String)

  private val genWindowDocs: Gen[Seq[(Long, String, String, String)]] = for {
    nd   <- Gen.chooseNum(1, 8)
    docs <- Gen.listOfN(nd, for {
      off    <- Gen.chooseNum(0L, 59L)
      source <- Gen.oneOf("s1", "s2")
      lang   <- Gen.oneOf("en", "fr", "de", "zz")
      ntok   <- Gen.chooseNum(1, 4)
      toks   <- Gen.listOfN(ntok, Gen.oneOf("aa", "bb", "cccc", "dd", "e"))
    } yield (off, source, lang, toks.mkString(" ")))
  } yield docs

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private lazy val docs: Seq[Doc] =
    sample(genWindowDocs, Windows, seed = 0xD81F7L).zipWithIndex.flatMap { case (ds, w) =>
      ds.map { case (off, src, lang, text) => Doc(w * WinSec + off, src, lang, text) }
    }

  /** Baseline corpus (langs en/fr/de only — zz stays out-of-baseline). */
  private lazy val baseDocs: Seq[(String, String)] =
    sample(
      for {
        lang <- Gen.oneOf("en", "fr", "de")
        n    <- Gen.chooseNum(1, 4)
        toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cccc", "dd", "e"))
      } yield (lang, toks.mkString(" ")),
      20, seed = 0xBA5E16L)

  // ---- plain-Scala referees ----------------------------------------------

  private def tokensOf(text: String): Seq[String] =
    text.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** The 60-bit md5 fold (vocabBucket's contract), independent of Spark. */
  private def bucketOf(tok: String): Long = {
    val d   = java.security.MessageDigest.getInstance("MD5").digest(tok.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % CurationStream.VocabBuckets
  }

  private def round6(x: Double): Double =
    BigDecimal.valueOf(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Baseline length ECDF on the 2^20 grid: sorted (v, qb). */
  private lazy val lenBaseRef: Seq[(Long, Long)] = {
    val freq = baseDocs.groupBy(_._2.length.toLong).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val n    = freq.map(_._2).sum
    freq.scanLeft((0L, 0L)) { case ((_, c), (v, f)) => (v, c + f) }.drop(1)
      .map { case (v, c) => (v, c * Q20 / n) }
  }

  private def ksRef(lens: Seq[Long]): Long = {
    val wc   = lens.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val grid = (lenBaseRef.map(_._1) ++ wc.keys).distinct.sorted
    val nw   = lens.size.toLong
    var c    = 0L
    grid.map { v =>
      c += wc.getOrElse(v, 0L)
      val qb = lenBaseRef.filter(_._1 <= v).lastOption.map(_._2).getOrElse(0L)
      math.abs(c * Q20 / nw - qb)
    }.max
  }

  private def quantRef(lens: Seq[Long], p: Int): Long = {
    val sorted = lens.sorted
    val n      = sorted.size.toLong
    val byV    = sorted.groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    var c = 0L
    byV.collectFirst { case (v, f) if { c += f; c * 100 >= n * p } => v }.get
  }

  private lazy val (psiBaseCt, psiT, psiK) = {
    val ct = baseDocs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    (ct, ct.values.sum, ct.size.toLong)
  }

  private def psiRef(langs: Seq[String]): Double = {
    val wc = langs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nw = langs.size.toLong
    val sum = (psiBaseCt.keySet ++ wc.keySet).toSeq.sorted.map { l =>
      val psq = math.max((wc.getOrElse(l, 0L) + 1L) * Q20 / (nw + psiK), 1L)
      val pcq = math.max((psiBaseCt.getOrElse(l, 0L) + 1L) * Q20 / (psiT + psiK), 1L)
      (psq - pcq) * math.floor(math.log(psq.toDouble / pcq) * Q20.toDouble).toLong
    }.sum
    round6(sum.toDouble / 1099511627776.0)
  }

  private lazy val klBaseCt: Map[Long, Long] =
    baseDocs.flatMap(d => tokensOf(d._2)).map(bucketOf)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  private lazy val klT: Long = klBaseCt.values.sum

  private def klRef(toks: Seq[String]): (Long, Double) = {
    val B    = CurationStream.VocabBuckets.toDouble
    val wc   = toks.map(bucketOf).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tsum = toks.size.toLong
    val klq = wc.toSeq.map { case (b, cs) =>
      val ct = klBaseCt.getOrElse(b, 0L)
      val lr = math.floor(math.log(
        ((cs + 1.0) / (tsum + B)) / ((ct + 1.0) / (klT + B))) * Q20.toDouble).toLong
      cs * lr
    }.sum
    (tsum, round6(klq.toDouble / Q20.toDouble / tsum))
  }

  private def miRef(cells: Seq[(String, String)]): (Long, Double) = {
    val c  = cells.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cy = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n  = cells.size.toLong
    val sum = c.toSeq.map { case ((x, y), cc) =>
      val a = math.max(cc * Q20 / n, 1L)
      val b = math.max(cx(x) * Q20 / n, 1L) * math.max(cy(y) * Q20 / n, 1L)
      a * math.floor(math.log(a * Q20.toDouble / b) * Q20.toDouble).toLong
    }.sum
    (c.size.toLong, round6(sum.toDouble / 1099511627776.0))
  }

  // ---- harness -------------------------------------------------------------

  /** Random micro-batch chunking: cuts only between distinct instants. */
  private def chunks(rng: scala.util.Random): Seq[Seq[Doc]] = {
    val sorted   = docs.sortBy(_.sec)
    val instants = sorted.map(_.sec).distinct
    // a LOW cut probability gives fewer, bigger micro-batches — cheaper
    // to run AND stronger composition pressure (more windows close per
    // batch, the exact psiOf-bug shape)
    val cuts     = instants.drop(1).filter(_ => rng.nextDouble() < 0.12).toSet
    val out = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[Doc])
    sorted.foreach { d =>
      if (out.last.nonEmpty && cuts(d.sec) && out.last.last.sec < d.sec)
        out += scala.collection.mutable.ArrayBuffer.empty[Doc]
      out.last += d
    }
    out.filter(_.nonEmpty).map(c => rng.shuffle(c.toSeq)).toSeq :+
      Seq(Doc(1000000L, "__sentinel__", "xx", "x")) // closes every real window
  }

  /** Feed the chunks through a monitor; returns the emitted rows GROUPED
    * by the sink call that delivered them (so the test can assert that
    * multi-window-close batches really occurred).
    */
  private def runMonitor[R](
      op: org.apache.spark.sql.DataFrame => (org.apache.spark.sql.DataFrame => Unit) => org.apache.spark.sql.streaming.StreamingQuery,
      collect: org.apache.spark.sql.DataFrame => Seq[R],
      batches: Seq[Seq[Doc]]): Seq[Seq[R]] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String, String)]
    val out   = scala.collection.mutable.ArrayBuffer.empty[Seq[R]]
    val query = op(input.toDF().toDF("ts", "source", "lang", "text")) { batch =>
      val rows = collect(batch)
      if (rows.nonEmpty) out.synchronized { out += rows }
      ()
    }
    try batches.foreach { b =>
      input.addData(b.map(d => (t(d.sec), d.source, d.lang, d.text)): _*)
      query.processAllAvailable()
    } finally query.stop()
    out.toSeq
  }

  test("drift-monitor adversary: multiDrift / fullDrift / miDrift / allDrift == plain-Scala referees on a random multi-window feed") {
    // fixture honesty: the out-of-baseline lang must actually occur
    assert(docs.exists(_.lang == "zz"), "no out-of-baseline lang generated")
    val rng     = new scala.util.Random(0xD81F716L)
    val batches = chunks(rng)
    assert(batches.size >= 5, s"feed must be genuinely incremental, got ${batches.size} chunks")

    val lenBl = CurationStream.lengthBaseline(baseDocs.map(_._2).toDF("text"))
    val catBl = CurationStream.langBaseline(baseDocs.map(_._1).toDF("lang"))
    val vocBl = CurationStream.vocabBaseline(baseDocs.map(_._2).toDF("text"))
    // the md5-fold referee and the production bucket must agree (pins
    // bucketOf so the KL referee is trustworthy)
    val prodBuckets = Seq("aa", "bb", "cccc", "dd", "e").toDF("tok")
      .select(org.apache.spark.sql.functions.col("tok"),
        CurationStream.vocabBucket(org.apache.spark.sql.functions.col("tok")).as("b"))
      .as[(String, Long)].collect().toMap
    Seq("aa", "bb", "cccc", "dd", "e").foreach(tok =>
      assert(bucketOf(tok) == prodBuckets(tok), s"bucket fold referee diverges on $tok"))

    // per-(window, source) and per-window ground truth off the raw multiset
    val byWinSrc = docs.groupBy(d => (d.sec / WinSec * WinSec, d.source))
    val byWin    = docs.groupBy(d => d.sec / WinSec * WinSec)

    // ---- multiDrift ----
    val multiGroups = runMonitor[(Timestamp, String, Long, Long, Long, Long, Long, Double)](
      df => sink => CurationStream.multiDrift(df, lenBl, catBl, "60 seconds", "0 seconds",
        ckpt("graft-adv-md-ck"))(sink),
      b => b.select("window_start", "source", "n_docs", "ks_q20", "p50", "p90", "p99", "psi")
        .as[(Timestamp, String, Long, Long, Long, Long, Long, Double)].collect().toSeq,
      batches)
    val multi = multiGroups.flatten
    assert(multi.map(r => (r._1, r._2)).distinct.size == byWinSrc.size,
      s"multiDrift must emit every (window, source) once: ${multi.size} vs ${byWinSrc.size}")
    multi.foreach { case (ws, src, nDocs, ks, p50, p90, p99, psi) =>
      val ds   = byWinSrc((ws.getTime / 1000L, src))
      val lens = ds.map(_.text.length.toLong)
      assert(nDocs == ds.size.toLong, s"[$ws $src] n_docs")
      assert(ks == ksRef(lens), s"[$ws $src] ks: $ks vs ${ksRef(lens)}")
      assert((p50, p90, p99) == ((quantRef(lens, 50), quantRef(lens, 90), quantRef(lens, 99))),
        s"[$ws $src] quantiles")
      assert(psi == psiRef(ds.map(_.lang)), s"[$ws $src] psi: $psi vs ${psiRef(ds.map(_.lang))}")
    }

    // ---- fullDrift (adds the KL axis) ----
    val full = runMonitor[(Timestamp, String, Long, Long, Double, Long, Long, Long, Long, Double)](
      df => sink => CurationStream.fullDrift(df, vocBl, lenBl, catBl, "60 seconds", "0 seconds",
        ckpt("graft-adv-fd-ck"))(sink),
      b => b.select("window_start", "source", "n_docs", "n_tokens", "kl",
        "ks_q20", "p50", "p90", "p99", "psi")
        .as[(Timestamp, String, Long, Long, Double, Long, Long, Long, Long, Double)].collect().toSeq,
      batches).flatten
    assert(full.map(r => (r._1, r._2)).distinct.size == byWinSrc.size)
    full.foreach { case (ws, src, nDocs, nTok, kl, ks, p50, p90, p99, psi) =>
      val ds   = byWinSrc((ws.getTime / 1000L, src))
      val lens = ds.map(_.text.length.toLong)
      val (refTok, refKl) = klRef(ds.flatMap(d => tokensOf(d.text)))
      assert(nDocs == ds.size.toLong && nTok == refTok, s"[$ws $src] totals")
      assert(kl == refKl, s"[$ws $src] kl: $kl vs $refKl")
      assert(ks == ksRef(lens) && psi == psiRef(ds.map(_.lang)), s"[$ws $src] ks/psi")
      assert((p50, p90, p99) == ((quantRef(lens, 50), quantRef(lens, 90), quantRef(lens, 99))))
    }

    // ---- miDrift (per-window, three axis pairs) ----
    val mi = runMonitor[(Timestamp, String, Long, Double)](
      df => sink => CurationStream.miDrift(df, "60 seconds", "0 seconds",
        ckpt("graft-adv-mi-ck"))(sink),
      b => b.select("window_start", "pair", "n_cells", "mi")
        .as[(Timestamp, String, Long, Double)].collect().toSeq,
      batches).flatten
    assert(mi.map(_._1).distinct.size == byWin.size,
      s"miDrift must emit every window: ${mi.map(_._1).distinct.size} vs ${byWin.size}")
    mi.foreach { case (ws, pair, nCells, got) =>
      val ds = byWin(ws.getTime / 1000L)
      def lm(d: Doc) = d.text.length.toString.length.toString
      val cells = pair match {
        case "lang_lenmag"   => ds.map(d => (d.lang, lm(d)))
        case "lang_source"   => ds.map(d => (d.lang, d.source))
        case "source_lenmag" => ds.map(d => (d.source, lm(d)))
      }
      val (refCells, refMi) = miRef(cells)
      assert(nCells == refCells && got == refMi, s"[$ws $pair] mi: ($nCells, $got) vs ($refCells, $refMi)")
    }

    // ---- allDrift (the GRAND monitor: q217's four axes + q218's pairs
    // in ONE stateful pass — every emission re-refereed independently) ----
    val all = runMonitor[(String, Timestamp, String, Option[Long], Option[Long], Option[Double],
        Option[Long], Option[Long], Option[Long], Option[Long], Option[Double],
        Option[Long], Option[Double])](
      df => sink => CurationStream.allDrift(df, vocBl, lenBl, catBl, "60 seconds", "0 seconds",
        ckpt("graft-adv-ad-ck"))(sink),
      b => b.select("kind", "window_start", "series", "n_docs", "n_tokens", "kl",
        "ks_q20", "p50", "p90", "p99", "psi", "n_cells", "mi")
        .as[(String, Timestamp, String, Option[Long], Option[Long], Option[Double],
          Option[Long], Option[Long], Option[Long], Option[Long], Option[Double],
          Option[Long], Option[Double])].collect().toSeq,
      batches).flatten
    val allSrc  = all.filter(_._1 == "source")
    val allPair = all.filter(_._1 == "pair")
    assert(allSrc.map(r => (r._2, r._3)).distinct.size == byWinSrc.size,
      s"allDrift must emit every (window, source) once: ${allSrc.size} vs ${byWinSrc.size}")
    assert(allPair.map(_._2).distinct.size == byWin.size,
      s"allDrift must emit every window's pairs: ${allPair.map(_._2).distinct.size} vs ${byWin.size}")
    allSrc.foreach { case (_, ws, src, nDocs, nTok, kl, ks, p50, p90, p99, psi, nc, mi) =>
      val ds   = byWinSrc((ws.getTime / 1000L, src))
      val lens = ds.map(_.text.length.toLong)
      val (refTok, refKl) = klRef(ds.flatMap(d => tokensOf(d.text)))
      assert(nc.isEmpty && mi.isEmpty, s"[$ws $src] source row must carry NULL MI columns")
      assert(nDocs.contains(ds.size.toLong) && nTok.contains(refTok), s"[$ws $src] totals")
      assert(kl.contains(refKl) && ks.contains(ksRef(lens)) &&
        psi.contains(psiRef(ds.map(_.lang))), s"[$ws $src] kl/ks/psi")
      assert((p50.get, p90.get, p99.get) ==
        ((quantRef(lens, 50), quantRef(lens, 90), quantRef(lens, 99))), s"[$ws $src] quantiles")
    }
    allPair.foreach { case (_, ws, pair, nDocs, _, _, _, _, _, _, _, nCells, got) =>
      val ds = byWin(ws.getTime / 1000L)
      def lm(d: Doc) = d.text.length.toString.length.toString
      val cells = pair match {
        case "lang_lenmag"   => ds.map(d => (d.lang, lm(d)))
        case "lang_source"   => ds.map(d => (d.lang, d.source))
        case "source_lenmag" => ds.map(d => (d.source, lm(d)))
      }
      val (refCells, refMi) = miRef(cells)
      assert(nDocs.isEmpty, s"[$ws $pair] pair row must carry NULL source-family columns")
      assert(nCells.contains(refCells) && got.contains(refMi),
        s"[$ws $pair] mi: ($nCells, $got) vs ($refCells, $refMi)")
    }

    // composition pressure really happened: at least one sink delivery
    // carried rows for ≥2 DISTINCT windows (the exact shape that exposed
    // the psiOf batch-wide-grid bug), and every window closed
    assert(multiGroups.exists(g => g.map(_._1).distinct.size >= 2),
      "no multi-window-close batch occurred — the adversary lost its composition pressure")
    val winStarts = multi.map(_._1.getTime / 1000L).distinct
    assert(winStarts.size == Windows, s"all $Windows windows must close, got ${winStarts.size}")
  }
}
