package graft

import java.security.MessageDigest

import graft.ops.PipelineQueries
import graft.tables.Tables
import org.apache.spark.sql.functions.col

/** Brute-force driver-side oracles for the training-mix assembly operators
  * (sf0.001) — independent plain-Scala recomputation, catching semantic
  * drift both SQL engines could agree on. */
class PipelineQueriesSpec extends SparkSpec {

  private lazy val corpus: Seq[(Long, String, String, Array[String])] =
    Tables(spark, sf).documents.select("doc_id", "lang", "source", "text")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ", -1)))

  private def md5mod1000(s: String): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(12), 16) % 1000
  }

  private def shingles(w: Array[String], n: Int): Set[String] =
    if (w.length < n) Set.empty
    else w.sliding(n).map(_.mkString(" ")).toSet

  test("decontaminate = per-train-doc count of distinct 8-grams shared with eval") {
    val n = PipelineQueries.DecontamN
    val eval = corpus.filter(_._3 == PipelineQueries.EvalSource)
      .flatMap(d => shingles(d._4, n)).toSet
    val want = corpus.filter(_._3 != PipelineQueries.EvalSource)
      .map(d => d._1 -> shingles(d._4, n).count(eval))
      .filter(_._2 > 0).toMap
    val got = PipelineQueries.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    got shouldBe want
  }

  test("domain mix keeps exactly the docs whose md5-hash permille is under the lang rate") {
    val rates = PipelineQueries.MixPermille.toMap
    val want = corpus.filter { case (id, lang, _, _) =>
      md5mod1000(id.toString) <
        rates.getOrElse(lang, PipelineQueries.MixDefaultPermille)
    }.map(d => (d._1, d._2, d._3))
    val got = PipelineQueries.domainMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    got shouldBe want.sortBy(_._1)
  }

  test("token packing = concat-and-cut manifest per lang in doc_id order") {
    val budget = PipelineQueries.PackBudget
    val want = corpus.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (_, _, _, w) =>
        val seq = cum / budget
        cum += w.length
        (lang, seq, w.length.toLong)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((lang, seq), xs) =>
      (lang, seq, xs.size.toLong, xs.map(_._3).sum)
    }.toSet
    val got = PipelineQueries.tokenPacking(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    got shouldBe want
  }

  test("repetition stats match per-doc token frequency recomputation") {
    val want = corpus.map { case (id, _, _, w) =>
      val counts = w.groupBy(identity).map(_._2.length)
      id -> (w.length.toLong, counts.size.toLong, counts.max.toLong)
    }.toMap
    val got = PipelineQueries.repetitionStats(spark, sf).collect()
    got.length shouldBe want.size
    got.foreach { r =>
      val (n, d, top) = want(r.getLong(0))
      r.getLong(1) shouldBe n
      r.getLong(2) shouldBe d
      r.getLong(3) shouldBe top
      r.getDouble(4) shouldBe (1.0 - d.toDouble / n) +- 1e-6
      r.getDouble(5) shouldBe (top.toDouble / n) +- 1e-6
    }
  }

  test("decontamination probe broadcasts the eval shingle set (no corpus shuffle join)") {
    val p = plan(PipelineQueries.decontaminate(spark, sf))
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("dup-span census = per-doc count of distinct spans shared with ANOTHER doc") {
    val n = PipelineQueries.DupSpanN
    val perDoc = corpus.map(d => d._1 -> shingles(d._4, n)).filter(_._2.nonEmpty)
    val docFreq = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val want = perDoc.map { case (id, sh) =>
      id -> ((sh.size.toLong, sh.count(docFreq(_) > 1).toLong))
    }.toMap
    val got = PipelineQueries.dupSpanCensus(spark, sf).collect()
    got.map(_.getLong(0)).toSet shouldBe want.keySet
    got.foreach { r =>
      val (nSpans, nDup) = want(r.getLong(0))
      r.getLong(1) shouldBe nSpans
      r.getLong(2) shouldBe nDup
      r.getDouble(3) shouldBe (nDup.toDouble / nSpans) +- 1e-6
    }
    // the corpus's injected near-dup docs must actually register
    assert(got.map(_.getLong(2)).sum > 0, "no duplicated spans found — census is vacuous")
  }

  test("dup-span census honors the span width argument (n = 16)") {
    val perDoc = corpus.map(d => d._1 -> shingles(d._4, 16)).filter(_._2.nonEmpty)
    val docFreq = perDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val want = perDoc.map { case (id, sh) =>
      id -> ((sh.size.toLong, sh.count(docFreq(_) > 1).toLong))
    }.toMap
    val got = PipelineQueries.dupSpanCensus(spark, sf, n = 16).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got shouldBe want
  }

  test("source overlap = pairwise shingle-set intersection with exact jaccard") {
    val n = PipelineQueries.OverlapN
    val bySource: Map[String, Set[String]] = corpus.groupBy(_._3)
      .map { case (s, docs) => s -> docs.flatMap(d => shingles(d._4, n)).toSet }
    val want = (for {
      a <- bySource.keys; b <- bySource.keys if a < b
      shared = (bySource(a) & bySource(b)).size.toLong if shared > 0
    } yield (a, b) -> ((shared,
      BigDecimal(shared.toDouble /
          (bySource(a).size + bySource(b).size - shared))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    val got = PipelineQueries.sourceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe want
  }

  test("drift PSI matches a driver-side recomputation and is non-negative") {
    val lens = Tables(spark, sf).documents.select("source", "n_chars")
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val bins = PipelineQueries.PsiBins
    def bin(c: Long) = math.min(c / PipelineQueries.PsiBinWidth, bins - 1L)
    val corpusBins = lens.groupBy(l => bin(l._2)).view.mapValues(_.size.toLong).toMap
    val nt = lens.size.toDouble
    val want = lens.groupBy(_._1).map { case (src, ls) =>
      val cbs = ls.groupBy(l => bin(l._2)).view.mapValues(_.size.toLong).toMap
      val nsrc = ls.size.toDouble
      val psi = (0L until bins.toLong).map { b =>
        val p = (cbs.getOrElse(b, 0L) + 0.5) / (nsrc + 5.0)
        val q = (corpusBins.getOrElse(b, 0L) + 0.5) / (nt + 5.0)
        (p - q) * math.log(p / q)
      }.sum
      src -> ((ls.size.toLong, psi))
    }
    val got = PipelineQueries.driftPsi(spark, sf).collect()
    got.map(_.getString(0)).toSet shouldBe want.keySet
    got.foreach { r =>
      val (nDocs, psi) = want(r.getString(0))
      r.getLong(1) shouldBe nDocs
      r.getDouble(2) shouldBe psi +- 1e-6
      r.getDouble(2) should be >= 0.0
    }
  }

  test("weighted sample ≡ driver-side sequential-Poisson recompute; " +
      "deterministic across runs") {
    import java.security.MessageDigest
    def u(docId: Long): Double = {
      val md = MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      (java.lang.Long.parseLong(md, 16).toDouble + 0.5) /
        PipelineQueries.SampleHashSpace
    }
    val want = Tables(spark, sf).documents
      .select(col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getLong(0), u(r.getLong(0)) / r.getLong(1)))
      .sortBy { case (id, p) => (p, id) }
      .take(PipelineQueries.WeightedSampleK)
      .map(_._1)
    val got = PipelineQueries.weightedSample(spark, sf).collect()
      .map(_.getLong(0))
    got.toSeq shouldBe want.toSeq
    // re-run selects the identical sample (hash-derived, no RNG state)
    PipelineQueries.weightedSample(spark, sf).collect()
      .map(_.getLong(0)).toSeq shouldBe got.toSeq
  }

  test("passage dedup = cross-doc census of non-overlapping 20-word windows") {
    import graft.ops.DedupQueries
    val w = DedupQueries.PassageW
    val perDoc = corpus.map { case (id, _, _, ws) =>
      id -> ws.grouped(w).filter(_.length == w).map(_.mkString(" ")).toVector
    }.filter(_._2.nonEmpty)
    val docsOf = perDoc.flatMap { case (id, ps) => ps.map(_ -> id) }
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).distinct.size }
    val want = perDoc.map { case (id, ps) =>
      val dup = ps.count(p => docsOf(p) >= 2)
      (id, ps.size.toLong, dup.toLong)
    }.sortBy(_._1)
    val got = DedupQueries.passageDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.toSeq shouldBe want
    // short docs (< one passage) are absent, never fabricated
    // (Spark's sequence(1, 0) is descending, not empty — regression guard)
    val shortIds = corpus.filter(_._4.length < w).map(_._1).toSet
    got.map(_._1).toSet.intersect(shortIds) shouldBe Set.empty
  }

  test("epoch plan: repeats = floor(epochs) + hash-permille Bernoulli; eval excluded") {
    val rates = PipelineQueries.EpochPermille.toMap
    val want = corpus.filter(_._3 != PipelineQueries.EvalSource)
      .map { case (id, _, src, ws) =>
        val r = rates.getOrElse(src, PipelineQueries.EpochDefaultPermille)
        val rep = r / 1000 + (if (md5mod1000(id.toString + ":ep") < r % 1000) 1 else 0)
        (id, src, ws.length.toLong, rep.toLong, rep.toLong * ws.length)
      }.sortBy(_._1)
    val got = PipelineQueries.epochPlan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    got.toSeq shouldBe want
    // a zeroed source plans zero repeats for every doc
    got.filter(_._2 == "src4").foreach(_._4 shouldBe 0L)
  }

  test("JS divergence matches driver-side recompute; bounded by ln 2") {
    val bySrc = corpus.groupBy(_._3).map { case (s, ds) =>
      s -> ds.flatMap(_._4).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val vocabCounts = bySrc.values.flatten
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
    val nt = vocabCounts.values.sum.toDouble
    val want = bySrc.map { case (s, cs) =>
      val n = cs.values.sum.toDouble
      val js = vocabCounts.toSeq.map { case (t, cc) =>
        val p = cs.getOrElse(t, 0L) / n
        val q = cc / nt
        0.5 * ((if (p > 0) p * math.log(2 * p / (p + q)) else 0.0) +
          q * math.log(2 * q / (p + q)))
      }.sum
      s -> ((n.toLong, js))
    }
    val got = PipelineQueries.jsDivergence(spark, sf).collect()
    got.map(_.getString(0)).toSet shouldBe want.keySet
    got.foreach { r =>
      val (nTok, js) = want(r.getString(0))
      r.getLong(1) shouldBe nTok
      r.getDouble(2) shouldBe js +- 1e-6
      r.getDouble(2) should be >= 0.0
      r.getDouble(2) should be <= math.log(2.0) + 1e-9
    }
  }
}
