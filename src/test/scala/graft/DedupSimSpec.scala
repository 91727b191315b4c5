package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sim}

/** Equivalence/recall checks for the approximate dedup + ANN operators —
  * the guarantees the DuckDB oracle can't express (SURVEY.md §5.4).
  */
class DedupSimSpec extends SparkSuite {

  private def pairSet(df: org.apache.spark.sql.DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(col(a), col(b)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("d14 substring-span dedup matches an independent in-memory brute force") {
    // The distributed geometry (hash-keyed gram shuffle + windowed
    // interval merge) against a from-scratch naive implementation on the
    // collected corpus: string grams in a hash map, then a sequential
    // interval sweep — different data structures, same published
    // semantics (union of duplicated >= L-token spans, merged maximal).
    val L = Dedup.SubstrL
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = scala.collection.mutable.Map.empty[String, Int]
    val grams = docs.map { case (id, t) =>
      val ws = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      val gs = (0 to ws.length - L).map(i => ws.slice(i, i + L).mkString(" "))
      gs.foreach(g => counts(g) = counts.getOrElse(g, 0) + 1)
      (id, ws.length.toLong, gs)
    }
    val expected = grams.map { case (id, n, gs) =>
      val hits = gs.zipWithIndex.collect { case (g, p) if counts(g) >= 2 => p }
      var spans = 0L; var covered = 0L; var end = Int.MinValue
      for (p <- hits) { // sequential sweep over sorted positions
        if (p > end) spans += 1
        covered += math.min(L, math.max(0, p + L - math.max(p, end + 1)))
        end = math.max(end, p + L - 1)
      }
      (id, (n, spans, covered, if (n > 0) covered * 1000000 / n else 0L))
    }.toMap
    val got = Dedup.queries("d14_substr_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === expected.keySet, "every document must appear exactly once")
    val diffs = expected.collect { case (id, e) if got(id) != e => s"$id: got ${got(id)} want $e" }
    assert(diffs.isEmpty, s"span geometry diverged:\n${diffs.mkString("\n")}")
    // the fixture genuinely exercises the operator: both classes present,
    // and every span obeys the >= L-token floor
    assert(got.values.exists(_._3 > 0) && got.values.exists(_._3 == 0))
    assert(got.values.forall { case (n, spans, cov, _) => cov <= n && cov >= L * spans })
  }

  test("d15 cut output reconciles with d14's span accounting, doc by doc") {
    // Two independent pipelines over the same duplicated-gram hits: d14
    // counts covered tokens through a window interval-union, d15 actually
    // cuts and rejoins. For every document: kept = n_tokens - dup_tokens,
    // the cleaned text has exactly kept tokens, and span-free documents
    // round-trip byte-identical to lower(text).
    import org.apache.spark.sql.functions.{col, lower}
    val stats = Dedup.queries("d14_substr_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap // n_tokens, dup_tokens
    val cut = Dedup.queries("d15_substr_cut")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val original = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text"))).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(cut.keySet === stats.keySet)
    for ((id, (nTok, dupTok)) <- stats) {
      val (nKept, text) = cut(id)
      assert(nKept === nTok - dupTok, s"doc $id: kept $nKept != $nTok - $dupTok")
      assert(text.split(" ", -1).count(_ => true).toLong ===
        (if (nKept == 0) 1L else nKept), s"doc $id: token count drifted")
      if (dupTok == 0) assert(text === original(id), s"doc $id must round-trip")
      else assert(text !== original(id), s"doc $id had $dupTok cut tokens")
    }
    assert(stats.values.exists(_._2 > 0), "fixture must exercise real cuts")
  }

  test("d19 line-level boilerplate dedup matches an in-memory brute force") {
    // The distributed pass (md5-fold frequency shuffle + doc regroup)
    // against the obvious definition on the collected corpus: chunk every
    // doc into LineW-word lines, count DISTINCT docs per line string,
    // remove lines at >= LineDupK everywhere, rejoin in order.
    val W = Dedup.LineW
    val K = Dedup.LineDupK
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def chunks(t: String): Seq[String] =
      t.toLowerCase(java.util.Locale.ROOT).split(" ", -1).grouped(W)
        .map(_.mkString(" ")).toSeq
    val docsPerLine = docs.flatMap { case (id, t) => chunks(t).distinct.map((_, id)) }
      .groupBy(_._1).map { case (l, xs) => (l, xs.length) }
    val expected = docs.map { case (id, t) =>
      val ls = chunks(t)
      val kept = ls.filter(docsPerLine(_) < K)
      (id, (ls.length.toLong, (ls.length - kept.length).toLong, kept.mkString(" ")))
    }.toMap
    val got = Dedup.queries("d19_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(got.keySet === expected.keySet, "every document must appear exactly once")
    val diffs = expected.collect { case (id, e) if got(id) != e => s"$id: got ${got(id)} want $e" }
    assert(diffs.isEmpty, s"line dedup diverged:\n${diffs.mkString("\n")}")
    // fixture exercises both classes; untouched docs round-trip to
    // lower(text) byte-for-byte (chunks partition the word array)
    assert(got.values.exists(_._2 > 0) && got.values.exists(_._2 == 0))
    val untouched = docs.toMap
    for ((id, (_, removed, text)) <- got if removed == 0)
      assert(text === untouched(id).toLowerCase(java.util.Locale.ROOT))
    // ppm column is the integer DIV of the two counts it rides with
    val ppm = Dedup.queries("d19_line_dedup")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ppm.forall { case (n, rm, p) => p === rm * 1000000L / n })
  }

  test("d20 soft-dedup weights are exactly 1e6 DIV d6 cluster size") {
    val clusters = graft.ops.Dedup.queries("d6_neardup_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val size = clusters.groupBy(_._2).map { case (c, xs) => (c, xs.length.toLong) }
    val got = graft.ops.Dedup.queries("d20_soft_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === clusters.map(_._1).toSet, "every doc keeps a weight")
    for ((id, c) <- clusters) {
      val (gc, n, w) = got(id)
      assert(gc === c && n === size(c) && w === 1000000L / n, s"doc $id")
    }
    // singletons keep full weight; real clusters are down-weighted, and a
    // cluster's total weight never exceeds one document's
    assert(got.values.exists { case (_, n, w) => n == 1 && w == 1000000L })
    assert(got.values.exists { case (_, n, w) => n > 1 && w < 1000000L })
    for ((c, n) <- size) assert(n * (1000000L / n) <= 1000000L)
  }

  test("cutSpans kernel: interior, boundary, adjacent and full-cover spans") {
    import Dedup.{cutSpans, SubstrSpan}
    val t = "a b c d e f"
    assert(cutSpans(t, Nil) === ((6L, t)))
    assert(cutSpans(t, Seq(SubstrSpan(1, 2))) === ((4L, "a d e f")))
    assert(cutSpans(t, Seq(SubstrSpan(0, 0), SubstrSpan(5, 5))) === ((4L, "b c d e")))
    assert(cutSpans(t, Seq(SubstrSpan(0, 5))) === ((0L, "")))
    assert(cutSpans(t, Seq(SubstrSpan(0, 1), SubstrSpan(2, 3))) === ((2L, "e f")))
    // span end past the last token is harmless (merged span e = p+L-1
    // can overrun short docs)
    assert(cutSpans(t, Seq(SubstrSpan(4, 99))) === ((4L, "a b c d")))
    // empty tokens from double spaces survive like split(" ", -1)
    assert(cutSpans("a  b", Seq(SubstrSpan(0, 0))) === ((2L, " b")))
  }

  test("cutSpans ≡ naive position filter over generated texts and span sets") {
    // Property check of the two-pointer kernel against the obvious O(n·m)
    // definition: keep token i iff no span contains i. Seeded generation:
    // random token counts (incl. 0-token and empty-token cases), random
    // non-overlapping sorted span sets (the operator's input contract —
    // spans come merged from the window), span ends allowed past the text.
    import Dedup.{cutSpans, SubstrSpan}
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(40)
      val toks = Seq.fill(n)(if (rnd.nextInt(10) == 0) "" else s"w${rnd.nextInt(9)}")
      val text = toks.mkString(" ")
      val nTok = text.split(" ", -1).length // n==0 still splits to [""]
      var spans = Vector.empty[SubstrSpan]
      var cursor = 0L
      while (cursor < nTok + 5 && rnd.nextInt(3) > 0) {
        val s0 = cursor + rnd.nextInt(4)
        val e0 = s0 + rnd.nextInt(6)
        spans :+= SubstrSpan(s0, e0)
        cursor = e0 + 2 // keep spans disjoint and non-adjacent-merged
      }
      val keptNaive = text.split(" ", -1).zipWithIndex
        .filterNot { case (_, i) => spans.exists(sp => sp.s <= i && i <= sp.e) }
        .map(_._1)
      val (nKept, cutText) = cutSpans(text, spans)
      assert(nKept === keptNaive.length.toLong, s"count drift: '$text' $spans")
      assert(cutText === keptNaive.mkString(" "), s"text drift: '$text' $spans")
    }
  }

  test("gramPosHashSeq keeps every occurrence at its position (d14 kernel)") {
    val h = Dedup.gramPosHashSeq("a b a b a", 2)
    assert(h.length === 4) // starts 0..3
    assert(h(0) === h(2) && h(1) === h(3), "repeated grams must repeat")
    assert(h(0) !== h(1))
    assert(Dedup.gramPosHashSeq("a b", 3).isEmpty, "short text has no grams")
  }

  test("tiled cosine pairs equal the single-tile result for any tiling") {
    // The bounded-memory tiling must be a pure execution-strategy change:
    // identical pair set and identical (sequential-double, round4) scores
    // for every tile count, including ones that split unevenly.
    import graft.ops.VecOps
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    val single = VecOps.cosinePairs(spark, emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(single.nonEmpty)
    for (tiles <- Seq(2, 3, 7)) {
      val tiled = VecOps.cosinePairsTiled(spark, emb, "vec_id", "embedding", 0.3, tiles)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(tiled === single, s"tiling with $tiles tiles changed the result")
    }
  }

  test("shuffled cosine kernel is bit-equal to the broadcast-tile kernel") {
    // The driver-bypass form (pair-block shuffle join, no collect/broadcast)
    // must be a pure execution-strategy change: same pair set, same
    // sequential-double round4 scores, for 1 and several tile counts.
    import graft.ops.VecOps
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    val bcast = VecOps.cosinePairs(spark, emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bcast.nonEmpty)
    for (tiles <- Seq(1, 3, 5)) {
      val shuffled = VecOps.cosinePairsShuffled(spark, emb, "vec_id", "embedding", 0.3, tiles)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(shuffled === bcast, s"shuffled kernel with $tiles tiles changed the result")
    }
  }

  test("exact-kernel dispatcher: stats-driven crossover, both sides bit-equal") {
    // The d5/d9 crossover as code (SURVEY §2.7): chooseExactKernel picks
    // broadcast tiles while a tile fits the budget in few rescans and the
    // cogroup shuffle past that — pure function of (rows, dim, budget),
    // pinned here on synthetic sizes spanning the crossover; then both
    // dispatch paths of exactCosinePairs must return the identical pair
    // set (the kernels are bit-equal, so dispatch is invisible).
    import graft.ops.VecOps
    import graft.ops.VecOps.{BroadcastTiles, ShuffledTiles}
    // fits in one tile → plain broadcast
    assert(VecOps.chooseExactKernel(1000, 64, 1L << 20) === BroadcastTiles(1))
    // a few tiles → still broadcast (rescans cheap), tile sized to budget
    assert(VecOps.chooseExactKernel(10000, 64, 1L << 20) === BroadcastTiles(3))
    // past MaxBroadcastTiles rescans → cogroup shuffle, budget-sized tiles
    VecOps.chooseExactKernel(1000000, 64, 1L << 20) match {
      case ShuffledTiles(t) => assert(t === 290) // 1e6·304B / 1MiB, ceil
      case other => fail(s"expected the shuffled kernel, got $other")
    }
    // degenerate inputs degrade to the single-tile broadcast, never refuse
    assert(VecOps.chooseExactKernel(0, 0, 1L << 20) === BroadcastTiles(1))
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    def run(budget: Long) =
      VecOps.exactCosinePairs(spark, emb, "vec_id", "embedding", 0.3, budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaBroadcast = run(Long.MaxValue)   // 1 tile, broadcast path
    val viaShuffle = run(10000)             // tiny budget forces ShuffledTiles
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle === viaBroadcast, "dispatch changed the result")
  }

  test("cell-pruned cosine pairs = the exact pairs restricted to same-cell (subset, exact scores)") {
    // The SemDeDup pruning contract: every emitted pair is an exact-kernel
    // pair whose endpoints share a nearest-centroid cell, and every
    // same-cell exact pair is emitted — no more, no less, with the same
    // round4 scores. (The oracle replays this in SQL; here we pin the
    // Scala kernel against an independent recomputation.)
    import graft.ops.{AnnIndex, VecOps}
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    val celled = VecOps.cellCosinePairs(spark, emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = VecOps.cosinePairs(spark, emb, "vec_id", "embedding", 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(celled.subsetOf(exact), "cell pruning emitted a non-exact pair")
    val vecs = VecOps.vectors(spark, emb, "vec_id", "embedding")
    val cents = VecOps.trainedCentroids(spark, emb, "vec_id", "embedding",
      VecOps.sqrtCells(vecs.length.toLong))
    val cellOf = vecs.map(v => v.id -> AnnIndex.nearestCell(v.emb, cents)).toMap
    val expected = exact.filter { case (a, b, _) => cellOf(a) == cellOf(b) }
    assert(celled === expected, "cell pruning disagrees with nearest-cell restriction")
    assert(celled.nonEmpty, "threshold 0.3 should yield same-cell pairs at this sf")
  }

  test("cell-probed band top-1 = brute-force top-1 over the probed candidate set") {
    // pair2's mined-negatives contract: for each anchor, the kernel's
    // answer equals an independent driver-side recomputation — score all
    // members of the anchor's 4 nearest cells, band-filter on round4,
    // rank by (cos desc, id asc) — and anchors whose probed cells hold
    // no band candidate are absent.
    import graft.ops.{AnnIndex, VecOps}
    val emb = graft.tables.Tables.table(spark, sf, "embeddings")
    val got = VecOps.cellBandTop1(spark, emb, "vec_id", "embedding", 0.15, 0.45, 4)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val vecs = VecOps.vectors(spark, emb, "vec_id", "embedding").sortBy(_.id)
    val cents = VecOps.trainedCentroids(spark, emb, "vec_id", "embedding",
      VecOps.sqrtCells(vecs.length.toLong))
    val cellOf = vecs.map(v => v.id -> AnnIndex.nearestCell(v.emb, cents)).toMap
    def probesOf(v: graft.ops.VecOps.Vec): Set[Long] =
      cents.map(c => (c.id, VecOps.dotD(v.emb, c.emb) / (v.norm * c.norm)))
        .sortBy { case (id, c) => (-c, id) }.take(4).map(_._1).toSet
    val expected = vecs.flatMap { a =>
      val probed = probesOf(a)
      val best = vecs.iterator
        .filter(m => m.id != a.id && probed(cellOf(m.id)))
        .map(m => (m.id, VecOps.round4(VecOps.dotD(a.emb, m.emb) / (a.norm * m.norm))))
        .filter { case (_, c) => c >= 0.15 && c < 0.45 }
        .toSeq.sortBy { case (id, c) => (-c, id) }.headOption
      best.map(b => a.id -> b)
    }.toMap
    assert(got === expected)
    assert(got.nonEmpty)
    got.values.foreach { case (_, c) => assert(c >= 0.15 && c < 0.45) }
  }

  test("MinHash-LSH ≡ exact Jaccard on generated corpora (property)") {
    // Soundness beyond the fixed testdata: deterministic LCG-generated
    // corpora with planted near-dup pairs at varying mutation rates. The
    // operators take (session, dir) so the corpus goes through a temp
    // parquet dir exactly like production input.
    import graft.ops.Dedup
    val sess = spark
    import sess.implicits._
    var seed = 0x9E3779B97F4A7C15L
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (Math.floorMod(seed >>> 17, bound.toLong)).toInt
    }
    val vocab = (0 until 200).map(i => s"w$i")
    def doc(len: Int): Seq[String] = Seq.fill(len)(vocab(nextInt(vocab.size)))
    def mutate(words: Seq[String], rate: Int): Seq[String] =
      words.map(w => if (nextInt(100) < rate) vocab(nextInt(vocab.size)) else w)
    for (trial <- 1 to 2) {
      val bases = (0 until 30).map(_ => doc(40 + nextInt(30)))
      val docs = bases.zipWithIndex.flatMap { case (b, i) =>
        // plant a light-mutation near-dup for every third base doc and a
        // heavy-mutation (non-dup) variant for every fifth
        val nd = if (i % 3 == 0) Seq(mutate(b, 2)) else Nil
        val far = if (i % 5 == 0) Seq(mutate(b, 60)) else Nil
        Seq(b) ++ nd ++ far
      }.zipWithIndex.map { case (ws, id) => (id.toLong, ws.mkString(" ")) }
      val dir = tmpDir(s"graft_lsh_prop_$trial")
      docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val exact = pairSet(Dedup.jaccardPairs(spark, dir, 0.7), "doc_a", "doc_b")
      val lsh = pairSet(Dedup.minhashLshPairs(spark, dir, 0.7), "doc_a", "doc_b")
      assert(lsh === exact, s"trial $trial: LSH pair set diverged from exact")
      assert(exact.nonEmpty, s"trial $trial: no planted near-dups detected")
    }
  }

  test("skew caps bound pair counts on a degenerate corpus (adversarial property)") {
    // Thousands of identical docs: every shingle's posting list and every
    // LSH band bucket is one hot group of size n. Uncapped, both operators
    // would enumerate n(n-1)/2 ≈ 4.5M pairs in single tasks; with the cap
    // each hot group star-links to its min doc, so the output is EXACTLY
    // n-1 pairs (true jaccard 1.0) and connectivity survives for
    // clustering. A handful of distinct docs prove the cold path still
    // runs beside the hot one.
    val sess = spark
    import sess.implicits._
    val n = 3000
    val boiler = "terms of service apply to all content on this site every day"
    val docs = ((0 until n).map(i => (i.toLong, boiler)) ++
      Seq((n.toLong, "one unique sentence about salmon migration patterns"),
          (n + 1L, "another unique sentence describing alpine weather fronts")))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft_skew_cap")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for ((label, out) <- Seq(
        "d2" -> Dedup.jaccardPairs(spark, dir, 0.8),
        "d3" -> Dedup.minhashLshPairs(spark, dir, 0.8))) {
      val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(pairs.length === n - 1, s"$label: star linking must emit n-1 pairs")
      assert(pairs.forall(p => p._1 == 0L && p._3 == 1.0),
        s"$label: every pair anchors at the min doc with true jaccard 1.0")
      assert(pairs.map(_._2).toSet === (1L until n.toLong).toSet,
        s"$label: all duplicate docs must stay connected to the anchor")
    }
  }

  test("near-threshold pairs grazing a hot shingle verify exactly, not on the under-count") {
    // Docs 0 and 1 are identical (true jaccard 1.0): 8 shingles, ONE of
    // which ("h1 h2 h3") is hot at dfCap=4 because four boilerplate docs
    // also carry it. Cold-only scoring sees common=7 of na=nb=8 →
    // 7/9 ≈ 0.778 < 0.8 — a naive cold filter would silently DROP the
    // pair. The optimistic bound (7 + min-hot-overlap 1 → 1.0) must keep
    // it as a candidate and the exact verify must emit the true 1.0.
    val sess = spark
    import sess.implicits._
    val twin = "h1 h2 h3 w4 w5 w6 w7 w8 w9 w10"
    val docs = (Seq((0L, twin), (1L, twin)) ++
      (2L to 5L).map(i => (i, "h1 h2 h3"))).toDF("doc_id", "text")
    val dir = tmpDir("graft_hot_graze")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val capped = Dedup.jaccardPairs(spark, dir, 0.8, dfCap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // (0,1) survives with its EXACT score; boilerplate-only docs reach the
    // anchor star (0,k) but verify to 1/8 and drop — so the capped output
    // is exactly the one true pair.
    assert(capped === Set((0L, 1L, 1.0)))
    // Uncapped (default cap: df 6 << 256, nothing is hot) the same pair
    // carries the same exact score, plus the boilerplate-only pairs whose
    // entire overlap is that one shingle — exactly the pair family the cap
    // documents away (their connectivity survives via the anchor star).
    val exact = Dedup.jaccardPairs(spark, dir, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val boilerPairs = (for { i <- 2L to 5L; j <- (i + 1) to 5L } yield (i, j, 1.0)).toSet
    assert(exact === capped ++ boilerPairs)
  }

  test("containment catches subset duplicates that Jaccard misses") {
    // Doc 1 is doc 0 quoted wholesale inside 30 words of new material:
    // every shingle of 0 appears in 1, so containment = 1.0, while the
    // union is dominated by doc 1's extra shingles → Jaccard ≈ 0.09,
    // invisible at any sane Jaccard threshold. Doc 2 is unrelated.
    val sess = spark
    import sess.implicits._
    val short = "q1 q2 q3 q4 q5"
    val long = short + " " + (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((0L, short), (1L, long),
      (2L, "totally different content about nothing shared at all here"))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft_containment")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cont = Dedup.containmentPairs(spark, dir, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(cont === Set((0L, 1L, 1.0)))
    val jac = Dedup.jaccardPairs(spark, dir, 0.8).collect()
    assert(jac.isEmpty, "the subset pair must be invisible to Jaccard")
  }

  test("MinHash-LSH finds exactly the exact-Jaccard pair set") {
    val exact = pairSet(Dedup.jaccardPairs(spark, sf, 0.8), "doc_a", "doc_b")
    val lsh = pairSet(Dedup.minhashLshPairs(spark, sf, 0.8), "doc_a", "doc_b")
    assert(lsh === exact)
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
  }

  test("SimHash banded pairs equal brute-force hamming pairs") {
    // Brute force: all-pairs hamming over the same signatures.
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh64"))
    val brute = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).as("hamming"))
      .filter(col("hamming") <= 3)
    val banded = Dedup.simhashPairs(spark, sf)
    assert(pairSet(banded, "doc_a", "doc_b") === pairSet(brute, "doc_a", "doc_b"))
  }

  test("SimHash derived banding stays sound for non-default maxDist") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh64"))
    for (maxDist <- Seq(0, 1, 5, 7)) {
      val brute = docs.as("a").join(docs.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.sh64").bitwiseXOR(col("b.sh64"))).as("hamming"))
        .filter(col("hamming") <= maxDist)
      val banded = Dedup.simhashPairs(spark, sf, maxDist)
      assert(pairSet(banded, "doc_a", "doc_b") === pairSet(brute, "doc_a", "doc_b"),
        s"maxDist=$maxDist")
    }
    assertThrows[IllegalArgumentException](Dedup.simhashPairs(spark, sf, 64))
  }

  test("span dedup attributes 8-gram spans to the earliest document") {
    val sess = spark
    import sess.implicits._
    // doc0: 10 words → 3 grams, all first-seen. doc1: identical → all 3
    // recycled. doc2: doc0's tail 8 words + 2 fresh → exactly 1 of its 3
    // grams recycled. doc3: 8 fresh words → 1 gram, fresh. doc4: 7 words →
    // below gram width, absent from the output.
    val w10 = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, w10),
      (1L, w10),
      (2L, (3 to 10).map(i => s"w$i").mkString(" ") + " x1 x2"),
      (3L, (1 to 8).map(i => s"y$i").mkString(" ")),
      (4L, (1 to 7).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val dir = tmpDir("graft_span_dedup")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Dedup.queries("d7_span_dedup")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      0L -> ((3L, 0L, 0.0)),
      1L -> ((3L, 3L, 1.0)),
      2L -> ((3L, 1L, 0.3333)),
      3L -> ((1L, 0L, 0.0))))
  }

  test("inverted index: df counts distinct docs, postings cap at 5, short tokens drop") {
    val sess = spark
    import sess.implicits._
    val docs = (Seq((0L, "alpha beta"), (1L, "alpha alpha gamma"), (2L, "alpha xy")) ++
      (3L to 6L).map(i => (i, "alpha"))).toDF("doc_id", "text")
    val dir = tmpDir("graft_inv_index")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.TextAnalysis.queries("t13_inverted_index")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // "alpha" appears twice in doc1 but counts once; postings stop at 5 ids.
    assert(out === Map(
      "alpha" -> ((7L, "0,1,2,3,4")),
      "beta" -> ((1L, "0")),
      "gamma" -> ((1L, "1"))))
  }

  test("exact dedup keeps one representative per distinct content") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
    val distinctTexts = docs.select(col("text")).distinct().count()
    assert(Dedup.queries("d1_exact_dedup")(spark, sf).count() === distinctTexts)
  }

  test("LSH ANN recall@5 >= 0.9 vs brute force") {
    val exact = pairSet(Sim.knnBrute(spark, sf), "q_id", "vec_id")
    val lsh = pairSet(Sim.knnLsh(spark, sf), "q_id", "vec_id")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall")
    // The registered v2 query carries the same number per q_id in-band.
    val emitted = Sim.queries("v2_knn_lsh")(spark, sf)
      .select(col("recall_at_k")).collect().map(_.getDouble(0))
    assert(emitted.nonEmpty && emitted.forall(_ >= 0.8),
      s"emitted recall column ${emitted.mkString(",")}")
  }

  test("k-means assigns every vector, bounds cells, and never increases SSE") {
    val n = graft.tables.Tables.table(spark, sf, "embeddings").count()
    val (assign, sses) = Sim.kmeans(spark, sf)
    val rows = assign.collect()
    assert(rows.length === n, "every vector gets exactly one assignment")
    val cells = rows.map(_.getInt(1)).toSet
    assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < Sim.KmK))
    assert(sses.length === Sim.KmIters)
    sses.zip(sses.tail).foreach { case (a, b) =>
      assert(b <= a * (1 + 1e-9) + 1e-9, s"SSE increased: $sses")
    }
    // Lloyd's must actually refine, not just not-regress, on real data
    assert(sses.last < sses.head, s"SSE never improved: $sses")
  }

  test("IVF ANN recall@5 >= 0.7 vs brute force") {
    val exact = pairSet(Sim.knnBrute(spark, sf), "q_id", "vec_id")
    val ivf = pairSet(Sim.knnIvf(spark, sf), "q_id", "vec_id")
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF recall $recall")
  }

  test("PQ-ADC ANN recall@5 >= 0.6 vs brute force; emitted cosines are exact") {
    val exactTop = Sim.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = Sim.knnPq(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val recall = (exactTop.keySet & pq.keySet).size.toDouble / exactTop.size
    assert(recall >= 0.6, s"PQ recall $recall")
    // the re-rank means every RETURNED cosine is the true value — any hit
    // shared with brute force must carry an identical score
    (exactTop.keySet & pq.keySet).foreach { k =>
      assert(pq(k) === exactTop(k), s"cosine drift at $k")
    }
  }

  test("MMR re-rank: relevance-first, distinct picks, diversity penalty binds") {
    val out = graft.ops.Sim.mmrRerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val brute = graft.ops.Sim.knnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === (0L until graft.ops.Sim.NumQueries).toSet)
    byQ.foreach { case (q, picks) =>
      assert(picks.length === 5 && picks.map(_._3).distinct.length === 5,
        s"q=$q picks must be 5 distinct items")
      // pick 1 is the pure-relevance argmax (no diversity term yet) —
      // identical tie order to the brute top-1
      val top1 = brute.filter(p => p._1 == q && p._3 == 1).head._2
      assert(picks.find(_._2 == 1).get._3 === top1, s"q=$q first pick")
      // from pick 2 on, the marginal score never increases: the penalty
      // set only grows and the candidate set only shrinks. (Pick 1 is
      // exempt — its penalty term is literal 0, and a negative max
      // similarity at pick 2 could legitimately beat it.)
      val scores = picks.sortBy(_._2).map(_._4).drop(1)
      assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
        s"q=$q scores not non-increasing after pick 1: ${scores.mkString(",")}")
    }
  }

  test("d18: a corpus doc near-dupping a benchmark doc drops; unrelated docs keep") {
    val sess = spark
    import sess.implicits._
    // doc 0 (%17 == 0) is the benchmark item; doc 1 is a near-verbatim
    // corpus copy (jaccard 1.0 -> leak), docs 2/3 are unrelated corpus
    // docs; doc 34 (%17 == 0) is a second benchmark item nothing copies.
    val eval = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, eval), (1L, eval),
      (2L, "completely different words about spark shuffles and parquet"),
      (3L, "yet another unrelated sentence describing alpine weather"),
      (34L, "a second benchmark item with its own unique phrasing"))
      .toDF("doc_id", "text")
    val dir = tmpDir("graft_decontam")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Dedup.queries("d18_decontaminate_neardup")(sess, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L), "benchmark docs never appear as corpus rows")
    assert(out(1L) === ((1L, false)), "the near-verbatim copy must drop")
    assert(out(2L) === ((0L, true)) && out(3L) === ((0L, true)))
  }

  test("labelComponents local union-find ≡ distributed fixpoint on an adversarial graph") {
    // r17's size-adaptive component labeling: both execution strategies
    // must emit the identical (id, min component id) labeling. The edge
    // set mixes the shapes that stress each path differently — a long
    // chain given in DESCENDING order (worst case for min propagation:
    // the min label must traverse the whole chain), a star, a cycle,
    // id-space gaps, and duplicate/self edges.
    val sess = spark
    import sess.implicits._
    val chain = (100L to 140L).sliding(2).map(w => (w(1), w(0))).toSeq // descending
    val star = (1L to 8L).map(i => (500L, 500L + i))
    val cycle = Seq((900L, 901L), (901L, 902L), (902L, 900L))
    val dup = Seq((100L, 101L), (77L, 77L))
    val edges = (chain ++ star ++ cycle ++ dup)
      .toDF("doc_a", "doc_b").localCheckpoint(true)
    def labelMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = labelMap(graft.ops.Dedup.localComponents(sess, edges))
    val iter = labelMap(graft.ops.Dedup.iterativeComponents(sess, edges))
    assert(local === iter, "local union-find and distributed fixpoint diverge")
    // independent ground truth for the three structures
    (100L to 140L).foreach(i => assert(local(i) === 100L))
    (500L to 508L).foreach(i => assert(local(i) === 500L))
    (900L to 902L).foreach(i => assert(local(i) === 900L))
    assert(local(77L) === 77L)
  }

  test("HLL sketch count-distinct lands within the 5-sigma rsd envelope") {
    val rows = graft.ops.Stats.queries("a3_hll_sketch")(spark, sf).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = r.getAs[Long]("exact_custs").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL ${approx} vs exact ${exact}")
    }
  }
}
