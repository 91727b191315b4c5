package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Pre-training batch assembly operators — the step between a cleaned
  * corpus (Quality/Dedup) and the trainer: sequence packing, domain
  * mixture accounting, and vocabulary coverage. Absent from the reference
  * (SURVEY.md §2.2); these are the ops a 100 TB training-data pipeline
  * runs LAST, so their scale story is the whole point:
  *
  *  - pack1 "concat-and-chunk" packing orders by (source, doc_id) and
  *    computes the running token offset as a TWO-PASS blocked prefix sum:
  *    block-local window sums (partitions bounded by PackBlockDocs docs)
  *    plus a carried base from a tiny block-grain prefix window — so no
  *    domain ever funnels through a single window partition, the failure
  *    mode of the naive per-source running sum at 100 TB.
  *  - mix1 is one aggregate + a broadcast one-row total (same shape as
  *    t6's N) — domain weights for mixture sampling fall out of it.
  *  - vocab1 derives the vocabulary from the corpus itself (top-df terms,
  *    deterministic tie-break) and broadcasts it against the token stream:
  *    df aggregation reuses the token exchange; the vocab join is map-side.
  */
object Packing {

  /** Tokens = whitespace split, the same cheap tokenizer t3 uses. */
  private def tokCount = size(split(col("text"), " ")).cast("long")

  /** Content-hash bucket 0..255 (first two md5 hex chars of `text`) and
    * the 80/10/10 split label derived from it — THE split hash, shared by
    * split1 and p3 (Quality) so the train/val/test assignment can never
    * drift between the standalone op and the composed pipeline. The
    * oracle SQL mirrors it with instr() hex arithmetic (same value as
    * this conv()).
    */
  def splitBucket(text: Column): Column =
    conv(substring(md5(text), 1, 2), 16, 10).cast("long")

  def splitLabel(text: Column): Column = {
    val v = splitBucket(text)
    when(v < 204, "train").when(v < 230, "val").otherwise("test")
  }

  val PackLen = 512L       // tokens per packed training sequence
  val MixBudget = 10000000L // mix6/mix7 training budget (tokens), uniform shares

  /** The shared mix6/mix7 epoch plan: per-source available tokens, the
    * uniform budget slice, and epochs as floored integer ppm — one corpus
    * scan aggregated to source grain, then a 1-row source-count broadcast.
    */
  private def epochPlan(s: SparkSession, d: String): DataFrame = {
    val bySrc = Tables.table(s, d, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("avail_tokens"))
    val nsrc = bySrc.agg(count(lit(1)).as("n_sources"))
    bySrc.crossJoin(broadcast(nsrc)).select(
      col("source"), col("avail_tokens"),
      expr(s"$MixBudget DIV n_sources").as("budget_tokens"),
      expr(s"($MixBudget DIV n_sources) * 1000000 DIV avail_tokens").as("epochs_ppm"))
  }

  /** The same plan as DuckDB CTEs, shared by the mix6/mix7 oracles. */
  private val EpochPlanSql =
    s"""t AS (
       |  SELECT source,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS avail_tokens
       |  FROM documents GROUP BY 1),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n_sources FROM t),
       |plan AS (
       |  SELECT source, avail_tokens,
       |    $MixBudget // n_sources AS budget_tokens,
       |    ($MixBudget // n_sources) * 1000000 // avail_tokens AS epochs_ppm
       |  FROM t CROSS JOIN n)""".stripMargin
  val VocabSize = 15       // top-df terms kept as the in-corpus vocabulary
  val PackBlockDocs = 64L  // docs per pack1 prefix-sum block (≫ at scale)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mix5_importance_resample" -> { (s, d) =>
      // DSIR-style importance resampling (Xie et al. 2023's idea: select
      // raw data whose n-gram distribution looks like a TARGET domain —
      // here lang='en'), with an EXACT integer surface: the per-word
      // likelihood ratio p_tgt(w)/p_raw(w) is compared by integer
      // cross-multiplication (c_tgt·N_raw vs c_raw·N_tgt — no division,
      // no log) and quantized to a ±2 weight; a doc's importance score
      // is the weight sum over its token stream and the keep-list is
      // score > 0. The quantization trades DSIR's real-valued log-ratio
      // for cross-engine bit-exactness while keeping its monotone
      // structure (commoner-in-target ⇒ higher weight).
      //
      // Scale shape: two vocab-sized count aggregates (target + raw),
      // weights broadcast onto the one (doc, word) shuffle, one doc
      // aggregate — t16's two-distribution shape.
      val toks = Tables.table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          explode(split(lower(col("text")), " ")).as("w"))
        .filter(length(col("w")) >= 3)
      val raw = toks.groupBy(col("w")).agg(count(lit(1)).as("c_raw"))
      val tgt = toks.filter(col("lang") === "en")
        .groupBy(col("w")).agg(count(lit(1)).as("c_tgt"))
      val totals = raw.agg(sum(col("c_raw")).as("n_raw"))
        .crossJoin(tgt.agg(sum(col("c_tgt")).as("n_tgt")))
      val a = col("c_tgt") * col("n_raw")
      val b = col("c_raw") * col("n_tgt")
      val weights = raw.join(tgt, Seq("w"), "left")
        .select(col("w"), col("c_raw"), coalesce(col("c_tgt"), lit(0L)).as("c_tgt"))
        .crossJoin(broadcast(totals))
        .select(col("w"),
          when(a > b * 2, 2).when(a > b, 1).when(a === b, 0)
            .when(a * 2 >= b, -1).otherwise(-2).as("wt"))
      toks.join(broadcast(weights), "w")
        .groupBy(col("doc_id"), col("lang"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("wt")).as("score"))
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("score"),
          (col("score") > 0).as("keep"))
    },
    "pack2_length_batching" -> { (s, d) =>
      // Length-grouped (dynamic) batching — pack1's complement for
      // padding-based trainers: bucket similar-length sequences into
      // fixed-size batches so each batch pads to its own max length,
      // not the corpus max, and account the padding waste per batch
      // (the number a batching strategy is judged by).
      //
      // Scale shape: docs hash (content md5, engine-stable) into shards;
      // each shard sorts by (len, doc_id) under a SHARD-partitioned
      // window — no global sort — and cuts into 16-doc batches. All
      // integer arithmetic; the one double is a single division.
      val batchSize = 16
      val docs = Tables.table(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("len"),
          (conv(substring(md5(col("text")), 1, 1), 16, 10).cast("long") % 4).as("shard"))
      val w = Window.partitionBy(col("shard")).orderBy(col("len"), col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .withColumn("batch_id", expr(s"CAST((rn - 1) div $batchSize AS BIGINT)"))
        .groupBy(col("shard"), col("batch_id"))
        .agg(count(lit(1)).as("n_docs"), max(col("len")).as("max_len"),
          sum(col("len")).cast("long").as("sum_len"))
        .select(col("shard"), col("batch_id"), col("n_docs"), col("max_len"),
          col("sum_len"),
          (col("n_docs") * col("max_len") - col("sum_len")).as("padding_waste"),
          ((col("n_docs") * col("max_len") - col("sum_len")).cast("double") /
            (col("n_docs") * col("max_len"))).as("pad_ratio"))
    },
    "pack1_sequence_packing" -> { (s, d) =>
      // Concat-and-chunk: within each source stream (ordered by doc_id),
      // documents concatenate into one token stream that is cut into
      // PackLen-token training sequences; a document's pack is where its
      // first token lands. start = running-sum-exclusive of token counts.
      //
      // TWO-PASS prefix sum, not one window per source: a single
      // per-source running sum puts the whole domain through ONE window
      // partition — fine at test scale, serial at 100 TB. Instead docs
      // group into doc_id blocks; pass 1 sums tokens per (source, block)
      // and prefix-sums those tiny block totals (a window over
      // corpus/BlockDocs rows); pass 2 computes block-LOCAL running sums
      // (window partitions bounded by BlockDocs docs) and adds the
      // carried block base. Same output as the naive form — the oracle
      // below still states the single running sum.
      val w = Window.partitionBy(col("source"), col("blk")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val carry = Window.partitionBy(col("source")).orderBy(col("blk"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val toks = Tables.table(s, d, "documents")
        .select(col("doc_id"), col("source"), tokCount.as("n_tokens"),
          (col("doc_id") / PackBlockDocs).cast("long").as("blk"))
      val blockBase = toks.groupBy(col("source"), col("blk"))
        .agg(sum(col("n_tokens")).as("blk_tok"))
        .withColumn("base", coalesce(sum(col("blk_tok")).over(carry), lit(0L)))
        .select(col("source"), col("blk"), col("base"))
      toks.join(blockBase, Seq("source", "blk"))
        .withColumn("start_offset",
          col("base") + sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("pack_id", floor(col("start_offset") / lit(PackLen.toDouble)).cast("long"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("start_offset"), col("pack_id"))
    },
    "mix1_domain_mixture" -> { (s, d) =>
      // Domain mixture table: per-source doc/token counts and each
      // domain's share of the corpus token budget — the weights a mixture
      // sampler consumes. One shuffle (the groupBy); the corpus total
      // rides a broadcast one-row aggregate, not a second action.
      val perSource = Tables.table(s, d, "documents")
        .select(col("source"), tokCount.as("n_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok"))
      val total = perSource.agg(sum(col("tok")).as("tot"))
      perSource.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"), col("tok").as("n_tokens"),
          round(col("tok").cast("double") / col("tot"), 6).as("token_share"))
    },
    "pair3_bitext_margin" -> { (s, d) =>
      // Bitext mining (Artetxe & Schwenk's margin criterion, forward
      // variant): for each English query vector, the best non-English
      // candidate scored by cos / mean(top-4 cos) — raw cosine over-
      // selects hub sentences that are near EVERYTHING; dividing by the
      // query's own neighborhood density is what makes mined translation
      // pairs precise. Spark-first shape: bounded query set broadcast
      // through the exact JVM kernel (one scan over the candidate side,
      // no pair shuffle), per-query top-4 via the window idiom the
      // TopKPerKey rule rewrites to bounded heaps. Determinism: round4
      // cosines (v1's contract), vec_id tie-break, and the margin's
      // arithmetic written in one fixed order so both engines produce
      // the identical double — emitted UNROUNDED.
      val docs = Tables.table(s, d, "documents").select(col("doc_id"), col("lang"))
      val embs = Tables.table(s, d, "embeddings")
      val withLang = embs.join(docs, embs("vec_id") === docs("doc_id"))
      val qs = VecOps.vectors(s,
        withLang.filter(col("lang") === "en" && col("vec_id") < 64)
          .select(col("vec_id"), col("embedding")),
        "vec_id", "embedding")
      val tgt = withLang.filter(col("lang") =!= "en")
        .select(col("vec_id"), col("embedding"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      VecOps.scoreAgainst(s, tgt, "vec_id", "embedding", qs)
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
        .groupBy(col("q_id")).agg(
          max(when(col("rank") === 1, col("vec_id"))).as("best_id"),
          max(when(col("rank") === 1, col("cos"))).as("c1"),
          max(when(col("rank") === 2, col("cos"))).as("c2"),
          max(when(col("rank") === 3, col("cos"))).as("c3"),
          max(when(col("rank") === 4, col("cos"))).as("c4"))
        .select(col("q_id"), col("best_id"), col("c1").as("cos"),
          (col("c1") / ((col("c1") + col("c2") + col("c3") + col("c4")) / 4))
            .as("margin"))
    },
    "mix4_weighted_sample" -> { (s, d) =>
      // Weighted SYSTEMATIC sampling without RNG: docs order
      // deterministically inside content-hash shards, integer quality
      // weights accumulate, and a row is kept exactly when its weight
      // interval crosses a stride boundary — inclusion probability ∝
      // weight, expected sample size = shard_weight/stride, and the
      // same rows come back on every engine and run (all-integer cumsum;
      // the /19.0 floors are exact for int64 inputs — a 19-denominator
      // rational sits ≥ 1/19 from any other integer). The window is
      // SHARD-partitioned — no global ordering, so the one shuffle is
      // by shard and the shape survives 100 TB; the weight here stands
      // in for a quality score (mix2's rates play the same role).
      val shard = expr(
        "CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT)")
      val win = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("n_chars"), col("text"))
        .withColumn("w", (lit(1L) + col("n_chars") % 7L).cast("long"))
        .withColumn("shard", shard)
        .withColumn("h", md5(col("text")))
        .withColumn("cum", sum(col("w")).over(win))
        .filter(floor((col("cum") - col("w")) / lit(19.0)) < floor(col("cum") / lit(19.0)))
        .select(col("doc_id"), col("shard"), col("w"), col("cum"))
    },
    "mix3_temperature_mixture" -> { (s, d) =>
      // Temperature-scaled mixture weights (the multilingual-pretraining
      // p^α reweighting, α = 0.5): upsample rare domains, downsample
      // dominant ones, renormalize. α = 0.5 keeps every double IEEE-exact
      // (sqrt, not pow — libm pow differs across engines in the last
      // ulp). Same one-shuffle + broadcast-one-row-aggregate shape as
      // mix1: the per-domain table is vocabulary-sized by construction,
      // so the two scalar normalizers ride broadcasts, never a second
      // corpus scan.
      val perSource = Tables.table(s, d, "documents")
        .select(col("source"), tokCount.as("n_tokens"))
        .groupBy(col("source"))
        .agg(sum(col("n_tokens")).as("tok"))
      val total = perSource.agg(sum(col("tok")).as("tot"))
      val shares = perSource.crossJoin(broadcast(total))
        .withColumn("share", col("tok").cast("double") / col("tot"))
      val z = shares.agg(sum(sqrt(col("share"))).as("z"))
      shares.crossJoin(broadcast(z))
        .select(col("source"),
          round(col("share"), 6).as("token_share"),
          round(sqrt(col("share")) / col("z"), 6).as("temp_share"),
          round(sqrt(col("share")) / col("z") / col("share"), 6).as("upsample"))
    },
    "mix2_curriculum_sample" -> { (s, d) =>
      // Curriculum sampling: each domain keeps a deterministic fraction of
      // its documents (rate_16/16ths here, keyed off the source id — in
      // production the rates come from a mixture table like mix1's). The
      // keep decision hashes CONTENT (md5), so it is reproducible across
      // engines and runs, needs no RNG state, and is a pure map-side
      // filter that pushes into the scan — the only sampling shape that
      // stays cheap at 100 TB.
      val srcNum = expr("CAST(substr(source, 4) AS INT)")
      val rate = when(srcNum % 3 === 0, 8).when(srcNum % 3 === 1, 4).otherwise(2)
      val hexpos = expr("instr('0123456789abcdef', substring(md5(text), 1, 1))")
      Tables.table(s, d, "documents")
        .withColumn("rate_16", rate)
        .filter(hexpos <= col("rate_16"))
        .select(col("doc_id"), col("source"), col("rate_16"))
    },
    "split1_train_split" -> { (s, d) =>
      // Deterministic train/val/test split (80/10/10): the assignment
      // hashes CONTENT (md5 → first two hex chars → 0..255), so it is
      // reproducible across engines/runs, survives re-partitioning and
      // re-ingestion, and is a pure map-side projection — no RNG state,
      // no shuffle, pushes into the scan. The same doc always lands in
      // the same split even when the corpus is re-sharded, which is the
      // property that keeps eval sets uncontaminated across pipeline
      // re-runs at 100 TB.
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("source"),
          splitBucket(col("text")).as("hash_bucket"),
          splitLabel(col("text")).as("split"))
    },
    "chunk1_overlap_chunks" -> { (s, d) =>
      // RAG-style overlapping chunking: 200-char windows at stride 150
      // (50-char overlap), one output row per chunk. Map-side only —
      // sequence+explode fans each document out to its chunk starts with
      // no shuffle, so chunking composes with any downstream op at corpus
      // scale. Chunk text rides as md5 (engine-stable, keeps the dump
      // narrow); n = 1 + ceil_div(len - chunkLen, stride) floored at 0.
      val chunkLen = 200
      val stride = 150
      val len = length(col("text")).cast("long")
      val n = lit(1L) + greatest(lit(0L),
        ((len - chunkLen + stride - 1) / stride).cast("long"))
      Tables.table(s, d, "documents")
        .withColumn("chunk_idx", explode(sequence(lit(0L), n - 1)))
        .withColumn("chunk_start", col("chunk_idx") * stride)
        .withColumn("chunk", expr(s"substring(text, chunk_start + 1, $chunkLen)"))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(col("chunk")).as("chunk_md5"))
    },
    "shuf1_shard_shuffle" -> { (s, d) =>
      // Deterministic global shuffle for training-order randomization:
      // docs hash (content md5) into 8 shards, with a position within
      // each shard from the hash order. No global row_number — a single
      // total order would serialize the corpus through one partition; the
      // shard-partitioned window is the distributed equivalent (readers
      // consume shards in any order, each internally hash-shuffled).
      // 8 shards is demo geometry: production sets shards ≈ output file
      // count (thousands) so each window partition stays executor-sized —
      // or layers pack1's blocked-prefix-sum trick if positions must be
      // dense within very large shards.
      // concat (not concat_ws): NULL text must propagate to a NULL key
      // exactly like the oracle's || operator, not silently collapse to
      // md5 of the bare id.
      val key = md5(concat(col("doc_id").cast("string"), lit(":"), col("text")))
      val shard = conv(substring(col("shuffle_key"), 1, 1), 16, 10)
        .cast("long") % 8
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("shuffle_key"), col("doc_id"))
      Tables.table(s, d, "documents")
        .withColumn("shuffle_key", key)
        .withColumn("shard", shard)
        .withColumn("pos_in_shard", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("shard"), col("pos_in_shard"), col("shuffle_key"))
    },
    "pair1_contrastive_pairs" -> { (s, d) =>
      // Contrastive training pair construction: anchors and positives are
      // the exact cosine near-dup pairs (d5's tiled kernel, same
      // threshold); each pair gets a deterministic LCG-picked negative
      // (RNG-free, engine-reproducible, collision-filtered) — the
      // (anchor, positive, negative) triples an embedding-model trainer
      // consumes. Pair generation is the d5 scan; the negative assignment
      // is a pure projection against a broadcast one-row count.
      val emb = Tables.table(s, d, "embeddings")
      val pos = VecOps.cosinePairsTiled(s, emb, "vec_id", "embedding", 0.45,
          numTiles = 4)
        .select(col("vec_a").as("anchor"), col("vec_b").as("pos_id"), col("cos"))
      val n = emb.agg(count(lit(1)).as("n_vec"))
      pos.crossJoin(broadcast(n))
        .withColumn("neg_id", (col("anchor") * 48271L + 11L) % col("n_vec"))
        .filter(col("neg_id") =!= col("anchor") && col("neg_id") =!= col("pos_id"))
        .select(col("anchor"), col("pos_id"), col("neg_id"), col("cos"))
    },
    "pair2_hard_negatives" -> { (s, d) =>
      // Hard-negative mining, the way production miners run it (DPR/ANCE
      // shape): each anchor retrieves from an ANN structure — here its 4
      // nearest of ceil(sqrt(n)) deterministic cells — and keeps the
      // top-scoring candidate in the cosine band [0.15, 0.45), the
      // negatives that actually move a contrastive loss. Cell-probed
      // candidates cost ~4·n^1.5·d and shuffle 5n vector rows, vs the
      // r12 form's n²·d exact band sweep whose INTERMEDIATE was ~12% of
      // all pairs (quadratic rows through a window). The pruning is
      // fully deterministic and the DuckDB oracle replays it, so the
      // query stays hash-checked under the mined-negatives contract.
      VecOps.cellBandTop1(s, Tables.table(s, d, "embeddings"),
        "vec_id", "embedding", 0.15, 0.45, probes = 4)
    },
    "pair2b_mined_gate" -> { (s, d) =>
      // Transparency gate for pair2's r13 contract change: the mined
      // (cell-probed) negative vs the exact band argmax, quantified on
      // record — anchor coverage and how often the mined top-1 achieves
      // the exact top-1's SCORE (a different id at the same rounded cos
      // is an equally hard negative). Floors are integer
      // cross-multiplications (mix5 trick), measured with slack:
      // coverage 100% and score-match 33-46% across sf0.001/0.01/0.1.
      // Deliberately quadratic at verify scale (the exact side is the
      // point); the headline/scale path is pair2 itself.
      import s.implicits._
      val emb = Tables.table(s, d, "embeddings")
      val mined = VecOps.cellBandTop1(s, emb, "vec_id", "embedding",
        0.15, 0.45, probes = 4)
      val band = VecOps.cosinePairsTiled(s, emb, "vec_id", "embedding", 0.15,
          numTiles = 4)
        .filter(col("cos") < 0.45)
      val sym = band.select(col("vec_a").as("anchor"), col("vec_b").as("neg_id"), col("cos"))
        .unionAll(band.select(col("vec_b").as("anchor"), col("vec_a").as("neg_id"), col("cos")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("anchor")).orderBy(col("cos").desc, col("neg_id"))
      val exact = sym.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("anchor"), col("neg_id").as("x_neg"), col("cos").as("x_cos"))
      // every count in ONE action (full-outer join + one aggregate): at
      // anchor grain the gate's wall is per-job latency, not compute
      val r = mined.join(exact, Seq("anchor"), "full_outer")
        .agg(count(col("x_cos")).as("n_exact"),
          count(col("neg_cos")).as("n_mined"),
          sum(when(col("neg_cos") === col("x_cos"), 1L).otherwise(0L)).as("same_cos"),
          sum(when(col("neg_id") === col("x_neg"), 1L).otherwise(0L)).as("same_neg"))
        .head
      val (nExact, nMined, sameCos, sameNeg) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      Seq((nExact, nMined, sameCos, sameNeg,
        nMined * 20L >= nExact * 19L, sameCos * 4L >= nExact)).toDF(
        "n_exact_anchors", "n_mined_anchors", "n_same_cos", "n_same_neg",
        "coverage_ge_95pct", "score_match_ge_25pct")
    },
    "vocab1_oov_rate" -> { (s, d) =>
      // Vocabulary coverage: vocab = the VocabSize highest-df terms
      // (ties broken by term), then each document's out-of-vocabulary
      // token-occurrence rate. df reuses the same exploded pass shape as
      // t6; the vocab (tiny by construction) broadcasts into a map-side
      // membership join — the corpus is scanned twice but shuffled only
      // at token-aggregate grain.
      val toks = Tables.table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      val df_ = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
      val vocab = df_.orderBy(col("df").desc, col("term")).limit(VocabSize)
        .select(col("term"), lit(1).as("in_vocab"))
      toks.join(broadcast(vocab), Seq("term"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate", round(col("n_oov").cast("double") / col("n_tokens"), 4))
    },
    "mix7_apply_mixture" -> { (s, d) =>
      // MATERIALIZE the mixture mix6 only plans: every document is
      // repeated floor(epochs) times, plus one extra copy when its
      // deterministic content hash falls under the fractional part — so
      // each source's realized token count converges on its budget share
      // with zero RNG state (the same doc always gets the same copy
      // count, on any engine, under any re-sharding). The fractional
      // test is an UNBIASED cross-multiplication over the full 20-bit
      // hash range: h20·10⁶ < frac·2²⁰ fires with probability frac to
      // within 2⁻²⁰ (a `% 1e6` fold of the 0..2²⁰ range would double the
      // odds of the low 48 576 values and overshoot every source's share
      // by up to ~4.6 pp). The fan-out is sequence+explode (map-side
      // after one source-grain plan broadcast back); no shuffle touches
      // the multiplied rows.
      val plan = epochPlan(s, d).select(col("source"), col("epochs_ppm"))
      val hash20 = conv(substring(md5(col("text")), 1, 5), 16, 10)
        .cast("long").as("h20")
      Tables.table(s, d, "documents")
        .select(col("doc_id"), col("source"), hash20)
        .join(broadcast(plan), "source")
        .select(col("doc_id"), col("source"),
          (expr("epochs_ppm DIV 1000000") +
            when(col("h20") * 1000000L <
              (col("epochs_ppm") % 1000000L) * 1048576L, 1L).otherwise(0L))
            .as("n_copies"))
        // a doc with zero copies drops out of the mixture (sequence with
        // start > stop would otherwise run DESCENDING, not empty)
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"), col("n_copies"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
    },
    "pack3_bin_packing" -> { (s, d) =>
      // NEXT-FIT-DECREASING bin packing into fixed PackLen-token training
      // bins — the padding-efficiency upgrade over pack1's concat-and-
      // chunk (documents never split across bins; bins close when the
      // next doc won't fit). Packing is inherently a sequential fold, so
      // it runs per content-hash SHARD: shards shuffle once, each sorts
      // (n_tokens DESC, doc_id) within its partition, and a mapPartitions
      // fold assigns bins — the (d)-tier escape hatch used exactly where
      // declarative ops can't express carry-state, with the sequential
      // grain capped at shard size (corpus/4 here; hundreds of shards at
      // 100 TB keeps every fold small AND the parallelism wide). The
      // DuckDB oracle replays the same fold as a recursive CTE per shard,
      // so bin boundaries are hash-checked, not just row counts.
      val cap = PackLen
      val docs = Tables.table(s, d, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          (conv(substring(md5(col("text")), 1, 1), 16, 10).cast("long") % 4)
            .as("shard"))
      import s.implicits._
      docs.repartition(col("shard"))
        .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          // fold resets on shard change: shards may share a partition
          var shard = Long.MinValue; var bin = 0L; var fill = 0L
          it.map { case (id, n, sh) =>
            if (sh != shard) { shard = sh; bin = 0L; fill = n }
            else if (fill + n > cap) { bin += 1; fill = n }
            else fill += n
            (id, sh, bin, n)
          }
        }.toDF("doc_id", "shard", "bin", "n_tokens")
    },
    "mix6_epoch_plan" -> { (s, d) =>
      // The token-budget epoch allocator — the published mixture tables
      // (LLaMA Tab. 1, Gopher Tab. A1) answer "given a training budget B
      // and a target share per source, how many PASSES over each source's
      // available tokens does the plan imply?" Epochs > 1 means
      // upsampling (repeating data, with its memorization cost); < 1
      // means subsampling. Shares and epochs are integer DIV ppm so the
      // plan is bit-identical across engines. Scale shape: one corpus
      // scan aggregated to source grain (map-side partials absorb the
      // token counts), then a 1-row broadcast of the source count — the
      // plan math itself is source-cardinality-sized.
      epochPlan(s, d).select(
        col("source"), col("avail_tokens"), col("budget_tokens"),
        col("epochs_ppm"), (col("epochs_ppm") > 1000000L).as("upsampled"))
    }
  )

  val oracleSql: Map[String, String] = Map(
    // DuckDB's sum(BIGINT) returns HUGEINT, which the driver's pandas hash
    // path lands as float64 while Spark emits int64 — CAST every window/
    // group sum back to BIGINT so both engines hash the same representation
    // (same representation-class issue as f16's decimal-as-string).
    "mix5_importance_resample" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, w
        |  FROM (SELECT doc_id, lang,
        |          unnest(string_split(lower(text), ' ')) AS w FROM documents)
        |  WHERE length(w) >= 3),
        |raw AS (SELECT w, CAST(count(*) AS BIGINT) AS c_raw FROM toks GROUP BY w),
        |tgt AS (SELECT w, CAST(count(*) AS BIGINT) AS c_tgt
        |        FROM toks WHERE lang = 'en' GROUP BY w),
        |tot AS (SELECT (SELECT CAST(sum(c_raw) AS BIGINT) FROM raw) AS n_raw,
        |               (SELECT CAST(sum(c_tgt) AS BIGINT) FROM tgt) AS n_tgt),
        |weights AS (
        |  SELECT raw.w,
        |    CASE WHEN coalesce(c_tgt, 0) * n_raw > c_raw * n_tgt * 2 THEN 2
        |         WHEN coalesce(c_tgt, 0) * n_raw > c_raw * n_tgt THEN 1
        |         WHEN coalesce(c_tgt, 0) * n_raw = c_raw * n_tgt THEN 0
        |         WHEN coalesce(c_tgt, 0) * n_raw * 2 >= c_raw * n_tgt THEN -1
        |         ELSE -2 END AS wt
        |  FROM raw LEFT JOIN tgt USING (w), tot)
        |SELECT doc_id, lang, count(*) AS n_tokens,
        |  CAST(sum(wt) AS BIGINT) AS score,
        |  CAST(sum(wt) AS BIGINT) > 0 AS keep
        |FROM toks JOIN weights USING (w)
        |GROUP BY doc_id, lang""".stripMargin,
    "pack2_length_batching" ->
      """WITH docs AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS len,
        |    CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) % 4 AS shard
        |  FROM documents
        |),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY len, doc_id) AS rn
        |  FROM docs
        |)
        |SELECT shard, CAST((rn - 1) // 16 AS BIGINT) AS batch_id,
        |  count(*) AS n_docs, max(len) AS max_len,
        |  CAST(sum(len) AS BIGINT) AS sum_len,
        |  CAST(count(*) * max(len) - sum(len) AS BIGINT) AS padding_waste,
        |  CAST(count(*) * max(len) - sum(len) AS DOUBLE)
        |    / (count(*) * max(len)) AS pad_ratio
        |FROM rn GROUP BY shard, (rn - 1) // 16""".stripMargin,
    "pack1_sequence_packing" ->
      s"""SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |  CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
         |    OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - CAST(len(string_split(text, ' ')) AS BIGINT) AS BIGINT) AS start_offset,
         |  CAST(floor((sum(CAST(len(string_split(text, ' ')) AS BIGINT))
         |    OVER (PARTITION BY source ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - CAST(len(string_split(text, ' ')) AS BIGINT)) / ${PackLen}.0) AS BIGINT) AS pack_id
         |FROM documents""".stripMargin,
    "mix1_domain_mixture" ->
      """WITH per_src AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM per_src), 6)
        |    AS token_share
        |FROM per_src""".stripMargin,
    // share is exact-int division on both sides; sqrt is IEEE-exact; the
    // z normalizer's 20-term sum can differ in the last ulp across
    // engines' summation order — round(6) absorbs it.
    "pair3_bitext_margin" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS nrm
        |  FROM embeddings),
        |el AS (SELECT e.*, d.lang FROM e JOIN documents d ON e.vec_id = d.doc_id),
        |scored AS (
        |  SELECT q.vec_id AS q_id, b.vec_id AS vec_id,
        |    round(list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (q.nrm * b.nrm), 4) AS cos
        |  FROM el q JOIN el b
        |    ON q.lang = 'en' AND q.vec_id < 64 AND b.lang <> 'en'),
        |ranked AS (SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored),
        |agg AS (SELECT q_id,
        |    max(CASE WHEN rank = 1 THEN vec_id END) AS best_id,
        |    max(CASE WHEN rank = 1 THEN cos END) AS c1,
        |    max(CASE WHEN rank = 2 THEN cos END) AS c2,
        |    max(CASE WHEN rank = 3 THEN cos END) AS c3,
        |    max(CASE WHEN rank = 4 THEN cos END) AS c4
        |  FROM ranked WHERE rank <= 4 GROUP BY q_id)
        |SELECT q_id, best_id, c1 AS cos,
        |  c1 / ((c1 + c2 + c3 + c4) / 4) AS margin FROM agg""".stripMargin,
    "mix4_weighted_sample" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(1 + n_chars % 7 AS BIGINT) AS w,
        |    CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1 AS BIGINT) AS shard,
        |    md5(text) AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, w,
        |    CAST(sum(w) OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS cum
        |  FROM base)
        |SELECT doc_id, shard, w, cum FROM c
        |WHERE floor((cum - w) / 19.0) < floor(cum / 19.0)""".stripMargin,
    "mix3_temperature_mixture" ->
      """WITH per_src AS (
        |  SELECT source,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS tok
        |  FROM documents GROUP BY source),
        |sh AS (SELECT source,
        |    CAST(tok AS DOUBLE) / (SELECT sum(tok) FROM per_src) AS share
        |  FROM per_src),
        |z AS (SELECT sum(sqrt(share)) AS z FROM sh)
        |SELECT source,
        |  round(share, 6) AS token_share,
        |  round(sqrt(share) / (SELECT z FROM z), 6) AS temp_share,
        |  round(sqrt(share) / (SELECT z FROM z) / share, 6) AS upsample
        |FROM sh""".stripMargin,
    "mix2_curriculum_sample" ->
      """SELECT doc_id, source,
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN 8
        |       WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 4
        |       ELSE 2 END AS rate_16
        |FROM documents
        |WHERE instr('0123456789abcdef', substring(md5(text), 1, 1)) <=
        |  CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN 8
        |       WHEN CAST(substr(source, 4) AS INT) % 3 = 1 THEN 4
        |       ELSE 2 END""".stripMargin,
    "split1_train_split" ->
      """SELECT doc_id, source,
        |  CAST((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |     + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) AS BIGINT)
        |    AS hash_bucket,
        |  CASE WHEN (instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |          + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) < 204
        |       THEN 'train'
        |       WHEN (instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
        |          + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) < 230
        |       THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "chunk1_overlap_chunks" ->
      """WITH ex AS (
        |  SELECT doc_id, text,
        |    unnest(range(0, 1 + greatest(0, (length(text) - 200 + 149) // 150))) AS i
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * 150 AS BIGINT) AS chunk_start,
        |  CAST(length(substr(text, CAST(i * 150 + 1 AS INT), 200)) AS BIGINT)
        |    AS chunk_len,
        |  md5(substr(text, CAST(i * 150 + 1 AS INT), 200)) AS chunk_md5
        |FROM ex""".stripMargin,
    "shuf1_shard_shuffle" ->
      """WITH keyed AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':' || text) AS shuffle_key
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((instr('0123456789abcdef', substring(shuffle_key, 1, 1)) - 1) % 8
        |    AS BIGINT) AS shard,
        |  CAST(row_number() OVER (
        |    PARTITION BY (instr('0123456789abcdef', substring(shuffle_key, 1, 1)) - 1) % 8
        |    ORDER BY shuffle_key, doc_id) AS BIGINT) AS pos_in_shard,
        |  shuffle_key
        |FROM keyed""".stripMargin,
    "pair1_contrastive_pairs" ->
      """WITH e AS (SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))) AS norm
        |  FROM embeddings),
        |pos AS (
        |  SELECT a.vec_id AS anchor, b.vec_id AS pos_id,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.norm * b.norm), 4) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.norm * b.norm), 4) >= 0.45),
        |n AS (SELECT count(*) AS n_vec FROM embeddings)
        |SELECT anchor, pos_id,
        |  (anchor * 48271 + 11) % n_vec AS neg_id, cos
        |FROM pos, n
        |WHERE (anchor * 48271 + 11) % n_vec <> anchor
        |  AND (anchor * 48271 + 11) % n_vec <> pos_id""".stripMargin,
    // The SAME multi-probe pruning as the Spark side over the K-MEANS-
    // TRAINED cells (r14: the shared TrainedCellsSql chain replays the
    // fixed-point Lloyd's training bit-for-bit): rank 1 = the vector's
    // home cell, ranks <= 4 = its probe list; candidates = members of
    // probed cells; HALF_UP-rounded band filter and rank-1 per anchor,
    // exactly VecOps.cellBandTop1.
    "pair2_hard_negatives" ->
      s"""WITH ${graft.ops.VecOps.TrainedCellsSql},
        |probes AS (SELECT vec_id, cell FROM rnk WHERE rn <= 4),
        |cand AS (
        |  SELECT p.vec_id AS anchor, mm.vec_id AS neg_id,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(mm.embedding[i] AS DOUBLE)))
        |      / (a.norm * mm.norm), 4) AS cos
        |  FROM probes p
        |  JOIN asg ma ON ma.cell = p.cell
        |  JOIN e a ON a.vec_id = p.vec_id
        |  JOIN e mm ON mm.vec_id = ma.vec_id
        |  WHERE mm.vec_id <> p.vec_id)
        |SELECT anchor, neg_id, cos AS neg_cos
        |FROM (SELECT anchor, neg_id, cos,
        |        row_number() OVER (PARTITION BY anchor
        |                           ORDER BY cos DESC, neg_id) AS rn
        |      FROM cand WHERE cos >= 0.15 AND cos < 0.45)
        |WHERE rn = 1""".stripMargin,
    // pair2b: the mined CTEs above plus the exact band argmax, folded to
    // one hashed row of integer counts + integer-floor booleans.
    "pair2b_mined_gate" ->
      s"""WITH ${graft.ops.VecOps.TrainedCellsSql},
        |probes AS (SELECT vec_id, cell FROM rnk WHERE rn <= 4),
        |cand AS (
        |  SELECT p.vec_id AS anchor, mm.vec_id AS neg_id,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(mm.embedding[i] AS DOUBLE)))
        |      / (a.norm * mm.norm), 4) AS cos
        |  FROM probes p
        |  JOIN asg ma ON ma.cell = p.cell
        |  JOIN e a ON a.vec_id = p.vec_id
        |  JOIN e mm ON mm.vec_id = ma.vec_id
        |  WHERE mm.vec_id <> p.vec_id),
        |mined AS (
        |  SELECT anchor, neg_id, cos FROM (
        |    SELECT anchor, neg_id, cos,
        |      row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, neg_id) AS rn
        |    FROM cand WHERE cos >= 0.15 AND cos < 0.45) WHERE rn = 1),
        |allp AS (
        |  SELECT a.vec_id AS va, b.vec_id AS vb,
        |    round(list_sum(list_transform(range(1, len(a.embedding) + 1),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.norm * b.norm), 4) AS cos
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
        |band AS (SELECT * FROM allp WHERE cos >= 0.15 AND cos < 0.45),
        |sym AS (SELECT va AS anchor, vb AS neg_id, cos FROM band
        |        UNION ALL SELECT vb, va, cos FROM band),
        |exact AS (
        |  SELECT anchor, neg_id, cos FROM (
        |    SELECT anchor, neg_id, cos,
        |      row_number() OVER (PARTITION BY anchor ORDER BY cos DESC, neg_id) AS rn
        |    FROM sym) WHERE rn = 1)
        |SELECT
        |  (SELECT count(*) FROM exact) AS n_exact_anchors,
        |  (SELECT count(*) FROM mined) AS n_mined_anchors,
        |  (SELECT count(*) FROM mined m JOIN exact x USING (anchor)
        |     WHERE m.cos = x.cos) AS n_same_cos,
        |  (SELECT count(*) FROM mined m JOIN exact x USING (anchor)
        |     WHERE m.neg_id = x.neg_id) AS n_same_neg,
        |  (SELECT count(*) FROM mined) * 20 >= (SELECT count(*) FROM exact) * 19
        |    AS coverage_ge_95pct,
        |  (SELECT count(*) FROM mined m JOIN exact x USING (anchor)
        |     WHERE m.cos = x.cos) * 4 >= (SELECT count(*) FROM exact)
        |    AS score_match_ge_25pct""".stripMargin,
    "vocab1_oov_rate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
         |  FROM documents),
         |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
         |vocab AS (SELECT term FROM df ORDER BY df DESC, term LIMIT $VocabSize)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN toks.term IN (SELECT term FROM vocab) THEN 0 ELSE 1 END)
         |    AS BIGINT) AS n_oov,
         |  round(CAST(sum(CASE WHEN toks.term IN (SELECT term FROM vocab) THEN 0 ELSE 1 END)
         |    AS DOUBLE) / count(*), 4) AS oov_rate
         |FROM toks GROUP BY doc_id""".stripMargin,
    // pack3: the per-shard next-fit fold replayed as a recursive CTE —
    // rank docs (n_tokens DESC, doc_id) inside each shard, then carry
    // (bin, fill) down the rank chain with the same overflow rule.
    "pack3_bin_packing" ->
      s"""WITH RECURSIVE d AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |    CAST(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1
         |      AS BIGINT) % 4 AS shard
         |  FROM documents),
         |r AS (
         |  SELECT *, row_number()
         |    OVER (PARTITION BY shard ORDER BY n_tokens DESC, doc_id) AS rn
         |  FROM d),
         |f(shard, rn, doc_id, n_tokens, bin, fill) AS (
         |  SELECT shard, rn, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
         |  FROM r WHERE rn = 1
         |  UNION ALL
         |  SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
         |    CASE WHEN f.fill + r.n_tokens > $PackLen THEN f.bin + 1
         |         ELSE f.bin END,
         |    CASE WHEN f.fill + r.n_tokens > $PackLen THEN r.n_tokens
         |         ELSE f.fill + r.n_tokens END
         |  FROM f JOIN r ON r.shard = f.shard AND r.rn = f.rn + 1)
         |SELECT doc_id, shard, bin, n_tokens FROM f""".stripMargin,
    // mix7: the same plan arithmetic, then each doc fanned out to
    // floor(epochs) copies plus the content-hash fractional copy.
    "mix7_apply_mixture" ->
      s"""WITH $EpochPlanSql,
        |d AS (
        |  SELECT doc_id, d0.source,
        |    CAST((instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 65536
        |       + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1) * 4096
        |       + (instr('0123456789abcdef', substring(md5(text), 3, 1)) - 1) * 256
        |       + (instr('0123456789abcdef', substring(md5(text), 4, 1)) - 1) * 16
        |       + (instr('0123456789abcdef', substring(md5(text), 5, 1)) - 1)
        |      AS BIGINT) AS h20,
        |    epochs_ppm
        |  FROM documents d0 JOIN plan USING (source)),
        |c AS (
        |  SELECT doc_id, source,
        |    epochs_ppm // 1000000
        |      + CASE WHEN h20 * 1000000 < (epochs_ppm % 1000000) * 1048576
        |             THEN 1 ELSE 0 END
        |      AS n_copies
        |  FROM d)
        |SELECT doc_id, source, n_copies, CAST(i.i AS BIGINT) AS copy_idx
        |FROM c, unnest(range(0, n_copies)) AS i(i)
        |WHERE n_copies > 0""".stripMargin,
    "mix6_epoch_plan" ->
      s"""WITH $EpochPlanSql
        |SELECT source, avail_tokens, budget_tokens, epochs_ppm,
        |  epochs_ppm > 1000000 AS upsampled
        |FROM plan""".stripMargin
  )
}
