package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-training half of the LLM data pipeline (Sennrich et al.
  * 2016's word-level algorithm, the public one every subword tokenizer
  * descends from). The reference has nothing like it; this is
  * north_star surface.
  *
  * Spark-first decomposition:
  *  - the CORPUS-scale work is one pass: lowercase word extraction +
  *    a weighted word histogram (`flatMap`-style explode + one
  *    groupBy shuffle). At 100 TB this is the only stage that touches
  *    the data, and it is embarrassingly map-side-combinable;
  *  - the histogram is capped to the top `maxWords` words
  *    (deterministic (cnt DESC, word) order) — BPE statistics above a
  *    few thousand distinct words change merges negligibly, and the
  *    cap bounds every later stage's state to KB–MB scale;
  *  - each merge round then runs on the capped word table: adjacent
  *    symbol pairs exploded with their word weights (one vocab-sized
  *    aggregate per round), the argmax pair chosen with a total
  *    deterministic order (count DESC, then pair lexicographically),
  *    and the merge applied to every word's symbol string.
  *
  * The merge application is exact GREEDY LEFT-TO-RIGHT pair merging
  * expressed with plain `replace` (no regex lookaround, so the same
  * expression runs on any engine, including RE2-based ones): doubling
  * the symbol separators first (` ` → `  `) gives every symbol its own
  * private boundary spaces, which makes non-overlapping left-to-right
  * `replace` of ` l  r ` → ` lr ` EQUAL to BPE's overlap rule ("a a a"
  * merges once, "a a a a" twice) — the shared-space consumption bug of
  * the naive ` l r ` replace cannot occur. Collapsing the doubles
  * restores the canonical form.
  *
  * Symbols are drawn from `[a-z]` plus the end-of-word marker `_`
  * (appended as its own symbol; words are `[a-z]+` so it cannot
  * collide), so replace patterns never need escaping and string
  * comparisons agree across engines in binary/ASCII order.
  */
object Bpe {

  val Rounds = 6
  val MaxWords = 5000
  private val MinLen = 2
  private val MaxLen = 20

  /** The capped, weighted word histogram: the one corpus-scale stage. */
  private def wordHistogram(docs: DataFrame, textCol: String,
                            maxWords: Int): DataFrame =
    docs.select(explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")).between(MinLen, MaxLen))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(maxWords)

  /** One greedy left-to-right merge of (l, r) over a symbol string
    * column (space-separated), via the doubled-separator trick.
    */
  private def applyMerge(s: Column, l: String, r: String): Column = {
    val doubled = concat(lit(" "), replace(s, lit(" "), lit("  ")), lit(" "))
    val merged = replace(doubled, lit(s" $l  $r "), lit(s" $l$r "))
    trim(replace(merged, lit("  "), lit(" ")))
  }

  /** Train `rounds` BPE merges over `docs(textCol)`; returns one row per
    * merge: (round, l, r, merged, cnt) where cnt is the pair's weighted
    * corpus count at selection time. Deterministic end to end — exact
    * integer counts, total tie-break order, greedy-left merge
    * application — so an independent engine replays it bit-for-bit
    * (the registered oracle does, as `Rounds` unrolled CTEs).
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
            rounds: Int = Rounds, maxWords: Int = MaxWords): DataFrame =
    // Initial tokenization: chars spaced out + the end-of-word marker.
    trainOver(spark, wordHistogram(docs, textCol, maxWords)
      .select(col("cnt"),
        concat(rtrim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" _")).as("s")),
      rounds)

  /** The shared merge-round loop over a weighted (cnt, s) symbol table —
    * word-level and byte-level training differ ONLY in how `s` was
    * seeded. Vocab-sized from here on; localCheckpoint bounds round
    * lineage (same discipline as Graph's power iteration).
    */
  private def trainOver(spark: SparkSession, toks0: DataFrame,
                        rounds: Int): DataFrame = {
    import spark.implicits._
    var toks = toks0.localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (k <- 1 to rounds) {
      val pairs = toks
        .select(col("cnt"), split(col("s"), " ").as("a"))
        // A fully-merged word (one symbol) has no pairs — and must be
        // excluded BEFORE sequence(0, size-2), which would descend into
        // negative indices for size = 1. The oracle's range(1, len) is
        // empty there for free.
        .filter(size(col("a")) > 1)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(a) - 2), i -> struct(a[i] AS l, a[i+1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
      // The argmax pair: one vocab-sized aggregate + a driver scalar per
      // round (rounds are bounded; the frame is KB-scale) — the same
      // shape as PageRank's per-iteration dangling-mass read.
      // headOption, not head: a degenerate corpus can fully merge every
      // word before `rounds` rounds, leaving no pairs — terminate with
      // fewer merges (the oracle's empty-CTE round is a no-op for free)
      // instead of throwing NoSuchElementException.
      val bestOpt = pairs.orderBy(col("c").desc, col("l"), col("r")).limit(1)
        .collect().headOption
      if (bestOpt.isEmpty) return merges.result().toDF("round", "l", "r", "merged", "cnt")
      val best = bestOpt.get
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      merges += ((k, l, r, l + r, c))
      toks = toks.select(col("cnt"), applyMerge(col("s"), l, r).as("s"))
        .localCheckpoint(true)
    }
    merges.result().toDF("round", "l", "r", "merged", "cnt")
  }

  /** GPT-2-family pre-tokenizer, lookahead-free so the SAME pattern runs
    * under Java regex (Spark) and RE2 (the DuckDB oracle): contractions,
    * optionally-space-prefixed letter runs, digit runs, punctuation runs,
    * then whitespace runs. Divergence from GPT-2's original, on purpose:
    * the `\s+(?!\S)` trailing-space carve-out needs negative lookahead
    * (RE2 has none), so inside a MULTI-space run every space joins the
    * whitespace token instead of the last one prefixing the next word —
    * a well-defined scheme both engines and the plain-Scala spec
    * reference replay identically.
    */
  val PreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** The capped, weighted PRE-TOKEN histogram, each token seeded as its
    * UTF-8 bytes spelled as space-separated 2-hex-digit symbols — the
    * byte-level twin of [[wordHistogram]]. Hex pairs keep the symbol
    * alphabet ASCII and engine-portable (uppercase in both Spark and
    * DuckDB), no end-of-word marker (the pre-tokenizer attaches leading
    * spaces to tokens, GPT-2's convention), and any Unicode text encodes
    * without a special case — multi-byte characters are just more bytes.
    */
  private def byteHistogram(docs: DataFrame, textCol: String,
                            maxWords: Int): DataFrame =
    docs.select(explode(
        regexp_extract_all(col(textCol), lit(PreTokenPattern), lit(0))).as("tok"))
      .filter(length(col("tok")).between(1, MaxLen))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(maxWords)
      .select(col("cnt"),
        rtrim(regexp_replace(hex(encode(col("tok"), "UTF-8")), "(..)", "$1 ")).as("s"))

  /** Byte-level BPE training (the GPT-2 family): regex pre-tokenization,
    * UTF-8 byte alphabet, merges over byte pairs — same one-histogram +
    * bounded-merge-rounds shape as the word-level [[train]], so the
    * corpus-scale cost is identical (one scan + one vocab-sized shuffle,
    * then vocab-sized rounds). Returns (round, l, r, merged, cnt) with
    * symbols as uppercase hex byte strings.
    */
  def trainBytes(spark: SparkSession, docs: DataFrame, textCol: String,
                 rounds: Int = Rounds, maxWords: Int = MaxWords): DataFrame =
    trainOver(spark, byteHistogram(docs, textCol, maxWords), rounds)

  /** Tokenize words of `docs(textCol)` with a trained merge table —
    * the APPLY side: each learned merge replays in order over the
    * word-level symbol strings, then per-word token sequences join
    * back. Vocabulary application at corpus scale is a broadcast of
    * the (tiny) merge list + one map-side pass; here expressed over
    * the capped histogram for the spec's round-trip check.
    */
  def tokenizeWords(spark: SparkSession, docs: DataFrame, textCol: String,
                    merges: Seq[(String, String)],
                    maxWords: Int = MaxWords): DataFrame = {
    var toks = wordHistogram(docs, textCol, maxWords)
      .select(col("word"), col("cnt"),
        concat(rtrim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" _")).as("s"))
    for ((l, r) <- merges)
      toks = toks.select(col("word"), col("cnt"), applyMerge(col("s"), l, r).as("s"))
    toks.select(col("word"), col("cnt"), split(col("s"), " ").as("tokens"))
  }

  /** The APPLY side at corpus scale: tokenize every document with a
    * trained merge list and emit per-doc token accounting — the numbers
    * a training-data pipeline actually budgets with (sequence packing,
    * mixture token shares, cost estimates all consume token counts).
    *
    * Scale shape: merges are a driver-side literal list (vocab-sized);
    * the chain of `replace`s applies MAP-SIDE on the DISTINCT word grain
    * (vocabulary-sized, not corpus-sized — the same word never re-pays
    * the merge chain), then one word-keyed join carries per-word token
    * counts back onto the (doc, word) stream and one doc-keyed aggregate
    * finishes. Two shuffles total, both at most corpus-word-sized.
    */
  def encodeCorpus(spark: SparkSession, docs: DataFrame, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col("doc_id"), explode(
        expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .filter(length(col("word")).between(MinLen, MaxLen))
    var toks = words.select(col("word")).distinct()
      .select(col("word"),
        concat(rtrim(regexp_replace(col("word"), "(.)", "$1 ")), lit(" _")).as("s"))
    for ((l, r) <- merges)
      toks = toks.select(col("word"), applyMerge(col("s"), l, r).as("s"))
    val wordTokens = toks.select(col("word"), size(split(col("s"), " ")).as("wt"))
    words.join(wordTokens, "word")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("wt")).cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("n_words")).as("tokens_per_word"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Distributed tokenizer training end to end on the documents
    // corpus: the oracle replays all `Rounds` merges as unrolled CTEs
    // (like g1/g2's power iteration), so pair counting, the
    // deterministic argmax, AND the greedy merge application must all
    // be exact — a single mis-merged word shifts later rounds' counts
    // and breaks the hash.
    "vocab2_bpe_merges" -> { (s, d) =>
      train(s, s.read.parquet(s"$d/documents.parquet"), "text")
    },
    // Train-then-tokenize end to end: the learned merges replay over
    // EVERY document and the oracle recomputes both halves (training
    // CTEs + the same merge chain on the distinct-word grain), so a
    // single mis-tokenized word occurrence breaks the per-doc hash.
    "vocab3_bpe_encode" -> { (s, d) =>
      val docs = s.read.parquet(s"$d/documents.parquet")
      val merges = train(s, docs, "text").collect()
        .sortBy(_.getInt(0)).toSeq.map(r => (r.getString(1), r.getString(2)))
      encodeCorpus(s, docs, "text", merges)
    },
    // Tokenizer FERTILITY per domain (tokens emitted per word) — the
    // standard cross-domain tokenizer-quality metric (e.g. Rust et al.
    // 2021): a domain whose fertility runs high is poorly served by the
    // learned vocabulary and inflates its training cost per word.
    // Composition: vocab3's train+encode verbatim, rolled up to the
    // source grain; the division happens ONCE on exact long sums, so the
    // double matches the oracle bit-for-bit.
    "vocab5_fertility" -> { (s, d) =>
      val docs = s.read.parquet(s"$d/documents.parquet")
      val merges = train(s, docs, "text").collect()
        .sortBy(_.getInt(0)).toSeq.map(r => (r.getString(1), r.getString(2)))
      encodeCorpus(s, docs, "text", merges)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
          sum(col("n_tokens")).as("n_tokens"))
        .withColumn("fertility",
          col("n_tokens").cast("double") / col("n_words"))
    },
    // Byte-level (GPT-2-family) training end to end: regex pre-split,
    // UTF-8 hex-byte alphabet, same unrolled-CTE oracle discipline as
    // vocab2 — a single mis-counted pre-token or mis-merged byte pair
    // shifts later rounds and breaks the hash.
    "vocab4_bpe_bytes" -> { (s, d) =>
      trainBytes(s, s.read.parquet(s"$d/documents.parquet"), "text")
    }
  )

  /** The unrolled-CTE oracle: the same algorithm in pure SQL. Every CTE
    * is `AS MATERIALIZED` and each round consumes its predecessor via a
    * cross join with the one-row argmax (never repeated scalar
    * subqueries): inlined CTEs would re-evaluate the whole chain per
    * reference — ~4^rounds blowup — while materialization keeps the
    * oracle linear in rounds, mirroring the engine's per-round
    * checkpoints.
    */
  /** The shared WITH-prefix: word histogram + `rounds` training CTEs
    * (p1..pN argmax rows, t1..tN merged symbol tables).
    */
  /** The shared p1..pN / t1..tN training round chain (argmax + greedy
    * merge per round), agnostic of how t0 was seeded.
    */
  private def bpeRoundCtes(rounds: Int): String =
    (1 to rounds).map { k =>
      val prev = s"t${k - 1}"
      s"""p$k AS MATERIALIZED (
         |  SELECT l, r, c FROM (
         |    SELECT a[i] AS l, a[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS c
         |    FROM (SELECT cnt, string_split(s, ' ') AS a FROM $prev),
         |         LATERAL (SELECT unnest(range(1, len(a))) AS i)
         |    GROUP BY 1, 2)
         |  ORDER BY c DESC, l, r LIMIT 1
         |),
         |t$k AS MATERIALIZED (
         |  SELECT cnt,
         |    trim(replace(
         |      replace(' ' || replace(s, ' ', '  ') || ' ',
         |              ' ' || p$k.l || '  ' || p$k.r || ' ',
         |              ' ' || p$k.l || p$k.r || ' '),
         |      '  ', ' ')) AS s
         |  FROM $prev, p$k
         |)""".stripMargin
    }.mkString(",\n")

  private def bpeOracleCtes(rounds: Int, maxWords: Int): String =
    s"""WITH words AS MATERIALIZED (
       |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
       |  WHERE length(w) BETWEEN $MinLen AND $MaxLen
       |  GROUP BY w
       |  ORDER BY cnt DESC, word LIMIT $maxWords
       |),
       |t0 AS MATERIALIZED (SELECT cnt, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' _' AS s FROM words),
       |${bpeRoundCtes(rounds)}""".stripMargin

  /** Byte-level head: pre-token histogram + hex-byte t0 seeding. The
    * regex literal is the SAME [[PreTokenPattern]] (RE2-safe by
    * construction), and DuckDB's `hex(encode(tok))` spells UTF-8 bytes
    * in the same uppercase hex Spark's `hex(encode(...))` does.
    */
  private def bpeBytesOracleCtes(rounds: Int, maxWords: Int): String = {
    val pat = PreTokenPattern.replace("'", "''")
    s"""WITH btoks AS MATERIALIZED (
       |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(text, '$pat')) AS tok FROM documents)
       |  WHERE length(tok) BETWEEN 1 AND $MaxLen
       |  GROUP BY tok
       |  ORDER BY cnt DESC, tok LIMIT $maxWords
       |),
       |t0 AS MATERIALIZED (
       |  SELECT cnt, rtrim(regexp_replace(hex(encode(tok)), '(..)', '\\1 ', 'g')) AS s
       |  FROM btoks
       |),
       |${bpeRoundCtes(rounds)}""".stripMargin
  }

  private def bpeOracle(rounds: Int, maxWords: Int): String = {
    val tail = (1 to rounds).map(k =>
      s"SELECT $k AS round, l, r, l || r AS merged, c AS cnt FROM p$k")
      .mkString("\nUNION ALL\n")
    s"${bpeOracleCtes(rounds, maxWords)}\n$tail"
  }

  /** Training CTEs + the same merge chain replayed on the corpus's
    * DISTINCT word grain, then per-doc token accounting.
    */
  private def bpeEncodeOracle(rounds: Int, maxWords: Int): String = {
    val applyCtes = (1 to rounds).map { k =>
      val prev = s"e${k - 1}"
      s"""e$k AS MATERIALIZED (
         |  SELECT word,
         |    trim(replace(
         |      replace(' ' || replace(s, ' ', '  ') || ' ',
         |              ' ' || p$k.l || '  ' || p$k.r || ' ',
         |              ' ' || p$k.l || p$k.r || ' '),
         |      '  ', ' ')) AS s
         |  FROM $prev, p$k
         |)""".stripMargin
    }
    s"""${bpeOracleCtes(rounds, maxWords)},
       |docwords AS MATERIALIZED (
       |  SELECT doc_id, w AS word
       |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |        FROM documents)
       |  WHERE length(w) BETWEEN $MinLen AND $MaxLen
       |),
       |e0 AS MATERIALIZED (
       |  SELECT word, rtrim(regexp_replace(word, '(.)', '\\1 ', 'g')) || ' _' AS s
       |  FROM (SELECT DISTINCT word FROM docwords)
       |),
       |${applyCtes.mkString(",\n")},
       |wt AS MATERIALIZED (
       |  SELECT word, CAST(len(string_split(s, ' ')) AS INT) AS wt FROM e$rounds
       |),
       |perdoc AS MATERIALIZED (
       |  SELECT doc_id, count(*) AS n_words, CAST(sum(wt) AS BIGINT) AS n_tokens,
       |    CAST(sum(wt) AS DOUBLE) / count(*) AS tokens_per_word
       |  FROM docwords JOIN wt USING (word)
       |  GROUP BY doc_id
       |)""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "vocab2_bpe_merges" -> bpeOracle(Rounds, MaxWords),
    "vocab3_bpe_encode" ->
      s"""${bpeEncodeOracle(Rounds, MaxWords)}
         |SELECT doc_id, n_words, n_tokens, tokens_per_word FROM perdoc""".stripMargin,
    // vocab5: the identical training + encode chain, rolled up to the
    // source grain — exact long sums divided once, so the double is
    // bit-identical on both engines.
    "vocab5_fertility" ->
      s"""${bpeEncodeOracle(Rounds, MaxWords)}
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(sum(p.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
         |  CAST(sum(p.n_tokens) AS DOUBLE) / CAST(sum(p.n_words) AS BIGINT) AS fertility
         |FROM perdoc p JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin,
    "vocab4_bpe_bytes" -> {
      val tail = (1 to Rounds).map(k =>
        s"SELECT $k AS round, l, r, l || r AS merged, c AS cnt FROM p$k")
        .mkString("\nUNION ALL\n")
      s"${bpeBytesOracleCtes(Rounds, MaxWords)}\n$tail"
    }
  )
}
