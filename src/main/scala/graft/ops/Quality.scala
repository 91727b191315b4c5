package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus-quality operators an LLM training-data pipeline runs after the
  * per-document text stats (TextAnalysis) and before dedup (Dedup):
  * repetition-based quality filtering (the Gopher/MassiveText rules) and
  * corpus-level n-gram statistics. Absent from the reference (SURVEY.md
  * §2.2 — north-star extension surface).
  *
  * Scale shape: both operators are one explode + hash-aggregation over the
  * corpus — the aggregation keys are (doc, word) / bigram, so partial
  * (map-side) aggregation absorbs the explosion before the shuffle; nothing
  * here is quadratic in document count and no driver-side iteration exists.
  */
object Quality {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pref1_preference_pairs" -> { (s, d) =>
      // PREFERENCE-PAIR construction — the RLHF/DPO dataset-assembly step:
      // within each candidate group (source here; the prompt id in a
      // real pipeline), pick chosen = best-scored response and rejected =
      // worst-scored, emit the pair with its margin, and drop groups
      // whose margin is zero (no learnable signal — the published DPO
      // filter). Score is integer-ppm lexical diversity (distinct words
      // per word, the t17 signal) so the ranking is engine-exact; ties
      // break on lower doc_id, making both picks total orders.
      //
      // Scale shape: scoring is map-side projection; both row_number
      // windows and the final aggregate share ONE group-keyed shuffle
      // (identical partition key), and per-group window state is a
      // counter, not a buffer. Pair selection never materializes
      // candidate × candidate — it is argmax/argmin, not a join.
      val scored = Tables.table(s, d, "documents")
        .select(col("source"), col("doc_id"),
          expr("size(array_distinct(split(lower(text), ' '))) * 1000000 " +
            "DIV size(split(lower(text), ' '))").as("ppm"))
      val wBest = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("ppm").desc, col("doc_id"))
      val wWorst = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("ppm").asc, col("doc_id"))
      scored
        .withColumn("rb", row_number().over(wBest))
        .withColumn("rw", row_number().over(wWorst))
        .groupBy(col("source"))
        .agg(max(when(col("rb") === 1, col("doc_id"))).as("chosen_id"),
          max(when(col("rb") === 1, col("ppm"))).as("chosen_ppm"),
          max(when(col("rw") === 1, col("doc_id"))).as("rejected_id"),
          max(when(col("rw") === 1, col("ppm"))).as("rejected_ppm"))
        .withColumn("margin_ppm", col("chosen_ppm") - col("rejected_ppm"))
        .filter(col("margin_ppm") > 0)
    },
    "t22_textrank_keywords" -> { (s, d) =>
      // TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank over
      // the word co-occurrence graph — nodes are corpus words, an
      // undirected edge links words ever ADJACENT in a document (the
      // paper's window-2 co-occurrence), rank is the keyword salience a
      // summarization pipeline cuts on. Pure composition: the t11 bigram
      // extraction feeds Graph.pageRank unchanged (id-type-agnostic — the
      // ids here are word STRINGS, no vocab-to-int sort needed).
      //
      // Scale shape: the pair stream collapses to DISTINCT normalized
      // edges map-side before the symmetrize (vocab² bounds the edge set,
      // and Heaps' law bounds vocab way below corpus size); the iteration
      // then runs on the vocab-sized graph with pageRank's cached
      // edge-partitioning discipline. Symmetric graph -> sink-free by
      // construction (trustSinkFree skips the probe job).
      val pairs = Tables.table(s, d, "documents")
        .select(split(lower(col("text")), " ").as("ws"))
        .select(explode(zip_with(
          slice(col("ws"), lit(1), size(col("ws")) - 1),
          slice(col("ws"), lit(2), size(col("ws")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
        .select(least(col("p.w1"), col("p.w2")).as("a"),
          greatest(col("p.w1"), col("p.w2")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      Graph.pageRank(s, edges, trustSinkFree = true)
        .select(col("id").as("word"), round(col("rank"), 6).as("rank"))
    },
    "t10_repetition" -> { (s, d) =>
      // Gopher-style repetition signals: duplicate-word fraction and
      // top-word fraction per document, plus the resulting keep/drop flag.
      // One explode pass, two cascaded aggregations; both shuffles move
      // partially-aggregated rows only (distinct (doc,word) pairs, then
      // per-partition doc partials) — never the exploded word stream.
      val words = Tables.table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      val wc = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      wc.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_words"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("top_c"))
        .select(
          col("doc_id"),
          col("n_words"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 4)
            .as("dup_word_frac"),
          round(col("top_c").cast("double") / col("n_words"), 4).as("top_word_frac"),
          ((lit(1.0) - col("n_distinct").cast("double") / col("n_words")) > 0.5 ||
            col("top_c").cast("double") / col("n_words") > 0.2).as("repetitive"))
    },
    "p2_clean_corpus" -> { (s, d) =>
      // The north-star composition, end to end in ONE job: normalize text
      // (t7's cleaning), gate on length and repetition (t10's signal),
      // exact-dedup the survivors on normalized content (d1's digest
      // grouping, min-id winner). Plan shape: one explode+agg for the
      // repetition signal joined back to the doc grain, then a digest
      // window for the dedup — two shuffles total (doc_id, content key),
      // both on aggregate-sized rows, independent of corpus bytes.
      import org.apache.spark.sql.expressions.Window
      val stop = Seq("the", "a", "of", "and", "to", "is", "in")
      val cleaned = regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " ")
      val base = Tables.table(s, d, "documents").select(
        col("doc_id"),
        concat_ws(" ",
          filter(split(trim(cleaned), " "), w => !w.isInCollection(stop) && w =!= ""))
          .as("clean_text"))
      val rep = Tables.table(s, d, "documents")
        .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_words"), max(col("c")).as("top_c"))
      val gated = base.join(rep, Seq("doc_id"))
        .withColumn("twf", col("top_c").cast("double") / col("n_words"))
        .filter(col("n_words") >= 5 && col("twf") <= 0.2)
        .withColumn("content_key", md5(col("clean_text")))
      val w = Window.partitionBy(col("content_key")).orderBy(col("doc_id"))
      gated.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("content_key"), col("n_words"),
          round(col("twf"), 4).as("top_word_frac"))
    },
    "p3_pipeline_e2e" -> { (s, d) =>
      // The whole pre-training flow as ONE DAG: p2's clean+gate+dedup
      // survivors, split1's deterministic content-hash train/val/test
      // assignment, then per-(source, split) shard accounting — the table
      // a trainer's data loader is pointed at. Composing registered ops
      // directly (no intermediate materialization) keeps it a single
      // Catalyst plan: the scan is shared, and only aggregate-grain rows
      // shuffle.
      val kept = queries("p2_clean_corpus")(s, d)
      val tagged = Tables.table(s, d, "documents").select(
        col("doc_id"), col("source"),
        Packing.splitLabel(col("text")).as("split"))
      kept.join(tagged, Seq("doc_id"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"))
    },
    "t12_contamination" -> { (s, d) =>
      // Train-test contamination scan (the decontamination pass every LLM
      // corpus runs): docs overlapping a benchmark set's word 5-grams are
      // flagged. The benchmark side (here: doc_id < 10 standing in for an
      // eval set) collapses to a distinct n-gram set that BROADCASTS; the
      // corpus side explodes its n-grams map-side into the broadcast hash
      // join — the corpus is scanned once, nothing corpus-sized shuffles.
      def ngrams(dfCol: org.apache.spark.sql.Column) = {
        val w = split(lower(dfCol), " ")
        // Guard short docs explicitly: sequence(1, 0) is a DESCENDING
        // [1, 0] in Spark, not empty, and element_at(w, 0) throws.
        when(size(w) >= 5,
          array_distinct(transform(
            sequence(lit(1), size(w) - 4),
            i => concat_ws(" ", element_at(w, i), element_at(w, i + 1),
              element_at(w, i + 2), element_at(w, i + 3), element_at(w, i + 4)))))
          .otherwise(array().cast("array<string>"))
      }
      val docs = Tables.table(s, d, "documents")
      val benchNg = docs.filter(col("doc_id") < 10)
        .select(explode(ngrams(col("text"))).as("ng")).distinct()
      val corpusNg = docs.filter(col("doc_id") >= 10)
        .select(col("doc_id"), explode(ngrams(col("text"))).as("ng"))
      val hits = corpusNg.join(broadcast(benchNg), Seq("ng"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      docs.filter(col("doc_id") >= 10).select(col("doc_id"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_overlap_5grams"),
          (coalesce(col("n_hits"), lit(0L)) >= 3).as("contaminated"))
    },
    "t16_lm_perplexity" -> { (s, d) =>
      // CCNet-style n-gram LM quality scoring: train an add-1-smoothed
      // bigram LM on the reference half of the corpus (even doc_ids),
      // score EVERY document's per-bigram log-likelihood, and emit
      // per-doc perplexity — the classic "how surprising is this text
      // under in-domain language statistics" filter (low ppl ≈ fluent
      // in-domain text, high ppl ≈ noise/boilerplate/foreign).
      //
      // Scale shape: the model is two hash aggregations over the train
      // slice (context counts c1, bigram counts c2 — vocab- and
      // bigram-vocab-sized, NOT corpus-sized); scoring is the doc bigram
      // stream joined against those two count tables. No broadcast hint
      // on purpose: AQE sees the post-aggregation sizes and broadcasts
      // when the model fits (word-level vocab does), else falls back to a
      // shuffle join — exactly the right behavior when a 100 TB corpus
      // produces an unexpectedly large bigram table. p(w2|w1) =
      // (c2+1)/(c1+V) with the integer adds done before ONE double
      // division, so both engines compute bit-identical probabilities;
      // ln/exp land within an ulp and ppl surfaces rounded (t15's
      // precedent for libm-adjacent oracle columns).
      lmPerplexity(s, d)
    },
    "ccnet1_ppl_buckets" -> { (s, d) =>
      // CCNet's head/middle/tail partition (Wenzek et al. 2020): per
      // language, documents are terciled by LM perplexity — head = most
      // fluent third, tail = noisiest — and downstream pipelines keep or
      // re-weight tiers. Composition: t16's bigram-LM scorer feeds an
      // ntile(3) per language ordered by (ppl, doc_id) — the ROUNDED ppl
      // (the t16 surface the oracle already matches hash-exactly) plus
      // the id tiebreak makes the tercile assignment a total order on
      // both engines.
      //
      // Scale shape: the scorer's cost dominates (see t16); the tercile
      // window adds one (lang)-keyed exchange over doc-grain rows and the
      // tier rollup reuses that partitioning. Exact per-language ntile is
      // inherently a per-language total order (the e6 stance); the 100 TB
      // tier swaps it for approx_percentile cut points when one language
      // outgrows a task.
      val ppl = lmPerplexity(s, d).select(col("doc_id"), col("ppl"))
      val docs = Tables.table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(split(lower(col("text")), " ")).cast("long").as("n_tokens"))
      docs.join(ppl, "doc_id")
        .withColumn("bucket", ntile(3).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang")).orderBy(col("ppl"), col("doc_id"))))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
          min(col("ppl")).as("ppl_min"), max(col("ppl")).as("ppl_max"))
        .withColumn("tier",
          when(col("bucket") === 1, "head")
            .when(col("bucket") === 2, "middle").otherwise("tail"))
    },
    "t23_blocklist_filter" -> { (s, d) =>
      // C4's blocklist filter (Raffel et al. 2020): a document containing
      // any dirty/obscene-list PHRASE is dropped wholesale. Phrases are
      // matched at word-boundary grain — the doc's adjacent-word bigrams
      // against the list — not substring grain (no "scunthorpe" false
      // hits). The list is a tiny literal array (the model artifact; a
      // real deployment broadcasts it), the bigram build and the filter
      // are native HOFs, so the whole pass is one map-side projection
      // over the scan: zero exchanges (PlanAuditSpec pins it).
      val words = split(lower(col("text")), " ")
      val bigrams = zip_with(
        slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => concat(a, lit(" "), b))
      val listed = Blocklist.map(p => s"'$p'").mkString(", ")
      Tables.table(s, d, "documents")
        .select(col("doc_id"), bigrams.as("bg"))
        .select(col("doc_id"),
          expr(s"size(filter(bg, g -> g IN ($listed)))").cast("long").as("n_hits"))
        .withColumn("keep", col("n_hits") === 0L)
    },
    "t11_bigrams" -> { (s, d) =>
      // Corpus-level top-20 bigrams: per-document bigram arrays built with
      // array primitives (slice + zip_with — codegen'd, no UDF), exploded
      // into a count aggregation, global top-k via TakeOrderedAndProject.
      val words = split(lower(col("text")), " ")
      val bigrams = zip_with(
        slice(words, lit(1), size(words) - 1),
        slice(words, lit(2), size(words) - 1),
        (a, b) => concat(a, lit(" "), b))
      Tables.table(s, d, "documents")
        .select(explode(bigrams).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)
    },
    "t15_pmi_collocations" -> { (s, d) =>
      // Pointwise mutual information over t11's bigram grain: which word
      // pairs co-occur far beyond chance — the classic collocation /
      // multi-word-expression detector (Church–Hanks), used to decide
      // what becomes one token ("new york") in vocab construction.
      // pmi = ln(P(ab) / (P(a)·P(b))) = ln(cab·Nu·Nu / (Nb·ca·cb)).
      //
      // Scale shape: corpus totals are MAP-SIDE sums (size(ws) per doc,
      // no explode), the unigram table is vocab-sized and broadcasts onto
      // the bigram counts twice (a-side, b-side), so the only full-corpus
      // shuffle is the bigram count itself. The ≥5 support floor kills
      // the hapax tail before the joins. Double arithmetic in the same
      // left-assoc order as the oracle; ln can differ in the last ulp
      // across libms, so the surface is round(·, 4) (t14 precedent).
      val words = split(lower(col("text")), " ")
      val base = Tables.table(s, d, "documents").select(words.as("ws"))
      val totals = base.agg(
        sum(size(col("ws"))).cast("double").as("nu"),
        sum(greatest(size(col("ws")) - 1, lit(0))).cast("double").as("nb"))
      val uni = base.select(explode(col("ws")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val pairs = zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("a"), b.as("b")))
      val bi = base.select(explode(pairs).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
        .filter(col("cab") >= 5)
      bi.join(broadcast(uni.select(col("tok").as("a"), col("c").as("ca"))), "a")
        .join(broadcast(uni.select(col("tok").as("b"), col("c").as("cb"))), "b")
        .crossJoin(broadcast(totals))
        .select(concat(col("a"), lit(" "), col("b")).as("bigram"), col("cab"),
          round(log((col("cab").cast("double") * col("nu") * col("nu")) /
            (col("nb") * col("ca") * col("cb"))), 4).as("pmi"))
        .orderBy(col("pmi").desc, col("bigram"))
        .limit(20)
    },
    "t19_gopher_rules" -> { (s, d) => gopherRules(s, d) },
    "t20_quality_classifier" -> { (s, d) =>
      // MODEL-BASED quality filter — the published classifier-filter tier
      // (FineWeb-Edu, Penedo et al. 2024; DCLM, Li et al. 2024: a linear
      // bag-of-words scorer trained on a labeled slice, applied
      // corpus-wide). Training is CLOSED-FORM counting (the Naive-Bayes
      // family), so the whole model — not just the scoring — replays
      // exactly in the oracle: the even-doc_id half is labeled by the
      // t19 Gopher rules (the bootstrap-labels trick: rules label the
      // seed set, the model generalizes token evidence to every doc
      // including the held-out odd half); each word with >= 5 training
      // occurrences gets weight (pos+1)·10^6 DIV (pos+neg+2) ppm — the
      // Laplace-smoothed positive rate; unseen/rare words fall back to
      // the 500000 ppm prior; a document's score is the integer mean of
      // its DISTINCT words' weights, kept when >= the prior. All-integer
      // fixed-point arithmetic (the d8 Lloyd's discipline) — no logs, no
      // doubles, engine-exact.
      //
      // Scale shape: training is one word-grain shuffle over the train
      // slice (map-side partial agg absorbs token volume) into a
      // vocab-sized weights table; scoring is one word-grain shuffle
      // (features join weights, regroup per doc). At 100 TB the weights
      // table is the model artifact — broadcast when it fits, shuffle
      // join otherwise; nothing iterates and nothing is corpus²-sized.
      val lab = gopherRules(s, d).select(col("doc_id"), col("keep"))
      val words = Tables.table(s, d, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(lower(col("text")), " "))).as("w"))
      val train = words.join(lab.filter(col("doc_id") % 2 === 0), "doc_id")
      val weights = train.groupBy(col("w"))
        .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("pos"),
          sum(when(col("keep"), 0L).otherwise(1L)).as("neg"))
        .filter(col("pos") + col("neg") >= 5L)
        .select(col("w"),
          expr("(pos + 1) * 1000000 DIV (pos + neg + 2)").as("w_ppm"))
      val scored = words.join(weights, Seq("w"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feats"),
          sum(coalesce(col("w_ppm"), lit(500000L))).as("score_sum"))
        .withColumn("score_ppm", expr("score_sum DIV n_feats"))
      scored.join(lab, "doc_id")
        .select(col("doc_id"), col("keep").as("label"),
          (col("doc_id") % 2 === 0).as("is_train"),
          col("n_feats"), col("score_sum"), col("score_ppm"),
          (col("score_ppm") >= 500000L).as("pred_keep"))
    },
    "t21_pii_redact" -> { (s, d) =>
      // PII REDACTION — the privacy pass every published corpus pipeline
      // runs before training (CCNet/FineWeb ship exactly this shape:
      // regex detectors for emails / phone numbers / IPs, counts per
      // type, placeholder substitution). The synthetic corpus carries no
      // PII, so the pass runs over a deterministically AUGMENTED text
      // (the media-synthesis discipline: every 7th doc gains an email,
      // every 11th a 555-line phone, every 13th an IP — formulas both
      // engines replay), which also means the detectors are exercised
      // against real surrounding text, not a toy column. Patterns stay
      // inside the Java-regex ∩ RE2 common subset (character classes,
      // counted repetition — no lookaround, no backrefs) so Spark and
      // DuckDB match identically; counts are taken BEFORE redaction and
      // the cleaned text is hash-compared byte-for-byte, so a greedy-vs-
      // lazy or replace-first-vs-all divergence breaks the row. Entirely
      // map-side: one projection, no shuffle; at 100 TB this is the
      // cheapest pass in the pipeline and composes into p2/p3 upstream
      // of dedup (redaction BEFORE content hashing, the published order,
      // so two docs differing only in PII dedup together).
      val email = "[a-z0-9]+@[a-z0-9]+\\.[a-z]+"
      val phone = "555-[0-9]{4}"
      val ip = "[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+"
      val aug = concat(col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact u"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" ok"))).otherwise(lit("")),
        when(col("doc_id") % 13 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".7 logged"))).otherwise(lit("")))
      Tables.table(s, d, "documents")
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(email)).cast("long").as("n_emails"),
          regexp_count(col("t"), lit(phone)).cast("long").as("n_phones"),
          regexp_count(col("t"), lit(ip)).cast("long").as("n_ips"),
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            email, "<EMAIL>"), phone, "<PHONE>"), ip, "<IP>").as("clean_text"))
        .withColumn("has_pii",
          col("n_emails") + col("n_phones") + col("n_ips") > 0L)
    }
  )

  /** The PUBLISHED Gopher/MassiveText document-quality rules (Rae et
    * al. 2021, App. A): word count in [50, 100k], mean word length in
    * [3, 10], >=80% of words alphabetic, '#'/'...' symbol-to-word
    * ratio <= 0.1, and at least 2 of the paper's 8 stop words present.
    * (The two LINE rules — bullet starts, ellipsis ends — have no
    * grain here: the corpus is single-line by construction, so they'd
    * be constant-true columns; omitted rather than faked.) The paper
    * applies the 0.1 symbol threshold to EACH symbol's ratio
    * separately, so '#' and '...' carry their own counts and flags —
    * summing them would reject documents the published rule keeps.
    * Every ratio threshold is an INTEGER cross-multiplication
    * (3·n <= chars, 5·alpha >= 4·n, 10·sym <= n) so both engines
    * compare bit-equal longs — no division, no doubles. Entirely
    * map-side: one projection over the scan, no shuffle,
    * pushdown-friendly (PlanAuditSpec pins zero exchanges). Registered
    * as t19; also the label source for the t20 classifier.
    */
  def gopherRules(s: SparkSession, d: String): DataFrame = {
    val words = split(col("text"), " ")
    val nWords = size(words).cast("long")
    // Single-space corpus identity: total word chars = len - (n-1).
    val wordChars = (length(col("text")) - size(words) + 1).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    val hashCnt = regexp_count(col("text"), lit("#")).cast("long")
    val ellipsisCnt = regexp_count(col("text"), lit("\\.\\.\\.")).cast("long")
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stops.map(w => array_contains(words, w).cast("long"))
      .reduce(_ + _)
    val okWords = col("n_words") >= 50L && col("n_words") <= 100000L
    val okMeanLen = col("word_chars") >= lit(3L) * col("n_words") &&
      col("word_chars") <= lit(10L) * col("n_words")
    val okAlpha = lit(5L) * col("alpha_words") >= lit(4L) * col("n_words")
    val okSymbols = lit(10L) * col("hash_cnt") <= col("n_words") &&
      lit(10L) * col("ellipsis_cnt") <= col("n_words")
    val okStops = col("stop_hits") >= 2L
    Tables.table(s, d, "documents")
      .select(col("doc_id"), nWords.as("n_words"), wordChars.as("word_chars"),
        alphaWords.as("alpha_words"), hashCnt.as("hash_cnt"),
        ellipsisCnt.as("ellipsis_cnt"), stopHits.as("stop_hits"))
      .select(col("*"), okWords.as("ok_words"), okMeanLen.as("ok_mean_len"),
        okAlpha.as("ok_alpha"), okSymbols.as("ok_symbols"),
        okStops.as("ok_stops"),
        (okWords && okMeanLen && okAlpha && okSymbols && okStops).as("keep"))
  }

  /** t23's phrase blocklist — corpus-vocabulary phrases so the fixture
    * genuinely drops documents; a deployment swaps in the published
    * C4 list unchanged.
    */
  val Blocklist: Seq[String] = Seq("slow merge", "big query", "hash join")

  /** t16's CCNet-style add-1 bigram-LM scorer, factored so ccnet1 can
    * tercile on the same per-doc perplexity: train on even doc_ids,
    * score every document, emit (doc_id, n_bigrams, oov_bigrams, ppl)
    * with ppl rounded to the oracle-matched surface. Scale notes live on
    * the t16 entry.
    */
  private def lmPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.table(s, d, "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("ws"))
    val pairs = docs.select(col("doc_id"), explode(zip_with(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1"), col("p.w2"))
    val train = pairs.filter(col("doc_id") % 2 === 0)
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val vocab = docs.filter(col("doc_id") % 2 === 0)
      .select(explode(col("ws")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    pairs
      .join(c2, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        log((coalesce(col("c2"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")).as("lp"),
        when(col("c2").isNull, 1L).otherwise(0L).as("oov"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("oov")).as("oov_bigrams"),
        round(exp(-(sum(col("lp")) / count(lit(1)))), 2).as("ppl"))
  }

  private val T16Oracle =
    """WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      |db AS (SELECT doc_id,
      |         unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS w1,
      |         unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS w2
      |       FROM w),
      |tr AS (SELECT * FROM db WHERE doc_id % 2 = 0),
      |c1 AS (SELECT w1, count(*) AS c FROM tr GROUP BY 1),
      |c2 AS (SELECT w1, w2, count(*) AS c FROM tr GROUP BY 1, 2),
      |vocab AS (SELECT count(DISTINCT tok) AS v
      |          FROM (SELECT unnest(ws) AS tok FROM w WHERE doc_id % 2 = 0)),
      |scored AS (
      |  SELECT db.doc_id,
      |    ln(CAST(COALESCE(c2.c, 0) + 1 AS DOUBLE) /
      |       CAST(COALESCE(c1.c, 0) + vocab.v AS DOUBLE)) AS lp,
      |    CASE WHEN c2.c IS NULL THEN 1 ELSE 0 END AS oov
      |  FROM db LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
      |  CROSS JOIN vocab)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(oov) AS BIGINT) AS oov_bigrams,
      |  round(exp(-(sum(lp) / count(*))), 2) AS ppl
      |FROM scored GROUP BY doc_id""".stripMargin

  private val P2Oracle =
    """WITH wrds AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM wrds GROUP BY 1, 2),
        |rep AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c
        |  FROM wc GROUP BY 1),
        |base AS (
        |  SELECT doc_id, array_to_string(list_filter(
        |    string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '),
        |    w -> w NOT IN ('the','a','of','and','to','is','in') AND w <> ''), ' ') AS clean_text
        |  FROM documents),
        |gated AS (
        |  SELECT b.doc_id, md5(b.clean_text) AS content_key, r.n_words,
        |    CAST(r.top_c AS DOUBLE) / r.n_words AS twf
        |  FROM base b JOIN rep r USING (doc_id)
        |  WHERE r.n_words >= 5 AND CAST(r.top_c AS DOUBLE) / r.n_words <= 0.2)
        |SELECT doc_id, content_key, n_words, round(twf, 4) AS top_word_frac
        |FROM (SELECT *, row_number() OVER (PARTITION BY content_key ORDER BY doc_id) AS rn
        |      FROM gated) t
        |WHERE rn = 1""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // t22: the word graph rebuilt on raw strings (adjacent pairs via the
    // positional-range idiom, CASE-normalized undirected edges) and the
    // same sink-free power iteration unrolled — each rK CTE is one Spark
    // loop round; round(,6) absorbs aggregation-order double drift (the
    // g1 precedent).
    "t22_textrank_keywords" -> {
      val d = graft.ops.Graph.Damping
      val iters = (1 to graft.ops.Graph.Iterations).map { k =>
        s"""r$k AS (
           |  SELECT nodes.id,
           |    (1 - $d) / (SELECT n FROM nn)
           |      + $d * coalesce(sum(r${k - 1}.rank / deg.deg), 0) AS rank
           |  FROM nodes
           |  LEFT JOIN edges ON edges.dst = nodes.id
           |  LEFT JOIN deg ON deg.src = edges.src
           |  LEFT JOIN r${k - 1} ON r${k - 1}.id = edges.src
           |  GROUP BY nodes.id)""".stripMargin
      }
      s"""WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
         |bp AS (SELECT ws, unnest(range(1, CAST(len(ws) AS BIGINT))) AS i FROM w),
         |pr AS (SELECT
         |         CASE WHEN ws[i] < ws[i+1] THEN ws[i] ELSE ws[i+1] END AS a,
         |         CASE WHEN ws[i] < ws[i+1] THEN ws[i+1] ELSE ws[i] END AS b
         |       FROM bp),
         |und AS (SELECT DISTINCT a, b FROM pr WHERE a <> b),
         |edges AS (SELECT a AS src, b AS dst FROM und
         |          UNION ALL SELECT b, a FROM und),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
         |${iters.mkString(",\n")}
         |SELECT id AS word, round(rank, 6) AS rank
         |FROM r${graft.ops.Graph.Iterations}""".stripMargin
    },
    // pref1: the same total-order argmax/argmin replayed with row_number
    // windows — list_distinct over the split replays array_distinct
    // (first-occurrence dedup; equality is all that matters), integer ppm
    // via //, HAVING-equivalent margin filter.
    "pref1_preference_pairs" ->
      """WITH scored AS (
        |  SELECT source, doc_id,
        |    len(list_distinct(string_split(lower(text), ' '))) * 1000000
        |      // len(string_split(lower(text), ' ')) AS ppm
        |  FROM documents),
        |rk AS (
        |  SELECT source, doc_id, ppm,
        |    row_number() OVER (PARTITION BY source ORDER BY ppm DESC, doc_id) AS rb,
        |    row_number() OVER (PARTITION BY source ORDER BY ppm ASC, doc_id) AS rw
        |  FROM scored),
        |agg AS (
        |  SELECT source,
        |    max(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
        |    max(CASE WHEN rb = 1 THEN ppm END) AS chosen_ppm,
        |    max(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
        |    max(CASE WHEN rw = 1 THEN ppm END) AS rejected_ppm
        |  FROM rk GROUP BY source)
        |SELECT source, chosen_id, chosen_ppm, rejected_id, rejected_ppm,
        |  chosen_ppm - rejected_ppm AS margin_ppm
        |FROM agg WHERE chosen_ppm - rejected_ppm > 0""".stripMargin,
    "t10_repetition" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
        |agg AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
        |    count(*) AS n_distinct, max(c) AS top_c
        |  FROM wc GROUP BY 1)
        |SELECT doc_id, n_words,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 4) AS dup_word_frac,
        |  round(CAST(top_c AS DOUBLE) / n_words, 4) AS top_word_frac,
        |  ((1.0 - CAST(n_distinct AS DOUBLE) / n_words) > 0.5 OR
        |    CAST(top_c AS DOUBLE) / n_words > 0.2) AS repetitive
        |FROM agg""".stripMargin,
    "p2_clean_corpus" -> P2Oracle,
    // p3: p2's survivors re-joined to the split assignment and rolled up
    // to shard accounting (nested-WITH subquery, same pattern as d6's).
    "p3_pipeline_e2e" ->
      s"""SELECT d.source,
         |  CASE WHEN (instr('0123456789abcdef', substring(md5(d.text), 1, 1)) - 1) * 16
         |          + (instr('0123456789abcdef', substring(md5(d.text), 2, 1)) - 1) < 204
         |       THEN 'train'
         |       WHEN (instr('0123456789abcdef', substring(md5(d.text), 1, 1)) - 1) * 16
         |          + (instr('0123456789abcdef', substring(md5(d.text), 2, 1)) - 1) < 230
         |       THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(k.n_words) AS BIGINT) AS n_tokens
         |FROM (${P2Oracle.replace("\n", "\n  ")}) k
         |JOIN documents d ON d.doc_id = k.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "t12_contamination" ->
      """WITH ng AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(string_split(lower(text), ' ')) - 3, 1)),
        |    i -> concat_ws(' ',
        |      string_split(lower(text), ' ')[i],
        |      string_split(lower(text), ' ')[i + 1],
        |      string_split(lower(text), ' ')[i + 2],
        |      string_split(lower(text), ' ')[i + 3],
        |      string_split(lower(text), ' ')[i + 4]))) ) AS g
        |  FROM documents),
        |bench AS (SELECT DISTINCT g FROM ng WHERE doc_id < 10),
        |hits AS (
        |  SELECT n.doc_id, count(*) AS n_hits
        |  FROM ng n JOIN bench b ON n.g = b.g
        |  WHERE n.doc_id >= 10 GROUP BY n.doc_id)
        |SELECT d.doc_id,
        |  coalesce(h.n_hits, 0) AS n_overlap_5grams,
        |  coalesce(h.n_hits, 0) >= 3 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |WHERE d.doc_id >= 10""".stripMargin,
    // Same discipline as t15 for the libm-adjacent math: the probability
    // itself is ONE double division of exact integers (bit-identical on
    // both engines), ln/exp differ at most in the last ulp, and the
    // 2-decimal rounding absorbs that plus the engines' different
    // log-summation orders.
    "t16_lm_perplexity" -> T16Oracle,
    // ccnet1: t16's scorer as a subquery, the same (rounded ppl, doc_id)
    // tercile order, the same tier rollup.
    "ccnet1_ppl_buckets" ->
      s"""WITH t16 AS (${T16Oracle.replace("\n", "\n  ")}),
         |docs AS (SELECT doc_id, lang,
         |           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
         |         FROM documents),
         |j AS (SELECT d.lang, d.n_tokens, t.ppl,
         |        ntile(3) OVER (PARTITION BY d.lang ORDER BY t.ppl, d.doc_id) AS bucket
         |      FROM docs d JOIN t16 t ON d.doc_id = t.doc_id)
         |SELECT lang, bucket, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |  min(ppl) AS ppl_min, max(ppl) AS ppl_max,
         |  CASE WHEN bucket = 1 THEN 'head'
         |       WHEN bucket = 2 THEN 'middle' ELSE 'tail' END AS tier
         |FROM j GROUP BY lang, bucket""".stripMargin,
    // t23: the same word-boundary bigram grain and list membership.
    "t23_blocklist_filter" -> {
      val listed = Blocklist.map(p => s"'$p'").mkString(", ")
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_filter(
         |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]),
         |    g -> g IN ($listed))) AS BIGINT) AS n_hits,
         |  len(list_filter(
         |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1]),
         |    g -> g IN ($listed))) = 0 AS keep
         |FROM w""".stripMargin
    },
    "t11_bigrams" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |b AS (
        |  SELECT unnest(list_transform(range(1, len(ws)),
        |    i -> ws[i] || ' ' || ws[i + 1])) AS bigram
        |  FROM w)
        |SELECT bigram, count(*) AS n FROM b
        |GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    // Same double expression order as the Spark side (left-assoc
    // numerator and denominator); ln differs in the last ulp across
    // libms, hence the round(·, 4) surface and ordering on the ROUNDED
    // value (t14 precedent).
    "t15_pmi_collocations" ->
      """WITH w AS (SELECT string_split(lower(text), ' ') AS ws FROM documents),
        |tot AS (SELECT CAST(sum(len(ws)) AS DOUBLE) AS nu,
        |               CAST(sum(greatest(len(ws) - 1, 0)) AS DOUBLE) AS nb FROM w),
        |uni AS (SELECT tok, count(*) AS c
        |        FROM (SELECT unnest(ws) AS tok FROM w) GROUP BY 1),
        |bi AS (SELECT a, b, count(*) AS cab FROM (
        |         SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i])) AS a,
        |                unnest(list_transform(range(1, len(ws)), i -> ws[i + 1])) AS b
        |         FROM w)
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT a || ' ' || b AS bigram, cab,
        |  round(ln((CAST(cab AS DOUBLE) * nu * nu) / (nb * ca * cb)), 4) AS pmi
        |FROM bi
        |JOIN (SELECT tok AS a, c AS ca FROM uni) USING (a)
        |JOIN (SELECT tok AS b, c AS cb FROM uni) USING (b)
        |CROSS JOIN tot
        |ORDER BY pmi DESC, bigram LIMIT 20""".stripMargin,
    "t19_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |    CAST(length(text) AS BIGINT) AS tc, text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    tc - CAST(len(ws) AS BIGINT) + 1 AS word_chars,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS hash_cnt,
        |    CAST(len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS ellipsis_cnt,
        |    CAST(list_contains(ws, 'the') AS BIGINT)
        |      + CAST(list_contains(ws, 'be') AS BIGINT)
        |      + CAST(list_contains(ws, 'to') AS BIGINT)
        |      + CAST(list_contains(ws, 'of') AS BIGINT)
        |      + CAST(list_contains(ws, 'and') AS BIGINT)
        |      + CAST(list_contains(ws, 'that') AS BIGINT)
        |      + CAST(list_contains(ws, 'have') AS BIGINT)
        |      + CAST(list_contains(ws, 'with') AS BIGINT) AS stop_hits
        |  FROM base)
        |SELECT doc_id, n_words, word_chars, alpha_words, hash_cnt,
        |  ellipsis_cnt, stop_hits,
        |  (n_words >= 50 AND n_words <= 100000) AS ok_words,
        |  (word_chars >= 3 * n_words AND word_chars <= 10 * n_words) AS ok_mean_len,
        |  (5 * alpha_words >= 4 * n_words) AS ok_alpha,
        |  (10 * hash_cnt <= n_words AND 10 * ellipsis_cnt <= n_words) AS ok_symbols,
        |  (stop_hits >= 2) AS ok_stops,
        |  ((n_words >= 50 AND n_words <= 100000)
        |    AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
        |    AND (5 * alpha_words >= 4 * n_words)
        |    AND (10 * hash_cnt <= n_words AND 10 * ellipsis_cnt <= n_words)
        |    AND (stop_hits >= 2)) AS keep
        |FROM m""".stripMargin,
    // t20: the whole model replays — Gopher labels on the even half,
    // Laplace-smoothed per-word positive rates in ppm (support >= 5),
    // integer-mean scoring with the 500000 ppm prior for unseen words.
    "t20_quality_classifier" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws,
        |    CAST(length(text) AS BIGINT) AS tc, text
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    tc - CAST(len(ws) AS BIGINT) + 1 AS word_chars,
        |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]')))
        |      AS BIGINT) AS alpha_words,
        |    CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS hash_cnt,
        |    CAST(len(regexp_extract_all(text, '\.\.\.')) AS BIGINT) AS ellipsis_cnt,
        |    CAST(list_contains(ws, 'the') AS BIGINT)
        |      + CAST(list_contains(ws, 'be') AS BIGINT)
        |      + CAST(list_contains(ws, 'to') AS BIGINT)
        |      + CAST(list_contains(ws, 'of') AS BIGINT)
        |      + CAST(list_contains(ws, 'and') AS BIGINT)
        |      + CAST(list_contains(ws, 'that') AS BIGINT)
        |      + CAST(list_contains(ws, 'have') AS BIGINT)
        |      + CAST(list_contains(ws, 'with') AS BIGINT) AS stop_hits
        |  FROM base),
        |lab AS (
        |  SELECT doc_id,
        |    ((n_words >= 50 AND n_words <= 100000)
        |      AND (word_chars >= 3 * n_words AND word_chars <= 10 * n_words)
        |      AND (5 * alpha_words >= 4 * n_words)
        |      AND (10 * hash_cnt <= n_words AND 10 * ellipsis_cnt <= n_words)
        |      AND (stop_hits >= 2)) AS keep
        |  FROM m),
        |feats AS (
        |  SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents)),
        |wt AS (
        |  SELECT f.w,
        |    (sum(CASE WHEN l.keep THEN 1 ELSE 0 END) + 1) * 1000000
        |      // (count(*) + 2) AS w_ppm
        |  FROM feats f JOIN lab l USING (doc_id)
        |  WHERE f.doc_id % 2 = 0
        |  GROUP BY f.w HAVING count(*) >= 5),
        |sc AS (
        |  SELECT f.doc_id, count(*) AS n_feats,
        |    CAST(sum(coalesce(wt.w_ppm, 500000)) AS BIGINT) AS score_sum
        |  FROM feats f LEFT JOIN wt USING (w) GROUP BY 1)
        |SELECT s.doc_id, l.keep AS label, s.doc_id % 2 = 0 AS is_train,
        |  CAST(s.n_feats AS BIGINT) AS n_feats, s.score_sum,
        |  CAST(s.score_sum // s.n_feats AS BIGINT) AS score_ppm,
        |  s.score_sum // s.n_feats >= 500000 AS pred_keep
        |FROM sc s JOIN lab l USING (doc_id)""".stripMargin,
    // t21: the identical augmentation formulas, the identical patterns
    // (Java-regex ∩ RE2 subset), counts before redaction, replace-all
    // ('g') in the same email → phone → ip order.
    "t21_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id, concat(text,
        |    CASE WHEN doc_id % 7 = 0
        |         THEN concat(' contact u', CAST(doc_id AS VARCHAR),
        |                     '@example.com now') ELSE '' END,
        |    CASE WHEN doc_id % 11 = 0
        |         THEN concat(' call 555-',
        |                     lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |                     ' ok') ELSE '' END,
        |    CASE WHEN doc_id % 13 = 0
        |         THEN concat(' from 10.0.', CAST(doc_id % 256 AS VARCHAR),
        |                     '.7 logged') ELSE '' END) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT) AS n_ips,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9]+@[a-z0-9]+\.[a-z]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g'),
        |    '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+', '<IP>', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+\.[a-z]+')) AS BIGINT)
        |    + CAST(len(regexp_extract_all(t, '555-[0-9]{4}')) AS BIGINT)
        |    + CAST(len(regexp_extract_all(t, '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS BIGINT)
        |    > 0 AS has_pii
        |FROM aug""".stripMargin
  )
}
