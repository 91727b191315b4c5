package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views over a
  * [[Snapshots]] table: `SELECT keys…, count(*), sum(valCol) GROUP BY
  * keys…` kept fresh by consuming only the files APPENDED since the last
  * refresh — the additive half of incremental view maintenance, which is
  * the half an append-mostly lakehouse needs.
  *
  * Mechanics, all on existing table-format machinery:
  *  - the delta is [[Snapshots.changes]] — a FILE-LIST diff, so refresh
  *    scans exactly the new data, never the table;
  *  - the delta's group aggregates upsert into the view via
  *    [[Snapshots.merge]] — matched group rows DV-delete and the combined
  *    rows append, so refresh WRITE cost is changed-groups-sized;
  *  - the source version consumed is recorded as a `:vN` tag on the view
  *    commit's manifest mode, making watermark and state one atomic
  *    publish: a crashed refresh either committed (watermark advanced) or
  *    didn't (next refresh redoes the same delta) — never double-counts;
  *  - the view is itself a snapshot table: time travel shows the view as
  *    of any past refresh, and compact() folds its vectors away.
  *
  * At 100 TB: a daily append touching 0.1% of groups costs one
  * delta-sized scan + a changed-groups-sized merge. The full recompute it
  * replaces costs a table scan — the gap IS the feature.
  *
  * Count and sum are the fully-mergeable pair (avg = sum/count derives at
  * read time): +new −old composes in any order, so appends AND removals
  * maintain them from deltas alone. Min/max (`withMinMax = true`) are
  * mergeable under APPENDS (least/greatest against the stored extremum)
  * but not under removals — deleting the extremum row leaves no way to
  * know the runner-up from the view's state. The fallback is
  * RECOMPUTE-TOUCHED-GROUPS: only groups whose removed rows tie-or-beat
  * the stored extremum (a value-equality-conservative test, so removing
  * one of two duplicate minima still recomputes) re-aggregate min/max
  * from the source at the target version, via a broadcast semi-join on
  * the at-risk keys. Cost: one source scan filtered to at-risk groups —
  * at 100 TB that is a scan-heavy but shuffle-light pass that runs ONLY
  * when a delete actually threatens an extremum, vs. the full
  * rebuild-the-view alternative (scan + full re-aggregate + view
  * rewrite). Groups whose removals stay strictly inside (min, max) keep
  * the additive path entirely.
  */
object MatView {

  /** Bring the view at `mvBase` up to date with `srcBase` (or with source
    * version `upTo`, for staged/backfill refreshes); returns the new (or
    * current, when already fresh) view version.
    */
  /** `distinctCol` (round 9) additionally maintains `ndv_sketch`, a
    * per-group Datasketches HLL sketch of the column's distinct values —
    * the approx-COUNT-DISTINCT materialized view. Sketches are
    * union-mergeable, so APPENDS maintain them additively (delta sketch ∪
    * stored sketch, register-wise — incremental state equals the
    * from-scratch sketch exactly); removals cannot subtract from an HLL,
    * so any group with removed rows recomputes its sketch from the source
    * (the min/max recompute-touched-groups pattern, with "touched" =
    * "had removals"). Small-cardinality groups sit in the sketch's exact
    * (coupon) regime, where `hll_sketch_estimate` IS the exact distinct
    * count. Like min/max, a creation-time property: the stored schema
    * wins, and a sketch view must be refreshed with its distinctCol
    * every time (the sketch cannot be maintained without knowing its
    * source column).
    */
  /** `enrich` (round 16) turns the view into an AGGREGATE-JOIN index
    * (the classic incrementally-maintained star-join view): a transform
    * applied to every source-row frame the maintenance touches — the
    * initial build, appended deltas, removed rows, and the risky-group
    * recompute scans — before aggregation, so `keyCols` may name columns
    * the transform adds (a dimension attribute) and the ± delta algebra
    * stays sound: agg(enrich(F)) maintained by ±agg(enrich(ΔF)).
    * Contract: `enrich` must be a deterministic per-row mapping that is
    * STABLE across refreshes — in practice a lookup join against an
    * IMMUTABLE dimension (broadcast it; a dimension that changes between
    * refreshes silently corrupts the algebra — rebuild instead). A
    * consistent row drop (inner-join miss) or consistent 1:N fan-out is
    * sound for the same reason: adds and removes transform identically.
    */
  def refresh(spark: SparkSession, mvBase: String, srcBase: String,
              keyCols: Seq[String], valCol: String,
              upTo: Option[Long] = None,
              withMinMax: Boolean = false,
              distinctCol: String = null,
              enrich: DataFrame => DataFrame = identity): Long = {
    require(keyCols.nonEmpty, "materialized view needs at least one group column")
    // The view's aggregate columns are fixed names; a key column reusing
    // one would collide in the view schema (and false-positive the
    // min/max schema probe below).
    val reserved = Set("n_rows", "sum_v", "min_v", "max_v", "ndv_sketch")
    require(keyCols.forall(k => !reserved(k)),
      s"group columns may not use the reserved view column names ${reserved.mkString(", ")}")
    val srcV = upTo.getOrElse(Snapshots.versions(srcBase).max)
    val mvVs = Snapshots.versions(mvBase)
    // min/max is a CREATION-time property of the view's state, so an
    // existing view's stored schema wins over the caller's flag: a
    // min/max view refreshed without the flag keeps maintaining its
    // extremes (forgetting the flag must not silently null them for
    // touched groups), and a plain view cannot be retrofitted (its state
    // never recorded extremes) — that asks for a rebuild, loudly. The
    // schema probe is the manifest header, metadata-only.
    val mm = if (mvVs.isEmpty) withMinMax else {
      val stored = Snapshots.currentSchema(mvBase).exists(_.fieldNames.contains("min_v"))
      if (withMinMax && !stored) throw new IllegalArgumentException(
        "view was built without min/max - existing state cannot be " +
          "retrofitted; delete the view tree and rebuild with withMinMax=true")
      stored
    }
    val dn = if (mvVs.isEmpty) distinctCol != null else {
      val stored = Snapshots.currentSchema(mvBase)
        .exists(_.fieldNames.contains("ndv_sketch"))
      if (distinctCol != null && !stored) throw new IllegalArgumentException(
        "view was built without a distinct column - existing state cannot " +
          "be retrofitted; delete the view tree and rebuild with distinctCol")
      if (stored && distinctCol == null) throw new IllegalArgumentException(
        "view maintains ndv_sketch - every refresh must pass distinctCol " +
          "(the sketch cannot be maintained without its source column)")
      stored
    }
    // One newest→oldest walk over the view's commit modes decides both
    // guards below: index of the newest watermark-bearing commit and of
    // the newest rollback.
    val modes = mvVs.sorted.reverse.map(v => Snapshots.modeOf(mvBase, v))
    val wmIdx = modes.indexWhere(_.matches("(append|merge):\\d+"))
    val rbIdx = modes.indexWhere(_.startsWith("rollback"))
    // A rolled-back view is un-refreshable: its additive state matches an
    // OLD watermark while the walk-back would find a newer one —
    // refreshing would skip (or double-count) deltas. Rebuild instead.
    // The check is NOT just the head commit: a rollback followed by any
    // tagless maintenance commit (compact) still poisons the watermark,
    // so any rollback NEWER than the newest watermark-bearing commit
    // refuses.
    require(rbIdx < 0 || (wmIdx >= 0 && wmIdx < rbIdx),
      "view was rolled back - its state no longer matches any watermark; " +
        "delete the view tree and rebuild")
    // The watermark is the NEWEST view version carrying an "append:vN" /
    // "merge:vN" tag — not necessarily the newest version: maintenance
    // commits on the view itself (compact's "overwrite") are tagless and
    // must not be parsed as watermarks, just skipped over. Only MatView's
    // own commit modes qualify, so a tag some other writer put on the
    // tree can't be misread as a source version. A NON-EMPTY view whose
    // lineage carries no watermark at all (e.g. compact followed by
    // expire(keepLast=1) dropped every tagged commit) must NOT default to
    // 0: treating it as an initial build would MERGE a full re-aggregate
    // into existing state and double-count every group. Only an empty
    // tree is an initial build.
    val last = modes.lift(wmIdx) match {
      case Some(m) if wmIdx >= 0 => m.split(':').last.toLong
      case _ if mvVs.isEmpty     => 0L
      case _ => throw new IllegalStateException(
        "view has commits but no append:vN/merge:vN watermark survives in " +
          "its lineage (expire removed the tagged commits?) - the additive " +
          "state can't be aligned to any source version; delete the view " +
          "tree and rebuild")
    }
    require(srcV >= last,
      s"upTo=$srcV is older than the view's watermark $last - " +
        "a view cannot be refreshed backwards (time travel the source instead)")
    if (last == srcV) return mvVs.max
    // Incremental maintenance is sound over appends (additive leg), and —
    // since round 7 — over merges and DV deletes too: their removed rows
    // surface through [[Snapshots.removedRows]] and SUBTRACT from the
    // view (count and sum are abelian, so +new −old composes in any
    // order). Round 8 adds the equality-delete commits (delete-eq,
    // merge-eq): removedRows accounts their key-hidden rows exactly
    // (visible-at-fromV semantics, no double count against DVs), so the
    // same subtraction applies. File-rewriting commits (overwrite/
    // compact, delete, rollback) still refuse: their row identity diffs
    // aren't recoverable from metadata. The INITIAL build reads the full
    // snapshot, which is correct whatever the source's history.
    if (last > 0L) {
      val consumed = Snapshots.versions(srcBase).filter(v => v > last && v <= srcV)
      // eq-convert is a logical no-op (removedRows reports nothing for
      // it: its vector's rows were already eq-hidden at the window
      // start), so a maintenance conversion never forces a rebuild.
      val bad = consumed.filterNot(v =>
        Set("append", "merge", "delete-dv", "delete-eq", "merge-eq",
          "eq-convert")(
          Snapshots.modeOf(srcBase, v).takeWhile(_ != ':')))
      require(bad.isEmpty,
        s"source versions ${bad.mkString(",")} rewrite files - " +
          "rebuild the view (delete its tree) instead of refreshing")
    }
    val added = enrich(
      if (last == 0L) Snapshots.read(spark, srcBase, Some(srcV))
      else Snapshots.changes(spark, srcBase, last, srcV))
    // sum as DOUBLE from the start so the initial build and every
    // refreshed upsert agree on the view schema regardless of valCol's
    // input type. (Incremental double sums add in delta order, not scan
    // order — use decimal or integral value columns where bit-exactness
    // against a full recompute matters; the registered query does.)
    // min/max ride as double (same schema-stability choice as sum_v).
    // hll_sketch_agg hashes int/long/string/binary only — other types
    // (doubles here) sketch their canonical STRING form, which is
    // injective per distinct value, so distinct counts are unchanged.
    def sketchInput(df: DataFrame) = {
      import org.apache.spark.sql.types._
      df.schema(distinctCol).dataType match {
        case IntegerType | LongType | StringType | BinaryType => col(distinctCol)
        case ByteType | ShortType => col(distinctCol).cast("int")
        case _ => col(distinctCol).cast("string")
      }
    }
    def agg(df: DataFrame, n: String, s: String, mn: String = null, mx: String = null,
            sk: String = null) = {
      val basics = Seq(count(lit(1)).as(n), sum(col(valCol)).cast("double").as(s))
      val extremes = if (mn == null) Nil else Seq(
        min(col(valCol)).cast("double").as(mn), max(col(valCol)).cast("double").as(mx))
      val sketch = if (sk == null) Nil
        else Seq(hll_sketch_agg(sketchInput(df)).as(sk))
      df.groupBy(keyCols.map(col): _*)
        .agg(basics.head, (basics.tail ++ extremes ++ sketch): _*)
    }
    def initAgg(df: DataFrame) =
      agg(df, "n_rows", "sum_v",
        if (mm) "min_v" else null, if (mm) "max_v" else null,
        if (dn) "ndv_sketch" else null)
    if (mvVs.isEmpty)
      Snapshots.commit(spark, initAgg(added), mvBase,
        mode = s"append:$srcV", sortCols = keyCols)
    else {
      val removed =
        if (last == 0L) None
        else Some(enrich(Snapshots.removedRows(spark, srcBase, last, srcV)))
          .filterNot(_.isEmpty)
      // Net per-group delta: +appended/merged-in rows, −merge/DV-removed
      // rows. A group can net to zero (every row it had was upserted away)
      // — those rows are tombstoned out below. With min/max the delta also
      // carries the added-rows extremes (additive candidates) and the
      // removed-rows extremes (the at-risk test's evidence).
      val dAgg = removed match {
        case None =>
          agg(added, "n_rows", "sum_v",
            if (mm) "mn_add" else null, if (mm) "mx_add" else null,
            if (dn) "sk_add" else null)
        case Some(rm) =>
          val a = agg(added, "n_add", "s_add",
            if (mm) "mn_add" else null, if (mm) "mx_add" else null,
            if (dn) "sk_add" else null)
          val r = if (mm) agg(rm, "n_rem", "s_rem", "mn_rem", "mx_rem")
                  else agg(rm, "n_rem", "s_rem")
          val extra =
            (if (mm) Seq(col("mn_add"), col("mx_add"), col("mn_rem"), col("mx_rem"))
             else Nil) ++
            // has_rem marks the groups whose sketch must recompute (an
            // HLL cannot subtract); computed here because only the
            // full-outer join knows which groups the removals touched
            (if (dn) Seq(col("sk_add"), col("n_rem").isNotNull.as("has_rem"))
             else Nil)
          a.join(r, keyCols, "full_outer")
            .select(keyCols.map(col) ++ Seq(
              (coalesce(col("n_add"), lit(0L)) - coalesce(col("n_rem"), lit(0L))).as("n_rows"),
              (coalesce(col("s_add"), lit(0.0)) - coalesce(col("s_rem"), lit(0.0))).as("sum_v"))
              ++ extra: _*)
      }
      // Combine the delta's groups with their current view rows; merge
      // touches exactly these groups (update or insert), nothing else.
      val old = Snapshots.read(spark, mvBase)
        .withColumnRenamed("n_rows", "old_n").withColumnRenamed("sum_v", "old_s")
        .withColumnsRenamed(
          (if (mm) Map("min_v" -> "old_mn", "max_v" -> "old_mx")
           else Map.empty[String, String]) ++
          (if (dn) Map("ndv_sketch" -> "old_sk") else Map.empty[String, String]))
      val joined = dAgg.join(old, keyCols, "left")
      // Additive sketch leg: delta ∪ stored (register-wise union equals
      // the from-scratch sketch). Groups with removals carry a risk mark
      // and their sketches are REPLACED by a source recompute below.
      val skCols: Seq[org.apache.spark.sql.Column] =
        if (!dn) Nil
        else Seq(
          when(col("old_sk").isNull, col("sk_add"))
            .when(col("sk_add").isNull, col("old_sk"))
            .otherwise(hll_union(col("sk_add"), col("old_sk"))).as("ndv_sketch"),
          (if (removed.isDefined) coalesce(col("has_rem"), lit(false))
           else lit(false)).as("__dn_risk"))
      val nSum = Seq(
        (col("n_rows") + coalesce(col("old_n"), lit(0L))).as("n_rows"),
        (col("sum_v") + coalesce(col("old_s"), lit(0.0))).as("sum_v"))
      // Names skCols OUTPUTS carry through the min/max branch's selects.
      val dnCarry: Seq[org.apache.spark.sql.Column] =
        if (dn) Seq(col("ndv_sketch"), col("__dn_risk")) else Nil
      val combined =
        if (!mm) joined.select(keyCols.map(col) ++ nSum ++ skCols: _*)
        else {
          val mnRem = if (removed.isDefined) col("mn_rem") else lit(null).cast("double")
          val mxRem = if (removed.isDefined) col("mx_rem") else lit(null).cast("double")
          // At-risk: the group HAS removals and either (a) it is NEW in
          // this window (no stored extremum — its additive candidates
          // come from mn_add/mx_add, which INCLUDE the rows removed in
          // the same window, e.g. an append+delete consumed by one
          // refresh) or (b) some removed value ties-or-beats the stored
          // extremum (ties are conservative — one of two duplicate
          // minima removed still recomputes). A group with no removals
          // is never at risk.
          val risk = mnRem.isNotNull && coalesce(
            col("old_mn").isNull || mnRem <= col("old_mn") || mxRem >= col("old_mx"),
            lit(true))
          val withRisk = joined.select(keyCols.map(col) ++ nSum ++ Seq(
            least(col("old_mn"), col("mn_add")).as("cand_mn"),
            greatest(col("old_mx"), col("mx_add")).as("cand_mx"),
            risk.as("at_risk")) ++ skCols: _*)
          // Recompute min/max ONLY for at-risk groups, from the source at
          // srcV. The risky key set is counted first: zero at-risk groups
          // (interior-only deletes — common) skips the source scan
          // entirely, a changed-groups-sized set broadcasts so the scan
          // never shuffles, and a mass delete threatening most extrema
          // degrades to a shuffled semi-join instead of forcing a
          // too-large broadcast into an OOM.
          val riskyKeys = withRisk.filter(col("at_risk")).select(keyCols.map(col): _*)
          val nRisky = riskyKeys.count()
          if (nRisky == 0L)
            withRisk.select(keyCols.map(col) ++ Seq(col("n_rows"), col("sum_v"),
              col("cand_mn").as("min_v"), col("cand_mx").as("max_v")) ++ dnCarry: _*)
          else {
            val BroadcastCap = 4000000L
            def sized(df: DataFrame) =
              if (nRisky <= BroadcastCap) broadcast(df) else df
            val recomputed = enrich(Snapshots.read(spark, srcBase, Some(srcV)))
              .join(sized(riskyKeys), keyCols, "left_semi")
              .groupBy(keyCols.map(col): _*)
              .agg(min(col(valCol)).cast("double").as("r_mn"),
                max(col(valCol)).cast("double").as("r_mx"))
            withRisk.join(sized(recomputed), keyCols, "left")
              .select(keyCols.map(col) ++ Seq(col("n_rows"), col("sum_v"),
                when(col("at_risk"), col("r_mn")).otherwise(col("cand_mn")).as("min_v"),
                when(col("at_risk"), col("r_mx")).otherwise(col("cand_mx")).as("max_v"))
                ++ dnCarry: _*)
          }
        }
      // Distinct-sketch risk pass: groups whose rows were removed get
      // their sketch REBUILT from the source at srcV (HLLs only merge
      // forward). Zero risky groups — the append-only common case —
      // skips the source scan entirely.
      val finalCombined =
        if (!dn) combined
        else {
          val risky = combined.filter(col("__dn_risk")).select(keyCols.map(col): _*)
          val nRisky = risky.count()
          val resolved =
            if (nRisky == 0L) combined
            else {
              val BroadcastCap = 4000000L
              def sized(df: DataFrame) =
                if (nRisky <= BroadcastCap) broadcast(df) else df
              val src = enrich(Snapshots.read(spark, srcBase, Some(srcV)))
              val rec = src
                .join(sized(risky), keyCols, "left_semi")
                .groupBy(keyCols.map(col): _*)
                .agg(hll_sketch_agg(sketchInput(src)).as("r_sk"))
              combined.join(sized(rec), keyCols, "left")
                .withColumn("ndv_sketch",
                  when(col("__dn_risk"), col("r_sk")).otherwise(col("ndv_sketch")))
                .drop("r_sk")
            }
          resolved.drop("__dn_risk")
        }
      val out = Snapshots.merge(spark, mvBase, finalCombined, keyCols,
        modeTag = srcV.toString)
      // Groups whose count hit zero no longer exist in a full recompute —
      // DV-delete their tombstones. The watermark already rode the merge
      // commit, so a crash between the two leaves only a visible
      // (n_rows=0) row that the next refresh's pass here re-cleans; the
      // call no-ops (no new version) when nothing matched.
      Snapshots.deleteWhereDV(spark, mvBase, col("n_rows") === 0L)
      out
    }
  }

  /** Register a view for TRANSPARENT rewrite: record on the SOURCE
    * table's property map the view path and aggregate shape, so
    * [[graft.connector.MvRewriteRule]] can substitute the view for a
    * matching user GROUP BY when the view's watermark covers the
    * source's current version. Idempotent; `name` distinguishes several
    * views over one source. Validates the view state exists and was
    * built with the named key/value shape (the reserved view columns),
    * so a registration can never advertise an answer the view does not
    * hold.
    */
  def register(srcBase: String, mvBase: String, keyCols: Seq[String],
               valCol: String, name: String = "mv"): Unit = {
    require(keyCols.nonEmpty, "register needs the view's group columns")
    require(!name.exists(c => c == '\t' || c == '=' || c == '\n'),
      s"illegal view registration name '$name'")
    val schema = Snapshots.currentSchema(mvBase).getOrElse(
      throw new IllegalArgumentException(
        s"no materialized view state under $mvBase - refresh it first"))
    val missing = (keyCols ++ Seq("n_rows", "sum_v"))
      .filterNot(schema.fieldNames.contains)
    require(missing.isEmpty,
      s"view $mvBase does not hold columns ${missing.mkString(", ")} - " +
        "register with the key columns it was refreshed with")
    val key = graft.connector.MvRewriteRule.PropPrefix + name
    val value = s"$mvBase\t${keyCols.mkString(",")}\t$valCol"
    val props = graft.connector.TableProps.read(srcBase)
    if (props.get(key).contains(value)) return
    graft.connector.TableProps.write(srcBase, props + (key -> value))
  }
}
