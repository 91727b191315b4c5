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
  * Count and sum are the mergeable pair (avg = sum/count derives at read
  * time); min/max are NOT incrementally maintainable under deletes and are
  * deliberately out of scope. The source must be append-only between
  * refreshes — [[refresh]] verifies this from the manifest modes and
  * fails loudly otherwise (a rewritten source file would need the
  * subtractive IVM half).
  */
object MatView {

  /** Bring the view at `mvBase` up to date with `srcBase` (or with source
    * version `upTo`, for staged/backfill refreshes); returns the new (or
    * current, when already fresh) view version.
    */
  def refresh(spark: SparkSession, mvBase: String, srcBase: String,
              keyCols: Seq[String], valCol: String,
              upTo: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "materialized view needs at least one group column")
    val srcV = upTo.getOrElse(Snapshots.versions(srcBase).max)
    val mvVs = Snapshots.versions(mvBase)
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
    // Additive maintenance is only sound over appends: check every source
    // commit being consumed incrementally. The INITIAL build reads the
    // full snapshot, which is correct whatever the source's history.
    if (last > 0L) {
      val consumed = Snapshots.versions(srcBase).filter(v => v > last && v <= srcV)
      val nonAppend = consumed.filterNot(v =>
        Snapshots.modeOf(srcBase, v).takeWhile(_ != ':') == "append")
      require(nonAppend.isEmpty,
        s"source versions ${nonAppend.mkString(",")} are not appends - " +
          "rebuild the view (delete its tree) instead of refreshing")
    }
    val delta =
      if (last == 0L) Snapshots.read(spark, srcBase, Some(srcV))
      else Snapshots.changes(spark, srcBase, last, srcV)
    // sum as DOUBLE from the start so the initial build and every
    // refreshed upsert agree on the view schema regardless of valCol's
    // input type. (Incremental double sums add in delta order, not scan
    // order — use decimal or integral value columns where bit-exactness
    // against a full recompute matters; the registered query does.)
    val dAgg = delta.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(col(valCol)).cast("double").as("sum_v"))
    if (mvVs.isEmpty)
      Snapshots.commit(spark, dAgg, mvBase, mode = s"append:$srcV",
        sortCols = keyCols)
    else {
      // Combine the delta's groups with their current view rows; merge
      // touches exactly these groups (update or insert), nothing else.
      val old = Snapshots.read(spark, mvBase)
        .withColumnRenamed("n_rows", "old_n").withColumnRenamed("sum_v", "old_s")
      val combined = dAgg.join(old, keyCols, "left")
        .select(keyCols.map(col) ++ Seq(
          (col("n_rows") + coalesce(col("old_n"), lit(0L))).as("n_rows"),
          (col("sum_v") + coalesce(col("old_s"), lit(0.0))).as("sum_v")): _*)
      Snapshots.merge(spark, mvBase, combined, keyCols, modeTag = srcV.toString)
    }
  }
}
