package graft

import org.apache.spark.sql.functions._
import graft.ops.{Behavior, Quality}

/** Semantic checks for the training-data assembly operators over the event
  * stream (sft1) and the scored-candidate groups (pref1): each distributed
  * pipeline against an obvious single-threaded definition on the collected
  * tables — different data structures, same published semantics.
  */
class BehaviorSpec extends SparkSuite {

  test("sft1 conversation assembly matches an in-memory sessionize + flatten") {
    val gapUs = 1800L * 1000000
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts_us"),
        concat(col("event_type"), lit(":"),
          coalesce(get_json_object(col("props"), "$.k").cast("int").cast("string"),
            lit(""))).as("turn"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      // split at gaps > gapUs between consecutive events
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._3 - cur.head._3 <= gapUs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.map(_.reverse)
      sessions.filter(s => s.length >= 2 && s.length <= Behavior.sftTurnCap)
        .map { s =>
          ((uid, s.map(_._3).min),
            (s.length.toLong, s.map(_._4).mkString("|")))
        }
    }.toMap
    val got = Behavior.queries("sft1_conversation_build")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getString(3))))
      .toMap
    assert(got.keySet === expected.keySet, "conversation (user, start) key sets diverged")
    val diffs = expected.collect { case (k, e) if got(k) != e => s"$k: got ${got(k)} want $e" }
    assert(diffs.isEmpty, s"conversations diverged:\n${diffs.mkString("\n")}")
    // the filter genuinely fires: some sessions exist outside [2, cap]
    val allSessions = ev.groupBy(_._1).map { case (_, rows) =>
      rows.sortBy(r => (r._3, r._2)).foldLeft(0 -> Long.MinValue) {
        case ((n, last), e) => (if (e._3 - last > gapUs) n + 1 else n, e._3)
      }._1
    }.sum
    assert(expected.size < allSessions, "fixture must drop at least one session")
    assert(expected.nonEmpty, "fixture must keep at least one conversation")
  }

  test("pref1 preference pairs match an in-memory argmax/argmin per group") {
    val docs = graft.tables.Tables.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def ppm(t: String): Long = {
      val ws = t.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      ws.distinct.length.toLong * 1000000 / ws.length
    }
    val expected = docs.groupBy(_._1).flatMap { case (src, rows) =>
      val scored = rows.map(r => (r._2, ppm(r._3)))
      val chosen = scored.minBy { case (id, p) => (-p, id) }
      val rejected = scored.minBy { case (id, p) => (p, id) }
      if (chosen._2 > rejected._2)
        Some(src -> ((chosen._1, chosen._2, rejected._1, rejected._2)))
      else None
    }
    val got = Quality.queries("pref1_preference_pairs")(spark, sf).collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    val diffs = expected.collect { case (k, e) if got(k) != e => s"$k: got ${got(k)} want $e" }
    assert(diffs.isEmpty, s"pairs diverged:\n${diffs.mkString("\n")}")
    // margins are strictly positive and the margin column is the difference
    val margins = Quality.queries("pref1_preference_pairs")(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(margins.nonEmpty && margins.forall { case (c, rj, m) => m === c - rj && m > 0 })
  }
}
