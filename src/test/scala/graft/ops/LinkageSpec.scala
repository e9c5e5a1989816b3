package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class NameRow(id: Long, name: String)

/** Deletion-neighborhood (FastSS) blocking for Levenshtein<=1 joins:
  * losslessness against the brute-force definition, refine correctness
  * (blocking collisions at lev 2 must be filtered out), and the
  * best-match tie-break of the record-linkage variant.
  */
class LinkageSpec extends SparkSpec {

  private val rows = Seq(
    NameRow(1, "martha"),   // substitution twin of 2
    NameRow(2, "marhta"),   // lev(martha, marhta) = 2 (transposition) — must NOT match
    NameRow(3, "marta"),    // deletion twin of 1 (lev 1), lev(marta, marhta)=1 too
    NameRow(4, "smith"),    // isolated
    NameRow(5, "smyth"),    // substitution twin of 4 (lev 1)
    NameRow(6, "xmith"),    // FIRST-char substitution twin of 4 — prefix blocking would miss it
    NameRow(7, "smithh"),   // insertion twin of 4 (lev 1)
    NameRow(8, "ann"),
    NameRow(9, "anne")      // insertion twin of 8
  )

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzySelfJoinLev1 equals the brute-force lev<=1 definition (incl. first-char edits)") {
    val got = Linkage.fuzzySelfJoinLev1(df(rows), "id", "name")
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      a <- rows; b <- rows if a.id < b.id
      d = lev(a.name, b.name) if d <= 1
    } yield (a.id, b.id, d.toLong)).toSet
    assert(got === want)
    // the fixture exercises all three edit kinds plus a first-char edit
    assert(want.contains((4L, 6L, 1L)))  // first-char substitution found
    assert(!want.exists { case (a, b, _) => (a, b) == (1L, 2L) })  // lev-2 excluded
  }

  test("linkLev1 picks min distance, ties to lowest clean id; unmatched dropped") {
    val clean = df(Seq(NameRow(10, "smith"), NameRow(11, "smyth"), NameRow(12, "qqqqq")))
    val dirty = df(Seq(
      NameRow(100, "smith"),   // exact (dist 0) beats dist-1 candidates
      NameRow(101, "smth"),    // dist 1 to BOTH 10 and 11 → tie to id 10
      NameRow(102, "zzzzzz"))) // no candidate within lev 1 → dropped
    val got = Linkage.linkLev1(clean, dirty, "id", "name")
      .select("dirty_id", "clean_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((100L, 10L, 0L), (101L, 10L, 1L)))
  }
}
