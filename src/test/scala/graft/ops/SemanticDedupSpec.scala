package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Vec7(id: Long, v: Array[Float])

/** SemDeDup-style semantic dedup: keep-first within k-means cells. */
class SemanticDedupSpec extends SparkSpec {

  private val centroids = Array(Array(1f, 0f), Array(0f, 1f))

  test("near-identical vectors in the same cell dedup to the lowest id") {
    val vecs = df(Seq(
      Vec7(1, Array(1f, 0.01f)),    // cell 0, kept (lowest id of the pair)
      Vec7(2, Array(1f, 0.011f)),   // cell 0, cos≈1 to id 1 → removed
      Vec7(3, Array(0.01f, 1f)),    // cell 1, no neighbor → kept
      Vec7(4, Array(-1f, 0.5f))     // cell 1 (max dot 0.5 vs -1), far → kept
    ))
    val out = VectorOps.semanticDedup(vecs, "id", "v", centroids, 0.9)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, true), (2L, false), (3L, true), (4L, true)))
  }

  test("within-cell restriction: a near pair split across cells is NOT deduped") {
    // cos(c, d) ≈ 0.998 but c lands in cell 0 and d in cell 1 — SemDeDup
    // trades this boundary case for never doing cross-cluster pair work
    val vecs = df(Seq(
      Vec7(1, Array(0.72f, 0.69f)),
      Vec7(2, Array(0.69f, 0.72f))
    ))
    val out = VectorOps.semanticDedup(vecs, "id", "v", centroids, 0.9)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, 0L, true), (2L, 1L, true)))
  }

  test("chains within a cell: every member with ANY lower-id near neighbor is removed") {
    val vecs = df(Seq(
      Vec7(1, Array(1f, 0f)),
      Vec7(2, Array(1f, 0.001f)),   // near 1 → removed
      Vec7(3, Array(1f, 0.002f))    // near both 1 and 2 → removed once
    ))
    val out = VectorOps.semanticDedup(vecs, "id", "v", centroids, 0.9)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getBoolean(2)))
    assert(out.toSeq === Seq((1L, true), (2L, false), (3L, false)))
  }
}
