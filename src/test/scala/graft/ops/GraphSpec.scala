package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Edge(id_a: Long, id_b: Long)
case class Node(id: Long)

class GraphSpec extends SparkSpec {

  test("connectedComponents labels every node with its component minimum") {
    // components: {0,1,2,3} (a chain), {4,5}, {6} isolated
    val nodes = df((0L to 6L).map(Node))
    val edges = df(Seq(Edge(1, 2), Edge(0, 1), Edge(2, 3), Edge(4, 5)))
    val reps = Graph.connectedComponents(nodes, "id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 4L, 6L -> 6L))
  }

  test("connectedComponents converges on a long chain (propagation depth)") {
    val n = 12
    val nodes = df((0L until n).map(Node))
    val edges = df((0L until n - 1).map(i => Edge(i, i + 1)))
    val reps = Graph.connectedComponents(nodes, "id", edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps.values.toSet === Set(0L))
  }

  test("connectedComponents on empty edges maps every node to itself") {
    val nodes = df((0L to 3L).map(Node))
    val reps = Graph.connectedComponents(nodes, "id", df(Seq.empty[Edge]), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reps === (0L to 3L).map(i => i -> i).toMap)
  }

  test("clusteringCoefficients: triangle vertices 1, connectors 0, partial wedges exact") {
    // triangle {1,2,3}; node 4 bridges 3 and 5 (a pure connector);
    // node 3 sits on the triangle AND the bridge: deg 3, 1 triangle ->
    // c = 2*1/(3*2) = 1/3.
    val edges = df(Seq(Edge(1, 2), Edge(1, 3), Edge(2, 3), Edge(3, 4), Edge(4, 5)))
    val got = Graph.clusteringCoefficients(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getAs[Double]("clustering"))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))  // node 5 has degree 1
    assert(got(1L) === ((2L, 1L, 1.0)))
    assert(got(2L) === ((2L, 1L, 1.0)))
    assert(got(4L) === ((2L, 0L, 0.0)))
    assert(got(3L)._1 === 3L)
    assert(math.abs(got(3L)._3 - 0.333333) < 1e-9)
  }

  test("degreeAssortativity: star is -1, degree-regular graph is undefined") {
    // Star K1,4: every edge joins deg 4 to deg 1 -> r = -1 exactly.
    val star = df(Seq(Edge(0, 1), Edge(0, 2), Edge(0, 3), Edge(0, 4)))
    val r1 = Graph.degreeAssortativity(star, "id_a", "id_b").collect().head
    assert(r1.getLong(0) === 4L)
    assert(r1.getAs[Double]("assortativity") === -1.0)
    // 4-cycle: all degrees 2 -> zero degree variance -> NULL, not 0.
    val cycle = df(Seq(Edge(1, 2), Edge(2, 3), Edge(3, 4), Edge(1, 4)))
    val r2 = Graph.degreeAssortativity(cycle, "id_a", "id_b").collect().head
    assert(r2.isNullAt(1))
  }

  test("richClub: a hub clique with pendant leaves reads phi 1 above the leaf degree") {
    // K4 on {1,2,3,4} (degree >= 3 each) plus a pendant leaf per hub
    // (leaves have degree 1, hubs degree 4)
    val k4 = for (a <- 1L to 4L; b <- a + 1 to 4L) yield Edge(a, b)
    val leaves = (1L to 4L).map(h => Edge(h, h + 10))
    val got = Graph.richClub(df(k4 ++ leaves), "id_a", "id_b", Seq(1, 3, 10))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // k=1: hubs only (deg 4 > 1; leaves deg 1 excluded) -> the K4: phi 1
    assert(got(1L) === ((4L, 6L, Some(1.0))))
    // k=3: same club
    assert(got(3L) === ((4L, 6L, Some(1.0))))
    // k=10: nobody qualifies -> undefined, not 0
    assert(got(10L) === ((0L, 0L, None)))
  }

  test("degreeAssortativity matches a plain-Scala Pearson referee on a mixed graph") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 5L), (5L, 6L))
    val deg = (edges.map(_._1) ++ edges.map(_._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    val xs = edges.flatMap { case (u, v) => Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val n = xs.size.toDouble
    val sx = xs.map(_._1).sum.toDouble
    val sxy = xs.map(p => p._1 * p._2).sum.toDouble
    val sxx = xs.map(p => p._1 * p._1).sum.toDouble
    val want = (n * sxy - sx * sx) / (n * sxx - sx * sx)
    val got = Graph.degreeAssortativity(df(edges.map(e => Edge(e._1, e._2))), "id_a", "id_b")
      .collect().head.getAs[Double]("assortativity")
    assert(math.abs(got - math.rint(want * 1e6) / 1e6) < 1e-9)
  }
}
