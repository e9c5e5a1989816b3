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
}
