package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("connectedComponents labels each node with its min reachable id") {
    val s = spark
    import s.implicits._
    // components: {1,2,3,4} (a path — needs propagation, not one hop),
    // {10,11}, {20,21,22} (a triangle), isolated-from-each-other pairs
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L),
    ).toDF("d1", "d2")
    val comp = Graph.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connectedComponents: a long path converges within the diameter bound") {
    val s = spark
    import s.implicits._
    // path 0-1-2-...-9: min label must travel 9 hops
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("d1", "d2")
    val comp = Graph.connectedComponents(edges, "d1", "d2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet === Set(0L))
    assert(comp.keySet === (0L to 9L).toSet)
  }
}
