package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-graph algorithms the dedup pipelines need. */
object Graph {

  /** Connected components by iterative min-label propagation — the
    * cluster-resolution step after any near-dup pair generation: pairs
    * say "these two are the same document", components say "this is
    * the set, and its canonical id is the minimum member", which is
    * what a dedup pass actually deletes against.
    *
    * Each round every node takes the minimum component label among
    * itself and its neighbors (one hash join edges⋈labels + one
    * partial-aggregable min — both shuffle on the same id key);
    * convergence needs diameter rounds, and near-dup clusters are
    * almost-cliques, so 2-3 rounds settle real corpora. The loop stops
    * early on a fixpoint (an aggregate-only check, no driver-side
    * data).
    *
    * Every round materializes through `localCheckpoint` — iterative
    * DataFrame algorithms MUST cut lineage each round or the nested
    * join plan grows exponentially with iterations (a 10-hop path
    * aborts analysis without it; GraphSpec pins that case). On a
    * cluster where executor loss matters, swap in reliable
    * `checkpoint()` — same plan, durable blocks.
    *
    * @param edges undirected pair list (src, dst)
    * @return (id, comp) — every node that appears in any edge, labeled
    *   with the minimum id reachable from it
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20): DataFrame = {
    // materialize the edge list ONCE: every round references it twice,
    // and without the cut each round would recompute the whole upstream
    // pair-generation pipeline (for near-dup input that is the entire
    // LSH + verify chain — measured 5x the total query cost)
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .localCheckpoint(true)
    var labels = und.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = und
        .join(labels.select(col("id").as("b"), col("comp").as("_nc")), "b")
        .groupBy(col("a").as("id")).agg(min(col("_nc")).as("_nbMin"))
      // the changed flag rides the propagation join, so convergence
      // detection is a cheap scan of the checkpointed round result —
      // not another shuffle join of next⋈labels per round
      val newComp = least(col("comp"), coalesce(col("_nbMin"), col("comp")))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), newComp.as("comp"),
          (newComp =!= col("comp")).as("_chg"))
        .localCheckpoint(true)
      converged = next.filter(col("_chg")).head(1).isEmpty
      labels = next.drop("_chg")
      iter += 1
    }
    // Unconverged labels are WRONG labels (a component split across
    // several canonical ids corrupts downstream deletion sets silently),
    // so failing loud beats returning them. Near-dup cliques converge in
    // 2-3 rounds; a graph that genuinely needs more gets a bigger budget
    // from the caller, not a quietly wrong answer.
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; " +
        "raise maxIter for graphs with diameter beyond the label-" +
        "propagation budget")
    labels
  }

  /** Materialize the deduplicated corpus: drop every non-canonical
    * member of a duplicate cluster (canonical = the component's min
    * id), keep everything unclustered. The standard end-cap after
    * near-dup detection + [[connectedComponents]]: a left-anti join
    * against the kill set. No broadcast hint — the kill set scales with
    * the duplicate count (20% dups of a 100 TB corpus would OOM a
    * forced broadcast); the planner/AQE broadcasts when it fits and
    * falls back to a shuffled anti-join when it doesn't. */
  def dropDuplicates(corpus: DataFrame, idCol: String,
      labels: DataFrame): DataFrame = {
    val kill = labels.filter(col("comp") =!= col("id"))
      .select(col("id").as("_kill_id"))
    corpus.join(kill, corpus(idCol) === col("_kill_id"), "left_anti")
  }
}
