package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key skew tools for the shuffle joins the engine cannot avoid.
  *
  * The domain produces real skew: a handful of recordsets hold a large
  * share of all records (the reference's own stats pages lead with the
  * biggest recordsets), so any record⋈recordset-dimension join keyed on
  * `recordset` sends those keys to single reducers. Two levers, in
  * preference order:
  *
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.*`) — free,
  *     runtime-adaptive, needs no code change; SkewSpec pins that the
  *     engine's sort-merge joins are eligible and demonstrates the
  *     split firing.
  *  2. Explicit salting ([[saltedJoin]]) — for the cases AQE cannot fix
  *     (skewed *aggregations* feeding a join, or a build side that is
  *     too big to broadcast yet small enough to replicate `n`×).
  */
object Skew {

  /** Salted inner equi-join on `key`: scatter each left row to one of
    * `n` salted sub-keys (deterministically — the salt is a hash of the
    * whole row, so re-runs produce identical partition placement, not
    * `rand()`), and replicate every right row to all `n` sub-keys. The
    * hot key's rows then spread over `n` reducers instead of one.
    *
    * Cost model: right side shuffles `n`× its size — use for dimension
    * sides in the "too big to broadcast, small enough to replicate"
    * band, with `n` sized to the observed hot-key share. Result equals
    * the plain join row-for-row (SkewSpec). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      n: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(n)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
