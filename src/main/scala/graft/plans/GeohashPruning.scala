package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Geohash partition pruning — SURVEY §7.3's one optional custom
  * optimizer rule, for lakes laid out as
  * `.partitionBy("ghash<p>")` with `ghash<p> = geohash(lat, lon, p)`
  * ([[graft.functions.Geohash]]).
  *
  * A bounding-box query arrives as plain lat/lon range conjuncts —
  * nothing in it mentions the partition column, so vanilla Spark
  * scans EVERY partition and relies on row-level filtering. This rule
  * recognizes a Filter carrying both lat bounds and both lon bounds
  * over a relation that exposes a `ghash<p>` string column, computes
  * the box's covering cell set driver-side, and conjoins
  * `ghash<p> IN (<cells>)` — which the built-in
  * PruneFileSourcePartitions then turns into real partition pruning
  * (the injected rule runs inside the operator-optimization batch,
  * BEFORE partition pruning, so the scan never lists the other
  * partitions' files at all).
  *
  * Soundness: quantization is monotone, so every point inside the box
  * geohashes into one of the covering cells — the IN is implied by
  * the box predicate and never drops a row (GeohashPruningSpec checks
  * results with the rule on and off). Guards: the rewrite skips when
  * the condition already references the ghash column (idempotence
  * under the fixed-point batch) and when the covering set exceeds
  * [[MaxCells]] (a planet-wide box gains nothing from a huge
  * IN-list). Bounds may be strict or non-strict — a looser box only
  * widens the cover, never breaks soundness.
  *
  * NAMING CONTRACT (user-facing): the rewrite assumes, by column-name
  * convention, that every `ghash<p>` StringType column was derived as
  * `geohash(lat, lon, p)` FROM THE SAME ROW's `lat`/`lon` DoubleType
  * columns ([[graft.functions.Geohash.geohash]], as
  * [[graft.store.Layout]]-partitioned lakes write it). A `ghash<p>`
  * column that came from another source, or lat/lon transformed after
  * hashing, breaks that invariant and the injected IN would silently
  * drop rows. Lakes that can't honor the contract should disable the
  * rule per session: `SET spark.graft.geohashPruning.enabled=false`.
  * Precision is honored only up to 12 (the geohash kernel's 64-bit
  * limit); a `ghash13+` column is left untouched. */
object GeohashPruning extends Rule[LogicalPlan] {

  val MaxCells = 256

  val EnabledKey = "spark.graft.geohashPruning.enabled"

  private val GhashName = "^ghash(\\d{1,2})$".r

  private case class Bounds(var lo: Option[Double] = None,
      var hi: Option[Double] = None)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "true").toBoolean) plan
    else plan.transform {
      case f @ Filter(cond, child) =>
        val ghash = child.output.collectFirst {
          case a if a.dataType == StringType &&
            GhashName.findFirstMatchIn(a.name)
              .exists(m => { val p = m.group(1).toInt; p >= 1 && p <= 12 }) => a
        }
        ghash match {
          case Some(g) if !cond.references.contains(g) =>
            rewrite(f, cond, child, g)
          case _ => f
        }
    }

  private def rewrite(f: Filter, cond: Expression, child: LogicalPlan,
      g: Attribute): LogicalPlan = {
    val precision = GhashName.findFirstMatchIn(g.name).get.group(1).toInt
    def attrNamed(n: String): Option[ExprId] = child.output
      .collectFirst { case a if a.name.equalsIgnoreCase(n) &&
        a.dataType == DoubleType => a.exprId }
    (attrNamed("lat"), attrNamed("lon")) match {
      case (Some(latId), Some(lonId)) =>
        val lat = Bounds(); val lon = Bounds()
        def num(l: Literal): Option[Double] = l.value match {
          case d: Double => Some(d)
          case f: Float => Some(f.toDouble)
          case i: Int => Some(i.toDouble)
          case j: Long => Some(j.toDouble)
          case d: java.math.BigDecimal => Some(d.doubleValue)
          case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
          case _ => None
        }
        def record(a: Expression, v: Literal, isLower: Boolean): Unit =
          a match {
            case at: Attribute =>
              val b = if (at.exprId == latId) Some(lat)
                else if (at.exprId == lonId) Some(lon) else None
              for (bb <- b; d <- num(v))
                if (isLower) bb.lo = Some(bb.lo.fold(d)(math.max(d, _)))
                else bb.hi = Some(bb.hi.fold(d)(math.min(d, _)))
            case _ => ()
          }
        splitConjuncts(cond).foreach {
          case GreaterThanOrEqual(a, l: Literal) => record(a, l, isLower = true)
          case GreaterThan(a, l: Literal)        => record(a, l, isLower = true)
          case LessThanOrEqual(a, l: Literal)    => record(a, l, isLower = false)
          case LessThan(a, l: Literal)           => record(a, l, isLower = false)
          case LessThanOrEqual(l: Literal, a)    => record(a, l, isLower = true)
          case LessThan(l: Literal, a)           => record(a, l, isLower = true)
          case GreaterThanOrEqual(l: Literal, a) => record(a, l, isLower = false)
          case GreaterThan(l: Literal, a)        => record(a, l, isLower = false)
          case _ => ()
        }
        (lat.lo, lat.hi, lon.lo, lon.hi) match {
          case (Some(la), Some(lb), Some(na), Some(nb))
              if la <= lb && na <= nb =>
            val cells = graft.functions.Geohash.cover(la, lb, na, nb, precision)
            if (cells.size <= MaxCells)
              Filter(And(cond,
                In(g, cells.map(c => Literal(c)).toSeq)), child)
            else f
          case _ => f
        }
      case _ => f
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
