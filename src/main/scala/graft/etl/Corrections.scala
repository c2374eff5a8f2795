package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The KV record-correction engine
  * (idb/corrections/record_corrector.py:186-255) re-expressed as
  * broadcast lookup joins over flat record columns.
  *
  * Semantics preserved:
  *  - rules are keyed by a tuple of fields; a record matches when the
  *    sha256 objectHasher of its lowercased key-tuple values equals the
  *    rule's hash (etags.py:41-79 — dict hashing is
  *    `concat(k + sha256(v))` over sorted keys, reproduced here with
  *    codegen'd sha2/concat);
  *  - key tuples apply SHORTEST FIRST (:210), each stage seeing the
  *    previous stage's corrected values (sequential join stages);
  *  - `dwc:scientificname` is never overwritten (:231-232);
  *  - a rule that would replace a protected kingdom flags
  *    `dwc_kingdom_suspect` and applies nothing (:221-228);
  *  - per-field flags: `_added` when the record lacked the field,
  *    `_replaced` when it differed (:233-253).
  *
  * At scale each key-tuple stage is one broadcast hash join (the
  * corrections table is KB-to-MB sized); n key tuples ⇒ n fused
  * codegen'd joins, no shuffle of the record side.
  */
object Corrections {

  /** record_corrector.py:14. */
  val protectedKingdoms: Seq[String] =
    Seq("animalia", "plantae", "fungi", "chromista", "protista", "protozoa")

  /** One correction rule: when every `matchOn` field (lowercased)
    * equals, set the `set` fields. */
  final case class Rule(matchOn: Map[String, String], set: Map[String, String]) {
    def keyTuple: Seq[String] = matchOn.keys.toSeq.sorted
  }

  /** objectHasher("sha256", {f -> lower(v)}) as a column over the
    * record's own columns; null when any key-tuple field is null
    * (get_etag returns None, :195-206). */
  def keyHash(fields: Seq[String], colFor: String => Column): Column = {
    val parts = fields.sorted.flatMap { f =>
      Seq(lit(f), sha2(lower(colFor(f)), 256))
    }
    val anyNull = fields.map(colFor(_).isNull).reduce(_ || _)
    when(anyNull, lit(null)).otherwise(sha2(concat(parts: _*), 256))
  }

  /** Driver-side twin of [[keyHash]] for building the rule table. */
  def ruleHash(matchOn: Map[String, String]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
    val s = matchOn.toSeq.sortBy(_._1).map { case (k, v) =>
      k + hex(java.security.MessageDigest.getInstance("SHA-256")
        .digest(v.toLowerCase.getBytes("UTF-8")))
    }.mkString
    hex(md.digest(s.getBytes("UTF-8")))
  }

  /** Apply rules to a DataFrame with flat record columns (null = field
    * absent). `fieldCol` maps a rule's field name (e.g. "dwc:country")
    * to the DataFrame column name (e.g. "country"). */
  def apply(df: DataFrame, rules: Seq[Rule],
      fieldCol: String => String = identity): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val byTuple = rules.groupBy(_.keyTuple).toSeq
      .sortBy { case (t, _) => (t.length, t.mkString("\u0000")) }

    // get_etag prefers the ORIGINAL record value for every field the
    // record carried (record_corrector.py:195-206: `if f in d` before
    // the corrected_dict fallbacks) — a later key tuple hashes the
    // pre-correction value of an originally-present field, and only
    // fields ADDED by an earlier stage hash their corrected value
    // (r11 corrections differential finding). Snapshot the originals
    // once; the hash input coalesces original-first.
    val keyFields = rules.flatMap(_.keyTuple).distinct
    val withOrig = keyFields.foldLeft(df) { (d, f) =>
      d.withColumn("_orig_" + fieldCol(f), col(fieldCol(f)))
    }
    def hashInput(f: String): Column =
      when(col("_orig_" + fieldCol(f)).isNotNull, col("_orig_" + fieldCol(f)))
        .otherwise(col(fieldCol(f)))

    val folded = byTuple.foldLeft(withOrig) { case (acc, (tuple, tupleRules)) =>
      // rules sharing a match key resolve LAST-write-wins, like the
      // reference's etag-keyed KV store where later to_insert lines
      // overwrite earlier ones wholesale (record_corrector.py:125-151;
      // locality's kl identity entries collide with its implied-parent
      // rules this way) — and the broadcast join below must see one
      // row per hash or matches would fan out record rows
      val deduped = tupleRules.foldLeft(
        scala.collection.immutable.ListMap.empty[Map[String, String], Rule]
      ) { (m, r) => m - r.matchOn + (r.matchOn -> r) }.values.toSeq
      val ruleRows = deduped.map { r =>
        (ruleHash(r.matchOn), r.set.map { case (k, v) => k -> v })
      }.toDF("_rule_hash", "_rule_set")
      val setFields = deduped.flatMap(_.set.keys).distinct
        .filterNot(_ == "dwc:scientificname") // never overwritten (:231)

      val withHash = acc.withColumn("_key_hash",
        keyHash(tuple, hashInput))
      val joined = withHash.join(broadcast(ruleRows),
        withHash("_key_hash") === ruleRows("_rule_hash"), "left")

      // kingdom guard: a rule replacing a protected kingdom flags and
      // skips the whole rule (:221-228)
      val kCol = col(fieldCol("dwc:kingdom"))
      val wantsKingdom = element_at(col("_rule_set"), "dwc:kingdom")
      val kingdomSuspect = col("_rule_set").isNotNull &&
        wantsKingdom.isNotNull && kCol.isNotNull &&
        lower(kCol) =!= wantsKingdom &&
        lower(kCol).isin(protectedKingdoms: _*)
      val active = col("_rule_set").isNotNull && !kingdomSuspect

      // accumulate a flag column across stages (first stage creates it)
      def orFlag(d: DataFrame, name: String, cond: Column): DataFrame =
        d.withColumn(name,
          if (d.columns.contains(name)) coalesce(col(name), lit(false)) || cond
          else coalesce(cond, lit(false)))

      val applied = setFields.foldLeft(
        orFlag(joined, "_flag_dwc_kingdom_suspect", kingdomSuspect)
      ) { (d, f) =>
        val cn = fieldCol(f)
        val newVal = element_at(col("_rule_set"), f)
        val flagBase = "_flag_" + f.replace(":", "_").toLowerCase
        val hasNew = active && newVal.isNotNull
        val d1 = orFlag(d, flagBase + "_added", hasNew && col(cn).isNull)
        val d2 = orFlag(d1, flagBase + "_replaced",
          hasNew && col(cn).isNotNull && lower(col(cn)) =!= newVal)
        // write only on added/replaced: a case-insensitive MATCH keeps
        // the record's own casing (record_corrector.py:246-248 `pass` —
        // kl identity rules like "florida"→"florida" must not lowercase
        // a record's "Florida")
        d2.withColumn(cn,
          when(hasNew && (col(cn).isNull || lower(col(cn)) =!= newVal), newVal)
            .otherwise(col(cn)))
      }
      applied.drop("_key_hash", "_rule_hash", "_rule_set")
    }
    folded.drop(keyFields.map("_orig_" + fieldCol(_)).distinct: _*)
  }

  /** Fold `_flag_*` columns produced by [[apply]] into a flags array
    * (grabAll-style fold) and drop them. */
  def foldFlags(df: DataFrame, into: String = "correction_flags"): DataFrame = {
    val flagCols = df.columns.filter(_.startsWith("_flag_")).sorted.toSeq
    val entries = flagCols.map(c =>
      when(coalesce(col(c), lit(false)), c.stripPrefix("_flag_")))
    df.withColumn(into, array_compact(array(entries: _*)))
      .drop(flagCols: _*)
  }
}
