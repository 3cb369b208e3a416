package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. When one join key dominates (a hot
  * partition at 100 TB: one celebrity user, one default enum value), a
  * plain shuffle join lands the whole hot key on ONE reducer. Salting
  * spreads it: the big side gets a deterministic per-row salt in
  * [0, salts), the other side is replicated `salts`× (an explode — cheap
  * when that side is the smaller-but-not-broadcastable one), and the join
  * key becomes (key, salt). The salt never escapes the shuffle, so the
  * output is EXACTLY the plain equi-join — which is what makes the
  * operator oracle-checkable with a plain SQL join.
  *
  * Relation to engine features: AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`) auto-splits skewed sort-merge
  * partitions at runtime and is the first answer on Spark 3+; explicit
  * salting remains the tool for skewed AGGREGATIONS, for joins AQE can't
  * split (e.g. bucketed inputs it won't re-shuffle), and as the portable
  * statement of the technique.
  */
object SkewJoin {

  /** `big ⋈ other` on `key`, with big-side rows salted by `saltSrc`
    * (any deterministic per-row numeric source, e.g. a hash of the row's
    * unique id; determinism keeps task retries consistent).
    */
  def saltedEquiJoin(
      big: DataFrame,
      other: DataFrame,
      key: String,
      salts: Int,
      saltSrc: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    // pmod BEFORE narrowing: casting a 64-bit hash straight to int throws
    // under ANSI overflow checking; the mod result always fits. coalesce:
    // a null saltSrc row must still join (on bucket 0), or the salted join
    // would silently drop it and break the ==-plain-equi-join guarantee.
    val b = big.withColumn(
      "__salt",
      coalesce(pmod(saltSrc.cast("long"), lit(salts.toLong)), lit(0L)).cast("int"))
    val o = other.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    b.join(o, Seq(key, "__salt")).drop("__salt")
  }
}
