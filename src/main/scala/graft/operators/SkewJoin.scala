package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. A plain shuffle join sends every
  * row of a hot key to ONE reducer; at 100 TB a single "null-ish" or
  * celebrity key stalls the stage. Salting splits each hot key across
  * `saltFactor` reducers:
  *   - the skewed (big) side gets a deterministic salt in
  *     [0, saltFactor) derived from md5 of the whole row's join-adjacent
  *     value (uniform, reproducible — no rand());
  *   - the other side is replicated once per salt value;
  *   - the join key becomes (key, salt).
  * AQE's skew-join handles sort-merge skew adaptively; this operator is
  * for the cases AQE can't see (aggregations keyed downstream, or
  * broadcast-ineligible dimension sides). Semantically identical to the
  * plain join.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, other: DataFrame, keyCols: Seq[String],
      saltFactor: Int, saltSource: String): DataFrame = {
    require(saltFactor > 0)
    val salted = skewed.withColumn("__salt",
      pmod(conv(substring(md5(col(saltSource).cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(saltFactor.toLong)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keyCols :+ "__salt").drop("__salt")
  }
}
