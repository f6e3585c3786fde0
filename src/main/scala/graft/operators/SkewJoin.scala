package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY §7 / 100 TB posture).
  *
  * Spark's AQE rewrites moderately skewed sort-merge joins at runtime
  * (`spark.sql.adaptive.skewJoin`, on by default). Salting is the explicit
  * technique for pathological hot keys that exceed what AQE splitting can
  * absorb, or when the build side must stay a shuffle join:
  *
  *  - the LARGE (skewed) side gets a uniform salt in [0, salt);
  *  - the SMALL side is replicated `salt` times (explode);
  *  - the join key becomes (key, salt), spreading each hot key over `salt`
  *    shuffle partitions.
  *
  * Result is row-identical to the plain inner equi-join; only the physical
  * distribution changes. Cost: small side × salt replication — use for a
  * dimension-sized right side only.
  */
object SkewJoin {

  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salt: Int = 16): DataFrame = {
    require(salt > 0)
    // uniform spread irrespective of key distribution (hot keys have
    // identical column values, so a hash-of-columns salt would NOT spread)
    val saltedLarge = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(typedlit((0 until salt).toList)))
    saltedLarge.join(saltedSmall,
        saltedLarge(key) === saltedSmall(key) &&
          saltedLarge("__salt") === saltedSmall("__salt"))
      .drop(saltedSmall(key)).drop(saltedLarge("__salt")).drop(saltedSmall("__salt"))
  }
}
