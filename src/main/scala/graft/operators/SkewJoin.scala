package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §4 / 100 TB design note).
  *
  * A plain shuffled join sends every row of a hot key to one reducer;
  * at 100 TB a single "null-ish" or celebrity key can hold a stage
  * hostage. Salting splits each left key across `salts` sub-partitions
  * (deterministic hash of a discriminator column — NOT rand(), so
  * retries/re-runs produce identical partitioning) and replicates the
  * right side `salts`× so every sub-partition can still find its
  * match. Cost: right side × salts (use on the smaller/dim side);
  * result is row-identical to the plain join.
  *
  * AQE's skew-join handles this automatically for sort-merge joins;
  * this operator is for when the skew is known up front or AQE can't
  * see it (e.g. aggregation-free pipelines, non-SMJ plans).
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, salted `salts`
    * ways. `leftDiscriminator` should be roughly uniform (any
    * unique-ish id column) — it only drives the salt assignment. NULL
    * discriminators can never drop rows: Spark's xxhash64 is
    * non-nullable (a NULL input hashes to the seed), so those rows all
    * land in one valid salt bucket; the coalesce is a defensive guard
    * should that hash contract ever change. The result is
    * row-identical to the plain join by construction (test-asserted).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      leftDiscriminator: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt",
      coalesce(pmod(xxhash64(col(leftDiscriminator)), lit(salts)), lit(0))
        .cast("int"))
    val explodedRight = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }
}
