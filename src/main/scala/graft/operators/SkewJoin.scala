package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't enough (e.g. one key holding >5% of a 100 TB fact
  * table, or a skewed aggregation feeding the join).
  *
  * Mechanics: the skewed (fact) side gets a deterministic salt in
  * [0, salts); the small (dim) side is exploded `salts` times; the join
  * key becomes (key, salt), spreading the hot key over `salts` reducers.
  * Cost: the dim side is duplicated `salts` times through the shuffle —
  * use only on genuinely-skewed joins and keep `salts` modest (8-32).
  *
  * First resort remains AQE (`spark.sql.adaptive.skewJoin.enabled`, on in
  * GraftSession) which splits oversized partitions at runtime without the
  * dim-duplication cost; this utility covers the cases AQE can't see,
  * e.g. skew created inside the same stage as the join.
  */
object SkewJoin {

  /** Inner equi-join `fact.key == dim.key` with `salts`-way salting.
    * Row-deterministic: the salt is a hash of the fact row's partition and
    * intra-partition position, not rand(), so plans replay identically.
    */
  def saltedInnerJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 16
  ): DataFrame = {
    require(salts > 0)
    val salted = fact.withColumn(
      "__salt",
      pmod(hash(spark_partition_id(), monotonically_increasing_id()), lit(salts))
    )
    val exploded = dim.withColumn(
      "__salt",
      explode(array((0 until salts).map(lit): _*))
    )
    salted
      .join(exploded, Seq(key, "__salt"))
      .drop("__salt")
  }
}
