package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for fact⋈dim equi-joins: salt the fact side's key
  * into `buckets` sub-keys and explode the dim side once per salt, so
  * one hot key's rows spread across `buckets` reducers instead of
  * hammering a single partition.
  *
  * This is the manual fallback for when AQE's skew-join split isn't
  * available (e.g., the skewed side is below AQE's partition-size
  * threshold but a single key still dominates a reducer, or the join
  * is dim-exploded deliberately). The salt is derived from stable row
  * content (xxhash64 over every fact column) so the placement is
  * deterministic run-to-run — and retry-safe, which a
  * spark_partition_id()/monotonically_increasing_id() salt is not.
  *
  * Caveat: pass the fact frame with at least one column BEYOND the
  * join key that varies within a hot key's rows — salting a frame
  * projected down to only the key gives every row of a key the same
  * salt (deterministic but spread-free). Fully identical duplicate
  * rows likewise share a salt and co-locate; that is inherent to any
  * content-derived (retry-safe) salt.
  */
object Salting {

  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, buckets: Int): DataFrame = {
    // The salt column must not collide with user columns on either input
    // (withColumn would silently REPLACE one and the final drop would
    // remove the user's data) — pick the first unused suffixed name,
    // the same pattern as AsOf.leftAsOf's helper columns.
    val taken = (fact.columns ++ dim.columns).toSet
    val saltCol = Iterator.from(0)
      .map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(!taken.contains(_)).get
    // Salt from stable row content only (hash of every fact column), so a
    // map-task retry recomputes the identical salt — nondeterministic
    // inputs like spark_partition_id() would make the shuffle key unstable
    // and risk row loss/duplication on partial stage retry.
    val salted = fact.withColumn(saltCol,
      pmod(xxhash64(fact.columns.map(col): _*), lit(buckets)).cast("int"))
    val expanded = dim.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded,
        salted(factKey) === expanded(dimKey)
          && salted(saltCol) === expanded(saltCol))
      .drop(saltCol)
  }
}
