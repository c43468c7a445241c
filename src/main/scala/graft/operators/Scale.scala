package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale utilities: the levers a 100 TB deployment pulls that small-SF
  * correctness tests never force.
  */
object Scale {

  /** Salted equi-join for skewed keys: explode the build side `salt` ways,
    * scatter the probe side across salts, join on (key, salt). Same rows
    * as a plain inner equi-join, but a hot key's rows spread over `salt`
    * reducers instead of one straggler.
    *
    * AQE's skew-join split (enabled in `GraftSession`) handles moderate
    * skew adaptively; explicit salting is for the pathological
    * one-key-dominates case (a viral item in the reference's product
    * stats, a boilerplate dup-cluster in corpus dedup).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salt: Int): DataFrame = {
    // Salt must be a deterministic function of the row itself: an id- or
    // rand-based salt recomputes differently on stage retry after a shuffle
    // fetch failure, duplicating/dropping rows against reducers that already
    // consumed the first attempt's output (the SPARK-23207 class of bug).
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col): _*), lit(salt.toLong)).cast("int"))
    val saltedBuild = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedProbe.join(saltedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-partition two frames on the join key so a subsequent join needs
    * no exchange of its own (both children arrive hash-partitioned) —
    * the API-level stand-in for bucketed tables when writing through the
    * catalog isn't available.
    */
  def coPartitioned(left: DataFrame, right: DataFrame, key: String, parts: Int): (DataFrame, DataFrame) =
    (left.repartition(parts, col(key)), right.repartition(parts, col(key)))
}
