package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting can't help (it only splits *sort-merge* join partitions, and
  * only after a shuffle has already materialized the skew).
  *
  * Shape: the skewed (large) side gets a random-but-deterministic salt in
  * `[0, n)` derived from its whole row hash; the small side is replicated n
  * ways with `explode`. The join key becomes (key, salt), so one hot key's
  * rows spread across n shuffle partitions instead of one. Row multiplicity
  * is preserved exactly: every large-side row matches exactly the one
  * replica carrying its salt.
  *
  * Cost model: replicates the SMALL side n× (bounded: n · |small|) to buy
  * n-way parallelism on the hot keys — the standard trade at 100 TB when a
  * handful of keys hold a double-digit percent of the rows. Use AQE first;
  * reach for this when the skew is known ahead of time (e.g. a null-heavy
  * FK or a celebrity user id).
  */
object SkewJoin {

  /** Inner-join `large` with `small` on `keys`, salted `n` ways. The salt is
    * `xxhash64` of the large row's key columns plus a disambiguator column
    * (monotonically varying, e.g. a unique id) so rows of the SAME hot key
    * still spread; pass the large side's primary key as `spread`. */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      spread: Column, n: Int): DataFrame = {
    require(n > 0, "salt fan-out must be positive")
    val l = large.withColumn("_salt", pmod(xxhash64(spread), lit(n)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    l.join(s, keys :+ "_salt").drop("_salt")
  }
}
