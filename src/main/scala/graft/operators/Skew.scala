package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic salted equi-join for skewed keys (BASELINE.json north_star:
  * "salted hash-join for skewed entities"). The dimension side is
  * replicated `salt` times with a salt column; each probe row picks one
  * deterministic salt bucket, so a hot key's probe rows spread over
  * `salt` shuffle partitions instead of one. Result rows are identical
  * to the unsalted join (asserted in SkewSpec and via the q_join_salted
  * DuckDB oracle). AQE skew-join splitting handles residual skew.
  */
object Skew {

  /** Inner equi-join probe⋈dim on probeKeys==dimKeys with `salt`-way
    * dimension replication. The shuffle is forced (merge hint) so the
    * salting actually matters — a broadcast would hide it.
    */
  def saltedJoin(probe: DataFrame, dim: DataFrame,
                 probeKeys: Seq[String], dimKeys: Seq[String],
                 salt: Int): DataFrame = {
    require(salt > 0)
    val saltedDim = dim
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    // deterministic bucket per probe row: hash over ALL probe columns
    val saltedProbe = probe
      .withColumn("__salt", pmod(hash(probe.columns.map(col).toSeq: _*), lit(salt)))
    val cond = probeKeys.zip(dimKeys)
      .map { case (p, d) => saltedProbe(p) === saltedDim(d) }
      .reduce(_ && _) && saltedProbe("__salt") === saltedDim("__salt")
    saltedProbe.hint("shuffle_hash").join(saltedDim, cond)
      .drop(saltedDim("__salt")).drop("__salt")
  }

  /** Identify heavy-hitter keys: first-pass count, top `k` by frequency
    * (SURVEY.md §2.4 J4 heavy-hitter detection).
    */
  def heavyHitters(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key)).count()
      .orderBy(col("count").desc, col(key))
      .limit(k)
}
