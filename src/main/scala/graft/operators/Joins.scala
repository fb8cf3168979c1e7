package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Join utilities for the cluster-scale failure modes local tests never
  * hit: key skew and repeated co-located joins.
  */
object Joins {

  /** Skew-resistant inner equi-join: the left (large, skewed) side gets a
    * random salt in [0, salts); the right side is replicated once per salt
    * value. A hot key's rows then spread across `salts` reducers instead
    * of serializing through one. Use when AQE's skew handling isn't
    * available (streaming state joins) or a key is pathological enough to
    * need a guaranteed spread. Replication cost: |right| × salts — meant
    * for moderate right sides.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", (rand(seed = 42) * salts).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Write both sides bucketed by the join key so subsequent joins are
    * exchange-free (co-located). Returns the two table names registered in
    * the session catalog. At 100 TB this converts every fact-fact join on
    * the bucket key from a full shuffle into a local zip of bucket files.
    */
  def bucketize(
      spark: SparkSession,
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int): String = {
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
    tableName
  }
}
