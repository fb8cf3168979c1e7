package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink surface beyond parquet: ORC, JSON-lines, and CSV —
  * the formats a corpus actually arrives in. The reference ingests JSON
  * frames from Kafka (`/root/reference/src/Tranforms/
  * moving_statistic.py:32-43` reads the `value` column and `from_json`s
  * it); these are the at-rest equivalents.
  *
  * Scale rules baked in:
  *  - reads take an EXPLICIT schema — schema inference is a full extra
  *    pass over the data (a 100 TB read before the real read) and can
  *    silently widen types between runs;
  *  - CSV/JSON parse in PERMISSIVE mode with a `_corrupt_record` column
  *    so malformed rows are quarantined, not fatal (the F1 null-reject
  *    discipline of the tick parser, applied to files);
  *  - writes can partition by low-cardinality columns for partition
  *    pruning downstream (see PartitionPruningSpec).
  */
object CorpusIO {

  val formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(
      df: DataFrame,
      path: String,
      format: String,
      partitionBy: Seq[String] = Nil): Unit = {
    require(formats.contains(format), s"unsupported format $format")
    val w = df.write.mode("overwrite").format(format)
    val pw = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    (if (format == "csv") pw.option("header", "true") else pw).save(path)
  }

  /** Pruning-friendly parquet layout — the write side of a 100 TB corpus
    * build, with the three knobs that decide read cost forever after:
    *
    *  - directory partitioning on low-cardinality `partitionBy` columns
    *    (partition pruning skips whole directories);
    *  - rows sorted within files on `sortCols`, so parquet row-group
    *    min/max stats are tight and predicate pushdown prunes row groups
    *    INSIDE each file (pair with a z-order key — `functions.ZOrderKey`
    *    — to make one sort column prune two dimensions);
    *  - `maxRecordsPerFile` bounds file sizes so a skewed partition
    *    becomes several well-sized files, not one unsplittable monster.
    *
    * The repartition on the partition columns makes each output
    * directory the work of few tasks — without it every task writes a
    * sliver of every partition and the job emits tasks × partitions tiny
    * files, the classic small-file explosion. */
  def writeLayout(
      df: DataFrame,
      path: String,
      partitionBy: Seq[String],
      sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import org.apache.spark.sql.functions.col
    require(partitionBy.nonEmpty, "writeLayout needs partition columns")
    df.repartition(partitionBy.map(col): _*)
      .sortWithinPartitions((partitionBy ++ sortCols).map(col): _*)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionBy: _*)
      .parquet(path)
  }

  def read(
      spark: SparkSession,
      path: String,
      format: String,
      schema: StructType): DataFrame = {
    require(formats.contains(format), s"unsupported format $format")
    // PERMISSIVE mode only routes malformed rows into the corrupt-record
    // column if the read schema CONTAINS that column — append it here so
    // the quarantine promise holds whether or not the caller declared it
    val quarantined =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    (format match {
      case "csv" => spark.read.format(format).schema(quarantined)
        .option("header", "true").option("mode", "PERMISSIVE")
      case "json" => spark.read.format(format).schema(quarantined)
        .option("mode", "PERMISSIVE")
      case _ => spark.read.format(format).schema(schema)
    }).load(path)
  }
}
