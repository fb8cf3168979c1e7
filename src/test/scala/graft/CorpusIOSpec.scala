package graft

import org.apache.spark.sql.functions._

import graft.sources.CorpusIO

/** Source/sink round-trips for every supported at-rest format, with the
  * scale properties asserted: explicit-schema reads, filter pushdown on
  * the columnar formats, malformed-row quarantine on the text formats. */
class CorpusIOSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("round-trip equality across parquet/orc/json/csv") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toFile
    dir.deleteOnExit()
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    CorpusIO.formats.foreach { fmt =>
      val p = s"${dir.getAbsolutePath}/$fmt"
      CorpusIO.write(docs, p, fmt)
      val got = CorpusIO.read(spark, p, fmt, docs.schema)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got === expected, s"$fmt round-trip mismatch")
    }
  }

  test("columnar formats push filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io_push").toFile
    dir.deleteOnExit()
    Seq("parquet", "orc").foreach { fmt =>
      val p = s"${dir.getAbsolutePath}/$fmt"
      CorpusIO.write(docs, p, fmt)
      val plan = CorpusIO.read(spark, p, fmt, docs.schema)
        .filter(col("n_chars") > 100L).select(col("doc_id"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)"),
        s"$fmt scan did not receive the pushed filter:\n$plan")
    }
  }

  test("malformed JSON rows are quarantined by permissive mode, not fatal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_io_bad").toFile
    dir.deleteOnExit()
    val p = s"${dir.getAbsolutePath}/mixed.jsonl"
    Seq("""{"doc_id": 1, "lang": "en"}""", """{not json at all""",
      """{"doc_id": 2, "lang": "es"}""")
      .toDF("value").coalesce(1).write.text(p)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("lang", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val read = CorpusIO.read(spark, p, "json", schema).cache()
    assert(read.filter(col("_corrupt_record").isNull).count() == 2)
    assert(read.filter(col("_corrupt_record").isNotNull).count() == 1)
    read.unpersist()
  }

  test("writeLayout: dir partitioning, bounded file sizes, sorted rows within files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io_layout").toFile
    dir.deleteOnExit()
    val docs = graft.util.SparkUtil.table(spark, sf(), "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    CorpusIO.writeLayout(docs, dir.getAbsolutePath,
      partitionBy = Seq("lang"), sortCols = Seq("doc_id"), maxRecordsPerFile = 10)
    val langDirs = dir.listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty, "directory partitioning must appear on disk")
    // every data file respects the record cap
    langDirs.foreach { ld =>
      ld.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        val n = spark.read.parquet(f.getAbsolutePath).count()
        assert(n <= 10, s"${f.getName} has $n rows > maxRecordsPerFile")
      }
    }
    // rows inside each file are doc_id-sorted (tight row-group stats)
    val aFile = langDirs.head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(aFile.getAbsolutePath)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, "rows within a file must be sorted on sortCols")
    // round trip: nothing lost, partition column recovered
    val back = spark.read.parquet(dir.getAbsolutePath)
    assert(back.count() == docs.count())
    assert(back.columns.toSet == Set("doc_id", "lang", "n_chars"))
  }
}
