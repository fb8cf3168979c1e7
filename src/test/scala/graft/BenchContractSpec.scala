package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses only a 2,000-char tail of bench output — the gate
  * was silently unscored for two rounds when the metric line outgrew it.
  * This spec renders the slim line for the CURRENT query registry with
  * worst-case-width numbers, so adding queries that would overflow the
  * budget fails here instead of in the next round's scoring. */
class BenchContractSpec extends AnyFunSuite {

  test("slim metric line fits the driver tail with worst-case numbers") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst-case per-median width under msSlimQ(): 9.94 renders "9.9"
    // and a pathological 99999 s clamps to "99" — ≤3 structural chars
    // in both regimes, so the budget holds for any runtime
    val medians = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 2 == 0) 9.94 else 99999.0)
    }
    // worst-case rendering of the abbreviated slim stream section
    // (msSlim clamps sec at 999 — 4-char structural bound)
    val stream =
      """{"sw":{"r":1000000,"s":999,"rps":999999},""" +
        """"swu":{"r":1000000,"s":999,"rps":999999},""" +
        """"swtp":{"r":1000000,"s":999,"rps":999999},""" +
        """"krt":{"r":1000000,"s":999,"rps":999999}}"""
    val line = Bench.renderSlim(medians, 99999.9999, "{}", stream, "/root/testdata/sf0.1",
      annBuildSec = 9999.99)
    assert(line.length <= 1950,
      s"metric line ${line.length} chars leaves <50 headroom under the 2000-char driver tail " +
        "— shorten query names or drop per-query detail from the slim line")
  }

  test("slim-line q-number prefixes are unique across the registry") {
    // renderSlim keys the stdout line by the q-number prefix; two queries
    // sharing a prefix would emit duplicate JSON keys and one median
    // would silently vanish in any JSON consumer
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    val dups = prefixes.groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted
    assert(dups.isEmpty, s"duplicate q-number prefixes: ${dups.mkString(", ")}")
    // the registry map itself is merged with ++ across per-file maps — a
    // full-name collision there is equally silent (later map wins)
    val perFile = Seq(
      queries.ReferenceQueries.queries, queries.RelationalQueries.queries,
      queries.TextQueries.queries, queries.SimilarityQueries.queries,
      queries.TimeSeriesQueries.queries)
    assert(SparkEntry.queries.size == perFile.map(_.size).sum,
      "query-name collision across per-file registries (++ silently dropped one)")
  }

  test("kafka_roundtrip bench path runs end-to-end and returns the input count") {
    val (n, sec) = Bench.kafkaRoundtrip(TestSpark.spark, "/root/testdata/sf0.001", 500)
    assert(n == 500, s"roundtrip must report the replayed row count, got $n")
    assert(sec > 0.0, "streaming section must be timed")
  }

  test("ms renderer emits valid minimal JSON numbers") {
    assert(Bench.ms(0.0) == "0")
    assert(Bench.ms(1.0) == "1")
    assert(Bench.ms(0.31003) == "0.31")
    assert(Bench.ms(12.004) == "12")   // %.2f rounding
    assert(Bench.ms(3.14159) == "3.14")
    assert(Bench.ms(999.999) == "1000") // carries, still a valid number
  }
}
