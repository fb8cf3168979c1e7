package graft

import org.apache.spark.sql.functions._

import graft.operators.{BpeStore, TextOps}

/** The BPE train-once / apply-many lifecycle: the merge-list artifact
  * roundtrips parquet exactly (padding included), stored-then-applied
  * output is bit-identical to the inline operator at the same depth,
  * and the driver-loop trainer reaches depths the inline 8-round plan
  * cap cannot (the store's reason to exist). */
class BpeStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/merges"
  }

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the journey"),
    (3L, "sphinx of black quartz judge my vow said the wizard"),
    (4L, "how vexingly quick daft zebras jump over fences daily"),
    (5L, "the five boxing wizards jump quickly over the lazy dog"))
    .toDF("doc_id", "text")

  test("merge list roundtrips parquet exactly, fixed-point padding included") {
    val path = tmp("bpe-roundtrip")
    // a two-letter corpus exhausts its pairs almost immediately: the
    // trainer must stop at the fixed point and pad the rest with ''
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val trained = BpeStore.train(tiny, "text", rounds = 6, path)
    assert(trained.length == 6, s"padded length: $trained")
    assert(trained.head == "|a| |b|", s"first merge: ${trained.head}")
    // after |ab| every word is one symbol — no pairs left anywhere
    assert(trained.tail.forall(_ == ""), s"padding: $trained")
    val loaded = BpeStore.load(spark, path)
    assert(loaded == trained, s"roundtrip: $loaded vs $trained")
  }

  test("stored-then-applied == inline applyBpeMerges, bit for bit") {
    val path = tmp("bpe-equiv")
    BpeStore.train(corpus, "text", rounds = 4, path)
    val stored = BpeStore.applyFromStore(corpus, "doc_id", "text", path)
      .collect().map(_.toSeq).toSet
    val inline = TextOps.applyBpeMerges(corpus, "doc_id", "text", rounds = 4)
      .collect().map(_.toSeq).toSet
    assert(stored == inline,
      s"stored/inline divergence:\n  stored=$stored\n  inline=$inline")
  }

  test("driver-loop training reaches 64 merges (past the inline plan cap)") {
    val path = tmp("bpe-64")
    // enough letter mass for 64 productive rounds: the 5-doc corpus
    // replicated with distinct ids (replication changes counts uniformly,
    // not the pair ranking's richness)
    val big = (0 until 8).map(i =>
      corpus.withColumn("doc_id", col("doc_id") + lit(i * 100L)))
      .reduce(_ unionAll _)
    val trained = BpeStore.train(big, "text", rounds = 64, path)
    assert(trained.length == 64)
    assert(trained.forall(_.nonEmpty),
      s"expected 64 productive rounds, got ${trained.count(_.nonEmpty)}")
    assert(trained.distinct.length == 64, "merges must be distinct")
    // every merge is a wrapped adjacent pair: "|…| |…|"
    val wrapped = "^\\|[a-z]+\\| \\|[a-z]+\\|$".r
    assert(trained.forall(p => wrapped.findFirstIn(p).isDefined),
      s"malformed pair in: ${trained.filterNot(p => wrapped.findFirstIn(p).isDefined)}")
    // application at depth 64 compresses strictly further than depth 4
    BpeStore.save(spark, trained.take(4), path + "_4")
    val at64 = BpeStore.applyFromStore(big, "doc_id", "text", path)
      .agg(sum("n_syms")).head.getLong(0)
    val at4 = BpeStore.applyFromStore(big, "doc_id", "text", path + "_4")
      .agg(sum("n_syms")).head.getLong(0)
    assert(at64 < at4, s"deeper merges must compress more: $at64 vs $at4")
  }

  test("symbols() exposes the learned vocabulary consistently with applyMerges") {
    val path = tmp("bpe-syms")
    BpeStore.train(corpus, "text", rounds = 4, path)
    val syms = BpeStore.symbols(corpus, Seq("doc_id"), "text", path)
    // per-doc symbol counts match applyFromStore's n_syms
    val bySyms = syms.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byApply = BpeStore.applyFromStore(corpus, "doc_id", "text", path)
      .select("doc_id", "n_syms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySyms == byApply, s"$bySyms vs $byApply")
    // keepCols=Nil drops the keys but keeps the same stream
    val total = BpeStore.symbols(corpus, Nil, "text", path).count()
    assert(total == bySyms.values.sum)
  }
}
