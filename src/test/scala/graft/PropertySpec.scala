package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.ExactAgg
import graft.operators.TickOps

/** Property-based checks for the numeric core (scalacheck Gen driven by a
  * fixed seed — deterministic, no runner bridge needed): ExactAgg vs
  * reference math, z-score guards, and engine-order invariance (the
  * property the ExactAgg design exists for). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("ExactAgg avg/stddev match reference math and are repartition-invariant") {
    val prices: Gen[List[Double]] =
      Gen.choose(1, 40).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0.01, 500.0).map(d => math.rint(d * 100) / 100)))
    samples(prices, 20).filter(_.nonEmpty).foreach { xs =>
      val df = xs.toDF("price")
      def run(parts: Int) = df.repartition(parts)
        .agg(ExactAgg.davg(col("price")).as("a"), ExactAgg.dstddev0(col("price")).as("s"))
        .as[(Double, Double)].collect().head
      val (a1, s1) = run(1)
      val (a7, s7) = run(7)
      // bitwise identical regardless of partitioning — the oracle property
      assert(a1 == a7 && s1 == s7, s"partitioning changed result for $xs")
      val mean = xs.sum / xs.size
      assert(math.abs(a1 - mean) < 1e-9)
      val sd = if (xs.size == 1) 0.0
        else math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (xs.size - 1))
      assert(math.abs(s1 - sd) < 1e-6, s"stddev mismatch for $xs: $s1 vs $sd")
    }
  }

  test("zscore is always finite and zero exactly when std is 0/null/NaN") {
    val gen = for {
      p <- Gen.choose(-1e6, 1e6)
      avg <- Gen.choose(-1e6, 1e6)
      std <- Gen.oneOf(Gen.const(0.0), Gen.const(Double.NaN), Gen.choose(1e-9, 1e3))
    } yield (p, avg, std)
    val rows = samples(gen, 60)
    val df = rows.map { case (p, a, s) =>
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "S", p, "w", a, s)
    }.toDF("event_time", "symbol", "price", "window", "avg_price", "std_price")
    val out = TickOps.zscore(df)
      .select("price", "avg_price", "std_price", "zscore_price")
      .collect()
    assert(out.length == rows.length)
    out.foreach { r =>
      val (p, avg, std, z) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(!z.isNaN && !z.isInfinite)
      if (std == 0.0 || std.isNaN) assert(z == 0.0)
      else assert(math.abs(z - (p - avg) / std) < 1e-12)
    }
  }

  test("text-quality scores stay in bounds and PII redaction is idempotent") {
    val word: Gen[String] = Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.const("the"), Gen.const("user@example.com"), Gen.const("10.0.0.1"),
      Gen.const("a.b"), Gen.const("@"), Gen.const("1.2.3"), Gen.const("..."))
    val text: Gen[String] =
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val docs = samples(text, 80).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

    val rows = docs.select(
      graft.operators.TextOps.qualityScore(col("text")).as("q"),
      graft.operators.TextOps.redactPii(col("text")).as("r1"),
      graft.operators.TextOps.redactPii(
        graft.operators.TextOps.redactPii(col("text"))).as("r2"),
      col("text")).collect()
    rows.foreach { r =>
      val q = r.getDouble(0)
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of [0,1] for '${r.getString(3)}'")
      // placeholders contain no emails/IPs themselves → scrubbing is a fixpoint
      assert(r.getString(1) == r.getString(2),
        s"redaction not idempotent for '${r.getString(3)}'")
    }

    val rep = graft.operators.TextOps.repetitionStats(docs, "doc_id", "text", k = 3)
      .select("repetition").collect().map(_.getDouble(0))
    assert(rep.forall(x => x >= 0.0 && x < 1.0)) // 1.0 unreachable: first gram unique

    // cluster labels: always ≤ own id (min-propagation) and a fixpoint
    // under re-clustering the (id, cluster) edges themselves
    val pairs = samples(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)), 40)
      .collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("id_a", "id_b")
    val labels = graft.operators.Dedup.duplicateClusters(pairs)
    val lm = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm.forall { case (id, c) => c <= id })
    val again = graft.operators.Dedup.duplicateClusters(
        labels.toDF("id_a", "id_b").filter(col("id_a") =!= col("id_b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again.forall { case (id, c) => lm(id) == c })
  }

  /** Independent driver-side evaluator for the TextOps replace chains
    * (java.util.regex directly, no Catalyst) - the cross-check that the
    * Column fold executes the step lists it claims to. */
  private def refChain(steps: Seq[graft.operators.TextOps.ChainStep], s: String): String =
    steps.foldLeft(s) {
      case (acc, graft.operators.TextOps.Rx(p, r)) =>
        java.util.regex.Pattern.compile(p).matcher(acc).replaceAll(r)
      case (acc, graft.operators.TextOps.Lit(f, t)) => acc.replace(f, t)
    }

  test("htmlText: column chain == driver-side reference on random markup soup; invariants hold") {
    import graft.operators.TextOps
    val token: Gen[String] = Gen.frequency(
      6 -> Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString)),
      2 -> Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", " \n "),
      3 -> Gen.oneOf("<", ">", "</", "<p>", "</p>", "<div class=\"x\">", "<br>",
        "<script>", "</script>", "<style>", "</style>", "<!--", "-->", "<em>",
        "<SCRIPT t=1>", "</SCRIPT>", "<h2>", "</li>", "<pre >",
        "&amp;", "&lt;", "&gt;", "&#39;", "&#38;", "&nbsp;", "&bogus;", "&#x41;",
        "&", ";", "&amp;lt;"))
    val html: Gen[String] =
      Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, token).map(_.mkString))
    val inputs = samples(html, 250)
    val got = inputs.toDF("h")
      .select(TextOps.htmlText(col("h"))).as[String].collect()
    inputs.zip(got).foreach { case (in, out) =>
      val ref = refChain(TextOps.htmlTextSteps, in)
      assert(out == ref,
        s"column chain diverged from the step-list reference\n in=${in.replace("\n", "\\n")}\nout=${out.replace("\n", "\\n")}\nref=${ref.replace("\n", "\\n")}")
      // whitespace discipline invariants: only spaces and newlines
      // survive, never doubled, never at the ends; extraction only shrinks
      assert(!out.exists(c => c == '\t' || c == '\r' || c == '\f' || c == 0x0B.toChar), s"raw ws in: $out")
      assert(!out.contains("  "), s"double space in: $out")
      assert(out.isEmpty || (!" \n".contains(out.head) && !" \n".contains(out.last)), s"untrimmed: '$out'")
      assert(out.length <= in.length, s"extraction grew the text: '$in' -> '$out'")
    }
  }

  test("canonicalizeUnicode: column chain == reference on random homoglyph soup; idempotent") {
    import graft.operators.TextOps
    val token: Gen[String] = Gen.frequency(
      6 -> Gen.alphaChar.map(_.toString),
      3 -> Gen.oneOf("\u0430", "\u043e", "\u0440", "\u0421", "\u041e", "\u03bf", "\u039f"),
      2 -> Gen.oneOf("\u0301", "\u0300", "\u0308", "\u0303", "\u0327"),
      2 -> Gen.oneOf("a\u0301", "e\u0300", "u\u0308", "n\u0303", "\u0430\u0301", "\u00e1"),
      1 -> Gen.const(" "))
    val text: Gen[String] =
      Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, token).map(_.mkString))
    val inputs = samples(text, 250)
    val got = inputs.toDF("t")
      .select(TextOps.canonicalizeUnicode(col("t"))).as[String].collect()
    inputs.zip(got).foreach { case (in, out) =>
      val ref = refChain(TextOps.unicodeCanonSteps, in)
      assert(out == ref, s"column chain diverged from reference: in=$in out=$out ref=$ref")
      // fold-then-compose makes the chain IDEMPOTENT: folds emit ASCII,
      // composition output (precomposed Latin-1) matches no left-hand
      // side, and every mapped decomposed pair is gone after one pass -
      // the stability a dedup canonical form requires
      assert(refChain(TextOps.unicodeCanonSteps, out) == out, s"not idempotent: $in -> $out")
      // confusable targets and composed forms only: no mapped Cyrillic/
      // Greek codepoint survives
      assert(!out.exists(c => (c >= 0x0400 && c <= 0x045f) || c == 0x03bf || c == 0x039f),
        s"mapped homoglyph survived: $out")
    }
  }
}
