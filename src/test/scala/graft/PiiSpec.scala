package graft

import org.apache.spark.sql.functions._

import graft.functions.Pii
import graft.operators.Corpus

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    (1L, "mail bob.smith+x@corp.example.org now"),
    (2L, "call 555-0134 or 555-9999 today"),
    (3L, "server 192.168.0.12 is up"),
    (4L, "reach a@b.io at 10.0.0.1 tel 555-0000"),
    (5L, "no personal data here at all")
  ).toDF("id", "text")

  test("PII counts per class") {
    val out = samples.select($"id",
        Pii.emailCount($"text").as("e"),
        Pii.phoneCount($"text").as("p"),
        Pii.ipv4Count($"text").as("i"),
        Pii.hasPii($"text").as("any"))
      .orderBy($"id").as[(Long, Int, Int, Int, Boolean)].collect().toSeq
    assert(out == Seq(
      (1L, 1, 0, 0, true),
      (2L, 0, 2, 0, true),
      (3L, 0, 0, 1, true),
      (4L, 1, 1, 1, true),
      (5L, 0, 0, 0, false)))
  }

  test("redaction replaces every class and nothing else") {
    val out = samples.select($"id", Pii.redact($"text").as("r"))
      .orderBy($"id").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "mail [EMAIL] now"),
      (2L, "call [PHONE] or [PHONE] today"),
      (3L, "server [IP] is up"),
      (4L, "reach [EMAIL] at [IP] tel [PHONE]"),
      (5L, "no personal data here at all")))
  }

  test("phone digits inside an IPv4 or email are not double-redacted") {
    // email local part with a dash-digit run; IP octets that would
    // pair as ddd-dddd if the dots were eaten first
    val df = Seq((1L, "x 123-4567@example.com y 123.456.7.8 z")).toDF("id", "text")
    val r = df.select(Pii.redact($"text")).head().getString(0)
    assert(r == "x [EMAIL] y [IP] z")
  }

  test("lmScore: rarer tokens score higher; uniform doc scores ln(n/c)") {
    // corpus: "a" appears 6x, "b" 2x, total 8 tokens
    val df = Seq((1L, "a a a"), (2L, "a a a"), (3L, "b b")).toDF("doc_id", "text")
    val out = Corpus.lmScore(df, "doc_id", "text")
      .orderBy($"id").as[(Long, Double, Long)].collect().toSeq
    val xentA = math.floor(math.floor((math.log(8.0) - math.log(6.0)) * 1e6 + 0.5) + 0.5) / 1e6
    val xentB = math.floor(math.floor((math.log(8.0) - math.log(2.0)) * 1e6 + 0.5) + 0.5) / 1e6
    assert(out == Seq((1L, xentA, 3L), (2L, xentA, 3L), (3L, xentB, 2L)))
    assert(xentB > xentA) // rarer token ⇒ higher cross-entropy
  }
}
