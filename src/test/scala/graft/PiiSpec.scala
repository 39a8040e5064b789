package graft

import graft.ops.Pii

/** PII scan/redact against hand-known cases: real Luhn-valid vs
  * -invalid card numbers, octet-range IPv4 validation, multiple
  * occurrences, and the fixed redaction pass order. */
class PiiSpec extends SparkSpec {

  import spark.implicits._

  test("scan: counts per class, octet and Luhn validation diverge from " +
      "candidates, multiple hits counted") {
    val rows = Seq(
      // 4532015112830366 is Luhn-valid; 4532015112830367 is not
      (1L, "mail a@b.io and c.d+x@e-f.org ip 10.0.0.1 and 999.1.2.3 " +
        "tel 555-123-4567 card 4532015112830366"),
      (2L, "no pii here at all"),
      (3L, "card 4532015112830367 ip 255.255.255.255 ip 256.0.0.1")
    ).toDF("doc_id", "text")
    val got = Pii.scan(rows, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got(1L) == ((2L, 2L, 1L, 1L, 1L, 1L))) // 999.1.2.3 fails octet
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((0L, 2L, 1L, 0L, 1L, 0L))) // bad Luhn, 256 octet
  }

  test("redact: fixed pass order, global replace, md5 over the result") {
    val rows = Seq(
      (1L, "a@b.io then 10.1.2.3 then 555-123-4567 then 4532015112830366 x")
    ).toDF("doc_id", "text")
    val got = Pii.redact(rows, "doc_id", "text").collect().head
    val expected = "<EMAIL> then <IP> then <PHONE> then <CARD> x"
    assert(got.getAs[String]("redacted_text") == expected)
    assert(got.getAs[Long]("redacted_len") == expected.length.toLong)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getAs[String]("redacted_md5") == md)
    // keepText=false drops the body but keeps the fingerprint
    val cols = Pii.redact(rows, "doc_id", "text", keepText = false).columns
    assert(cols.toSet == Set("doc_id", "redacted_len", "redacted_md5"))
  }

  test("redact: a Luhn-INVALID card still redacts (regex-level contract) " +
      "and redaction is idempotent on placeholders") {
    val rows = Seq((1L, "pay 1234567890123456 now")).toDF("doc_id", "text")
    val r1 = Pii.redact(rows, "doc_id", "text").collect().head
      .getAs[String]("redacted_text")
    assert(r1 == "pay <CARD> now")
    val again = Pii.redact(Seq((1L, r1)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head.getAs[String]("redacted_text")
    assert(again == r1)
  }
}
