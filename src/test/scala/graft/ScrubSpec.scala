package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrub semantics on crafted payloads — the cases the
  * fixture-enriched oracle can't isolate: multiple matches of one
  * type, all three types in one doc, redaction order (IP before
  * phone), and clean text passing through byte-identical.
  */
class ScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scrub(rows: (Long, String)*) = {
    import spark.implicits._
    graft.ext.Scrub.scrub(rows.toDF("doc_id", "enr"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[Long]("n_ips"), r.getAs[String]("redacted")))).toMap
  }

  test("each PII type detected and redacted; clean text untouched") {
    val m = scrub(
      1L -> "write to alice.b@corp.example today",
      2L -> "dial 555-0199 now",
      3L -> "server 192.168.0.17 down",
      4L -> "nothing sensitive here")
    assert(m(1L) === ((1L, 0L, 0L, "write to <EMAIL> today")))
    assert(m(2L) === ((0L, 1L, 0L, "dial <PHONE> now")))
    assert(m(3L) === ((0L, 0L, 1L, "server <IP> down")))
    assert(m(4L) === ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("multiple occurrences and mixed types in one doc") {
    val m = scrub(
      1L -> "a@x.example then b.c@y.example call 555-0100 or 555-0101 at 10.0.0.1")
    val (e, p, ip, red) = m(1L)
    assert((e, p, ip) === ((2L, 2L, 1L)))
    assert(red === "<EMAIL> then <EMAIL> call <PHONE> or <PHONE> at <IP>")
  }

  test("redaction order: IP redacted whole, not chewed by the phone pattern") {
    // 172.16.254.255 contains the digit run "254" + "-" nowhere — but a
    // phone-first order could still never corrupt it; assert the ip
    // token survives intact alongside an adjacent phone
    val m = scrub(1L -> "10.20.30.40 555-1234")
    assert(m(1L)._4 === "<IP> <PHONE>")
  }

  test("email local part with digits and dots is one match") {
    val m = scrub(1L -> "v2.user.99@mail.test.example ok")
    assert(m(1L)._1 === 1L)
    assert(m(1L)._4 === "<EMAIL> ok")
  }
}
