package graft.text

import org.apache.spark.sql.functions._
import graft.GraftSuite

class PiiSpec extends GraftSuite {
  import spark.implicits._

  private def kindsOf(texts: String*): Seq[Seq[String]] =
    texts.toDF("t")
      .select(Pii.matchedKinds(col("t"), Pii.allKinds).as("k"))
      .as[Seq[String]].collect().toSeq

  test("battery: each kind fires on its shape and only there") {
    val got = kindsOf(
      "write to alice.smith+labels@example.co.uk for details",
      "call 415-555-0134 tomorrow",
      "ssn is 078-05-1120 on file",
      "host at 192.168.1.254 went down",
      "card 4111111111111111 on record", // Luhn-valid Visa test number
      "clean prose with no identifiers at all",
      "just numbers 12 345 6789012")
    assert(got(0) == Seq("email"))
    assert(got(1) == Seq("phone"))
    assert(got(2) == Seq("ssn"))
    assert(got(3) == Seq("ipv4"))
    assert(got(4) == Seq("card"))
    assert(got(5) == Seq.empty)
    assert(got(6) == Seq.empty)
  }

  test("card candidates are Luhn-verified, all candidates checked") {
    val got = kindsOf(
      "order 4111111111111112 shipped", // 16 digits, Luhn-INVALID
      "order 1234567890123 then card 4111111111111111", // 2nd candidate valid
      "30569309025904 diners", // 14-digit Luhn-valid
      "a4111111111111111b") // letter-adjacent: no \b boundary, no candidate
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq("card"))
    assert(got(2) == Seq("card"))
    assert(got(3) == Seq.empty)
  }

  test("multiple kinds in one value report in battery order") {
    val got = kindsOf(
      "mail bob@x.io or call 212-555-0198 from 10.0.0.1")
    assert(got(0) == Seq("email", "phone", "ipv4"))
  }

  test("ipv4 octet bounds: 256 and 999 do not match") {
    val got = kindsOf("at 256.1.1.1 nope", "at 999.999.999.999 nope",
      "at 255.255.255.255 yes", "at 0.0.0.0 yes")
    assert(got(0) == Seq.empty)
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("ipv4"))
    assert(got(3) == Seq("ipv4"))
  }

  test("ssn vs phone separators are distinct shapes") {
    // 3-2-4 is ssn, 3-3-4 is phone; dots are phone-only
    val got = kindsOf("078-05-1120", "415-555-0134", "415.555.0134",
      "078.05.1120")
    assert(got(0) == Seq("ssn"))
    assert(got(1) == Seq("phone"))
    assert(got(2) == Seq("phone"))
    assert(got(3) == Seq.empty)
  }

  test("null text yields an empty battery (guarded by callers)") {
    val got = Seq[Option[String]](None, Some("x@y.io")).toDF("t")
      .select(Pii.matchedKinds(col("t"), Pii.allKinds).as("k"))
      .collect()
    // null in → every when() branch nulls → filter drops them → empty;
    // the constraint's isNotNull guard makes nulls NotNull's finding
    assert(got(0).getSeq[String](0) == Seq.empty)
    assert(got(1).getSeq[String](0) == Seq("email"))
  }

  test("unknown kind refused at expression build") {
    val e = intercept[IllegalArgumentException] {
      Pii.kindMatches(col("t"), "passport")
    }
    assert(e.getMessage.contains("unknown pii kind"))
  }
}
