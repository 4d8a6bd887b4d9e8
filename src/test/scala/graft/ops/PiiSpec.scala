package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PII scrub semantics: detection predicates, digit accounting, and
  * the two redaction rewrites on hand-built strings with known
  * expected outputs. */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(s: String) = Seq(s).toDF("t")

  test("phone detection and keep-last-4 masking") {
    val df = one("reach me at 25-989-741-2988 today")
      .select(Pii.hasPhone($"t").as("hit"),
        Pii.maskPhoneKeepLast(lit("25-989-741-2988")).as("masked"))
    val r = df.head()
    assert(r.getBoolean(0))
    assert(r.getString(1) == "##-###-###-2988")
    assert(!one("no numbers here").select(Pii.hasPhone($"t")).head().getBoolean(0))
    assert(!one("12-34-56").select(Pii.hasPhone($"t")).head().getBoolean(0),
      "short digit groups are not phone-shaped")
  }

  test("digit run redaction tags only runs >= 6 and counts digits") {
    val r = one("acct 12345678 pin 123 ok 999999")
      .select(Pii.redactDigitRuns($"t").as("red"),
        Pii.digitCount($"t").as("n"))
      .head()
    assert(r.getString(0) == "acct <ID> pin 123 ok <ID>")
    assert(r.getLong(1) == 17)
  }

  test("email detection") {
    assert(one("mail a.b+c@example.org now")
      .select(Pii.hasEmail($"t")).head().getBoolean(0))
    assert(!one("at sign @ alone is not an address x@y")
      .select(Pii.hasEmail($"t")).head().getBoolean(0))
  }

  test("maskDigits is total and null-safe maskPhoneKeepLast") {
    assert(one("a1b22c333").select(Pii.maskDigits($"t")).head().getString(0)
      == "a#b##c###")
    val masked = one("x").select(
      Pii.maskPhoneKeepLast(lit(null).cast("string"))).head()
    assert(masked.isNullAt(0))
  }
}
