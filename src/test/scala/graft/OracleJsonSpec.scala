package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Round-trips Verify's hand-built oracle_sql.json through a strict JSON
  * parser (Jackson, from the Spark classpath). The driver's correctness gate
  * does `json.load(oracle_sql.json)` — if that fails the whole round's
  * correctness artifact silently zeroes (r14 arrived as `{}`), so the escape
  * code must be provably correct in-repo, not just driver-tested.
  */
class OracleJsonSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("full oracleSql payload parses strictly and round-trips every entry") {
    val node = mapper.readTree(Verify.oracleJson)
    assert(node.isObject, "oracle_sql.json root must be a JSON object")
    assert(node.size() === SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      val got = node.get(k)
      assert(got != null, s"missing key $k after JSON round-trip")
      assert(got.asText() === v, s"SQL for $k mutated by escaping")
    }
  }

  test("every queries entry with SQL-expressible semantics has an oracle") {
    // The driver records a weaker rows-only check for missing oracle keys;
    // pin the current full-coverage state so a dropped oracle is loud.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracleSql: $missing")
  }

  test("escape handles quotes, backslashes, and all control chars") {
    val nasty = "a\"b\\c\nd\re\tfgh plain ünïcode €"
    val parsed = mapper.readTree(s"{${Verify.q("k")}: ${Verify.q(nasty)}}")
    assert(parsed.get("k").asText() === nasty)
  }
}
