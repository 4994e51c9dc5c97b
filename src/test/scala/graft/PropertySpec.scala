package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.model.Event
import graft.parse._

/** Property tests (SURVEY.md §5): parse operators must round-trip arbitrary
  * generated values, not just the golden fixtures. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val fieldVal: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.nonEmpty)

  test("dissect round-trips arbitrary comma-joined values") {
    check(Prop.forAll(Gen.listOfN(5, fieldVal)) { vs =>
      val ev = new Event
      ev.set("m", vs.mkString(","))
      Dissect(ev, "m", "%{f0},%{f1},%{f2},%{f3},%{f4}") &&
        (0 until 5).forall(i => ev.getString(s"f$i").contains(vs(i)))
    })
  }

  test("kv round-trips arbitrary key=value pairs") {
    val pair = for (k <- fieldVal; v <- fieldVal) yield (k, v)
    check(Prop.forAll(Gen.listOfN(4, pair)) { kvs =>
      val distinct = kvs.toMap // last wins on dup keys in the expectation
      val ev = new Event
      ev.set("m", kvs.map { case (k, v) => s"$k=$v" }.mkString(";"))
      Kv(ev, "m", ';', '=')
      distinct.forall { case (k, v) =>
        // duplicate keys promote to array; value must be present either way
        ev.getString(k).contains(v) ||
          ev.getString(s"[$k][0]").isDefined
      }
    })
  }

  test("csv splitLine round-trips values containing commas and quotes") {
    val tricky = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(','),
      Gen.const('"'), Gen.const(' '))).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(4, tricky)) { vs =>
      val line = vs.map(v => "\"" + v.replace("\"", "\"\"") + "\"").mkString(",")
      Csv.splitLine(line) == vs.toVector
    })
  }

  test("grok IPV4 extracts any valid dotted quad") {
    val octet = Gen.choose(0, 255)
    check(Prop.forAll(octet, octet, octet, octet) { (a, b, c, d) =>
      val ev = new Event
      ev.set("m", s"ip $a.$b.$c.$d end")
      Grok(ev, "m", Seq("%{IPV4:[x][ip]}")) &&
        ev.getString("[x][ip]").contains(s"$a.$b.$c.$d")
    })
  }

  test("UNIX date parse is exact for any epoch second in range") {
    check(Prop.forAll(Gen.choose(0L, 4102444800L)) { sec =>
      Dates.parseMulti(sec.toString, Seq("UNIX")).contains(sec * 1000L)
    })
  }

  test("syslog_pri decode satisfies pri == 8*facility + severity") {
    check(Prop.forAll(Gen.choose(0, 191)) { pri =>
      val ev = new Event
      ev.set("pri", pri.toString)
      SyslogPri(ev)
      val fac = ev.get("syslog_facility_code").collect { case l: Long => l }.get
      val sev = ev.get("syslog_severity_code").collect { case l: Long => l }.get
      8 * fac + sev == pri.toLong
    })
  }

  test("event nested set/get round-trips arbitrary paths") {
    val seg = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
    check(Prop.forAll(Gen.listOfN(3, seg), fieldVal) { (segs, v) =>
      val ev = new Event
      val path = segs.map(s => s"[$s]").mkString
      ev.set(path, v)
      ev.getString(path).contains(v)
    })
  }

  test("ipv4ToLong agrees with manual base-256 for any quad") {
    val octet = Gen.choose(0, 255)
    check(Prop.forAll(octet, octet, octet, octet) { (a, b, c, d) =>
      Net.ipv4ToLong(s"$a.$b.$c.$d") ==
        a.toLong * 16777216L + b.toLong * 65536L + c.toLong * 256L + d.toLong
    })
  }
}
