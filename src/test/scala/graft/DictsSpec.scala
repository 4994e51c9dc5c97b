package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.Dicts

/** The broadcast dictionaries load the reference's REAL public data files
  * (not hand-curated subsets) — size and spot-value assertions. */
class DictsSpec extends AnyFunSuite {
  test("iana transport dictionary is the full reference file") {
    assert(Dicts.IanaTransport.size >= 130)
    assert(Dicts.IanaTransport("6") == "tcp")
    assert(Dicts.IanaTransport("17") == "udp")
    assert(Dicts.IanaTransport("132") == "sctp")
  }
  test("iana protocols dictionaries are the full reference files (primary-name rule)") {
    assert(Dicts.IanaProtocols.size >= 5000)
    assert(Dicts.IanaProtocols("80/tcp") == "http") // first/primary IANA name
    assert(Dicts.IanaProtocols("443/udp") == "https")
    assert(Dicts.IanaProtocolsPort.size >= 3000)
    assert(Dicts.IanaProtocolsPort("80") == "http") // semicolon-joined alternates reduced
    assert(Dicts.IanaProtocolsPort("22") == "ssh")
  }
  test("mitre tactics dictionary carries the reference's kv-encoded payloads") {
    assert(Dicts.MitreTactics.size >= 14)
    assert(Dicts.MitreTactics("ta0001").contains("[threat][tactic][name]: initial access"))
  }
  test("cisco facility categories load the full 1,296-entry reference CSV") {
    val d = Dicts.build()
    assert(d.facilityCategories.size >= 1280) // 1295 rows, a few dup facility keys
    assert(d.facilityCategories("LINK") == "Data link")
    assert(d.facilityCategories("AAA") == "Authentication, authorization, and accounting")
  }
  test("misp store is md5-keyed per namespace at feed scale") {
    val d = Dicts.build()
    assert(d.misp("source.ip").size == 100000)
    assert(d.misp("destination.ip").size == d.iocIps.size)
    val k = graft.util.Md5.hex("192.168.7.13")
    assert(d.misp("destination.ip")(k).contains("misp-destination.ip"))
  }
}
