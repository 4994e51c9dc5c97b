package graft.enrich

/** Broadcast lookup tables — the Spark-native replacement for the reference's
  * `translate` dictionaries, geoip mmdb, dns caches and memcached IOC store
  * (SURVEY.md §2.4: every reference correlation is a broadcast-style
  * dictionary lookup — the exact semantic of a Spark broadcast hash join).
  *
  * All content is deterministic: curated subsets of the reference's public
  * dictionary files plus synthetic-but-pure-function geo/ptr tables, so that
  * `sbt -batch test` replays are exact (SURVEY.md §7.4 #4).
  *
  * Built once on the driver, shipped to executors via `sc.broadcast`.
  */
final case class Dicts(
  ianaTransport: Map[String, String],
  mnemonics: Map[String, String], // 100k-entry translate dict (reference scale)
  ianaProtocols: Map[String, String], // "port/transport" → protocol keyword
  ianaProtocolsPort: Map[String, String], // "port" → protocol keyword
  mitreTactics: Map[String, String], // "ta0001" → tactic name
  geoRanges: Array[GeoRange], // sorted by start, binary-searched
  ptr: Map[String, String], // ip → reverse-dns hostname
  iocIps: Set[String] // MISP-style IOC set (destination.ip namespace)
) extends Serializable

final case class GeoRange(start: Long, end: Long, country: String, city: String)

object Dicts {
  import graft.parse.Net.ipv4ToLong

  /** IANA "protocol number → transport keyword"
    * (subset of config/iana_transport.yml: "1": icmp, "6": tcp, "17": udp). */
  val IanaTransport: Map[String, String] = Map(
    "0" -> "hopopt", "1" -> "icmp", "2" -> "igmp", "6" -> "tcp",
    "17" -> "udp", "41" -> "ipv6", "47" -> "gre", "50" -> "esp",
    "58" -> "ipv6-icmp", "89" -> "ospfigp", "132" -> "sctp")

  /** IANA "port/transport → service keyword"
    * (subset of config/iana_protocols.yml: 22/tcp: ssh, 53/udp: domain,
    * 80/tcp: http, 443/tcp: https …). */
  val IanaProtocols: Map[String, String] = Map(
    "22/tcp" -> "ssh", "22/udp" -> "ssh",
    "53/tcp" -> "domain", "53/udp" -> "domain",
    "80/tcp" -> "http", "80/udp" -> "http",
    "443/tcp" -> "https", "443/udp" -> "https",
    "25/tcp" -> "smtp", "123/udp" -> "ntp", "389/tcp" -> "ldap")

  /** port-only fallback dictionary (config/iana_protocols_port.yml). */
  val IanaProtocolsPort: Map[String, String] = Map(
    "22" -> "ssh", "53" -> "domain", "80" -> "http", "443" -> "https",
    "25" -> "smtp", "123" -> "ntp", "389" -> "ldap")

  /** MITRE tactic id → name (from config/mitre_tactics.json values; the
    * reference encodes them as kv-parseable strings — we keep name +
    * reference URL derived from the id). */
  val MitreTactics: Map[String, String] = Map(
    "ta0001" -> "initial access",
    "ta0002" -> "execution",
    "ta0003" -> "persistence",
    "ta0004" -> "privilege escalation",
    "ta0005" -> "defense evasion")

  /** Synthetic deterministic geo "database": 8.0.0.0/8 sliced by second octet
    * into country bands (stands in for GeoLite2-City.mmdb,
    * ref: config/enrichments/91_geoip.conf:20-36). The *mechanism* is the
    * production one — sorted range table + binary search per row. */
  def buildGeoRanges(): Array[GeoRange] = {
    val bands = Array((0, 49, "US"), (50, 99, "DE"), (100, 149, "JP"),
      (150, 199, "BR"), (200, 255, "GB"))
    val out = Array.newBuilder[GeoRange]
    bands.foreach { case (lo, hi, c) =>
      var o = lo
      while (o <= hi) {
        val start = ipv4ToLong(s"8.$o.0.0")
        out += GeoRange(start, start + 65535L, c, s"city${o % 5}")
        o += 1
      }
    }
    out.result().sortBy(_.start)
  }

  /** Deterministic PTR table over the synthesized destination-IP space
    * (50,800 entries — same order of magnitude as the reference's DNS
    * hit-cache sizing, ref: config/enrichments/17_dns.conf:47-52).
    * hostname = 'ptr-a-b-c-d.internal'. */
  def buildPtr(): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    for (prefix <- Seq("192.168", "172.16"); o3 <- 0 until 100; o4 <- 1 to 254) {
      val ip = s"$prefix.$o3.$o4"
      b += (ip -> s"ptr-${ip.replace('.', '-')}.internal")
    }
    b.result()
  }

  /** Deterministic IOC set (stands in for the memcached MISP store,
    * ref: config/enrichments/92_misp.conf:14-37): destination IPs whose last
    * octet is 13 are "known bad". */
  def buildIoc(): Set[String] = {
    val b = Set.newBuilder[String]
    for (prefix <- Seq("192.168", "172.16"); o3 <- 0 until 100)
      b += s"$prefix.$o3.13"
    b.result()
  }

  /** Synthetic 100,000-entry mnemonic dictionary — the scale the reference
    * documents for `translate` ("tested with up to 100,000 key/values",
    * ref: config/processors/syslog_audit_cisco.switch.conf:87). Exercises a
    * realistically sized broadcast (~6 MB). */
  def buildMnemonics(): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b.sizeHint(100000)
    var i = 0
    while (i < 100000) { b += (s"MNEM-$i" -> s"category${i % 37}"); i += 1 }
    b.result()
  }

  def build(): Dicts = Dicts(
    ianaTransport = IanaTransport,
    mnemonics = buildMnemonics(),
    ianaProtocols = IanaProtocols,
    ianaProtocolsPort = IanaProtocolsPort,
    mitreTactics = MitreTactics,
    geoRanges = buildGeoRanges(),
    ptr = buildPtr(),
    iocIps = buildIoc())

  /** Binary search the geo range table; the per-row analogue of the geoip
    * filter's cached lookup. */
  def geoLookup(ranges: Array[GeoRange], ipLong: Long): Option[GeoRange] = {
    var lo = 0
    var hi = ranges.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val r = ranges(mid)
      if (ipLong < r.start) hi = mid - 1
      else if (ipLong > r.end) lo = mid + 1
      else return Some(r)
    }
    None
  }
}
