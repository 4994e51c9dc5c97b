package graft.parse

/** IP / CIDR / domain-suffix helpers.
  *
  *  - `cidr` membership of the reference's fixed private/special network list
  *    (ref: config/enrichments/91_geoip.conf:11-15 — the 12-network list used
  *    for dip_private / sip_private tagging)
  *  - `tld` public-suffix split (ref: config/enrichments/06_url.conf:82-85),
  *    longest-suffix match like Guava InternetDomainName, over a curated
  *    suffix set covering the synthesized corpus + common suffixes.
  */
object Net {
  /** Dotted-quad IPv4 → unsigned long; -1 if not a valid IPv4. Validity regex
    * mirrors the reference's `^\d+\.\d+\.\d+\.\d+$` check then range-checks
    * octets (ref: config/enrichments/02_ecs_data_type.conf:130). */
  def ipv4ToLong(s: String): Long = {
    var part = 0L; var nParts = 0; var acc = 0L; var digits = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (digits == 0 || part > 255) return -1L
        acc = (acc << 8) | part; nParts += 1; part = 0; digits = 0
        if (nParts > 3) return -1L
      } else if (c >= '0' && c <= '9') {
        part = part * 10 + (c - '0'); digits += 1
        if (digits > 3) return -1L
      } else return -1L
      i += 1
    }
    if (nParts != 3 || digits == 0 || part > 255) return -1L
    (acc << 8) | part
  }

  def isValidIpv4(s: String): Boolean = ipv4ToLong(s) >= 0

  // (base, maskBits) for the v4 members of the 91_geoip.conf network list
  private val privateNets: Array[(Long, Int)] = Array(
    ("0.0.0.0", 32), ("10.0.0.0", 8), ("172.16.0.0", 12), ("192.168.0.0", 16),
    ("127.0.0.0", 8), ("169.254.0.0", 16), ("224.0.0.0", 4),
    ("255.255.255.255", 32)
  ).map { case (ip, m) => (ipv4ToLong(ip), m) }

  /** True if ip is in the reference's private/special list → `dip_private` /
    * `sip_private` tag. Non-IPv4 strings return false. */
  def isPrivate(ip: String): Boolean = {
    val v = ipv4ToLong(ip)
    if (v < 0) return false
    var i = 0
    while (i < privateNets.length) {
      val (base, bits) = privateNets(i)
      val mask = if (bits == 0) 0L else (0xffffffffL << (32 - bits)) & 0xffffffffL
      if ((v & mask) == base) return true
      i += 1
    }
    false
  }

  /** Curated public-suffix set (longest match wins). */
  val Suffixes: Set[String] = Set(
    "com", "org", "net", "edu", "gov", "io", "dev", "internal",
    "co.uk", "org.uk", "ac.uk", "uk", "de", "fr", "jp", "co.jp", "br",
    "com.br", "au", "com.au", "cn", "com.cn")

  /** Split domain → (tld, registered_domain, subdomain). Longest public
    * suffix; registered = label + suffix. */
  def splitDomain(domain: String): Option[(String, String, String)] = {
    val labels = domain.toLowerCase.split('.')
    if (labels.length < 2) return None
    var best = -1
    var i = 0
    while (i < labels.length) {
      val cand = labels.slice(i, labels.length).mkString(".")
      if (Suffixes.contains(cand)) { best = i; i = labels.length }
      else i += 1
    }
    if (best <= 0) return None
    val tld = labels.slice(best, labels.length).mkString(".")
    val registered = labels.slice(best - 1, labels.length).mkString(".")
    val sub = if (best >= 2) labels.slice(0, best - 1).mkString(".") else ""
    Some((tld, registered, sub))
  }
}
