package graft.util

import java.security.MessageDigest

/** Hot-path md5-hex: thread-local digest instance + table-driven hex encode
  * (the naive `"%02x".format(b)` allocates a java.util.Formatter per byte —
  * measured as a dominant cost in the per-event hash enrichment and the
  * winnowing fingerprint loop). */
object Md5 {
  private val HexChars = "0123456789abcdef".toCharArray

  private val local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def bytesToHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def hex(s: String): String = {
    val md = local.get()
    md.reset()
    bytesToHex(md.digest(s.getBytes("UTF-8")))
  }

  def digest(s: String): Array[Byte] = {
    val md = local.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }
}
