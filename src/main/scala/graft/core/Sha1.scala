package graft.core

/** SHA-1 hex content addresses, 40 lowercase hex chars
  * (reference: src/io/mandoline/chunk.clj:35-45 via DigestUtils/shaHex). */
object Sha1 {
  def hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val d = md.digest(bytes)
    val sb = new StringBuilder(40)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
