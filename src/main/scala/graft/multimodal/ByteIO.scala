package graft.multimodal

/** Fixed-endian byte readers shared by every decode kernel — split out
  * of [[Multimodal]] in r11 so the per-codec traits (AudioCodecs, ...)
  * and the core header parsers read bytes through ONE definition. */
private[multimodal] object ByteIO {
  def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
}
