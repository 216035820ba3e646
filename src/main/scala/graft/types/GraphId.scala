package graft.types

/** 64-bit graph entity id: label id in the top 16 bits, 48-bit entry id.
  *
  * Mirrors the reference's `graphid` packing
  * (reference: src/include/utils/graphid.h:29-60, make_graphid
  * src/backend/utils/adt/graphid.c:200) so the label of any entity is
  * recoverable from the id alone — label filters stay cheap long
  * comparisons and ids are self-describing for startNode()/endNode()/
  * label().
  */
object GraphId {
  val EntryIdBits = 48
  val EntryIdMax: Long = 0x0000ffffffffffffL
  val LabelIdMin = 1
  val LabelIdMax = 0xffff

  def make(labelId: Int, entryId: Long): Long = {
    require(labelId >= LabelIdMin && labelId <= LabelIdMax, s"label id out of range: $labelId")
    require(entryId >= 0 && entryId <= EntryIdMax, s"entry id out of range: $entryId")
    (labelId.toLong << EntryIdBits) | entryId
  }

  def labelId(gid: Long): Int = ((gid >>> EntryIdBits) & 0xffffL).toInt

  def entryId(gid: Long): Long = gid & EntryIdMax
}
