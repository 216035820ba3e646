package graft.cypher

/** Canonical column-naming scheme for pattern variables inside planned
  * DataFrames. Every Cypher variable `v` owns a namespace of columns:
  * `v@id`, `v@label`, `v@start`, `v@end`, and `v@p#<key>` for properties.
  * Names are globally unique within a plan, which keeps multi-way pattern
  * joins unambiguous without Spark alias gymnastics.
  */
object Columns {
  def idCol(v: String): String = s"$v@id"
  def labelCol(v: String): String = s"$v@label"
  def startCol(v: String): String = s"$v@start"
  def endCol(v: String): String = s"$v@end"
  def propCol(v: String, key: String): String = s"$v@p#$key"
  def idsCol(v: String): String = s"$v@ids" // VLE/path: array of edge ids
  def nidsCol(v: String): String = s"$v@nids" // path: array of node ids
  def hopsCol(v: String): String = s"$v@hops" // VLE: path length

  def isVarCol(col: String, v: String): Boolean = col.startsWith(v + "@")
  def propName(col: String): Option[String] = {
    val i = col.indexOf("@p#")
    if (i >= 0) Some(col.substring(i + 3)) else None
  }
}
