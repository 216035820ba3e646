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

  /** Scope column for property `key` of variable `v`. Dots and backticks
    * in the key are escaped (injectively) so the resulting name is
    * always safe for a bare col() reference — otherwise every consumer
    * would need backtick-quoting to stop Spark parsing `v@p#a.b` as
    * nested-field access. The mapping is forward-only (nothing recovers
    * the key from the column name). */
  def propCol(v: String, key: String): String = {
    val safe = key.replace("~", "~~").replace(".", "~d").replace("`", "~b")
    s"$v@p#$safe"
  }
  def idsCol(v: String): String = s"$v@ids" // VLE/path: array of edge ids
  def nidsCol(v: String): String = s"$v@nids" // path: array of node ids
  def hopsCol(v: String): String = s"$v@hops" // VLE: path length
  def nintCol(v: String): String = s"$v@nint" // VLE: interior node ids
  // (between the hop's endpoints, exclusive) — emitted only when the
  // pattern binds a named path, consumed by planPath's nids assembly

  def isVarCol(col: String, v: String): Boolean = col.startsWith(v + "@")
}
