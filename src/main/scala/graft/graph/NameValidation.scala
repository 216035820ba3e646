package graft.graph

/** Graph/label name rules — re-derived from the reference's name
  * validation (reference: src/include/utils/name_validation.h:32-39
  * regex + length limits; src/backend/utils/name_validation.c:35-80;
  * regress/sql/name_validation.sql): graph names are 3..63 chars
  * (longer names truncate to 63 FIRST, like PG identifiers, then
  * validate), start with a letter or underscore, continue with
  * letters/digits/combining marks/underscore plus interior dots and
  * dashes — the final character may not be a dot or dash. Label names
  * are 1..63 chars with no dots/dashes. The reference enumerates the
  * Unicode ID_Start/ID_Continue sets literally; here they are the
  * equivalent Unicode property classes.
  */
object NameValidation {
  private val IdStart = "[\\p{L}\\p{Nl}_]"
  private val IdCont = "[\\p{L}\\p{Nl}\\p{Mn}\\p{Mc}\\p{Nd}\\p{Pc}·]"
  private val GraphName = (s"$IdStart($IdCont|[.\\-])*$IdCont").r
  private val LabelName = (s"$IdStart$IdCont*").r

  /** PG-style identifier truncation at NAMEDATALEN-1. */
  def truncate(name: String): String =
    if (name.length > 63) name.take(63) else name

  def isValidGraphName(name0: String): Boolean = {
    val name = truncate(name0)
    name.length >= 3 && GraphName.matches(name)
  }

  def isValidLabelName(name0: String): Boolean = {
    val name = truncate(name0)
    name.nonEmpty && LabelName.matches(name)
  }

  /** Validate (after truncation) and return the effective name;
    * `what` distinguishes the rename error ("new graph name is
    * invalid", graph_commands.c:358). */
  def requireGraphName(name: String, what: String = "graph name"): String = {
    if (!isValidGraphName(name))
      throw new IllegalArgumentException(s"$what is invalid")
    truncate(name)
  }

  def requireLabelName(name: String): String = {
    if (!isValidLabelName(name))
      throw new IllegalArgumentException("label name is invalid")
    truncate(name)
  }
}
