package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Name rules ported row-for-row from regress/sql/name_validation.sql /
  * expected/name_validation.out (graph section lines 20-80, label rules
  * :200+; reference validator name_validation.c:35-80).
  */
class NameValidationSpec extends AnyFunSuite {
  import NameValidation._

  test("graph names: length rules (name_validation.out:27)") {
    assert(!isValidGraphName("db")) // length < 3
    // > 63 chars truncates BEFORE validation, so a 64-char name is valid
    assert(isValidGraphName(
      "oiblpsacrufgxiilyevvoiblpsacrufgxiilyevvoiblpsacrufgxiilyevvsdss"))
    assert(isValidGraphName("mydatabase"))
  }

  test("graph names: first character must be alphabetic or underscore") {
    assert(!isValidGraphName("2mydatabase"))
    assert(isValidGraphName("mydatabase2"))
    assert(isValidGraphName("_mydatabase"))
  }

  test("graph names: special characters (name_validation.out:60-104)") {
    assert(!isValidGraphName("my\ndatabase"))
    assert(!isValidGraphName("my database"))
    assert(!isValidGraphName("my&database"))
    // non-ascii alphabets are valid (unicode ID_Start/ID_Continue)
    assert(isValidGraphName("mydätabase")) // mydätabase
    assert(isValidGraphName("mydঅtabase")) // mydঅtabase
  }

  test("graph names: interior dots/dashes ok, trailing not") {
    assert(isValidGraphName("main.db"))
    assert(!isValidGraphName("main.db."))
    assert(isValidGraphName("main-db"))
    assert(!isValidGraphName("main.db-"))
    assert(isValidGraphName("my_database"))
  }

  test("label names: 1..63 chars, no dots/dashes (name_validation.out:237+)") {
    assert(isValidLabelName("v"))
    assert(isValidLabelName("_private"))
    assert(isValidLabelName("Person2"))
    assert(!isValidLabelName(""))
    assert(!isValidLabelName("2label"))
    assert(!isValidLabelName("my.label"))
    assert(!isValidLabelName("my-label"))
    assert(!isValidLabelName("my label"))
  }

  test("error message parity: invalid create / rename raise the reference texts") {
    val e1 = intercept[IllegalArgumentException](requireGraphName("db"))
    assert(e1.getMessage === "graph name is invalid")
    val e2 = intercept[IllegalArgumentException](
      requireGraphName("1mydatabase", "new graph name"))
    assert(e2.getMessage === "new graph name is invalid")
    val e3 = intercept[IllegalArgumentException](requireLabelName("my.label"))
    assert(e3.getMessage === "label name is invalid")
  }
}

/** Integration: the MutableGraph surfaces enforce the rules. */
class NameValidationGraphSpec extends SparkTestBase {

  test("create / rename / create-label validate like the reference") {
    val e1 = intercept[IllegalArgumentException](MutableGraph.create("db", spark))
    assert(e1.getMessage === "graph name is invalid")
    val g = MutableGraph.create("mydatabase", spark)
    val e2 = intercept[IllegalArgumentException](g.rename("1mydatabase"))
    assert(e2.getMessage === "new graph name is invalid")
    g.rename("mydatabase1") // valid rename from the regress file
    assert(g.name === "mydatabase1")
    val e3 = intercept[IllegalArgumentException](g.createVertexLabel("bad label"))
    assert(e3.getMessage === "label name is invalid")
    g.createVertexLabel("Person") // fine
  }
}
