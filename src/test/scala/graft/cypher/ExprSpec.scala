package graft.cypher

import graft.SparkTestBase
import graft.graph.PropertyGraph

/** Expression-surface golden tests — semantics ported from the
  * reference's regress/sql/expr.sql expectations (operator behavior,
  * 0-indexing, null propagation, rounding mode), re-asserted against
  * our typed-column encoding.
  */
class ExprSpec extends SparkTestBase {

  lazy val empty = new PropertyGraph("expr", Nil, Nil)

  /** Run a single-value RETURN and fetch the value (null-safe). */
  def one(q: String): Any = {
    val r = Cypher.query(spark, empty, q).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("arithmetic dispatch") {
    assert(one("RETURN 3 / 2 AS x") === 1L) // int/int is integer division
    // exact past 2^53 (double-divide would round; reference int8 div is exact)
    assert(one("RETURN 9007199254740993 / 1 AS x") === 9007199254740993L)
    assert(one("RETURN -7 / 2 AS x") === -3L) // truncation toward zero
    assert(one("RETURN 3.0 / 2 AS x") === 1.5)
    assert(one("RETURN 7 % 3 AS x") === 1L)
    assert(one("RETURN 2 ^ 10 AS x") === 1024.0) // power yields float
    assert(one("RETURN -(-3) AS x") === 3L)
    assert(one("RETURN 1 + 2 * 3 AS x") === 7L) // precedence
  }

  test("+ concatenation overloads") {
    assert(one("RETURN 'ab' + 'cd' AS x") === "abcd")
    assert(one("RETURN [1, 2] + [3] AS x") === Seq(1L, 2L, 3L))
    assert(one("RETURN [1, 2] + 3 AS x") === Seq(1L, 2L, 3L))
  }

  test("comparison null propagation (3-valued logic)") {
    assert(one("RETURN 1 = null AS x") === null)
    assert(one("RETURN null = null AS x") === null)
    assert(one("RETURN null IS NULL AS x") === true)
    assert(one("RETURN 1 IS NOT NULL AS x") === true)
  }

  test("cross-type comparisons follow the reference total order, not cast-null") {
    // agtype_eq/ne are total (agtype_ops.c:1054/1117): 1 = 'x' is false,
    // 1 <> 'x' is TRUE — Spark's implicit cast would have made both null
    assert(one("RETURN 1 = 'x' AS x") === false)
    assert(one("RETURN 1 <> 'x' AS x") === true)
    assert(one("RETURN true <> 'x' AS x") === true)
    // ordering ranks string < bool < numeric (sort priority)
    assert(one("RETURN 1 > 'x' AS x") === true)
    assert(one("RETURN 'x' < true AS x") === true)
    assert(one("RETURN true < 1 AS x") === true)
    // null operands still yield null
    assert(one("RETURN null <> 'x' AS x") === null)
    // same numeric class still compares by value
    assert(one("RETURN 1 < 2.5 AS x") === true)
  }

  test("range() handles inverted bounds and negative steps") {
    assert(one("RETURN range(0, 10, 3) AS x") === Seq(0L, 3L, 6L, 9L))
    assert(one("RETURN range(5, 1) AS x") === Seq.empty)
    assert(one("RETURN range(5, 1, -2) AS x") === Seq(5L, 3L, 1L))
    assert(one("RETURN range(1, 5, -1) AS x") === Seq.empty)
    assert(one("RETURN range(3, 3) AS x") === Seq(3L))
  }

  test("IN over mixed-type literal lists uses total-order equality") {
    assert(one("RETURN 1 IN [1, 'x'] AS a") === true)
    assert(one("RETURN 'x' IN [1, 'x'] AS a") === true)
    assert(one("RETURN 2 IN [1, 'x'] AS a") === false)
    assert(one("RETURN 1 IN ['a', 'b'] AS a") === false)
    // null element: no match -> null, match -> true (3-valued OR)
    assert(one("RETURN 2 IN [1, null] AS a") === null)
    assert(one("RETURN 1 IN [1, null] AS a") === true)
    assert(one("RETURN 1 IN [] AS a") === false)
  }

  test("string predicates on non-string operands are null (reference semantics)") {
    assert(one("RETURN 1 STARTS WITH '1' AS x") === null)
    assert(one("RETURN 'abc' CONTAINS 1 AS x") === null)
    assert(one("RETURN true =~ 't.*' AS x") === null)
  }

  test("list index and slice are 0-based with negatives") {
    assert(one("RETURN [5, 6, 7, 8][1] AS x") === 6L)
    assert(one("RETURN [5, 6, 7, 8][-1] AS x") === 8L)
    assert(one("RETURN [0, 1, 2, 3][-2..] AS x") === Seq(2L, 3L))
    assert(one("RETURN [0, 1, 2, 3][..2] AS x") === Seq(0L, 1L))
    assert(one("RETURN [0, 1, 2, 3][1..3] AS x") === Seq(1L, 2L))
    // out-of-bounds and missing keys are null, never an error (Cypher
    // semantics; under ANSI Spark a raw element_at would throw)
    assert(one("RETURN [1, 2, 3][5] AS x") === null)
    assert(one("RETURN [1, 2][-9] AS x") === null)
    assert(one("RETURN head([]) AS x") === null)
    assert(one("RETURN last([]) AS x") === null)
    assert(one("RETURN {a: 1}['z'] AS x") === null)
  }

  test("string predicates and functions") {
    assert(one("RETURN 'abcdef' STARTS WITH 'abc' AS x") === true)
    assert(one("RETURN 'abcdef' CONTAINS 'cde' AS x") === true)
    assert(one("RETURN 'Hello' =~ 'H.*' AS x") === true)
    assert(one("RETURN toUpper('ab') AS x") === "AB")
    assert(one("RETURN left('abcdef', 3) AS x") === "abc")
    assert(one("RETURN right('abcdef', 2) AS x") === "ef")
    // Cypher substring is 0-indexed (reference: age_substring)
    assert(one("RETURN substring('abcdef', 1, 3) AS x") === "bcd")
    assert(one("RETURN split('a,b,c', ',') AS x") === Seq("a", "b", "c"))
    assert(one("RETURN replace('aXbX', 'X', '-') AS x") === "a-b-")
    assert(one("RETURN reverse('abc') AS x") === "cba")
    assert(one("RETURN trim('  x  ') AS x") === "x")
    assert(one("RETURN size('hello') AS x") === 5L)
  }

  test("conversions") {
    assert(one("RETURN toInteger('42') AS x") === 42L)
    assert(one("RETURN toInteger(3.9) AS x") === 3L)
    // fractional STRING parses as float then truncates (reference:
    // expr.out toInteger("1.2") = 1); invalid strings are null
    assert(one("RETURN toInteger('1.2') AS x") === 1L)
    assert(one("RETURN toInteger('false_') AS x") === null)
    assert(one("RETURN toFloat('2.5') AS x") === 2.5)
    assert(one("RETURN toString(123) AS x") === "123")
    assert(one("RETURN toBoolean('true') AS x") === true)
    assert(one("RETURN toBoolean('false_') AS x") === null)
    assert(one("RETURN toBoolean(1) AS x") === true)
  }

  test("math: rounding is half-away-from-zero like Cypher") {
    assert(one("RETURN round(2.5) AS x") === 3.0)
    assert(one("RETURN round(-2.5) AS x") === -3.0)
    assert(one("RETURN ceil(1.1) AS x") === 2.0)
    assert(one("RETURN floor(1.9) AS x") === 1.0)
    assert(one("RETURN abs(-7) AS x") === 7L)
    assert(one("RETURN sign(-0.1) AS x") === -1.0)
    assert(one("RETURN sqrt(9.0) AS x") === 3.0)
  }

  test("math domain and result-type fidelity (expr.out corpora)") {
    // round/ceil/floor always yield float, even on integer input
    assert(one("RETURN round(0) AS x") === 0.0)
    assert(one("RETURN ceil(1) AS x") === 1.0)
    assert(one("RETURN floor(1) AS x") === 1.0)
    assert(one("RETURN round(7.4163, 3) AS x") === 7.416)
    // out-of-domain inputs yield null, never NaN
    assert(one("RETURN sqrt(-1) AS x") === null)
    assert(one("RETURN asin(1.1) AS x") === null)
    assert(one("RETURN acos(-1.1) AS x") === null)
    assert(one("RETURN log(0) AS x") === null)
    assert(one("RETURN log(-1) AS x") === null)
    assert(one("RETURN log(e()) AS x") === 1.0)
    // sign stays integral
    assert(one("RETURN sign(10) AS x") === 1L)
    assert(one("RETURN sign(0) AS x") === 0L)
  }

  test("split edge cases (expr.out split corpus)") {
    assert(one("RETURN split('a,b,c,d,e,f', '') AS x") ===
      Seq("a", ",", "b", ",", "c", ",", "d", ",", "e", ",", "f"))
    assert(one("RETURN split('a,b,cd  e,f', ' ') AS x") === Seq("a,b,cd", "", "e,f"))
    assert(one("RETURN split('a,b,c,d,e,f', 'c,') AS x") === Seq("a,b,", "d,e,f"))
    assert(one("RETURN split('a,b,c', null) AS x") === null)
    assert(one("RETURN split(null, null) AS x") === null)
  }

  test("list functions") {
    assert(one("RETURN range(0, 10, 2) AS x") === Seq(0L, 2L, 4L, 6L, 8L, 10L))
    assert(one("RETURN head([7, 8]) AS x") === 7L)
    assert(one("RETURN last([7, 8]) AS x") === 8L)
    assert(one("RETURN tail([7, 8, 9]) AS x") === Seq(8L, 9L))
    assert(one("RETURN size([1, 2, 3]) AS x") === 3L)
    assert(one("RETURN reverse([1, 2]) AS x") === Seq(2L, 1L))
  }

  test("CASE simple and searched") {
    assert(one("RETURN CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' ELSE 'c' END AS x") === "b")
    assert(one("RETURN CASE WHEN 1 > 2 THEN 'y' ELSE 'n' END AS x") === "n")
    assert(one("RETURN CASE WHEN null THEN 'y' ELSE 'n' END AS x") === "n")
  }

  test("HOFs: comprehension, predicates, reduce") {
    assert(one("RETURN [x IN [1, 2, 3, 4] WHERE x % 2 = 0 | x * 10] AS r") ===
      Seq(20L, 40L))
    assert(one("RETURN all(x IN [2, 4] WHERE x % 2 = 0) AS r") === true)
    assert(one("RETURN any(x IN [1, 4] WHERE x % 2 = 0) AS r") === true)
    assert(one("RETURN none(x IN [1, 3] WHERE x % 2 = 0) AS r") === true)
    assert(one("RETURN single(x IN [1, 2, 3] WHERE x = 2) AS r") === true)
    assert(one("RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS r") === 6L)
  }

  test("predicate functions: 3-valued logic with null elements " +
      "(predicate_functions.sql:103-190)") {
    // null list input: all four return null
    assert(one("RETURN all(x IN null WHERE x > 0) AS r") === null)
    assert(one("RETURN any(x IN null WHERE x > 0) AS r") === null)
    assert(one("RETURN none(x IN null WHERE x > 0) AS r") === null)
    assert(one("RETURN single(x IN null WHERE x > 0) AS r") === null)
    // null elements make the predicate unknown; definite outcomes dominate
    assert(one("RETURN any(x IN [null] WHERE x > 0) AS r") === null)
    assert(one("RETURN any(x IN [null, 1, 2] WHERE x > 0) AS r") === true)
    assert(one("RETURN all(x IN [1] WHERE null) AS r") === null)
    assert(one("RETURN all(x IN [1, null, 2] WHERE x > 0) AS r") === null)
    assert(one("RETURN all(x IN [1, null, -1] WHERE x > 0) AS r") === false)
    assert(one("RETURN none(x IN [null] WHERE x > 0) AS r") === null)
    assert(one("RETURN none(x IN [null, 5] WHERE x > 0) AS r") === false)
    // single: two definite trues -> false; any null otherwise -> unknown
    assert(one("RETURN single(x IN [null, 5] WHERE x > 0) AS r") === null)
    assert(one("RETURN single(x IN [null, 5, 6] WHERE x > 0) AS r") === false)
    assert(one("RETURN single(x IN [null, null] WHERE x > 0) AS r") === null)
  }

  test("null list input to comprehension/reduce returns null " +
      "(age_reduce.sql:86)") {
    assert(one("RETURN reduce(s = 0, x IN null | s + x) AS r") === null)
    assert(one("RETURN [x IN null | x + 1] AS r") === null)
    assert(one("RETURN [x IN null WHERE x > 0] AS r") === null)
  }

  test("reduce dispatches on accumulator type") {
    assert(one("RETURN reduce(s = '', x IN ['a', 'b'] | s + x) AS r") === "ab")
    assert(one("RETURN reduce(acc = 0.0, x IN [1, 2] | acc + x) AS r") === 3.0)
  }

  test("IN list membership") {
    assert(one("RETURN 2 IN [1, 2, 3] AS x") === true)
    assert(one("RETURN 9 IN [1, 2, 3] AS x") === false)
  }

  test("coalesce") {
    assert(one("RETURN coalesce(null, 7) AS x") === 7L)
    assert(one("RETURN coalesce(null, null) AS x") === null)
  }

  test("typecasts") {
    assert(one("RETURN '7'::int AS x") === 7L)
    assert(one("RETURN 1::float AS x") === 1.0)
    assert(one("RETURN 1::bool AS x") === true)
  }

  test("stDev/stDevP return 0.0 for empty and single-value groups") {
    // reference: age_stdev 'should return 0' corpus (expr.out)
    assert(one("RETURN stDev(null) AS x") === 0.0)
    assert(one("RETURN stDevP(null) AS x") === 0.0)
    assert(one("UNWIND [5] AS x RETURN stDev(x) AS r") === 0.0)
  }

  test("map literals keep null values; writes strip them") {
    // keep_null = true for expression maps (cypher_gram.y:2139)
    assert(one("RETURN size(keys({a: 1, b: null})) AS n") === 2L)
  }

  test("percentileDisc is exact; percentileCont interpolates") {
    assert(one(
      "UNWIND [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] AS x RETURN percentileDisc(x, 0.5) AS p") === 5L)
    assert(one(
      "UNWIND [1, 2, 3, 4, 5, 6, 7, 8, 9, 10] AS x RETURN percentileDisc(x, 0.95) AS p") === 10L)
    assert(one(
      "UNWIND [1, 2, 3, 4] AS x RETURN percentileCont(x, 0.5) AS p") === 2.5)
  }

  test("heterogeneous list/map literals (agtype containers are untyped)") {
    // mixed scalars render agtype text at RETURN (reference: agtype_out)
    assert(one("RETURN [1, 2.5, true] AS m") === "[1, 2.5, true]")
    assert(one("RETURN [1, 'a', null] AS m") === "[1, \"a\", null]")
    assert(one("RETURN {a: 1, b: 'x'} AS m") === "{\"a\": 1, \"b\": \"x\"}")
    // element access decodes the scalar
    assert(one("RETURN [1, 'a'][0] AS x") === "1")
    assert(one("RETURN [1, 'a'][1] AS x") === "a")
    assert(one("RETURN {a: 1, b: 'x'}['b'] AS x") === "x")
    assert(one("RETURN size([1, 'a', true]) AS x") === 3L)
    // UNWIND over a mixed list yields per-row scalars
    val rows = Cypher.query(spark, empty,
      "UNWIND [1, 'a', 2.5] AS x RETURN x").collect().map(_.get(0))
    assert(rows.toSeq === Seq("1", "a", "2.5"))
  }

  test("recursive heterogeneous containers (AGTV_ARRAY/OBJECT recursion, agtype.h:307-324)") {
    // scalars mixed with containers — the reference's fully recursive
    // array (regress: expr.sql / agtype.sql list corpora)
    assert(one("RETURN [1, [2], {a: 3}] AS x") === "[1, [2], {\"a\": 3}]")
    assert(one("RETURN [1.5, 'x', [true, [2]]] AS x") === "[1.5, \"x\", [true, [2]]]")
    assert(one("RETURN [null, [1, 'a'], 2] AS x") === "[null, [1, \"a\"], 2]")
    // container equality through the canonical-text slot
    assert(one("RETURN [1, [2]] = [1, [2]] AS x") === true)
    assert(one("RETURN [1, [2]] = [1, [3]] AS x") === false)
    assert(one("RETURN {a: [1]} = {a: [1]} AS x") === true)
    // CASE arms may disagree scalar-vs-container
    assert(one("RETURN CASE WHEN true THEN [1, 2] ELSE 'x' END AS x") === "[1, 2]")
    assert(one("RETURN CASE WHEN false THEN [1, 2] ELSE 'x' END AS x") === "x")
    // collect() over mixed scalar/container values
    val cs = Cypher.query(spark, empty,
      "UNWIND [1, 2, 3] AS i WITH CASE WHEN i = 1 THEN 'one' WHEN i = 2 " +
        "THEN [2, 2] ELSE {n: 3} END AS v RETURN collect(v) AS cs").collect()(0).get(0)
    assert(cs === "[\"one\", [2, 2], {\"n\": 3}]")
    // DISTINCT + ORDER BY follow agtype rank: object < array < string < number
    val ord = Cypher.query(spark, empty,
      "UNWIND [[1, 2], 'a', [1, 2], {b: 1}, 7, {b: 1}] AS x " +
        "RETURN DISTINCT x ORDER BY x").collect().map(_.get(0))
    assert(ord.toSeq === Seq("{\"b\": 1}", "[1, 2]", "a", "7"))
    // membership over a mixed list
    assert(one("RETURN 2 IN [1, [2], 2] AS x") === true)
    assert(one("RETURN 4 IN [1, [2], 2] AS x") === false)
    // same-rank containers ORDER element-wise like the reference
    // (compare_agtype_containers_orderability), not by text
    val lists = Cypher.query(spark, empty,
      "UNWIND [[1, 10], 'a', [1, 2, 3], [1, 2]] AS x RETURN x ORDER BY x")
      .collect().map(_.get(0))
    assert(lists.toSeq === Seq("[1, 2]", "[1, 2, 3]", "[1, 10]", "a"))
    // min/max over mixed values follow orderability too
    assert(one("UNWIND [[1, 10], [1, 2], 'z'] AS x RETURN min(x) AS m") === "[1, 2]")
    assert(one("UNWIND [[1, 10], [1, 2], 'z'] AS x RETURN max(x) AS m") === "z")
    // decode-on-access: chains recurse INTO container-slot variants
    // (reference: agtype_access_operator chains, expr.sql deep access)
    assert(one("RETURN [1, {bool: true, int: 3, array: [9, 11, " +
      "{boom: false, float: 3.14}, 13]}, 5, 7, 9][1].array[2].float AS x") === "3.14")
    assert(one("RETURN [1, {bool: true, array: [9, 13]}, 5][1].array[1] AS x") === "13")
    assert(one("RETURN [1, [2, [3, [4]]]][1][1][1][0] AS x") === "4")
    assert(one("RETURN [1, [2]][1][-1] AS x") === "2") // negative index
    assert(one("RETURN [1, [2]][1][5] AS x") === null) // OOB → null
    assert(one("RETURN [1, {a: 2}][1].missing AS x") === null)
    assert(one("RETURN [1, {a: 2}][0].a AS x") === null) // scalar target
  }

  test("NUMERIC stays exact and distinct from float (agtype.c:5385, ::numeric)") {
    // numeric prints annotated at its natural scale
    assert(one("RETURN 1.5::numeric AS x") === "1.5::numeric")
    assert(one("RETURN 2::numeric AS x") === "2::numeric")
    // numeric arithmetic is exact where float is not
    assert(one("RETURN (0.1::numeric + 0.2::numeric) = 0.3::numeric AS x") === true)
    assert(one("RETURN (0.1 + 0.2) = 0.3 AS x") === false)
    // numeric ⊕ int stays numeric; numeric in a mixed list keeps its slot
    assert(one("RETURN [1.5::numeric, 'a'][0] AS x") === "1.5::numeric")
    // cross-class numeric compare by value
    assert(one("RETURN 1::numeric = 1 AS x") === true)
    assert(one("RETURN 1.5::numeric < 2 AS x") === true)
  }

  test("entity typecasts ::vertex/::edge/::path (agtype.c:5694/5774/5867)") {
    // an object with the vertex shape becomes a vertex
    assert(one("WITH {id: 7, label: 'P', properties: {a: 1}}::vertex AS v " +
      "RETURN id(v) AS x") === 7L)
    assert(one("WITH {id: 7, label: 'P', properties: {a: 1}}::vertex AS v " +
      "RETURN label(v) AS x") === "P")
    assert(one("WITH {id: 7, label: 'P', properties: {a: 1}}::vertex AS v " +
      "RETURN v.a AS x") === 1L)
    // edge shape: id, label, start_id, end_id, properties
    assert(one("WITH {id: 9, label: 'E', start_id: 1, end_id: 2, " +
      "properties: {}}::edge AS e RETURN start_id(e) AS x") === 1L)
    assert(one("WITH {id: 9, label: 'E', start_id: 1, end_id: 2, " +
      "properties: {}}::edge AS e RETURN type(e) AS x") === "E")
    // null input propagates (typecast.sql: null::vertex is null)
    assert(one("RETURN null::vertex AS x") === null)
    assert(one("RETURN null::path AS x") === null)
    // malformed object errors like the reference
    assertThrows[Exception](one("RETURN {id: 1}::vertex AS x"))
    assertThrows[Exception](one("RETURN {id: 1, label: 'x'}::edge AS x"))
    assertThrows[Exception](one("RETURN 3::path AS x"))
  }

  test("regress-sweep round 5: concat harmonization, IN null, qualified names, pg casts") {
    // mixed-element list concat is legal (expr.out:152-156)
    assert(one("RETURN ['str', 1, 1.0] + [true, null] AS x") ===
      "[\"str\", 1, 1.0, true, null]")
    assert(one("RETURN [1, 2] + ['a'] AS x") === "[1, 2, \"a\"]")
    // map membership in a heterogeneous list (expr.out:195-199)
    assert(one("RETURN {bool: true, int: 1} IN " +
      "['str', 1, 1.0, true, null, {bool: true, int: 1}, [1,3,5,[2,4,6]]] AS x") === true)
    // IN null is null; scalar object errors (expr.out:217/368)
    assert(one("RETURN true IN NULL AS x") === null)
    assertThrows[Exception](one("RETURN 'str' IN 'str' AS x"))
    // slice must access a list (expr.out:503)
    assertThrows[Exception](one("RETURN 0[0..1] AS x"))
    // comparisons against a static null fold to null ({a:1} = null)
    assert(one("RETURN {a: 1} = null AS x") === null)
    // int literal past int64 reads as numeric (ag_scanner overflow path)
    assert(one("RETURN 10000000000000000000 AS x") === "10000000000000000000::numeric")
    // schema-qualified + age_-prefixed function names resolve
    assert(one("RETURN pg_catalog.sqrt(25::pg_float8) AS x") === 5.0)
    assert(one("RETURN ag_catalog.age_sqrt(25) AS x") === 5.0)
    // pg_float8 accepts the NaN/inf spellings
    assert(one("RETURN 'inf'::pg_float8 AS x") === Double.PositiveInfinity)
    assert(one("RETURN '-infinity'::pg_float8 AS x") === Double.NegativeInfinity)
    assert(one("RETURN '2.71'::pg_float8 AS x") === 2.71)
    // null propagation: head/last/replace/startNode
    assert(one("RETURN head(null) AS x") === null)
    assert(one("RETURN replace('Hello', null, null) AS x") === null)
    assert(one("RETURN startNode(null) AS x") === null)
    // container elements are unconvertible: all-null result
    assert(one("RETURN toBooleanList([['A', 'B'], ['C', 'D']]) AS x") ===
      Seq(null, null))
    // variant input typecasts dispatch per-slot
    assert(one("RETURN ([0, 'x', 2.9][2])::int AS x") === 3L)
    assert(one("RETURN ([0, 'x', 2.9][1])::string AS x") === "x")
    // mixed vertex/edge literal list with map-typed (cast) properties —
    // the reference's path-shaped AGTV_ARRAY (agtype regress); rendered
    // through the agtype output layer
    val df = Cypher.query(spark, empty,
      "RETURN [{id: 0, label: 'v0', properties: {}}::vertex, " +
        "{id: 2, label: 'e0', end_id: 1, start_id: 0, properties: {w: 1.5}}::edge] AS x")
    val rendered = df.select(graft.types.AgVariant.printedNative(
      org.apache.spark.sql.functions.col("x"), df.schema("x").dataType))
      .collect()(0).getString(0)
    assert(rendered ===
      "[{\"id\": 0, \"label\": \"v0\", \"properties\": {}}::vertex, " +
        "{\"id\": 2, \"label\": \"e0\", \"end_id\": 1, \"start_id\": 0, " +
        "\"properties\": {\"w\": 1.5}}::edge]")
  }

  test("list conversion functions (expr.sql to*List corpora)") {
    assert(one("RETURN toBooleanList([0, 1, 2]) AS x") === Seq(false, true, true))
    assert(one("RETURN toBooleanList(['true', 'false']) AS x") === Seq(true, false))
    assert(one("RETURN toIntegerList(['1.2', '7', 'x']) AS x") === Seq(1L, 7L, null))
    assert(one("RETURN toFloatList(['2.5', 'x']) AS x") === Seq(2.5, null))
    assert(one("RETURN toStringList([1, 2.5, true]) AS x") === Seq("1", "2.5", "true"))
    assert(one("RETURN toBooleanList([]) AS x") === null)
    assert(one("RETURN toBooleanList([null, null]) AS x") === Seq(null, null))
  }

  test("chained comparisons AND the pairwise comparisons (expr.sql:319-368)") {
    // `a OP b OP c` means (a OP b) AND (b OP c); parens break the chain
    // and the inner boolean then compares cross-type by total order
    assert(one("RETURN 1 = 1 = 1 AS x") === true)
    assert(one("RETURN 1 = 2 = 1 AS x") === false)
    assert(one("RETURN (1 = 1) = 1 AS x") === false)
    assert(one("RETURN 1 = (1 = 1) AS x") === false)
    assert(one("RETURN 1 = 1 = true AS x") === false)
    assert(one("RETURN (1 = 1) = true AS x") === true)
    assert(one("RETURN true = ((1 = 1) = true) AS x") === true)
    assert(one("RETURN ((1 = 1) = 1) = 1 AS x") === false)
    assert(one("RETURN 35 < 40 <= 49 AS x") === true)
    assert(one("RETURN 25 <= 25 <= 25 AS x") === true)
    assert(one("RETURN 50 > 40 > 35 AS x") === true)
    assert(one("RETURN 40 <> 36 <> 35 AS x") === true)
    // arithmetic binds tighter than the chain
    assert(one("RETURN 35 < 35 + 1 <= 36 AS x") === true)
    assert(one("RETURN NOT 35 < 35 + 1 <= 36 AS x") === false)
    // mixed chain where one leg fails
    assert(one("RETURN 30 <= 40 <= 49 > 40 AS x") === true)
    assert(one("RETURN 30 <= 40 <= 49 = 40 AS x") === false)
  }

  test("map projection over plain maps (map_projection.out corpus)") {
    assert(one("WITH {name:'Bob', age:50} AS map RETURN map { .* } AS a") ===
      "{\"age\": 50, \"name\": \"Bob\"}")
    assert(one("WITH {name:'Bob', age:50} AS map RETURN map { .name } AS a") ===
      "{\"name\": \"Bob\"}")
    assert(one("WITH {name:'Bob', age:50} AS map RETURN map { name:'Tom' } AS a") ===
      "{\"name\": \"Tom\"}")
    assert(one("WITH {name:'Bob', age:50} AS map, 'Tom' AS name RETURN map { name } AS a") ===
      "{\"name\": \"Tom\"}")
    // explicit entries win over .* regardless of position
    assert(one("WITH {name:'Bob', age:50} AS map RETURN map { name:'Tom', .* } AS a") ===
      "{\"age\": 50, \"name\": \"Tom\"}")
    assert(one("WITH {name:'Bob', age:50} AS map RETURN map { .name, .age, height:180 } AS a") ===
      "{\"age\": 50, \"name\": \"Bob\", \"height\": 180}")
    // a null map projects to the empty object
    assert(one("WITH null AS map RETURN map { .name } AS a") === "{}")
  }

  test("mixed UNION / UNION ALL chains are left-associative (cypher_union.sql)") {
    def rows(q: String): Seq[Any] =
      Cypher.query(spark, empty, q).collect().toSeq
        .map(r => if (r.isNullAt(0)) null else r.get(0))
    assert(rows("RETURN null AS a UNION ALL RETURN null AS a UNION RETURN null AS a") ===
      Seq(null))
    assert(rows("RETURN null AS a UNION RETURN null AS a UNION ALL RETURN null AS a") ===
      Seq(null, null))
    // int/float dedupe by numeric value, integer representative survives
    assert(rows("RETURN 1.0::int AS a UNION RETURN 1.0::float AS a UNION ALL RETURN 1::int AS a")
      .map(_.toString).sorted === Seq("1", "1"))
    // scalar class mismatch harmonizes through the variant encoding
    assert(rows("RETURN 1 AS a UNION RETURN 'x' AS a").map(_.toString).sorted ===
      Seq("1", "x"))
    // container-vs-scalar branches render agtype text
    // (reference: cypher_union.sql '[1,2,3] UNION 1' keeps both rows)
    assert(rows("RETURN [1,2,3] AS a UNION RETURN 1 AS a").map(_.toString).sorted ===
      Seq("1", "[1, 2, 3]"))
    assert(rows("RETURN {a: 1} AS a UNION RETURN [1, 'b'] AS a").map(_.toString).sorted ===
      Seq("[1, \"b\"]", "{\"a\": 1}"))
  }

  test("CALL of a scalar function is a one-row source (cypher_call.sql:41-69)") {
    assert(one("CALL sqrt(64) YIELD sqrt RETURN sqrt") === 8.0)
    assert(one("CALL sqrt(64) YIELD sqrt WHERE sqrt > 1 RETURN sqrt") === 8.0)
    assert(Cypher.query(spark, empty,
      "CALL sqrt(64) YIELD sqrt WHERE sqrt = 1 RETURN sqrt").collect().isEmpty)
    val e = intercept[Exception](Cypher.query(spark, empty,
      "CALL sqrt(64) YIELD squirt RETURN squirt").collect())
    assert(e.getMessage.contains("sqrt"))
  }

  test("XOR") {
    assert(one("RETURN true XOR false AS x") === true)
    assert(one("RETURN true XOR true AS x") === false)
  }

  test("map equality is key/value-set equality, order-independent") {
    assert(one("RETURN {a: 1} = {a: 1} AS x") === true)
    assert(one("RETURN {a: 1} = {a: 2} AS x") === false)
    assert(one("RETURN {a: 1, b: 2} = {b: 2, a: 1} AS x") === true)
    assert(one("RETURN {a: 1} <> {a: 2} AS x") === true)
  }

  test("nested heterogeneous map literals (AGTV_OBJECT nests freely)") {
    assert(one("RETURN {a: 1, b: {c: 2}}.b.c AS x") === 2L)
    assert(one("RETURN {a: 1, b: [1, 2, 3]}.b[1] AS x") === 2L)
    assert(one("RETURN {a: 1, b: {c: 2}}['a'] AS x") === 1L)
    assert(one("RETURN {a: 1, b: {c: 2}}['z'] AS x") === null)
    assert(one("RETURN keys({a: 1, b: {c: 2}}) AS x") === Seq("a", "b"))
  }

  test("isEmpty over string/list/map incl. empty map literal") {
    assert(one("RETURN isEmpty('') AS x") === true)
    assert(one("RETURN isEmpty([]) AS x") === true)
    assert(one("RETURN isEmpty({}) AS x") === true)
    assert(one("RETURN isEmpty({a: 1}) AS x") === false)
    assert(one("RETURN size(keys({})) AS x") === 0)
  }

  test("hex/octal/trailing-dot literals (ag_scanner.l hexint; strtoint base 0)") {
    assert(one("RETURN 0x1F AS x") === 31L)
    assert(one("RETURN 0X10 AS x") === 16L)
    assert(one("RETURN 017 AS x") === 15L) // leading zero = octal
    assert(one("RETURN 00 AS x") === 0L)
    assert(one("RETURN 1. AS x") === 1.0)
    assert(one("RETURN 1.e3 AS x") === 1000.0)
    assertThrows[Exception](one("RETURN 08 AS x")) // invalid octal
    assert(one("RETURN 0x10 + 010 AS x") === 24L)
  }

  test("doubled-quote escapes (ag_scanner.l essquote/esdquote/esbquote)") {
    assert(one("RETURN 'it''s' AS x") === "it's")
    assert(one("RETURN \"a\"\"b\" AS x") === "a\"b")
    assert(one("RETURN 1 AS `back``tick`") === 1L)
  }

  test("trailing garbage after a complete query is a parse error") {
    assertThrows[Exception](Parser.parse("RETURN 1 2"))
    assertThrows[Exception](Parser.parse("MATCH (n) RETURN n garbage here"))
    // trailing semicolon is fine
    assert(one("RETURN 1 AS x;") === 1L)
  }

  test("numeric division keeps PG-scale precision (no Spark scale-6 collapse)") {
    // Spark decimal divide under allowPrecisionLoss yields scale 6 for
    // (38,18) operands; PG numeric division keeps high fractional scale
    assert(one("RETURN 1::numeric / 3::numeric AS x") === "0.333333333333333333::numeric")
    assert(one("RETURN 2::numeric / 3::numeric AS x") === "0.666666666666666667::numeric")
    assert(one("RETURN 10::numeric / 4 AS x") === "2.5::numeric")
    assert(one("RETURN 1::numeric / 0::numeric AS x") === null)
  }

  test("string conversion of numerics is numeric_out: natural scale, no annotation") {
    assert(one("RETURN 2.5::numeric::string AS x") === "2.5")
    assert(one("RETURN 2::numeric::string AS x") === "2")
    assert(one("RETURN toString(2.5::numeric) AS x") === "2.5")
    // through the variant container slot too
    assert(one("RETURN [2.5::numeric, 'a'][0]::string AS x") === "2.5")
  }

  test("::int rounds like the reference casts (dtoi8 half-even on float, numeric_int8 half-away on numeric)") {
    assert(one("RETURN 1.5::int AS x") === 2L)
    assert(one("RETURN 2.5::int AS x") === 2L) // half-to-even
    assert(one("RETURN -1.5::int AS x") === -2L)
    assert(one("RETURN 3.7::int AS x") === 4L)
    assert(one("RETURN 2.5::numeric::int AS x") === 3L) // numeric: half away
    assert(one("RETURN '42'::int AS x") === 42L)
  }

  test("entity-vs-scalar UNION branches render agtype entity text") {
    val g = graft.graph.TpchGraph(spark, "/root/testdata/sf0.001")
    val rows = Cypher.query(spark, g,
      "MATCH (r:Region) WHERE r.name = 'ASIA' RETURN r AS x UNION RETURN 1 AS x")
      .collect().map(_.getString(0)).sorted
    assert(rows.length === 2)
    assert(rows.contains("1"))
    assert(rows.exists(s => s.endsWith("::vertex") && s.contains("\"label\": \"Region\"")
      && s.contains("\"properties\": {\"name\": \"ASIA\"}")))
    val erows = Cypher.query(spark, g,
      """MATCH (n:Nation {name: 'NATION_1'})-[e:IN_REGION]->() RETURN e AS x
        |UNION RETURN 'scalar' AS x""".stripMargin)
      .collect().map(_.getString(0))
    assert(erows.exists(s => s.endsWith("::edge") && s.contains("\"start_id\": ")))
  }

  test("entity lists across labels widen to the union property schema") {
    val g = graft.graph.TpchGraph(spark, "/root/testdata/sf0.001")
    val r = Cypher.query(spark, g,
      """MATCH (n:Nation {name: 'NATION_1'})-[:IN_REGION]->(r)
        |RETURN [x IN [n, r] | x.name] AS names""".stripMargin)
      .collect()(0).getSeq[String](0)
    assert(r === Seq("NATION_1", "AMERICA"))
  }

  test("procedures resolve reference-spelled age_ names") {
    val g = graft.graph.TpchGraph(spark, "/root/testdata/sf0.001")
    val rows = Cypher.query(spark, g,
      "CALL age_graph_stats() YIELD kind RETURN count(*) AS k").collect()
    assert(rows(0).getLong(0) > 0)
  }

  test("=~ is an unanchored POSIX-style search (reference binds textregexeq, agtype.c:12441)") {
    assert(one("RETURN 'abc' =~ 'b.*' AS x") === true) // substring match
    assert(one("RETURN 'abc' =~ '^b.*' AS x") === false)
    assert(one("RETURN 'John' =~ '(?i)JoHn' AS x") === true) // inline flags
    assert(one("RETURN 'John' =~ 'JoHn' AS x") === false)
  }
}
