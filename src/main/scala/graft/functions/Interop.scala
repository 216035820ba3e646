package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's extension-interop function surface, re-derived as
  * Spark column expressions: agtype values flow through pg_trgm,
  * fuzzystrmatch and pgvector functions inside Cypher queries
  * (reference: regress/sql/pg_trgm.sql, fuzzystrmatch.sql,
  * pgvector.sql). Semantics re-implemented from the published
  * algorithms (PG docs), NOT ported code; golden tests pin the regress
  * expected outputs. None of these sit on a hot scan path — they're
  * user-called scalar functions; HOF lambdas are acceptable here.
  */
object Interop {

  // ---- pg_trgm ----

  /** The sorted, de-duplicated trigram set of a string, PG-style:
    * lowercase, split on non-alphanumeric, each word padded with two
    * leading and one trailing space (pg_trgm's KEEPONLYALNUM +
    * make_trigrams behavior; show_trgm('hello') = {"  h"," he",ell,
    * hel,llo,"lo "}). */
  def showTrgm(s: Column): Column = {
    val words = filter(split(lower(s), "[^a-z0-9]+"), w => length(w) > 0)
    val tris = transform(words, w => {
      val padded = concat(lit("  "), w, lit(" "))
      transform(sequence(lit(1), length(padded) - 2), i => padded.substr(i, lit(3)))
    })
    array_sort(array_distinct(flatten(tris)))
  }

  /** Trigram set similarity: |A ∩ B| / |A ∪ B|, as float4 like PG's
    * `real` return type. */
  def similarity(a: Column, b: Column): Column = {
    val (ta, tb) = (showTrgm(a), showTrgm(b))
    val inter = size(array_intersect(ta, tb))
    (inter.cast(DoubleType) / (size(ta) + size(tb) - inter)).cast(FloatType)
  }

  /** Greatest similarity between the first string's trigram set and any
    * continuous extent of the second string's ORDERED trigram set —
    * PG word_similarity. O(m²) extents over the (small) trigram array
    * of the second argument; not a scan-path function. */
  def wordSimilarity(a: Column, b: Column): Column = {
    val (ta, tb) = (showTrgm(a), showTrgm(b))
    val m = size(tb)
    val pairs = flatten(transform(sequence(lit(1), greatest(m, lit(1))), i =>
      transform(sequence(i, greatest(m, lit(1))), j =>
        struct(i.as("i"), j.as("j")))))
    val sims = transform(pairs, p => {
      val len = p.getField("j") - p.getField("i") + 1
      val ext = slice(tb, p.getField("i"), len)
      val inter = size(array_intersect(ta, ext))
      inter.cast(DoubleType) / (size(ta) + len - inter)
    })
    when(m >= 1, array_max(sims)).otherwise(lit(0.0)).cast(FloatType)
  }

  // ---- fuzzystrmatch ----
  // soundex / levenshtein are Spark built-ins with PG-identical
  // semantics (standard algorithms); difference composes soundex.

  /** Number of matching positions (of 4) between the soundex codes —
    * fuzzystrmatch's difference(). */
  def difference(a: Column, b: Column): Column = {
    val (sa, sb) = (soundex(a), soundex(b))
    (1 to 4).map(i =>
      when(substring(sa, i, 1) === substring(sb, i, 1), 1L).otherwise(0L))
      .reduce(_ + _)
  }

  // ---- pgvector ----

  /** Coerce a pgvector operand to array<double>: '[1,2,3]' strings
    * (agtype strings flow into the vector functions in the reference
    * regress) or any numeric array. */
  def asVector(c: Column, dt: Option[DataType]): Column = dt match {
    case Some(StringType) =>
      transform(
        filter(split(regexp_replace(trim(c), "^\\[|\\]$", ""), ","),
          x => length(trim(x)) > 0),
        x => trim(x).cast(DoubleType))
    case Some(ArrayType(_, _)) => c.cast(ArrayType(DoubleType))
    case Some(d) if graft.types.AgVariant.isVariant(d) =>
      // string slot or container text — either way a '[...]' rendering
      asVector(coalesce(c.getField("s"), c.getField("c")), Some(StringType))
    case _ => c.cast(ArrayType(DoubleType))
  }

  def innerProduct(a: Column, b: Column): Column =
    VectorExpressions.dotProduct(a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))

  def l1Distance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => abs(x - y)), lit(0.0), _ + _)

  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - innerProduct(a, b) /
      (sqrt(innerProduct(a, a)) * sqrt(innerProduct(b, b)))

  def vectorNorm(a: Column): Column = sqrt(innerProduct(a, a))

  /** Unit-normalized vector as float4 elements (pgvector's storage
    * type, so printed values match the reference). */
  def l2Normalize(a: Column): Column = {
    val n = vectorNorm(a)
    transform(a, x => (x / n).cast(FloatType))
  }

  /** 1-based (start, count) slice — pgvector subvector. */
  def subvector(a: Column, start: Column, count: Column): Column =
    slice(a, start, count)

  /** Bit-string text of sign bits — pgvector binary_quantize ('111'
    * for [1,2,4]). */
  def binaryQuantize(a: Column): Column =
    concat_ws("", transform(a, x => when(x > 0, lit("1")).otherwise(lit("0"))))
}
