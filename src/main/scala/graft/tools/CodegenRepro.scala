package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

object CodegenRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.codegen.fallback", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.range(1).withColumn("lbl", lit("Q3")).localCheckpoint(true)
    def idx = when(lit(0) >= 0, lit(0) + 1).otherwise(lit(0)).cast(IntegerType)
    println("case A: try_element_at(array(col))")
    base.select(try_element_at(array(col("lbl")), idx)).show()
    println("case B: try_element_at(array(lit))")
    base.select(try_element_at(array(lit("Q3")), idx)).show()
    println("case C: element_at")
    base.select(element_at(array(col("lbl")), 1)).show()
    println("case D: try_element_at literal idx")
    base.select(try_element_at(array(col("lbl")), lit(1))).show()
    println("case E: get()")
    base.select(get(array(col("lbl")), lit(0))).show()
    println("case F: try_element_at on map col")
    val m = spark.range(1).select(map(lit("a"), lit(1)).as("m"), lit("a").as("k")).localCheckpoint(true)
    m.select(try_element_at(col("m"), lit("a"))).show()
    println("case G: try_element_at map, col key")
    m.select(try_element_at(col("m"), col("k"))).show()
    println("case H: plain element_at map (ansi?)")
    m.select(element_at(col("m"), lit("z"))).show()
    spark.stop()
  }
}
