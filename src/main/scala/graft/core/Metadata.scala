package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset-level metadata aggregates (SURVEY §2.3 A9/A10 + assembly):
  * the suggestions list, natural-sorted chromosome list, and the
  * metadata JSON payload pieces. */
object Metadata {

  /** A9 suggestions: flatten all gene_names bags (space/;/, split) →
    * distinct → sorted, dropping empties.
    * Reference: generate_suggestions, network_generator_lib.R:397-405. */
  def suggestions(vertices: DataFrame): DataFrame =
    vertices
      .select(explode(split(col("gene_names"), "[;, ]+")).as("suggestion"))
      .filter(col("suggestion") =!= "")
      .distinct()
      .orderBy(col("suggestion"))

  /** Natural-order sort key for chromosome names: numeric chromosomes
    * zero-padded so "2" < "10"; X/Y/PP sort after numerics
    * (str_sort(numeric=TRUE) semantics). Pad width 9, not 2: lpad
    * TRUNCATES past the target width, so a 3+-digit scaffold name
    * (e.g. "123") would collide with chromosome "12"'s key. */
  def naturalChrKey(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.rlike("^\\d+$"), concat(lit("0"), lpad(c, 9, "0")))
      .otherwise(concat(lit("1"), c))

  /** A10 chromosome list: distinct chromosomes (MT dropped), natural
    * sort, pseudo-chromosome "PP" appended.
    * Reference: network_generator.R:238-244. */
  def chromosomes(vertices: DataFrame): DataFrame = {
    val chrs = vertices.select(col("chr")).distinct()
      .filter(!col("chr").contains("MT"))
    chrs.unionAll(chrs.sparkSession.range(1).select(lit("PP").as("chr")))
      .withColumn("__k", naturalChrKey(col("chr")))
      .orderBy(col("__k"))
      .drop("__k")
  }
}
