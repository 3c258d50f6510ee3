package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** PARTITION-SPEC EVOLUTION (Iceberg `ALTER TABLE … ADD PARTITION
  * FIELD` / partition evolution, the metadata-only relayout): a table
  * starts partitioned one way (say `year(o_orderdate)`), and a later
  * commit switches to a finer spec (`year, month`) WITHOUT rewriting
  * a single existing file. Each data file is bound to the spec it was
  * written under; the manifest records, per file, the partition
  * TUPLE under that spec (absent fields = null). A scan prunes each
  * file with the fields that file actually has — Iceberg's inclusive
  * projection: a file survives unless one of its NON-NULL partition
  * values refutes the predicate. Old files therefore prune at the
  * old (coarser) granularity and new files at the new one, and both
  * eras answer the same query from one read.
  *
  * Why this is the 100 TB feature: re-partitioning history is a
  * full-table rewrite — at 100 TB that is days of cluster IO for a
  * layout change. Spec evolution is O(1) metadata: the next commit
  * simply writes under the new spec, and the manifest (one row per
  * file, metadata-sized at any volume) carries both generations.
  * This is exactly why Iceberg/Delta bind specs to files, not to the
  * table.
  *
  * Partitioning here is HIDDEN (Iceberg-style): the spec is a list
  * of named TRANSFORMS over data columns (`p_y -> year(o_orderdate)`).
  * The transform columns exist only as directory structure and
  * manifest metadata — data files keep the full original schema, so
  * files written under different specs are schema-identical and one
  * multi-path read serves any mix of eras. Queries never mention
  * partition columns; pruning happens against the manifest.
  *
  * Reference anchor: the reference maintains its incremental models
  * as single-directory parquet tables (src/dbt_incremental_ci/
  * copier.py:110-284 clones them wholesale); this module is the
  * lakehouse layout layer a 100 TB deployment would put under them.
  */
object PartitionEvolution {

  /** One partition spec: id + named transforms over data columns.
    * Field names are shared across specs (a finer spec ADDS fields);
    * a file's manifest row carries null for fields its spec lacks.
    */
  final case class Spec(id: Int, transforms: Seq[(String, Column)])

  /** An evolved table: the commit directories plus the unified
    * manifest — one row per data file:
    * (file, spec_id, &lt;field…&gt; nullable). Manifest rows are built at
    * commit time from the written directory layout and carried as a
    * (metadata-sized) DataFrame, the in-process analogue of an
    * Iceberg manifest list.
    */
  final case class Table(root: String, fields: Seq[String], manifest: DataFrame)

  def empty(spark: SparkSession, root: String, fields: Seq[String]): Table = {
    val cols = Seq(lit("").as("file"), lit(0).as("spec_id")) ++
      fields.map(f => lit(null).cast(IntegerType).as(f))
    Table(root, fields, spark.range(0).select(cols: _*))
  }

  /** Append `df` under `spec`: write partitioned by the spec's
    * transform columns into a fresh commit directory, then derive the
    * new manifest rows from the directory layout (one
    * `_metadata.file_path` aggregation over the just-written commit —
    * commit-sized, not table-sized). The transform columns are
    * dropped from the data files by `partitionBy`, which is what
    * keeps every era's files schema-identical.
    */
  def commit(spark: SparkSession, t: Table, df: DataFrame, spec: Spec,
      commitId: Int): Table = {
    val names = spec.transforms.map(_._1)
    require(names.forall(t.fields.contains),
      s"spec ${spec.id} uses fields outside the table's ${t.fields}")
    val dir = s"${t.root}/commit=$commitId"
    spec.transforms
      .foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c.cast(IntegerType)) }
      .write.partitionBy(names: _*).parquet(dir)
    // read back ONLY this commit: partition discovery rehydrates the
    // transform values; one row per file.
    val aggs = lit(spec.id).as("spec_id") +: names.map(n => first(col(n)).as(n))
    val written = spark.read.parquet(dir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val padded = t.fields.filterNot(names.contains)
      .foldLeft(written)((d, f) => d.withColumn(f, lit(null).cast(IntegerType)))
      .select(("file" +: "spec_id" +: t.fields).map(col): _*)
    Table(t.root, t.fields, t.manifest.unionByName(padded))
  }

  /** Inclusive-projection pruning: keep a file unless one of its
    * NON-NULL partition fields refutes `fieldPreds`. Returns (kept
    * file paths, total files) — the collect is manifest-sized, which
    * is exactly what a lakehouse reader holds on the driver.
    */
  def prunedFiles(t: Table, fieldPreds: Seq[(String, Column => Column)])
      : (Seq[String], Long) = {
    val pred = fieldPreds.map { case (f, p) => col(f).isNull || p(col(f)) }
      .reduceOption(_ && _).getOrElse(lit(true))
    val kept = t.manifest.filter(col("file") =!= "" && pred)
      .select("file").collect().map(_.getString(0)).toSeq.sorted
    (kept, t.manifest.filter(col("file") =!= "").count())
  }

  /** Manifest-pruned scan + exact row predicate. Old-spec files prune
    * only as far as their coarser fields allow (a year-only file
    * matching the year is read whole), so the row filter finishes the
    * job — pruning is an IO optimization, never a semantics change.
    */
  def scan(spark: SparkSession, t: Table,
      fieldPreds: Seq[(String, Column => Column)], rowPred: Column): DataFrame = {
    val (kept, _) = prunedFiles(t, fieldPreds)
    val base =
      if (kept.isEmpty) {
        // derive the empty frame from a real data file RECORDED IN THE
        // MANIFEST (not an assumed commit=0 directory — the first
        // commit can carry any id), and read it as an explicit file
        // path so no partition discovery runs: empty and non-empty
        // scans return the SAME schema (data columns only), which any
        // caller unioning results depends on.
        val sample = t.manifest.filter(col("file") =!= "")
          .select("file").limit(1).collect()
        require(sample.nonEmpty,
          s"${t.root}: no data files committed — nothing to derive a scan schema from")
        spark.read.parquet(sample.head.getString(0)).limit(0)
      } else spark.read.parquet(kept: _*)
    base.filter(rowPred)
  }
}
