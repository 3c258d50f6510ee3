package graft.queries

import org.apache.spark.sql.DataFrame

import graft.operators.Ann
import graft.sources.Catalog

/** Construction-time SQL/oracle builders shared across the §2.D family
  * objects (the k-means/IVF trainer CTEs, SRP bucket branches, SQL
  * IN-list rendering). Living here keeps the family objects'
  * initialization acyclic: every family depends on SharedSql, never on
  * another family at construction time.
  */
private[queries] object SharedSql {


  /** DuckDB oracle for the registered (LSH-bucketed) d05, generated
    * from the SAME seeded hyperplanes the Spark plan uses. Both
    * engines accumulate every dot product in strict ascending-index
    * order (DotProduct's codegen loop ≙ left-assoc `+` chain /
    * list_reduce), so the sign bits — and therefore the candidate
    * set and the final exact-verified pairs — are bit-identical.
    * This pins the full deterministic operator, not just "rows > 0";
    * recall vs the exact all-pairs baseline is pinned separately in
    * LlmOpsSpec (planted near-dups at cosine ≥ 0.9 → recall 1.0).
    */
  /** The SRP bucket branches shared by the d05 and s02 oracles: the
    * SAME seeded planes the operators hash with, rendered as literal
    * weights — both engines then compute identical sign bits.
    */
  def srpBucketBranches(tables: Int, bits: Int, dim: Int,
      seed: Long): String = {
    val hp = Ann.srpPlanes(tables, bits, dim, seed)
    def dot(plane: Array[Double]): String =
      plane.zipWithIndex.map { case (w, i) => s"v[${i + 1}]*($w)" }.mkString(" + ")
    def bucket(t: Int): String =
      (0 until bits).map { j =>
        s"(CASE WHEN (${dot(hp(t)(j))}) > 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
    (0 until tables).map { t =>
      s"SELECT vec_id, $t AS tbl, ${bucket(t)} AS bucket FROM n" }
      .mkString(" UNION ALL ")
  }

  /** DuckDB mirror of [[Ann.ivfCodebook]]'s seeded spherical k-means,
    * unrolled to `iters` Lloyd iterations — the s02 recipe extended
    * from "mirror the seeded planes" to "mirror the TRAINING":
    * the codebook is a deterministic function of the corpus (seeds =
    * vec_id < nCentroids; per-component means accumulate 2^40-scaled
    * integers exactly, so fold order cannot matter; every dot product
    * is the same strict left-to-right fold both engines run), so the
    * oracle retrains it in SQL and must land on bit-identical
    * centroids, probe sets, and ranks.
    */
  def ivfDot(a: String, b: String) =
    s"list_reduce(list_transform(range(1, 65), i -> $a[i]*$b[i]), (acc, x) -> acc + x)"

  // nearest-centroid assignment (ties: highest cid, mirroring the
  // struct array_max tie-break)
  def ivfAssign(out: String, cents: String, rnCond: String,
      filt: String = "") =
    s"""$out AS (SELECT * FROM (
       |  SELECT n.vec_id, n.v, n.nrm, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
       |      ORDER BY ${ivfDot("n.v", "c.cv")} / c.ncv DESC, c.cid DESC) AS rn
       |  FROM n CROSS JOIN $cents c$filt) WHERE $rnCond)""".stripMargin

  /** The shared training CTEs: normed corpus `n`, seeds `c0`, `iters`
    * unrolled Lloyd steps to `c<iters>`, and the final full-corpus
    * assignment `af`. Each Lloyd step takes the element-wise mean of
    * unit members per cluster via exact scaled-integer sums (trunc ==
    * Spark's double->long cast); an empty or degenerate cluster keeps
    * its previous centroid.
    */
  def ivfTrainSql(nCentroids: Int, iters: Int = 2): String = {
    def refine(prev: String, a: String, out: String) =
      s"""${out}m AS (SELECT cid, i AS pos,
         |    CAST(SUM(CAST(trunc(v[i]/nrm*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM $a, range(1, 65) t(i) GROUP BY cid, i),
         |${out}g AS (SELECT cid, cv, sqrt(list_reduce(list_transform(cv, x -> x*x), (acc, x) -> acc + x)) AS ncv
         |  FROM (SELECT cid, list(comp ORDER BY pos) AS cv FROM ${out}m GROUP BY cid)),
         |$out AS (SELECT p.cid,
         |    CASE WHEN g.ncv IS NULL OR g.ncv = 0 THEN p.cv ELSE g.cv END AS cv,
         |    CASE WHEN g.ncv IS NULL OR g.ncv = 0 THEN p.ncv ELSE g.ncv END AS ncv
         |  FROM $prev p LEFT JOIN ${out}g g USING (cid))""".stripMargin
    val lloyd = (1 to iters).map { t =>
      ivfAssign(s"a$t", s"c${t - 1}", "rn = 1") + ",\n" +
        refine(s"c${t - 1}", s"a$t", s"c$t")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
       |c0 AS (SELECT vec_id AS cid, v AS cv, nrm AS ncv FROM n WHERE vec_id < $nCentroids),
       |$lloyd,
       |${ivfAssign("af", s"c$iters", "rn = 1")}""".stripMargin
  }

  /** DuckDB mirror of [[Ann.kmeansDf]] (the DataFrame-native codebook
    * behind the Auto dials) + final assignment `kaf`. Differs from
    * [[ivfTrainSql]] exactly where the implementations differ: k is
    * CORPUS-ADAPTIVE (GREATEST(16, n//256), computed in SQL), seeds
    * are the k lowest vec_ids BY RANK with rank as the cid, centroids
    * are UNIT-normalized each step (so assignment scores divide by
    * the row norm only), and ties resolve to the LOWEST cid (the
    * struct-negcid max). Valid while k stays ≤ RouteThreshold — the
    * direct-assignment regime every oracle-scale corpus is in; the
    * routed form (k > 256) keeps its rows-only spec.
    */
  def kmeansAutoTrainSql(iters: Int = 2): String = {
    def assign(out: String, cents: String) =
      s"""$out AS (SELECT * FROM (
         |  SELECT n.vec_id, n.v, n.nrm, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${ivfDot("n.v", "c.cv")} / n.nrm DESC, c.cid ASC) AS rn
         |  FROM n CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
    def refine(prev: String, a: String, out: String) =
      s"""${out}m AS (SELECT cid, i AS pos,
         |    CAST(SUM(CAST(trunc(v[i]/nrm*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM $a, range(1, 65) t(i) GROUP BY cid, i),
         |${out}g AS (SELECT cid, mv, sqrt(list_reduce(list_transform(mv, x -> x*x), (acc, x) -> acc + x)) AS mnrm
         |  FROM (SELECT cid, list(comp ORDER BY pos) AS mv FROM ${out}m GROUP BY cid)),
         |$out AS (SELECT p.cid,
         |    CASE WHEN g.mnrm IS NULL OR g.mnrm = 0 THEN p.cv
         |         ELSE list_transform(g.mv, x -> x/g.mnrm) END AS cv
         |  FROM $prev p LEFT JOIN ${out}g g USING (cid))""".stripMargin
    val lloyd = (1 to iters).map { t =>
      assign(s"ka$t", s"kc${t - 1}") + ",\n" +
        refine(s"kc${t - 1}", s"ka$t", s"kc$t")
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
       |kk AS (SELECT GREATEST(16, COUNT(*) // 256) AS k FROM n),
       |kc0 AS (SELECT rnk - 1 AS cid, list_transform(v, x -> x/nrm) AS cv FROM (
       |    SELECT v, nrm, ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk FROM n)
       |  WHERE rnk <= (SELECT k FROM kk)),
       |$lloyd,
       |${assign("kaf", s"kc$iters")}""".stripMargin
  }

  /** Pooled variant of [[kmeansAutoTrainSql]]: trains the adaptive-k
    * DataFrame-native codebook over ONE label pool of the shared
    * labeled `n` CTE, every CTE prefixed with `p` so two pools can
    * train inside one query (s15_auto's per-language codebooks).
    * Exposes `${p}pn` (the pool), `${p}kc<iters>` (unit centroids)
    * and `${p}kaf` (the pool's final assignment). Same mirrored
    * details as the unpooled form: k = GREATEST(16, pool // 256),
    * rank-seeded cids, exact scaled-integer Lloyd means, ties to the
    * LOWEST cid.
    */
  def kmeansPoolTrainSql(p: String, label: Int, iters: Int = 2): String =
    kmeansSubsetTrainSql(p, s"label = $label", iters)

  /** Subset variant of [[kmeansPoolTrainSql]]: trains the adaptive-k
    * codebook over `n WHERE pred` (s21's per-layer builds — the layer
    * predicate is the deterministic geometric sample). Exposes
    * `${p}pn`, `${p}kc<iters>`, `${p}kaf`; identical mirrored details
    * (k = GREATEST(16, subset // 256), rank-seeded cids within the
    * subset, exact scaled-integer Lloyd means, ties to the LOWEST
    * cid).
    */
  def kmeansSubsetTrainSql(p: String, pred: String, iters: Int = 2): String = {
    def assign(out: String, cents: String, rnCond: String) =
      s"""$out AS (SELECT * FROM (
         |  SELECT n.vec_id, n.v, n.nrm, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id
         |      ORDER BY ${ivfDot("n.v", "c.cv")} / n.nrm DESC, c.cid ASC) AS rn
         |  FROM ${p}pn n CROSS JOIN $cents c) WHERE $rnCond)""".stripMargin
    def refine(prev: String, a: String, out: String) =
      s"""${out}m AS (SELECT cid, i AS pos,
         |    CAST(SUM(CAST(trunc(v[i]/nrm*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM $a, range(1, 65) t(i) GROUP BY cid, i),
         |${out}g AS (SELECT cid, mv, sqrt(list_reduce(list_transform(mv, x -> x*x), (acc, x) -> acc + x)) AS mnrm
         |  FROM (SELECT cid, list(comp ORDER BY pos) AS mv FROM ${out}m GROUP BY cid)),
         |$out AS (SELECT w.cid,
         |    CASE WHEN g.mnrm IS NULL OR g.mnrm = 0 THEN w.cv
         |         ELSE list_transform(g.mv, x -> x/g.mnrm) END AS cv
         |  FROM $prev w LEFT JOIN ${out}g g USING (cid))""".stripMargin
    val lloyd = (1 to iters).map { t =>
      assign(s"${p}ka$t", s"${p}kc${t - 1}", "rn = 1") + ",\n" +
        refine(s"${p}kc${t - 1}", s"${p}ka$t", s"${p}kc$t")
    }.mkString(",\n")
    s"""${p}pn AS (SELECT vec_id, v, nrm FROM n WHERE $pred),
       |${p}kk AS (SELECT GREATEST(16, COUNT(*) // 256) AS k FROM ${p}pn),
       |${p}kc0 AS (SELECT rnk - 1 AS cid, list_transform(v, x -> x/nrm) AS cv FROM (
       |    SELECT v, nrm, ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk FROM ${p}pn)
       |  WHERE rnk <= (SELECT k FROM ${p}kk)),
       |$lloyd,
       |${assign(s"${p}kaf", s"${p}kc$iters", "rn = 1")}""".stripMargin
  }

  def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ",", ")")
}

/** The tiny builder DSL every family object uses to register entries. */
private[queries] trait QDsl {
  protected def q(name: String, oracle: String)(f: Catalog => DataFrame): Q =
    Q(name, (s, dir) => f(Catalog(s, dir)), Some(oracle.stripMargin.trim))

  protected def rowsOnly(name: String)(f: Catalog => DataFrame): Q =
    Q(name, (s, dir) => f(Catalog(s, dir)), None)
}
