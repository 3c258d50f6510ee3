package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Text, Vectors}
import graft.operators.{Ann, Bpe, Dedup, DupGroups, Multimodal, Packing, PageRank}
import graft.sources.Catalog

/** SURVEY.md §2.D2 — similarity / ANN entries (s01–s18), split out of LlmOps along the family seam; semantics, oracles, and helper constants are unchanged. */
object AnnQueries extends QDsl {


  // s01 — brute-force cosine top-5 for query vectors vec_id < 20
  val s01: Q = q("s01_ann_brute",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_reduce(list_transform(range(1, 65), i -> q.v[i]*c.v[i]), (acc, x) -> acc + x)
      |          / (q.nrm*c.nrm) AS cos
      |      FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM p)
      |WHERE rn <= 5 ORDER BY query_id, rank""") { c =>
    Ann.brute(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s02 — LSH-bucketed approximate top-5. Oracle-gated since round
  // 10: the candidate set comes from the SAME seeded SRP planes the
  // d05 oracle already mirrors as literal weights (identical sign
  // bits in both engines), and the top-k ranking reuses s01's proven
  // deterministic (cos DESC, neighbor_id) idiom — so the full
  // approximate RESULT hash-compares, not just its recall.
  val s02: Q = q("s02_ann_lsh",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
      |b AS (${SharedSql.srpBucketBranches(tables = 8, bits = 6, dim = 64, seed = 7L)}),
      |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
      |         FROM b q JOIN b c ON q.tbl = c.tbl AND q.bucket = c.bucket
      |          AND q.vec_id < 20 AND c.vec_id <> q.vec_id),
      |p AS (SELECT query_id, neighbor_id,
      |        list_reduce(list_transform(range(1, 65), i -> x.v[i]*y.v[i]), (acc, t) -> acc + t)
      |          / (x.nrm*y.nrm) AS cos
      |      FROM cand JOIN n x ON x.vec_id = query_id JOIN n y ON y.vec_id = neighbor_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM p)
      |WHERE rn <= 5 ORDER BY query_id, rank""") { c =>
    Ann.lsh(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  /** DuckDB mirror of [[Ann.ivfpq]]: the coarse probe CTEs plus the
    * per-subspace PQ training (same exact-scaled-integer Lloyd steps
    * over unit subvectors, argmin ties to the LOWEST code mirroring
    * array_position-of-min), ADC accumulated as an ORDERED list fold
    * (SQL SUM over doubles is order-free and could flip the shortlist
    * boundary by a last bit), shortlist by (adc ASC, neighbor_id),
    * then the exact-cosine re-rank. m=8 subspaces of 8 dims, 16 codes.
    */
  private def ivfpqOracleSql(nCentroids: Int, nProbe: Int, k: Int,
      m: Int = 8, pqK: Int = 16, shortlist: Int = 64,
      iters: Int = 2): String = {
    val subDim = 64 / m
    def l2(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${subDim + 1}), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (acc, x) -> acc + x)"
    def pqAssign(out: String, cb: String) =
      s"""$out AS (SELECT * FROM (
         |  SELECT s.vec_id, s.j, s.sub, p.c,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY ${l2("s.sub", "p.pv")} ASC, p.c ASC) AS rn
         |  FROM subs s JOIN $cb p ON p.j = s.j) WHERE rn = 1)""".stripMargin
    val pqLloyd = (1 to iters).map { t =>
      s"""${pqAssign(s"pa$t", s"p${t - 1}")},
         |pm$t AS (SELECT j, c, i AS pos,
         |    CAST(SUM(CAST(trunc(sub[i]*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM pa$t, range(1, ${subDim + 1}) t(i) GROUP BY j, c, i),
         |pg$t AS (SELECT j, c, list(comp ORDER BY pos) AS pv FROM pm$t GROUP BY j, c),
         |p$t AS (SELECT p.j, p.c, COALESCE(g.pv, p.pv) AS pv
         |  FROM p${t - 1} p LEFT JOIN pg$t g ON g.j = p.j AND g.c = p.c)""".stripMargin
    }.mkString(",\n")
    s"""${SharedSql.ivfTrainSql(nCentroids, iters)},
       |${SharedSql.ivfAssign("pf", s"c$iters", s"rn <= $nProbe", " WHERE n.vec_id < 20")},
       |u AS (SELECT vec_id, list_transform(range(1, 65), i -> v[i]/nrm) AS uv FROM n),
       |subs AS (SELECT vec_id, j, list_slice(uv, j*$subDim+1, j*$subDim+$subDim) AS sub
       |  FROM u, range(0, $m) t(j)),
       |p0 AS (SELECT j, vec_id AS c, sub AS pv FROM subs WHERE vec_id < $pqK),
       |$pqLloyd,
       |${pqAssign("codes", s"p$iters")},
       |perj AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, nc.j,
       |    ${l2("qs.sub", "p.pv")} AS dist
       |  FROM pf q
       |  JOIN af a ON a.cid = q.cid AND a.vec_id <> q.vec_id
       |  JOIN codes nc ON nc.vec_id = a.vec_id
       |  JOIN subs qs ON qs.vec_id = q.vec_id AND qs.j = nc.j
       |  JOIN p$iters p ON p.j = nc.j AND p.c = nc.c),
       |adc AS (SELECT query_id, neighbor_id,
       |    list_reduce(list(dist ORDER BY j), (acc, x) -> acc + x) AS adc
       |  FROM perj GROUP BY query_id, neighbor_id),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id ASC) AS r FROM adc) WHERE r <= $shortlist),
       |sc AS (SELECT query_id, neighbor_id, ${SharedSql.ivfDot("x.v", "y.v")} / (x.nrm*y.nrm) AS cos
       |  FROM short JOIN n x ON x.vec_id = query_id JOIN n y ON y.vec_id = neighbor_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[Ann.ivfpqResidual]]: [[ivfpqOracleSql]] with
    * the PQ trained and applied on RESIDUALS — members re-center
    * against their OWN assigned centroid (af ⋈ unit centroids `cu`),
    * the query against EACH probed centroid (qsubs keyed by (vec_id,
    * cid) — the per-probe ADC table the residual form pays for). All
    * other details verbatim from the s04 oracle: exact scaled-integer
    * Lloyd means (trunc == Spark's double→long cast, valid on the
    * negative components residuals introduce), argmin ties to the
    * LOWEST code, ADC as an ORDERED list fold, shortlist by (adc ASC,
    * neighbor_id), exact-cosine re-rank.
    */
  private def ivfpqResidualOracleSql(nCentroids: Int, nProbe: Int, k: Int,
      m: Int = 8, pqK: Int = 16, shortlist: Int = 64,
      iters: Int = 2): String = {
    val subDim = 64 / m
    def l2(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${subDim + 1}), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (acc, x) -> acc + x)"
    def pqAssign(out: String, cb: String) =
      s"""$out AS (SELECT * FROM (
         |  SELECT s.vec_id, s.j, s.sub, p.c,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY ${l2("s.sub", "p.pv")} ASC, p.c ASC) AS rn
         |  FROM subs s JOIN $cb p ON p.j = s.j) WHERE rn = 1)""".stripMargin
    val pqLloyd = (1 to iters).map { t =>
      s"""${pqAssign(s"pa$t", s"p${t - 1}")},
         |pm$t AS (SELECT j, c, i AS pos,
         |    CAST(SUM(CAST(trunc(sub[i]*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM pa$t, range(1, ${subDim + 1}) t(i) GROUP BY j, c, i),
         |pg$t AS (SELECT j, c, list(comp ORDER BY pos) AS pv FROM pm$t GROUP BY j, c),
         |p$t AS (SELECT p.j, p.c, COALESCE(g.pv, p.pv) AS pv
         |  FROM p${t - 1} p LEFT JOIN pg$t g ON g.j = p.j AND g.c = p.c)""".stripMargin
    }.mkString(",\n")
    s"""${SharedSql.ivfTrainSql(nCentroids, iters)},
       |cu AS (SELECT cid, list_transform(range(1, 65), i -> cv[i]/ncv) AS cuv FROM c$iters),
       |${SharedSql.ivfAssign("pf", s"c$iters", s"rn <= $nProbe", " WHERE n.vec_id < 20")},
       |u AS (SELECT vec_id, list_transform(range(1, 65), i -> v[i]/nrm) AS uv FROM n),
       |res AS (SELECT u.vec_id, list_transform(range(1, 65), i -> u.uv[i] - c.cuv[i]) AS rv
       |  FROM u JOIN af a ON a.vec_id = u.vec_id JOIN cu c ON c.cid = a.cid),
       |subs AS (SELECT vec_id, j, list_slice(rv, j*$subDim+1, j*$subDim+$subDim) AS sub
       |  FROM res, range(0, $m) t(j)),
       |p0 AS (SELECT j, vec_id AS c, sub AS pv FROM subs WHERE vec_id < $pqK),
       |$pqLloyd,
       |${pqAssign("codes", s"p$iters")},
       |qres AS (SELECT q.vec_id, q.cid, list_transform(range(1, 65), i -> u.uv[i] - c.cuv[i]) AS qrv
       |  FROM pf q JOIN u ON u.vec_id = q.vec_id JOIN cu c ON c.cid = q.cid),
       |qsubs AS (SELECT vec_id, cid, j, list_slice(qrv, j*$subDim+1, j*$subDim+$subDim) AS sub
       |  FROM qres, range(0, $m) t(j)),
       |perj AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, nc.j,
       |    ${l2("qs.sub", "p.pv")} AS dist
       |  FROM pf q
       |  JOIN af a ON a.cid = q.cid AND a.vec_id <> q.vec_id
       |  JOIN codes nc ON nc.vec_id = a.vec_id
       |  JOIN qsubs qs ON qs.vec_id = q.vec_id AND qs.cid = q.cid AND qs.j = nc.j
       |  JOIN p$iters p ON p.j = nc.j AND p.c = nc.c),
       |adc AS (SELECT query_id, neighbor_id,
       |    list_reduce(list(dist ORDER BY j), (acc, x) -> acc + x) AS adc
       |  FROM perj GROUP BY query_id, neighbor_id),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id ASC) AS r FROM adc) WHERE r <= $shortlist),
       |sc AS (SELECT query_id, neighbor_id, ${SharedSql.ivfDot("x.v", "y.v")} / (x.nrm*y.nrm) AS cos
       |  FROM short JOIN n x ON x.vec_id = query_id JOIN n y ON y.vec_id = neighbor_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** DuckDB mirror of [[Ann.ivfpqOpq]]: [[ivfpqOracleSql]] with the
    * OPQ variance-balancing dimension allocation applied before PQ —
    * per-dimension variance as the EXACT integer n·Σq² − (Σq)² over
    * 2²⁰-scaled components (trunc == Spark's double→long cast),
    * ranked DESC with index tiebreak, snake-dealt across the m
    * subspaces, and the resulting 1-based permutation applied to
    * every unit vector before the subspace slicing. Everything
    * downstream (seeds, Lloyd, codes, ADC, shortlist, exact re-rank)
    * is the s04 oracle verbatim over the permuted frame.
    */
  private def ivfpqOpqOracleSql(nCentroids: Int, nProbe: Int, k: Int,
      m: Int = 8, pqK: Int = 16, shortlist: Int = 64,
      iters: Int = 2): String = {
    val subDim = 64 / m
    def l2(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${subDim + 1}), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (acc, x) -> acc + x)"
    def pqAssign(out: String, cb: String) =
      s"""$out AS (SELECT * FROM (
         |  SELECT s.vec_id, s.j, s.sub, p.c,
         |    ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.j
         |      ORDER BY ${l2("s.sub", "p.pv")} ASC, p.c ASC) AS rn
         |  FROM subs s JOIN $cb p ON p.j = s.j) WHERE rn = 1)""".stripMargin
    val pqLloyd = (1 to iters).map { t =>
      s"""${pqAssign(s"pa$t", s"p${t - 1}")},
         |pm$t AS (SELECT j, c, i AS pos,
         |    CAST(SUM(CAST(trunc(sub[i]*1099511627776) AS HUGEINT)) AS DOUBLE)/1099511627776/COUNT(*) AS comp
         |  FROM pa$t, range(1, ${subDim + 1}) t(i) GROUP BY j, c, i),
         |pg$t AS (SELECT j, c, list(comp ORDER BY pos) AS pv FROM pm$t GROUP BY j, c),
         |p$t AS (SELECT p.j, p.c, COALESCE(g.pv, p.pv) AS pv
         |  FROM p${t - 1} p LEFT JOIN pg$t g ON g.j = p.j AND g.c = p.c)""".stripMargin
    }.mkString(",\n")
    s"""${SharedSql.ivfTrainSql(nCentroids, iters)},
       |${SharedSql.ivfAssign("pf", s"c$iters", s"rn <= $nProbe", " WHERE n.vec_id < 20")},
       |u0 AS (SELECT vec_id, list_transform(range(1, 65), i -> v[i]/nrm) AS uv FROM n),
       |qz AS (SELECT vec_id, list_transform(uv, x -> CAST(trunc(x*1048576) AS BIGINT)) AS qv FROM u0),
       |vs AS (SELECT i, COUNT(*) AS cnt, SUM(CAST(qv[i] AS HUGEINT)) AS sm,
       |    SUM(CAST(qv[i] AS HUGEINT)*qv[i]) AS sq
       |  FROM qz, range(1, 65) t(i) GROUP BY i),
       |alloc AS (SELECT i, ROW_NUMBER() OVER (ORDER BY (cnt*sq - sm*sm) DESC, i ASC) - 1 AS r FROM vs),
       |ga AS (SELECT i, CASE WHEN ((r // $m) % 2) = 0 THEN r % $m ELSE $m - 1 - (r % $m) END AS grp, r FROM alloc),
       |perm AS (SELECT list(i ORDER BY grp, r) AS p FROM ga),
       |u AS (SELECT vec_id, list_transform(range(1, 65), i -> uv[p[i]]) AS uv FROM u0 CROSS JOIN perm),
       |subs AS (SELECT vec_id, j, list_slice(uv, j*$subDim+1, j*$subDim+$subDim) AS sub
       |  FROM u, range(0, $m) t(j)),
       |p0 AS (SELECT j, vec_id AS c, sub AS pv FROM subs WHERE vec_id < $pqK),
       |$pqLloyd,
       |${pqAssign("codes", s"p$iters")},
       |perj AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id, nc.j,
       |    ${l2("qs.sub", "p.pv")} AS dist
       |  FROM pf q
       |  JOIN af a ON a.cid = q.cid AND a.vec_id <> q.vec_id
       |  JOIN codes nc ON nc.vec_id = a.vec_id
       |  JOIN subs qs ON qs.vec_id = q.vec_id AND qs.j = nc.j
       |  JOIN p$iters p ON p.j = nc.j AND p.c = nc.c),
       |adc AS (SELECT query_id, neighbor_id,
       |    list_reduce(list(dist ORDER BY j), (acc, x) -> acc + x) AS adc
       |  FROM perj GROUP BY query_id, neighbor_id),
       |short AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adc ASC, neighbor_id ASC) AS r FROM adc) WHERE r <= $shortlist),
       |sc AS (SELECT query_id, neighbor_id, ${SharedSql.ivfDot("x.v", "y.v")} / (x.nrm*y.nrm) AS cos
       |  FROM short JOIN n x ON x.vec_id = query_id JOIN n y ON y.vec_id = neighbor_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  // s19 — OPQ-allocated IVF-PQ (Ge et al. CVPR'13 eigenvalue
  // allocation restricted to the coordinate basis — the rotation is
  // the variance-balancing permutation; the PCA basis in front of it
  // is iterative float linear algebra no SQL oracle reproduces
  // bit-for-bit, and the restriction is documented in the operator):
  // the fixed m×k code budget stops being spent on whatever
  // CONTIGUOUS dimension slices the storage order happened to create
  // — the pathological case (all high-variance dims in one subspace,
  // one subquantizer drowning while seven idle) is exactly what the
  // snake deal dismantles. Permutations are orthonormal, so ADC
  // ranking semantics are unchanged and the exact-cosine re-rank
  // keeps reported scores exact either way; recon-error dominance on
  // a planted anisotropic corpus is spec-pinned. ORACLE-GATED end to
  // end: the SQL derives the identical permutation from exact integer
  // variance ranks, then retrains both codebooks over the permuted
  // frame (the s04/s18 recipe).
  val s19: Q = q("s19_ann_opq",
    ivfpqOpqOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    Ann.ivfpqOpq(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s19_rot — the FULL OPQ rotation (Ann.ivfpqOpqRotated): the PCA
  // basis in front of the allocation, the restriction the registered
  // s19 documents. ROWS-ONLY by contract: the basis comes from
  // iterative float eigendecomposition (power iteration + deflation,
  // driver-bounded 64×64 math over an integer-exact covariance) —
  // deterministic run to run, but with no bit-stable DuckDB mirror.
  // Pinned in ScalaTest: exact orthonormality, run-to-run stability,
  // recon-error dominance over allocation-only on a rotated-
  // anisotropy corpus (where coordinate variances are uniform and the
  // allocation has nothing to grab), and serve-path soundness via the
  // exact re-rank.
  val s19rot: Q = rowsOnly("s19_ann_opq_rot") { c =>
    Ann.ivfpqOpqRotated(c.embeddings.filter(col("vec_id") < 20),
        c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  /** DuckDB mirror of [[Ann.nswSearch]]: the same adaptive-k
    * assignment (kmeansAutoTrainSql → kaf), the same symmetrized
    * occupancy-held k-NN graph, per-cluster min-id entry points, and
    * the beam walk REPLAYED hop by hop as generated CTE steps —
    * expand the beam's neighbors, anti-join the visited set, score
    * only fresh nodes, re-cut the beam on (µ-cosine DESC, node).
    * Rankings compare integer µ-cosines (CAST(round(cos*1e6) AS
    * BIGINT)), so beam membership is bit-identical across engines;
    * reported cosines are the exact strict-fold doubles.
    */
  private def nswOracleSql(k: Int, graphK: Int, beam: Int,
      hops: Int): String = {
    val cosQ = s"${SharedSql.ivfDot("q.qv", "n.v")} / (q.qn*n.nrm)"
    val hopCtes = (1 to hops).map { t =>
      s"""e$t AS (SELECT DISTINCT f.query_id, g.b AS node
         |  FROM f${t - 1} f JOIN g ON g.a = f.node),
         |fr$t AS (SELECT e.query_id, e.node FROM e$t e
         |  LEFT JOIN v${t - 1} v ON v.query_id = e.query_id AND v.node = e.node
         |  WHERE v.node IS NULL),
         |sc$t AS (SELECT query_id, node, cos,
         |    CAST(round(cos*1000000, 0) AS BIGINT) AS cosu
         |  FROM (SELECT q.query_id, fr.node, $cosQ AS cos
         |        FROM fr$t fr JOIN kaf n ON n.vec_id = fr.node
         |        JOIN q20 q ON q.query_id = fr.query_id)),
         |v$t AS (SELECT * FROM v${t - 1} UNION ALL SELECT * FROM sc$t),
         |f$t AS (SELECT query_id, node FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosu DESC, node ASC) AS rn FROM v$t)
         |  WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    s"""${SharedSql.kmeansAutoTrainSql()},
       |g0 AS (SELECT q.vec_id AS qid, a.vec_id AS nb,
       |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${SharedSql.ivfDot("q.v", "a.v")} / (q.nrm*a.nrm) DESC,
       |        a.vec_id ASC) AS rn
       |  FROM kaf q JOIN kaf a ON a.cid = q.cid AND a.vec_id <> q.vec_id),
       |ge AS (SELECT qid AS a, nb AS b FROM g0 WHERE rn <= $graphK),
       |g AS (SELECT DISTINCT a, b FROM
       |  (SELECT a, b FROM ge UNION ALL SELECT b AS a, a AS b FROM ge)),
       |en AS (SELECT DISTINCT node FROM (
       |  SELECT MIN(vec_id) AS node FROM kaf GROUP BY cid
       |  UNION ALL SELECT MAX(vec_id) AS node FROM kaf GROUP BY cid)),
       |q20 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
       |  FROM kaf WHERE vec_id < 20),
       |v0 AS (SELECT query_id, node, cos,
       |    CAST(round(cos*1000000, 0) AS BIGINT) AS cosu
       |  FROM (SELECT q.query_id, en.node, $cosQ AS cos
       |        FROM q20 q CROSS JOIN en JOIN kaf n ON n.vec_id = en.node)),
       |f0 AS (SELECT query_id, node FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cosu DESC, node ASC) AS rn FROM v0)
       |  WHERE rn <= $beam),
       |$hopCtes
       |SELECT query_id, CAST(rn AS INT) AS rank, node AS neighbor_id,
       |  ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosu DESC, node ASC) AS rn
       |  FROM v$hops WHERE node <> query_id)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
  }

  // s20 — GRAPH-BASED ANN: IVF-seeded NSW beam search (Ann.nswSearch
  // — the graph-traversal regime of HNSW/Vamana, the one ANN family
  // the IVF stack lacked; single-layer NSW with the coarse quantizer
  // as the seeding device in place of HNSW's upper layers — the
  // hierarchy IS a seeder, the layer-0 beam walk is this algorithm,
  // and the restriction is documented in the operator). Navigation
  // edges = the occupancy-held k-NN graph symmetrized; seeding costs
  // nq × (n/occupancy) entry scores — exactly s03's coarse-probe
  // shape; each hop is a frontier equi-join into the edge list + an
  // anti-join against visited, beam-bounded per query. Beam
  // membership ranks on integer µ-cosines with node tie-breaks, so
  // the traversal is a pure function of the input and the oracle
  // replays it hop by hop (generated CTEs, the ivfTrainSql recipe).
  val s20: Q = q("s20_ann_nsw",
    nswOracleSql(k = 5, graphK = 3, beam = 8, hops = 3)) { c =>
    Ann.nswSearch(c.embeddings.filter(col("vec_id") < 20), c.embeddings,
        k = 5, graphK = 3, beam = 8, hops = 3)
      .orderBy("query_id", "rank")
  }

  /** DuckDB mirror of [[Ann.hnswSearch]]: the s20 replay machinery
    * GENERALIZED over the layer stack — the same adaptive-k layer-0
    * assignment (kaf) and symmetrized graph, plus one
    * kmeansSubsetTrainSql + graph per upper layer over the
    * deterministic geometric sample (the golden-ratio-over-prime
    * predicate both engines compute), the exhaustive top-layer entry
    * set, and one generated beam-walk block per layer whose final
    * beam CTE seeds the next layer down. Every ranking is (µ-cosine
    * DESC, node ASC), so the whole descent is bit-replayable.
    */
  private def hnswOracleSql(k: Int, graphK: Int, beam: Int, hops: Int,
      levels: Int, decay: Int): String = {
    def pred(l: Int): String =
      s"((vec_id % 1000000) * 2654435761) % 1000003 * ${math.pow(decay.toDouble, l.toDouble).toLong} < 1000003"
    // symmetrized occupancy-held kNN graph over one layer's final
    // assignment — the nswOracleSql g-chain, prefixed
    def graphCtes(p: String, kaf: String): String =
      s"""${p}gr AS (SELECT q.vec_id AS qid, a.vec_id AS nb,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${SharedSql.ivfDot("q.v", "a.v")} / (q.nrm*a.nrm) DESC,
         |        a.vec_id ASC) AS rn
         |  FROM $kaf q JOIN $kaf a ON a.cid = q.cid AND a.vec_id <> q.vec_id),
         |${p}ge AS (SELECT qid AS a, nb AS b FROM ${p}gr WHERE rn <= $graphK),
         |${p}g AS (SELECT DISTINCT a, b FROM
         |  (SELECT a, b FROM ${p}ge UNION ALL SELECT b AS a, a AS b FROM ${p}ge))""".stripMargin
    val cosQ = s"${SharedSql.ivfDot("q.qv", "n.v")} / (q.qn*n.nrm)"
    // one layer's beam walk: entries (query_id, node) scored into v0,
    // then `hops` expand/anti-join/score/re-cut steps — nswOracleSql's
    // hop chain, prefixed and seeded from an arbitrary entry CTE
    def walkCtes(p: String, g: String, entries: String): String = {
      val hopSteps = (1 to hops).map { t =>
        s"""${p}e$t AS (SELECT DISTINCT f.query_id, g.b AS node
           |  FROM ${p}f${t - 1} f JOIN $g g ON g.a = f.node),
           |${p}fr$t AS (SELECT e.query_id, e.node FROM ${p}e$t e
           |  LEFT JOIN ${p}v${t - 1} v ON v.query_id = e.query_id AND v.node = e.node
           |  WHERE v.node IS NULL),
           |${p}sc$t AS (SELECT query_id, node, cos,
           |    CAST(round(cos*1000000, 0) AS BIGINT) AS cosu
           |  FROM (SELECT q.query_id, fr.node, $cosQ AS cos
           |        FROM ${p}fr$t fr JOIN kaf n ON n.vec_id = fr.node
           |        JOIN q20 q ON q.query_id = fr.query_id)),
           |${p}v$t AS (SELECT * FROM ${p}v${t - 1} UNION ALL SELECT * FROM ${p}sc$t),
           |${p}f$t AS (SELECT query_id, node FROM (
           |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY cosu DESC, node ASC) AS rn FROM ${p}v$t)
           |  WHERE rn <= $beam)""".stripMargin
      }.mkString(",\n")
      s"""${p}v0 AS (SELECT query_id, node, cos,
         |    CAST(round(cos*1000000, 0) AS BIGINT) AS cosu
         |  FROM (SELECT q.query_id, e.node, $cosQ AS cos
         |        FROM $entries e JOIN kaf n ON n.vec_id = e.node
         |        JOIN q20 q ON q.query_id = e.query_id)),
         |${p}f0 AS (SELECT query_id, node FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cosu DESC, node ASC) AS rn FROM ${p}v0)
         |  WHERE rn <= $beam),
         |$hopSteps""".stripMargin
    }
    val layerTrains = (1 to levels).map { l =>
      SharedSql.kmeansSubsetTrainSql(s"l$l", pred(l)) + ",\n" +
        graphCtes(s"l$l", s"l${l}kaf")
    }.mkString(",\n")
    val descent = (levels to 1 by -1).map { l =>
      val entries = if (l == levels) "tope" else s"w${l + 1}f$hops"
      walkCtes(s"w$l", s"l${l}g", entries)
    }.mkString(",\n")
    val sql = s"""${SharedSql.kmeansAutoTrainSql()},
       |${graphCtes("", "kaf")},
       |$layerTrains,
       |q20 AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
       |  FROM kaf WHERE vec_id < 20),
       |tope AS (SELECT q.query_id, t.vec_id AS node
       |  FROM q20 q CROSS JOIN (SELECT vec_id FROM n WHERE ${pred(levels)}) t),
       |$descent,
       |${walkCtes("w0", "g", s"w1f$hops")}
       |SELECT query_id, CAST(rn AS INT) AS rank, node AS neighbor_id,
       |  ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cosu DESC, node ASC) AS rn
       |  FROM w0v$hops WHERE node <> query_id)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin
    // MATERIALIZE every CTE: DuckDB inlines plain CTEs at each
    // reference, and this oracle's visited-set chains reference their
    // predecessors twice per hop — inlined, the shared train CTEs
    // re-expand exponentially (measured: the file-handle limit blows
    // before the plan finishes). Materialization is semantically
    // identical; it only pins evaluate-once.
    sql.replaceAll("""(?m)^(\s*)(\w+) AS \(""", "$1$2 AS MATERIALIZED (")
      .replace("WITH e AS (", "WITH e AS MATERIALIZED (")
  }

  // s21 — HIERARCHICAL graph ANN (Ann.hnswSearch — the full HNSW
  // shape, closing s20's documented single-layer restriction): nested
  // deterministic geometric layers (golden-ratio hash over a prime
  // modulus — both engines compute the same ~1/4^ℓ sample), each with
  // its own occupancy-held symmetrized kNN graph, searched by DESCENT
  // — exhaustive entry at the constant-sized top layer, beam-walk,
  // carry the best beam down as the next layer's entries, finish with
  // the layer-0 walk. Entry quality now comes from progressively
  // denser graphs instead of s20's per-cell extremal-id seeds (the
  // two-blob-per-cell case is spec-pinned WITHOUT the two-seed
  // workaround). `levels` is the corpus dial (≈ log₄(n/minTop) keeps
  // the top layer constant-sized); the oracle replays the whole
  // descent layer by layer, hop by hop.
  val s21: Q = q("s21_ann_hnsw",
    hnswOracleSql(k = 5, graphK = 3, beam = 8, hops = 3,
      levels = 2, decay = 4)) { c =>
    Ann.hnswSearch(c.embeddings.filter(col("vec_id") < 20), c.embeddings,
        k = 5, graphK = 3, beam = 8, hops = 3, levels = 2, decay = 4)
      .orderBy("query_id", "rank")
  }

  private def ivfOracleSql(nCentroids: Int, nProbe: Int, k: Int,
      iters: Int = 2): String =
    s"""${SharedSql.ivfTrainSql(nCentroids, iters)},
       |${SharedSql.ivfAssign("pf", s"c$iters", s"rn <= $nProbe", " WHERE n.vec_id < 20")},
       |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
       |       FROM pf p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.vec_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  // s03 — IVF-bucketed approximate top-5. Oracle-gated since round
  // 11: the DuckDB oracle RETRAINS the codebook (ivfOracleSql) and
  // the full approximate result hash-compares; recall vs s01 stays
  // pinned in ScalaTest.
  /** s10's oracle: the s03 skeleton with the label predicate joined
    * INTO the candidate set (label carried from the raw table; the
    * codebook retrains identically — same CTEs, same constants).
    */
  private def ivfFilteredOracleSql(nCentroids: Int, nProbe: Int, k: Int,
      iters: Int = 2): String =
    s"""${SharedSql.ivfTrainSql(nCentroids, iters)},
       |${SharedSql.ivfAssign("pf", s"c$iters", s"rn <= $nProbe", " WHERE n.vec_id < 20")},
       |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
       |       FROM pf p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.vec_id
       |       JOIN embeddings lq ON lq.vec_id = p.vec_id
       |       JOIN embeddings la ON la.vec_id = a.vec_id AND la.label = lq.label)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= $k ORDER BY query_id, rank""".stripMargin

  // s10 — FILTERED vector search (the vector-store metadata-filter
  // feature: tenant isolation, language-scoped retrieval): top-k
  // cosine among corpus vectors sharing the query's label, with the
  // predicate pushed INTO the candidate equi-join key (cluster AND
  // label) — candidates shrink by the label's selectivity BEFORE any
  // cosine is computed; post-filtering a plain top-k both
  // over-scores and under-returns. Oracle retrains the codebook in
  // SQL (s03's machinery) and mirrors the label join.
  val s10: Q = q("s10_ann_filtered",
    ivfFilteredOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    Ann.ivfFiltered(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s11 — ANN RECALL EVALUATION (index-quality monitoring, the
  // metric every production vector deployment tracks before turning
  // a probe dial): recall@5 of the IVF index against brute-force
  // ground truth, per query plus the corpus roll-up (query_id = -1).
  // Both rankings run IN the same plan — truth is s01's exact top-k,
  // approx is s03's probed top-k — and the compare is a left-semi
  // join on (query_id, neighbor_id), so the eval costs one extra
  // k-bounded join over what the two searches already cost. The
  // roll-up divides INTEGER hit/k sums once (no double summation
  // order to disagree on). Oracle: the retrained-codebook recipe
  // (ivfTrainSql) re-derives the identical approx ranking in SQL,
  // brute in SQL, and recomputes the same recall arithmetic.
  val s11: Q = q("s11_ann_recall_eval",
    s"""${SharedSql.ivfTrainSql(nCentroids = 16)},
       |${SharedSql.ivfAssign("pf", "c2", "rn <= 4", " WHERE n.vec_id < 20")},
       |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
       |       FROM pf p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.vec_id),
       |ak AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rn FROM sc) WHERE rn <= 5),
       |bp AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("q.v", "a.v")} / (q.nrm*a.nrm) AS cos
       |       FROM n q JOIN n a ON q.vec_id < 20 AND a.vec_id <> q.vec_id),
       |bk AS (SELECT query_id, neighbor_id FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rn FROM bp) WHERE rn <= 5),
       |per AS (SELECT b.query_id, COUNT(a.neighbor_id) AS hits, COUNT(*) AS k
       |  FROM bk b LEFT JOIN ak a
       |    ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id
       |  GROUP BY b.query_id)
       |SELECT query_id, CAST(hits AS INT) AS n_hits,
       |  ROUND(CAST(hits AS DOUBLE) / k, 6) AS recall FROM per
       |UNION ALL
       |SELECT -1 AS query_id, CAST(SUM(hits) AS INT) AS n_hits,
       |  ROUND(CAST(SUM(hits) AS DOUBLE) / SUM(k), 6) AS recall FROM per
       |ORDER BY query_id""".stripMargin) { c =>
    val queries = c.embeddings.filter(col("vec_id") < 20)
    val truth = Ann.brute(queries, c.embeddings, k = 5)
      .select("query_id", "neighbor_id")
    val approx = Ann.ivf(queries, c.embeddings, k = 5)
      .select("query_id", "neighbor_id")
    val per = truth
      .join(approx.withColumn("hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("hit"), lit(0))).as("hits"), count(lit(1)).as("k"))
    per.select(col("query_id"), col("hits").cast("int").as("n_hits"),
        round(col("hits").cast("double") / col("k"), 6).as("recall"))
      .unionByName(per.agg(sum("hits").as("h"), sum("k").as("kk"))
        .select(lit(-1L).as("query_id"), col("h").cast("int").as("n_hits"),
          round(col("h").cast("double") / col("kk"), 6).as("recall")))
      .orderBy("query_id")
  }

  /** DuckDB mirror of [[Ann.mmrRerank]]: the greedy MMR trajectory
    * unrolled as one CTE chain per trip. The λ and 1−λ literals are
    * interpolated FROM the Scala doubles (1.0−0.7 is
    * 0.30000000000000004 in IEEE — writing "0.3" would diverge at
    * the 17th digit and eventually flip an argmax), and every compare
    * key is ROUND(,6) so the greedy trajectory is reproducible.
    */
  private def mmrOracleSql(k: Int, shortlist: Int, lam: Double): String = {
    val steps = (2 to k).map { t =>
      s"""ms$t AS (SELECT p.query_id, p.a AS neighbor_id, MAX(p.sim) AS max_sim
         |  FROM pair p JOIN sel${t - 1} s
         |    ON s.query_id = p.query_id AND s.neighbor_id = p.b
         |  GROUP BY p.query_id, p.a),
         |c$t AS (SELECT c.query_id, c.neighbor_id,
         |    ROUND($lam * c.rel - ${1.0 - lam} * m.max_sim, 6) AS score
         |  FROM cand c JOIN ms$t m
         |    ON m.query_id = c.query_id AND m.neighbor_id = c.neighbor_id
         |  WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
         |    WHERE s.query_id = c.query_id AND s.neighbor_id = c.neighbor_id)),
         |st$t AS (SELECT query_id, neighbor_id, $t AS rank, score FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS rn FROM c$t) WHERE rn = 1),
         |sel$t AS (SELECT query_id, neighbor_id FROM sel${t - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM st$t)""".stripMargin
    }.mkString(",\n")
    val union = (1 to k)
      .map(t => s"SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, score FROM st$t")
      .mkString("\nUNION ALL ")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
       |bp AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("q.v", "c.v")} / (q.nrm*c.nrm) AS cos
       |       FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
       |cand AS (SELECT query_id, neighbor_id, ROUND(cos, 6) AS rel FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, neighbor_id) AS rn FROM bp) WHERE rn <= $shortlist),
       |pair AS (SELECT x.query_id, x.neighbor_id AS a, y.neighbor_id AS b,
       |    ROUND(${SharedSql.ivfDot("va.v", "vb.v")} / (va.nrm*vb.nrm), 6) AS sim
       |  FROM cand x JOIN cand y
       |    ON y.query_id = x.query_id AND y.neighbor_id <> x.neighbor_id
       |  JOIN n va ON va.vec_id = x.neighbor_id
       |  JOIN n vb ON vb.vec_id = y.neighbor_id),
       |st1 AS (SELECT query_id, neighbor_id, 1 AS rank, rel AS score FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY rel DESC, neighbor_id) AS rn FROM cand) WHERE rn = 1),
       |sel1 AS (SELECT query_id, neighbor_id FROM st1),
       |$steps
       |$union
       |ORDER BY query_id, rank""".stripMargin
  }

  // s12 — MMR DIVERSITY re-ranking (Carbonell & Goldstein '98 —
  // the standard RAG redundancy fix: the raw top-k is five
  // paraphrases of one passage; MMR greedily trades relevance
  // against similarity to what's already picked). Sequential only in
  // k: the corpus-sized work is the one shortlist retrieval, every
  // greedy trip is shortlist-bounded and distributed ACROSS queries.
  // ORACLE-GATED on the full greedy trajectory (ranks AND scores) —
  // the SQL unrolls the k−1 trips as CTEs from the same constants.
  val s12: Q = q("s12_mmr_diversify",
    mmrOracleSql(k = 5, shortlist = 12, lam = 0.7)) { c =>
    Ann.mmrRerank(c.embeddings.filter(col("vec_id") < 20), c.embeddings,
        k = 5, shortlist = 12, lam = 0.7)
      .orderBy("query_id", "rank")
  }

  // s13 — SQ8 SERVING (Ann.sq8Serve): top-k inner product over the
  // int8-quantized corpus with ASYMMETRIC distance — x26 builds the
  // SQ8 index, this is the retrieval that runs against it. The
  // corpus side of the join carries ONLY its uint8 codes (1 byte/dim:
  // the 4-8× scan-IO cut over float/double IS the serving feature at
  // 100 TB), and the per-query affine algebra
  //   ip = Σ q·mn + Σ (q·span/255)·code
  // folds reconstruction into one broadcast constant + one
  // integer-weighted strict-fold dot product — no dequantized vector
  // ever materializes. ORACLE-GATED end to end: the SQL rebuilds the
  // same per-dim (mn, span), the same exact integer codes, and the
  // same two left-fold dot products, so every rank hash-compares;
  // ADC-vs-exact recall is additionally pinned in LlmOpsSpec.
  val s13: Q = q("s13_ann_sq8",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |c2 AS (SELECT vec_id, unnest(range(1, 65)) AS i, v FROM e),
      |c3 AS (SELECT vec_id, i, v[i] AS x FROM c2),
      |st AS (SELECT i, MIN(x) AS mn, MAX(x) - MIN(x) AS span FROM c3 GROUP BY i),
      |sta AS (SELECT list(mn ORDER BY i) AS mns, list(span ORDER BY i) AS spans FROM st),
      |cd AS (SELECT vec_id, list_transform(range(1, 65),
      |         i -> CASE WHEN spans[i] = 0 THEN 0
      |                   ELSE LEAST(255, GREATEST(0, CAST(floor(((v[i] - mns[i]) * 255.0) / spans[i] + 0.5) AS INT))) END) AS codes
      |       FROM e, sta),
      |q AS (SELECT vec_id AS query_id,
      |        list_reduce(list_transform(range(1, 65), i -> v[i] * mns[i]), (a, x) -> a + x) AS qc,
      |        list_transform(range(1, 65), i -> (v[i] * spans[i]) / 255.0) AS qs
      |      FROM e, sta WHERE vec_id < 20),
      |p AS (SELECT query_id, c.vec_id AS neighbor_id,
      |        qc + list_reduce(list_transform(range(1, 65), i -> qs[i] * codes[i]), (a, x) -> a + x) AS ip
      |      FROM q JOIN cd c ON c.vec_id <> query_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(ip, 6) AS adc_ip
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rn FROM p)
      |WHERE rn <= 5 ORDER BY query_id, rank""") { c =>
    Ann.sq8Serve(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  val s03: Q = q("s03_ann_ivf",
    ivfOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    Ann.ivf(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s04 — IVF-PQ: coarse probe bounds WHICH rows, product-quantized
  // asymmetric distance (m table lookups/row over dim/m-times smaller
  // codes) bounds WORK PER ROW; exact cosine re-ranks the ADC
  // shortlist. Oracle-gated since round 11: the oracle retrains BOTH
  // codebooks in SQL (ivfpqOracleSql) and hash-compares the full
  // result; recall + determinism vs brute stay in ScalaTest.
  val s04: Q = q("s04_ann_ivfpq",
    ivfpqOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    Ann.ivfpq(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s18 — RESIDUAL IVF-PQ (the full FAISS IVFPQ shape — closes the
  // trade s04's docstring prices: codes spend their resolution on the
  // residual the coarse index hasn't explained, ~1 extra effective
  // bit/dim; ADC tables become per-(query, probed cluster), nProbe
  // config-sized builds instead of one). Same probe bound, shortlist,
  // and exact re-rank as s04; oracle retrains coarse + residual-PQ
  // codebooks in SQL (ivfpqResidualOracleSql) and hash-compares every
  // rank. Recon-error dominance over direct coding is spec-pinned.
  val s18: Q = q("s18_ann_ivfpq_residual",
    ivfpqResidualOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    Ann.ivfpqResidual(c.embeddings.filter(col("vec_id") < 20),
        c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s05 — k-NN GRAPH: every vector's top-3 neighbors with IVF-bounded
  // candidates (the self-query form of s03 — an exact graph is
  // all-pairs by definition, so the probe bound IS the operator).
  // Oracle-gated since round 11 via the retrained-codebook recipe
  // (every vector probes its 4 nearest lists); recall vs the brute
  // graph + cosine exactness stay pinned in LlmOpsSpec.
  // COMPARE-SCALE DIAL: 16 fixed centroids — quadratic within-cluster
  // as n grows; at warehouse scale use s05_auto / Ann.knnGraphAuto
  // (README "Scale dials").
  val s05: Q = q("s05_knn_graph",
    s"""${SharedSql.ivfTrainSql(nCentroids = 16)},
       |${SharedSql.ivfAssign("pf", "c2", "rn <= 4")},
       |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
       |       FROM pf p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.vec_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { c =>
    Ann.knnGraph(c.embeddings, k = 3)
      .orderBy("query_id", "rank")
  }

  // s06 — exact MIPS top-5: raw inner-product retrieval for
  // unnormalized embedding stores (magnitude carries signal — cosine
  // is the wrong order there). Oracle-gated like s01: DuckDB computes
  // the same strict left-to-right dot products. The scale path is
  // Ann.mipsIvf — the order-exact [x, sqrt(M²−|x|²)] augmentation
  // reduces MIPS to cosine so the IVF machinery applies unchanged
  // (full-probe set-equality with this entry pinned in LlmOpsSpec).
  val s06: Q = q("s06_ann_mips",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        list_reduce(list_transform(range(1, 65), i -> q.v[i]*c.v[i]), (acc, x) -> acc + x) AS ip
      |      FROM e q JOIN e c ON q.vec_id < 20 AND c.vec_id <> q.vec_id)
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(ip, 6) AS inner_product
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id) AS rn FROM p)
      |WHERE rn <= 5 ORDER BY query_id, rank""") { c =>
    Ann.bruteMips(c.embeddings.filter(col("vec_id") < 20), c.embeddings, k = 5)
      .orderBy("query_id", "rank")
  }

  // s05 AUTO — occupancy-held k-NN graph (k ∝ n via the DataFrame-
  // native k-means, routed assignment past RouteThreshold): the
  // fixed-16-centroid graph's within-cluster work is quadratic at
  // fixed k (10× probe ratio ~9-16); this dial keeps candidate
  // volume ~n·occupancy. Oracle-gated since round 11 via the
  // adaptive-k retrained codebook (single-probe: each vector scores
  // only its own cluster); planted-neighbor recall and the routed
  // k > RouteThreshold contracts stay pinned in LlmOpsSpec.
  val s05auto: Q = q("s05_knn_graph_auto",
    s"""${SharedSql.kmeansAutoTrainSql()},
       |sc AS (SELECT q.vec_id AS query_id, a.vec_id AS neighbor_id,
       |        ${SharedSql.ivfDot("q.v", "a.v")} / (q.nrm*a.nrm) AS cos
       |       FROM kaf q JOIN kaf a ON a.cid = q.cid AND a.vec_id <> q.vec_id)
       |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
       |WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin) { c =>
    Ann.knnGraphAuto(c.embeddings, k = 3)
      .orderBy("query_id", "rank")
  }

  // s07 — HYBRID retrieval: BM25 (x19's leg, same dials) fused with
  // dense cosine (query = vec_id 0's embedding) by Reciprocal Rank
  // Fusion (Cormack et al., SIGIR'09; k=60) — the modern default for
  // combining lexical and vector search without score calibration.
  // Each leg keeps only its top-100 (TakeOrderedAndProject — no full
  // sort shuffle), so the fusion join and the rank windows run over
  // driver-bounded shortlists: the same rerank-a-shortlist shape as
  // IVF-PQ. RRF works on ranks alone, so both engines compute
  // IDENTICAL integers, the fused doubles agree exactly, and the
  // whole hybrid result hash-compares.
  val s07: Q = q("s07_hybrid_rrf",
    """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |dl AS (SELECT doc_id, len(t) AS dl FROM toks),
      |corpus AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
      |tf AS (SELECT doc_id, w, COUNT(*) AS tf
      |       FROM (SELECT doc_id, unnest(t) AS w FROM toks)
      |       WHERE w IN ('spark', 'vector', 'merge') GROUP BY 1, 2),
      |df AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY 1),
      |sc AS (SELECT doc_id,
      |         ln(1.0 + (n - df + 0.5)/(df + 0.5)) * (tf * 2.2) /
      |           (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))) AS s
      |       FROM tf JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus),
      |lex AS (SELECT doc_id, SUM(s) AS bm25 FROM sc GROUP BY doc_id),
      |lext AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(bm25, 6) DESC, doc_id) AS lrank
      |         FROM lex QUALIFY lrank <= 100),
      |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |nv AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
      |qv AS (SELECT v, nrm FROM nv WHERE vec_id = 0),
      |vec AS (SELECT c.vec_id AS doc_id,
      |          list_reduce(list_transform(range(1, 65), i -> qv.v[i]*c.v[i]), (a, x) -> a + x)
      |            / (qv.nrm*c.nrm) AS cos
      |        FROM nv c CROSS JOIN qv WHERE c.vec_id <> 0),
      |vect AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY ROUND(cos, 6) DESC, doc_id) AS vrank
      |         FROM vec QUALIFY vrank <= 100),
      |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |            CAST(l.lrank AS INT) AS lrank, CAST(v.vrank AS INT) AS vrank,
      |            COALESCE(1.0/(60 + l.lrank), 0) + COALESCE(1.0/(60 + v.vrank), 0) AS raw
      |          FROM lext l FULL JOIN vect v ON l.doc_id = v.doc_id)
      |SELECT doc_id, lrank, vrank, ROUND(raw, 6) AS rrf FROM fused
      |ORDER BY raw DESC, doc_id LIMIT 50""") { c =>
    import org.apache.spark.sql.expressions.{Window => W}
    // ranks order on the ROUNDED score (then doc_id): the raw doubles
    // are parallel sums whose last bits depend on summation order, so
    // a sub-1e-6 cross-engine divergence would flip a rank and break
    // the hash gate — ROUND(,6) absorbs it (same rule as x19)
    val lexTop = TextQueries.bm25Frame(c, Seq("spark", "vector", "merge"))
      .withColumn("bm25r", round(col("bm25"), 6))
      .orderBy(col("bm25r").desc, col("doc_id")).limit(100)
    // rank windows run over the ALREADY-limited 100-row shortlists —
    // the single-partition window is driver-bounded by construction
    val lext = lexTop
      .withColumn("lrank",
        row_number().over(W.orderBy(col("bm25r").desc, col("doc_id")))
          .cast(IntegerType))
      .select("doc_id", "lrank")
    val e = c.embeddings.select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", graft.functions.Vectors.norm(col("v")))
    val qv = e.filter(col("vec_id") === 0)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    val vecTop = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        graft.functions.Vectors.cosine(col("qv"), col("v"), col("qn"), col("nrm"))
          .as("cos"))
      .withColumn("cosr", round(col("cos"), 6))
      .orderBy(col("cosr").desc, col("doc_id")).limit(100)
    val vect = vecTop
      .withColumn("vrank",
        row_number().over(W.orderBy(col("cosr").desc, col("doc_id")))
          .cast(IntegerType))
      .select("doc_id", "vrank")
    val raw = coalesce(lit(1.0) / (lit(60) + col("lrank")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60) + col("vrank")), lit(0.0))
    lext.join(vect, Seq("doc_id"), "full")
      .withColumn("raw", raw)
      .orderBy(col("raw").desc, col("doc_id")).limit(50)
      .select(col("doc_id"), col("lrank"), col("vrank"),
        round(col("raw"), 6).as("rrf"))
  }

  // s08 — exact RADIUS (threshold) retrieval: every corpus vector
  // with cosine >= 0.35 of each query (vec_id < 8) — the recall-
  // complete mode where a top-k cutoff would silently truncate a
  // data-dependent answer set. One corpus pass scores all queries
  // (broadcast query side), the threshold filter is map-side, and —
  // unlike s01 — NO rank window runs at all. The filter lands on the
  // ROUNDED cosine so both engines decide boundary pairs identically
  // (the s07 ordering lesson applied to a predicate).
  val s08: Q = q("s08_range_search",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM e),
      |p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |        ROUND(list_reduce(list_transform(range(1, 65), i -> q.v[i]*c.v[i]), (acc, x) -> acc + x)
      |          / (q.nrm*c.nrm), 6) AS cosine
      |      FROM n q JOIN n c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
      |SELECT query_id, neighbor_id, cosine FROM p WHERE cosine >= 0.35
      |ORDER BY query_id, neighbor_id""") { c =>
    Ann.rangeSearch(c.embeddings.filter(col("vec_id") < 8), c.embeddings, 0.35)
      .orderBy("query_id", "neighbor_id")
  }

  // s09 — IVF TRAIN/SERVE split: the codebook is trained once (the
  // expensive corpus pass), persisted as a warehouse TABLE like any
  // other relation, and the probe runs against the RELOADED copy —
  // the deployment shape every production ANN system uses (you do
  // not retrain per query batch at 100 TB; you version the model).
  // Stored doubles round-trip parquet bit-exactly, so the served
  // probe must equal s03's train-session probe bitwise — which is
  // why it shares s03's retrained-codebook oracle verbatim: a serve
  // path that drifted from its training artifact is a wrong answer,
  // not a slow one.
  val s09: Q = q("s09_ann_ivf_served",
    ivfOracleSql(nCentroids = 16, nProbe = 4, k = 5)) { c =>
    val wh = graft.core.Warehouse.scratch(c.spark, "s09")
    Ann.saveCodebook(wh, "models", "ivf16",
      Ann.ivfCodebook(c.embeddings, nCentroids = 16, kmeansIters = 2))
    val served = Ann.loadCodebook(wh, "models", "ivf16")
    Ann.ivfServe(c.embeddings.filter(col("vec_id") < 20), c.embeddings,
        k = 5, served, nProbe = 4)
      .orderBy("query_id", "rank")
  }

  // s14 — VECTOR INDEX MAINTENANCE under upserts + deletes
  // (Ann.ivfIndexApply + ivfServeIndexed — merge-on-read applied to
  // the ANN index, the vector-store "collection update" feature):
  // every 7th vector is tombstoned, every 10th re-arrives with a NEW
  // embedding (circular shift — different direction, same id); the
  // upsert batch is (re)assigned against the FROZEN s09 codebook in
  // O(batch) — production never retrains per batch — and the live
  // index is base − (tombstoned ∪ upserted-old) + upserted-new, so
  // newest wins and an upsert after a delete REVIVES the id
  // (vec_id % 70 — present with the new vector, spec-pinned). The
  // base index is never rewritten; maintenance cost is the batch and
  // two id anti-joins. Serving probes the maintained frame as-is.
  // ORACLE-GATED: DuckDB retrains the same codebook, applies the
  // same shift/tombstone/revive algebra, and every rank
  // hash-compares. Plan note (Explain --audit reads 5 file scans):
  // each leg is a DIFFERENT pruned slice of embeddings — two id-only
  // projections (the anti-join sides), the vec_id<20 query slice
  // (filter pushed to the scan), the base assignment, and the %10
  // upsert batch; freezing a shared frame would undo exactly that
  // pushdown/pruning, so multi-leg is the right shape here.
  private val s14Ctes =
    s"""${SharedSql.ivfTrainSql(16)},
      |up AS (SELECT vec_id, list_concat(v[2:64], [v[1]]) AS v FROM e WHERE vec_id % 10 = 0),
      |upn AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm FROM up),
      |ua AS (SELECT * FROM (
      |  SELECT u.vec_id, u.v, u.nrm, c.cid,
      |    ROW_NUMBER() OVER (PARTITION BY u.vec_id
      |      ORDER BY ${SharedSql.ivfDot("u.v", "c.cv")} / c.ncv DESC, c.cid DESC) AS rn
      |  FROM upn u CROSS JOIN c2 c) WHERE rn = 1),
      |live AS (SELECT vec_id, v, nrm, cid FROM af
      |          WHERE vec_id % 7 <> 0 AND vec_id % 10 <> 0
      |         UNION ALL SELECT vec_id, v, nrm, cid FROM ua),
      |${SharedSql.ivfAssign("pf", "c2", "rn <= 4", " WHERE n.vec_id < 20")},
      |sc AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
      |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
      |       FROM pf p JOIN live a ON a.cid = p.cid AND a.vec_id <> p.vec_id)""".stripMargin

  private val s14OracleSql =
    s"""$s14Ctes
      |SELECT query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
      |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin

  val s14: Q = q("s14_ann_upsert", s14OracleSql) { c =>
    val cb = Ann.ivfCodebook(c.embeddings, nCentroids = 16, kmeansIters = 2)
    val upserts = c.embeddings.filter(col("vec_id") % 10 === 0)
      .withColumn("embedding",
        concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1)))
    val tomb = c.embeddings.filter(col("vec_id") % 7 === 0)
    val live = Ann.ivfIndexApply(
      Ann.assigned(c.embeddings, cb), upserts, tomb, cb)
    Ann.ivfServeIndexed(c.embeddings.filter(col("vec_id") < 20), live,
        k = 5, cb, nProbe = 4)
      .orderBy("query_id", "rank")
  }

  // s16 — INDEX COMPACTION (Ann.indexInit/Upsert/Delete/Live/Compact/
  // Vacuum — the lifecycle step that completes s14: the on-disk index
  // is an immutable base GENERATION plus seq-stamped log segments
  // under a versioned manifest; serving reads the merge-on-read live
  // view whose cost grows with the unfolded log tail, and COMPACT
  // materializes the live view as the NEXT generation and commits it
  // with one atomic manifest rename — m31/m17/m29's lakehouse
  // discipline applied to the vector index: crash at any point leaves
  // either the old committed view or the new one, never a truncated
  // base, and folded segments/superseded generations are swept by
  // indexVacuum (the m28 rule), not at commit time — which is what
  // keeps a reader racing the compaction on its pinned snapshot). The
  // registered entry runs the FULL lifecycle on disk: init gen 1,
  // tombstone %7 (seq 1), upsert %10 shifted (seq 2), compact to gen
  // 2, vacuum, then serve from the committed base alone — and because
  // compaction preserves the live view bit-for-bit, the result is
  // EXACTLY s14's maintained-view serving, so the entry shares s14's
  // retrained-codebook oracle verbatim (post-compaction serving
  // equality, oracle-enforced). The seq order additionally gives the
  // log upsert-then-delete semantics s14's one-shot algebra cannot
  // express (latest op wins — spec-pinned along with crash injection
  // at both commit stages and cross-compaction increment composition).
  val s16: Q = q("s16_ann_compact", s14OracleSql) { c =>
    val dir = graft.core.Scratch.dir("s16idx").toString
    val cb = Ann.ivfCodebook(c.embeddings, nCentroids = 16, kmeansIters = 2)
    Ann.indexInit(c.embeddings, cb, dir)
    Ann.indexDelete(
      c.embeddings.filter(col("vec_id") % 7 === 0).select("vec_id"),
      dir, seq = 1L)
    Ann.indexUpsert(c.embeddings.filter(col("vec_id") % 10 === 0)
        .withColumn("embedding",
          concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))),
      cb, dir, seq = 2L)
    Ann.indexCompact(c.spark, dir)
    Ann.indexVacuum(c.spark, dir)
    Ann.ivfServeIndexed(c.embeddings.filter(col("vec_id") < 20),
        Ann.indexBase(c.spark, dir), k = 5, cb, nProbe = 4)
      .orderBy("query_id", "rank")
  }

  // s17 — INDEX TIME TRAVEL (Ann.indexBaseAsOf — m29's AS-OF read
  // applied to the vector index, which the s16 versioned manifest
  // makes a metadata pin, not a restore): version 1 is the initial
  // corpus assignment, version 2 the post-(delete seq1, upsert seq2)
  // compaction; the entry serves the SAME queries against BOTH
  // committed snapshots and emits the union tagged by version —
  // "what did retrieval return before yesterday's index update"
  // answered from one dir with no second copy of the index. Version
  // resolution is TimeTravel.read's rule (latest manifest ≤ request,
  // O(manifest) metadata). ORACLE-GATED end to end by EXTENDING s14's
  // retrained-codebook chain: v1 serves from the raw full assignment
  // (af — the s03/s09 index), v2 from the maintained live view (sc —
  // s14's), both through the same probe CTE, so every rank of both
  // snapshots hash-compares. Retention contract (vacuum keeps latest
  // only → AS-OF reaches as far as the sweep cadence) is spec-pinned.
  private val s17OracleSql =
    s"""$s14Ctes,
      |sc1 AS (SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
      |        ${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) AS cos
      |       FROM pf p JOIN af a ON a.cid = p.cid AND a.vec_id <> p.vec_id),
      |r1 AS (SELECT 1 AS version, query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
      |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc1)
      |       WHERE rn <= 5),
      |r2 AS (SELECT 2 AS version, query_id, CAST(rn AS INT) AS rank, neighbor_id, ROUND(cos, 6) AS cosine
      |       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM sc)
      |       WHERE rn <= 5)
      |SELECT * FROM r1 UNION ALL SELECT * FROM r2
      |ORDER BY version, query_id, rank""".stripMargin
  val s17: Q = q("s17_index_asof", s17OracleSql) { c =>
    val dir = graft.core.Scratch.dir("s17idx").toString
    val cb = Ann.ivfCodebook(c.embeddings, nCentroids = 16, kmeansIters = 2)
    Ann.indexInit(c.embeddings, cb, dir)
    Ann.indexDelete(
      c.embeddings.filter(col("vec_id") % 7 === 0).select("vec_id"),
      dir, seq = 1L)
    Ann.indexUpsert(c.embeddings.filter(col("vec_id") % 10 === 0)
        .withColumn("embedding",
          concat(slice(col("embedding"), 2, 63), slice(col("embedding"), 1, 1))),
      cb, dir, seq = 2L)
    Ann.indexCompact(c.spark, dir)
    val q20 = c.embeddings.filter(col("vec_id") < 20)
    def serve(v: Int) =
      Ann.ivfServeIndexed(q20, Ann.indexBaseAsOf(c.spark, dir, v),
          k = 5, cb, nProbe = 4)
        .select(lit(v).as("version"), col("query_id"), col("rank"),
          col("neighbor_id"), col("cosine"))
    serve(1).unionByName(serve(2)).orderBy("version", "query_id", "rank")
  }

  // ---------------------------------------------------------------
  // s15 — BITEXT MINING via RATIO MARGIN (Artetxe & Schwenk 2019 —
  // the LASER/CCMatrix parallel-corpus miner, the curation op that
  // builds translation pairs from two monolingual embedding pools):
  // raw cosine over-selects hub vectors (points close to EVERYTHING
  // score high against everything), so each candidate (x, y) is
  // scored by cos(x,y) normalized by the mean of both sides' k-NN
  // cosines — a hub's inflated denominator cancels its inflated
  // cosines, and only pairs that are MUTUALLY unusual survive. Per
  // source vector the top-margin target is emitted. Determinism
  // discipline: cosines quantize to µ-units (round×1e6 → BIGINT)
  // before the top-4 sums, so the k-NN normalizers are exact integer
  // sums (no float fold order) and margin = cosµ·8/(xkµ+ykµ) is one
  // double division both engines compute identically — ORACLE-GATED
  // end to end. Scale shape: the bipartite product is bounded by
  // label selectivity (the target pool broadcasts), the k-NN
  // normalizers are rank-≤4 window sums over that same scored frame
  // (frozen once, three consumers); at corpus scale both the pair
  // candidates and the normalizers come from the s03 IVF shortlist —
  // the ANN-kNN margin CCMatrix runs — with this entry as the
  // exact-verification form.
  val s15: Q = q("s15_bitext_margin",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm, label FROM e),
      |x AS (SELECT vec_id AS src_id, v, nrm FROM n WHERE label = 0),
      |y AS (SELECT vec_id AS tgt_id, v, nrm FROM n WHERE label = 1),
      |sc AS (SELECT src_id, tgt_id,
      |        CAST(ROUND(${SharedSql.ivfDot("x.v", "y.v")} / (x.nrm*y.nrm) * 1000000) AS BIGINT) AS cosu
      |       FROM x JOIN y ON TRUE),
      |xk AS (SELECT src_id, SUM(cosu) AS xs FROM (
      |        SELECT src_id, cosu, ROW_NUMBER() OVER (PARTITION BY src_id
      |          ORDER BY cosu DESC, tgt_id) AS r FROM sc) t WHERE r <= 4
      |       GROUP BY src_id),
      |yk AS (SELECT tgt_id, SUM(cosu) AS ys FROM (
      |        SELECT tgt_id, cosu, ROW_NUMBER() OVER (PARTITION BY tgt_id
      |          ORDER BY cosu DESC, src_id) AS r FROM sc) t WHERE r <= 4
      |       GROUP BY tgt_id),
      |m AS (SELECT s.src_id, s.tgt_id, s.cosu,
      |        ROUND(s.cosu * 8.0 / (xk.xs + yk.ys), 6) AS margin
      |      FROM sc s JOIN xk USING (src_id) JOIN yk USING (tgt_id))
      |SELECT src_id, tgt_id, ROUND(cosu/1000000.0, 6) AS cosine, margin
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
      |        ORDER BY margin DESC, tgt_id) AS rn FROM m)
      |WHERE rn = 1 ORDER BY src_id""") { c =>
    Ann.bitextMargin(c.embeddings.filter(col("label") === 0),
        c.embeddings.filter(col("label") === 1), k = 4)
      .orderBy("src_id")
  }

  // s15_auto — the PRODUCTION dial of s15 (the ANN-kNN ratio margin
  // CCMatrix actually runs): candidates AND both k-NN normalizers
  // come from per-pool IVF shortlists — the source pool probes its 4
  // nearest lists of a codebook trained on the TARGET pool (forward:
  // candidate pairs + src normalizers) and vice versa (reverse: tgt
  // normalizers) — so the |src|·|tgt| crossJoin of the exact form
  // never appears; every join is an equi-join on the cluster key and
  // the per-pool codebooks hold occupancy (k = max(16, pool/256), the
  // d05/d10/s05 dial). Margin math is UNCHANGED (µ-quantized cosines,
  // integer top-4 sums, one double division), which is what keeps the
  // whole thing ORACLE-GATED: the SQL retrains BOTH pool codebooks
  // with the kmeansAutoTrainSql machinery (prefixed CTEs), probes,
  // scores, and margins identically. Equality with the exact s15 on a
  // shortlist-covering corpus is spec-pinned with the coverage
  // ASSERTED (LlmOpsSpec), hub demotion included.
  val s15auto: Q = q("s15_bitext_margin_auto",
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x*x), (a, x) -> a + x)) AS nrm, label FROM e),
      |${SharedSql.kmeansPoolTrainSql("s", label = 0)},
      |${SharedSql.kmeansPoolTrainSql("t", label = 1)},
      |xpf AS (SELECT * FROM (
      |    SELECT n.vec_id, n.v, n.nrm, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
      |        ORDER BY ${SharedSql.ivfDot("n.v", "c.cv")} / n.nrm DESC, c.cid ASC) AS rn
      |    FROM spn n CROSS JOIN tkc2 c) WHERE rn <= 4),
      |ypf AS (SELECT * FROM (
      |    SELECT n.vec_id, n.v, n.nrm, c.cid,
      |      ROW_NUMBER() OVER (PARTITION BY n.vec_id
      |        ORDER BY ${SharedSql.ivfDot("n.v", "c.cv")} / n.nrm DESC, c.cid ASC) AS rn
      |    FROM tpn n CROSS JOIN skc2 c) WHERE rn <= 4),
      |fwd AS (SELECT p.vec_id AS src_id, a.vec_id AS tgt_id,
      |        CAST(ROUND(${SharedSql.ivfDot("p.v", "a.v")} / (p.nrm*a.nrm) * 1000000) AS BIGINT) AS cosu
      |       FROM xpf p JOIN tkaf a ON a.cid = p.cid),
      |rev AS (SELECT a.vec_id AS src_id, p.vec_id AS tgt_id,
      |        CAST(ROUND(${SharedSql.ivfDot("a.v", "p.v")} / (a.nrm*p.nrm) * 1000000) AS BIGINT) AS cosu
      |       FROM ypf p JOIN skaf a ON a.cid = p.cid),
      |xk AS (SELECT src_id, SUM(cosu) AS xs FROM (
      |        SELECT src_id, cosu, ROW_NUMBER() OVER (PARTITION BY src_id
      |          ORDER BY cosu DESC, tgt_id) AS r FROM fwd) t WHERE r <= 4
      |       GROUP BY src_id),
      |yk AS (SELECT tgt_id, SUM(cosu) AS ys FROM (
      |        SELECT tgt_id, cosu, ROW_NUMBER() OVER (PARTITION BY tgt_id
      |          ORDER BY cosu DESC, src_id) AS r FROM rev) t WHERE r <= 4
      |       GROUP BY tgt_id),
      |m AS (SELECT f.src_id, f.tgt_id, f.cosu,
      |        ROUND(f.cosu * 8.0 / (xk.xs + yk.ys), 6) AS margin
      |      FROM fwd f JOIN xk USING (src_id) JOIN yk USING (tgt_id))
      |SELECT src_id, tgt_id, ROUND(cosu/1000000.0, 6) AS cosine, margin
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY src_id
      |        ORDER BY margin DESC, tgt_id) AS rn FROM m)
      |WHERE rn = 1 ORDER BY src_id""") { c =>
    Ann.bitextMarginAuto(c.embeddings.filter(col("label") === 0),
        c.embeddings.filter(col("label") === 1), k = 4)
      .orderBy("src_id")
  }
}
