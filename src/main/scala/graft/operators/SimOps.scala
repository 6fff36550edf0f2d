package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Similarity search over the embedding column (SURVEY.md §2.10).
  *
  * Brute-force top-k is the correctness baseline: probes × corpus via a
  * dimension-position join, dot products accumulated exactly in
  * order-independent fixed-point longs (Det.sumFixed — a double sum
  * would drift with shuffle order, a decimal sum is exact but
  * BigDecimal-bound). The LSH variant is the 100 TB path: deterministic
  * hyperplane signatures shrink the search to same-bucket candidates,
  * an equi-join on the bucket key instead of a cross product.
  */
object SimOps {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic hyperplane family for sim_ann_lsh.
    *
    * Weights come from SplitMix64 over (plane, dim) with fixed literal
    * constants (SURVEY §7.4.5: seeded determinism, no Math.random) and
    * are baked into the plan as float ARRAY LITERALS at build time — the
    * per-row cost is Planes codegen'd dot_f kernels, zero hash calls.
    */
  private object Lsh {
    val Planes = 16
    val Dims = 64

    private def splitmix64(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    /** Plane weight in [-1, 1) — identical on every run and JVM. */
    private def weight(p: Int, i: Int): Float =
      (((splitmix64(p.toLong * 1024L + i) >>> 11).toDouble
        / (1L << 53).toDouble) * 2.0 - 1.0).toFloat

    private def planeLit(p: Int) =
      array((0 until Dims).map(i => lit(weight(p, i))): _*)

    private def dotF(a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.DotProductF(
          org.apache.spark.sql.GraftSqlBridge.expr(a),
          org.apache.spark.sql.GraftSqlBridge.expr(b)))

    /** Planes-bit sign signature of a float-array embedding column. */
    def signature(embedding: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (0 until Planes).map { p =>
        when(dotF(embedding, planeLit(p)) > 0.0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
  }

  /** (vec_id, pos, v:double) exploded view of the embedding table. */
  private def exploded(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("vec_id"), col("label"), col("pos"), col("v").cast(DoubleType).as("v"))

  private def norms(e: DataFrame): DataFrame =
    e.groupBy("vec_id")
      .agg(sqrt(graft.Det.sumFixed(col("v") * col("v"))).as("nrm"))

  val queries: Map[String, Q] = Map(
    "sim_cosine_topk" -> ((s, d) => {
      // Top-5 cosine neighbors for probe vectors vec_id < 10.
      val e = exploded(s, d)
      val nr = norms(e)
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("a"), col("pos"), col("v").as("va"))
      val dots = broadcast(probes)
        .join(e.select(col("vec_id").as("b"), col("pos"), col("v").as("vb")), "pos")
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b")
        .agg(graft.Det.sumFixed(col("va") * col("vb")).as("dotd"))
      val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b"))
      dots
        .join(broadcast(nr.select(col("vec_id").as("a"), col("nrm").as("na"))), "a")
        .join(broadcast(nr.select(col("vec_id").as("b"), col("nrm").as("nb"))), "b")
        .withColumn("cos", round(col("dotd") / (col("na") * col("nb")), 4))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 5)
        .select(col("a"), col("b"), col("cos"), col("rnk"))
        .orderBy("a", "rnk")
    }),

    "sim_knn_per_label" -> ((s, d) => {
      // Group-wise kNN: for each probe (vec_id < 5), the single nearest
      // vector of EACH class label — same dot core, label-partitioned
      // ranking window.
      val e = exploded(s, d)
      val nr = norms(e)
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("a"), col("pos"), col("v").as("va"))
      val cands = e.select(col("vec_id").as("b"), col("label"), col("pos"),
        col("v").as("vb"))
      val dots = broadcast(probes).join(cands, "pos")
        .filter(col("a") =!= col("b"))
        .groupBy("a", "b", "label")
        .agg(graft.Det.sumFixed(col("va") * col("vb")).as("dotd"))
      val w = Window.partitionBy("a", "label").orderBy(col("cos").desc, col("b"))
      dots
        .join(broadcast(nr.select(col("vec_id").as("a"), col("nrm").as("na"))), "a")
        .join(broadcast(nr.select(col("vec_id").as("b"), col("nrm").as("nb"))), "b")
        .withColumn("cos", round(col("dotd") / (col("na") * col("nb")), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("a"), col("label"), col("b"), col("cos"))
        .orderBy("a", "label")
    }),

    "sim_ann_ivf" -> ((s, d) => {
      // IVF-style ANN with a FIXED-k coarse quantizer: k=64 centroids
      // chosen as the k smallest xxhash64(vec_id) — a deterministic
      // seeded sample whose size is INDEPENDENT of table cardinality
      // (planned as TakeOrderedAndProject: per-partition heap of k, no
      // full sort). Production swaps the sample for seeded k-means with
      // k ≈ min(√N, 65536); everything downstream is unchanged.
      // Assignment is one broadcast product over the k centroids with a
      // map-side max_by — the ×k expansion collapses BEFORE any shuffle
      // (partial aggregation), so assignment cost is O(N·k) compute and
      // O(N) shuffle bytes: the real IVF shape at 10⁹ vectors.
      graft.functions.DotProductF.register(s)
      val emb = Tables.embeddings(s, d)
      val k = 64
      val cents = emb
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
        .orderBy(xxhash64(col("cent_id")), col("cent_id"))
        .limit(k)
      val assigned = emb.join(broadcast(cents))
        .withColumn("cdot", expr("dot_f(embedding, cent_emb)"))
        .groupBy(col("vec_id"))
        .agg(
          // total order (unique cent_id) → deterministic argmax
          max_by(col("cent_id"), struct(col("cdot"), -col("cent_id")))
            .as("cluster"),
          first(col("embedding")).as("embedding"))
      val probes = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("cluster"))
      val cands = assigned.select(col("vec_id").as("b"),
        col("embedding").as("eb"), col("cluster").as("cluster2"))
      // cluster has only k distinct values — broadcast the tiny probe
      // side so the join never shuffles the corpus on a 64-value key.
      val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b"))
      broadcast(probes)
        .join(cands, col("cluster") === col("cluster2") && col("a") =!= col("b"))
        .withColumn("cos", round(expr("dot_f(ea, eb)"), 4))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .select(col("a"), col("cluster"), col("b"), col("cos"), col("rnk"))
        .orderBy("a", "rnk")
    }),

    "sim_ann_lsh" -> ((s, d) => {
      // Banded multi-table LSH, the scale path: 16 deterministic
      // hyperplanes (SplitMix64 of (plane,dim), fixed literal seed)
      // give a 16-bit sign signature, split into 2 bands × 8 bits.
      // Candidates must agree on at least one FULL band (band-OR):
      // per-band buckets stay selective while two independent tables
      // recover the recall a single wider code would lose.
      //
      // The plane matrix is materialized ONCE, driver-side, as float
      // literal arrays — the plan carries constants and each sign bit is
      // one codegen'd dot_f over the row; nothing recomputes weights or
      // hashes per row (the round-1 version burned a per-row xxhash64
      // per plane×dim on the interpreted HOF path).
      graft.functions.DotProductF.register(s)
      val emb = Tables.embeddings(s, d)
      val bucketed = emb.withColumn("sig", Lsh.signature(col("embedding")))
        .select(col("vec_id"), col("embedding"),
          col("sig").bitwiseAND(lit(255L)).as("band0"),
          shiftright(col("sig"), 8).bitwiseAND(lit(255L)).as("band1"))
        .select(col("vec_id"), col("embedding"),
          explode(array(
            struct(lit(0).as("band"), col("band0").as("bucket")),
            struct(lit(1).as("band"), col("band1").as("bucket")))).as("bb"))
        .select(col("vec_id"), col("embedding"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val probes = bucketed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("band"), col("bucket"))
      val cands = bucketed
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("band").as("band2"), col("bucket").as("bucket2"))
      // Probe side is tiny and the (band,bucket) key space is small →
      // broadcast probes; score per band-match, then collapse the ≤2
      // duplicate pairs (same pair found in both bands) with a map-side
      // max (cos is identical across bands).
      val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b"))
      broadcast(probes)
        .join(cands, col("band") === col("band2")
          && col("bucket") === col("bucket2") && col("a") =!= col("b"))
        .withColumn("cos", round(expr("dot_f(ea, eb)"), 4))
        .groupBy(col("a"), col("b")).agg(max(col("cos")).as("cos"))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .select(col("a"), col("b"), col("cos"), col("rnk"))
        .orderBy("a", "rnk")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, CAST(v AS DOUBLE) AS v, pos FROM (
             SELECT vec_id, unnest(embedding) AS v,
                    unnest(range(1, len(embedding)+1)) AS pos
             FROM embeddings)),
         norms AS (SELECT vec_id,
                     sqrt(CAST(sum(CAST(floor(v*v * 1099511627776.0) AS BIGINT)) AS DOUBLE)
                          / 1099511627776.0) AS nrm
                   FROM e GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS a, b.vec_id AS b,
                    CAST(sum(CAST(floor(a.v*b.v * 1099511627776.0) AS BIGINT)) AS DOUBLE)
                      / 1099511627776.0 AS dotd
                  FROM e a JOIN e b ON a.pos = b.pos
                   AND a.vec_id < 10 AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2)
         SELECT a, b, cos, CAST(rnk AS INTEGER) AS rnk FROM (
           SELECT d.a, d.b,
                  round(d.dotd / (na.nrm * nb.nrm), 4) AS cos,
                  row_number() OVER (PARTITION BY d.a
                    ORDER BY round(d.dotd / (na.nrm * nb.nrm), 4) DESC, d.b) AS rnk
           FROM dots d
           JOIN norms na ON d.a = na.vec_id
           JOIN norms nb ON d.b = nb.vec_id)
         WHERE rnk <= 5 ORDER BY a, rnk""",

    "sim_knn_per_label" ->
      """WITH e AS (SELECT vec_id, label, CAST(v AS DOUBLE) AS v, pos FROM (
             SELECT vec_id, label, unnest(embedding) AS v,
                    unnest(range(1, len(embedding)+1)) AS pos
             FROM embeddings)),
         norms AS (SELECT vec_id,
                     sqrt(CAST(sum(CAST(floor(v*v * 1099511627776.0) AS BIGINT)) AS DOUBLE)
                          / 1099511627776.0) AS nrm
                   FROM e GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS a, b.vec_id AS b, b.label AS label,
                    CAST(sum(CAST(floor(a.v*b.v * 1099511627776.0) AS BIGINT)) AS DOUBLE)
                      / 1099511627776.0 AS dotd
                  FROM e a JOIN e b ON a.pos = b.pos
                   AND a.vec_id < 5 AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2, 3)
         SELECT a, label, b, cos FROM (
           SELECT d.a, d.label, d.b,
                  round(d.dotd / (na.nrm * nb.nrm), 4) AS cos,
                  row_number() OVER (PARTITION BY d.a, d.label
                    ORDER BY round(d.dotd / (na.nrm * nb.nrm), 4) DESC, d.b) AS rn
           FROM dots d
           JOIN norms na ON d.a = na.vec_id
           JOIN norms nb ON d.b = nb.vec_id)
         WHERE rn = 1 ORDER BY a, label"""
  )
}
