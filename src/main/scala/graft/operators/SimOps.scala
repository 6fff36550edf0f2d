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
      // IVF-style ANN: a deterministic coarse quantizer (every 40th
      // vector serves as a centroid — a k-means fit would be the
      // production quantizer, seeded) assigns each vector to its
      // nearest centroid; probes then search ONLY their own inverted
      // list. Search cost drops from O(N) to O(N/k) per probe; the
      // assignment pass is one broadcast join (centroids are tiny by
      // construction — that's the point of IVF).
      graft.functions.DotProductF.register(s)
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") % 40 === 0)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cent_emb"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(col("cdot").desc, col("cent_id"))
      val assigned = emb.join(broadcast(cents))
        .withColumn("cdot", expr("dot_f(embedding, cent_emb)"))
        .withColumn("arn", row_number().over(wAssign))
        .filter(col("arn") === 1)
        .select(col("vec_id"), col("embedding"), col("cent_id").as("cluster"))
      val probes = assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("cluster"))
      val cands = assigned.select(col("vec_id").as("b"),
        col("embedding").as("eb"), col("cluster").as("cluster2"))
      val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b"))
      probes.join(cands, col("cluster") === col("cluster2") && col("a") =!= col("b"))
        .withColumn("cos", round(expr("dot_f(ea, eb)"), 4))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .select(col("a"), col("cluster"), col("b"), col("cos"), col("rnk"))
        .orderBy("a", "rnk")
    }),

    "sim_ann_lsh" -> ((s, d) => {
      // Approximate NN, the scale path: 8 deterministic random-ish
      // hyperplanes (weights derived from xxhash64 of "plane:dim" —
      // fixed seeds, SURVEY §7.4.5) → 8-bit sign bucket per vector →
      // probes meet candidates only inside their bucket.
      val emb = Tables.embeddings(s, d)
      val bucketed = emb.withColumn("bucket", expr(
        """aggregate(sequence(0, 7), 0L, (acc, p) ->
             acc + IF(
               aggregate(transform(embedding, (x, i) ->
                 CAST(x AS DOUBLE) *
                 ((CAST(pmod(xxhash64(concat('plane:', cast(p AS string), ':', cast(i AS string))), 2001) AS DOUBLE) - 1000.0) / 1000.0)),
                 CAST(0.0 AS DOUBLE), (a, x) -> a + x) > 0.0,
               shiftleft(1L, p), 0L))"""))
      val probes = bucketed.filter(col("vec_id") < 20)
        .select(col("vec_id").as("a"), col("embedding").as("ea"), col("bucket"))
      val cands = bucketed
        .select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("bucket").as("bucket2"))
      // Codegen'd dot-product kernel (graft.functions.DotProductF) on
      // the candidate pairs — unit-norm embeddings make dot == cosine.
      graft.functions.DotProductF.register(s)
      val w = Window.partitionBy("a").orderBy(col("cos").desc, col("b"))
      probes.join(cands, col("bucket") === col("bucket2") && col("a") =!= col("b"))
        .withColumn("cos", round(expr("dot_f(ea, eb)"), 4))
        .withColumn("rnk", row_number().over(w).cast(IntegerType))
        .filter(col("rnk") <= 3)
        .select(col("a"), col("bucket"), col("b"), col("cos"), col("rnk"))
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
