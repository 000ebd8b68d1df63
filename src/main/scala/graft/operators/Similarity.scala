package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two rungs:
  *  - [[bruteForceKnn]] — exact cosine top-k: broadcast the query vector,
  *    one narrow codegen'd map computes scores, `orderBy+limit` compiles to
  *    Spark's TakeOrderedAndProject (per-partition top-k, tiny driver merge —
  *    no full sort, no wide shuffle). The correctness baseline.
  *  - [[annSignLsh]] — the scale path: sign-bit LSH bucketing prunes the scan
  *    to the query's bucket before scoring. At 100 TB the table would be
  *    written bucketed/partitioned by this key, so a probe touches one
  *    partition instead of the fleet; recall can be traded up by probing
  *    neighboring buckets (hamming-1 on the bucket id).
  */
object Similarity {

  /** Exact top-k neighbors of `queryId` by cosine. The query's norm rides in
    * the broadcast row, each candidate's norm is computed once per row — one
    * dot product per candidate, not three. */
  def bruteForceKnn(emb: DataFrame, queryId: Long, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__q"), norm(col(vecCol)).as("__qn"))
    emb.crossJoin(broadcast(q))
      .withColumn("cos", dot(col(vecCol), col("__q")) / (norm(col(vecCol)) * col("__qn")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .drop("__q", "__qn", vecCol)
  }

  /** ANN: restrict the candidate set to the query's sign-LSH bucket, then
    * exact cosine top-k within it. */
  def annSignLsh(emb: DataFrame, queryId: Long, k: Int, bits: Int = 8,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = emb.withColumn("bucket", signBucket(col(vecCol), bits))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__q"), norm(col(vecCol)).as("__qn"), col("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .withColumn("cos", dot(col(vecCol), col("__q")) / (norm(col(vecCol)) * col("__qn")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .drop("__q", "__qn", vecCol)
  }

  /** IVF-flat ANN: `nlist` deterministic centroids (the first nlist vectors
    * — a real deployment trains k-means and persists them), every vector
    * assigned to its best cell by dot product, queries probe the `nProbe`
    * nearest cells and score exactly within them.
    *
    * At scale the assignment is a one-off build step (the table is written
    * partitioned by `cell`), so a probe reads nProbe/nlist of the data;
    * centroids are a broadcast. Recall/latency trades via nProbe. */
  def ivfKnn(emb: DataFrame, queryId: Long, k: Int, nlist: Int = 16,
             nProbe: Int = 2, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame = {
    val cent = emb.filter(col(idCol) < nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))
    val assign = emb.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cent))
      .groupBy(col(idCol))
      .agg(max_by(col("cid"), dot(col(vecCol), col("cv"))).as("cell"))
    val q = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__q"), norm(col(vecCol)).as("__qn"))
    val qcells = cent.crossJoin(broadcast(q))
      .orderBy(dot(col("cv"), col("__q")).desc, col("cid").asc)
      .limit(nProbe).select("cid")
    emb.join(assign, idCol)
      .join(broadcast(qcells), col("cell") === col("cid"))
      .crossJoin(broadcast(q))
      .withColumn("cos", dot(col(vecCol), col("__q")) / (norm(col(vecCol)) * col("__qn")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .drop("__q", "__qn", "cid", vecCol) // schema-agnostic: keep caller's cols + cell + cos
  }

  /** Bucket occupancy histogram — the skew diagnostic for the ANN path. */
  def lshBucketStats(emb: DataFrame, bits: Int = 8,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    emb.groupBy(signBucket(col(vecCol), bits).as("bucket"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"),
        max(col(idCol)).as("max_id"))
}
