package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product quantization — the memory-bounded ANN path for 100 TB corpora.
  *
  * A d-dim float vector (d×4 bytes) compresses to `m` small codes (m
  * bytes-ish): the vector is L2-normalized, split into m subvectors, and
  * each subvector is replaced by the id of its nearest sub-centroid from a
  * per-subspace codebook (trained with Lloyd iterations). Search uses the
  * classic asymmetric-distance construction (ADC): each QUERY precomputes
  * a (m × ksub) table of subvector dot products once, and scoring a corpus
  * vector is then m table lookups — no float vectors on the corpus side at
  * all. At 100 TB the corpus relation shrinks ~d×4/m ≈ 64× (d=128, m=8)
  * and scan/shuffle cost shrinks with it; that compression is the point.
  *
  * All three kernels are zero-shuffle literal-embedded expressions
  * ([[PqCodes]], [[PqTable]], [[PqLookup]]); the codebook is tiny
  * (m × ksub × d/m floats = exactly d×ksub) and rides into the plan the
  * same way [[NearestCells]]'s centroids do.
  */
object Pq {

  /** Codebooks: (subspace)(code)(sub-dimension). */
  type Codebooks = IndexedSeq[IndexedSeq[IndexedSeq[Float]]]

  private val B = org.apache.spark.sql.graft.Bridge

  def codesCol(emb: Column, cb: Codebooks): Column =
    B.column(PqCodes(B.expression(emb), cb))

  def tableCol(emb: Column, cb: Codebooks): Column =
    B.column(PqTable(B.expression(emb), cb))

  def lookupCol(codes: Column, table: Column, ksub: Int): Column =
    B.column(PqLookup(B.expression(codes), B.expression(table), ksub))

  /** Train per-subspace codebooks with Lloyd iterations over the
    * L2-normalized corpus. Deterministic but SPREAD init: the `ksub` seed
    * vectors are the first by `xxhash64(vec_id)` order — a reproducible
    * pseudo-random sample across the corpus (seeding from the first k
    * vec_ids degenerates when ids correlate with content: a subspace
    * where those rows are all zero collapses to one cell and Lloyd never
    * recovers). Each iteration is one zero-shuffle assignment pass plus
    * one (subspace, code, dim) aggregate whose exploded rows collapse
    * map-side (the groups number m × ksub × subdim — driver-side tiny,
    * like the IVF centroid table). */
  def train(
      corpus: DataFrame,
      m: Int = 8,
      ksub: Int = 16,
      iters: Int = 3): Codebooks = {
    val first = corpus.orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(ksub)
      .select(col("embedding")).collect()
      .map(r => normalize(r.getSeq[Float](0).toArray))
    require(first.nonEmpty, "empty corpus")
    val dim = first.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    var cb: Codebooks = IndexedSeq.tabulate(m) { j =>
      first.toIndexedSeq.map(v =>
        v.slice(j * subDim, (j + 1) * subDim).toIndexedSeq)
    }
    var it = 0
    while (it < iters) {
      val assigned = corpus.select(
        codesCol(col("embedding"), cb).as("codes"),
        normCol(col("embedding")).as("nv"))
      val means = assigned
        .select(col("codes"), posexplode(col("nv")).as(Seq("pos", "v")))
        .select(
          (col("pos") / subDim).cast(IntegerType).as("j"),
          element_at(col("codes"),
            (col("pos") / subDim).cast(IntegerType) + 1).as("c"),
          (col("pos") % subDim).as("d"),
          col("v"))
        .groupBy("j", "c", "d").agg(avg(col("v")).as("mv"))
        .collect()
      val next = Array.tabulate(m, ksub)((j, c) =>
        cb(j)(c).toArray.clone())
      means.foreach { r =>
        val j = r.getInt(0)
        val c = r.getInt(1)
        val d = r.getInt(2)
        next(j)(c)(d) = r.getDouble(3).toFloat
      }
      cb = next.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
      it += 1
    }
    cb
  }

  /** Corpus → (vec_id, codes): the compressed representation to persist.
    * codes is array<int> of length m — the ONLY per-vector state search
    * needs. */
  def encode(corpus: DataFrame, cb: Codebooks): DataFrame =
    corpus.select(col("vec_id"), codesCol(col("embedding"), cb).as("codes"))

  /** ADC top-k: queries precompute their (m × ksub) dot-product table
    * (one pass, broadcast with the query row); each corpus code vector is
    * scored with m lookups and ranked through the bounded [[TopKByScore]]
    * aggregate. The corpus side never touches float vectors. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      cb: Codebooks,
      k: Int = 5): DataFrame = {
    val ksub = cb.head.length
    val coded = encode(corpus, cb)
    val q = queries.select(
      col("vec_id").as("query_id"),
      tableCol(col("embedding"), cb).as("qtable"))
    val scored = coded.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("score", lookupCol(col("codes"), col("qtable"), ksub))
    Similarity.rankTopK(scored, k, scoreCol = "score")
  }

  /** PQ shortlist + exact re-rank (what FAISS calls a refine step): ADC
    * over the compressed codes prunes the corpus to `shortlist`
    * candidates per query, then ONLY those candidates' float vectors are
    * fetched and exactly cosine-ranked to the final k. This closes PQ's
    * structural within-cluster rank degeneracy (RECALL.md: same-cluster
    * vectors share codes, so quantization-only recall@5 collapses to
    * ~k/cluster-size) at the cost of one slim semi-join: the re-rank
    * reads `shortlist × |queries|` vectors, not the corpus. */
  def topKRefined(
      corpus: DataFrame,
      queries: DataFrame,
      cb: Codebooks,
      k: Int = 5,
      shortlist: Int = 50): DataFrame = {
    val cand = topK(corpus, queries, cb, shortlist)
      .select(col("query_id"), col("vec_id"))
    val q = queries.select(
      col("vec_id").as("query_id"), col("embedding").as("qemb"))
    val scored = cand
      .join(corpus, "vec_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", Similarity.cosine(col("embedding"), col("qemb")))
    Similarity.rankTopK(scored, k)
  }

  /** IVF × PQ — the composed 100 TB shape (what FAISS calls IVFPQ):
    * coarse cells prune the candidate set (only `nprobe`/`nlist` of the
    * corpus is scored per query) AND the scored representation is m int
    * codes instead of float vectors. The persisted corpus relation is
    * (vec_id, cid, codes) — a few dozen bytes per vector regardless of
    * dimension; both assignment and encoding are zero-shuffle
    * literal-embedded expressions, and the only exchanges are the cell
    * equi-join and the bounded top-k aggregate. */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      cb: Codebooks,
      k: Int = 5,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainedCentroids: Option[DataFrame] = None): DataFrame = {
    val ksub = cb.head.length
    val centroids = trainedCentroids.getOrElse(
      corpus.orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nlist)
        .select(col("vec_id").as("cid"), col("embedding").as("cemb")))
    val (cids, cents) = Similarity.collectCentroids(centroids)

    val coded = corpus.select(
      col("vec_id"),
      element_at(
        Similarity.nearestCells(col("embedding"), cids, cents, 1), 1)
        .as("cid"),
      codesCol(col("embedding"), cb).as("codes"))
    val q = queries.select(
      col("vec_id").as("query_id"),
      tableCol(col("embedding"), cb).as("qtable"),
      explode(
        Similarity.nearestCells(col("embedding"), cids, cents, nprobe))
        .as("cid"))
    val scored = coded.join(q, "cid")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", lookupCol(col("codes"), col("qtable"), ksub))
    Similarity.rankTopK(scored, k, scoreCol = "score")
  }

  private[operators] def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  def normCol(emb: Column): Column =
    B.column(L2Normalize(B.expression(emb)))

  private[operators] def normalize0(
      v: IndexedSeq[Float]): IndexedSeq[Float] =
    normalize(v.toArray).toIndexedSeq
}

/** L2-normalized copy of a float vector (zero vector passes through). */
case class L2Normalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    new GenericArrayData(Pq.normalize(arr))
  }
  override protected def withNewChildInternal(c: Expression): L2Normalize =
    copy(child = c)
  override def prettyName: String = "l2_normalize"
}

/** PQ encode: L2-normalize, split into m subvectors, emit the nearest
  * sub-centroid id per subspace (L2 distance; ties → lower id). */
case class PqCodes(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val books: Array[Array[Array[Float]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val nv = Pq.normalize(v.asInstanceOf[ArrayData].toFloatArray())
    val m = books.length
    val subDim = nv.length / m
    val codes = new Array[Any](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestD = Double.MaxValue
      val book = books(j)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        val lim = math.min(subDim, cent.length)
        while (i < lim) {
          val diff = nv(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
  override def prettyName: String = "pq_codes"
}

/** Per-query ADC table: flat array<float> of m × ksub entries, entry
  * (j, c) = <normalized-query subvector j, codebook j centroid c>. */
case class PqTable(child: Expression, cb: Pq.Codebooks)
    extends UnaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  @transient private lazy val books: Array[Array[Array[Float]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val nv = Pq.normalize(v.asInstanceOf[ArrayData].toFloatArray())
    val m = books.length
    val ksub = books(0).length
    val subDim = nv.length / m
    val out = new Array[Any](m * ksub)
    var j = 0
    while (j < m) {
      val base = j * subDim
      val book = books(j)
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var dot = 0.0
        var i = 0
        val lim = math.min(subDim, cent.length)
        while (i < lim) { dot += nv(base + i) * cent(i); i += 1 }
        out(j * ksub + c) = dot.toFloat
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqTable =
    copy(child = c)
  override def prettyName: String = "pq_table"
}

/** ADC score: sum of m table lookups — the per-pair cost PQ buys. */
case class PqLookup(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ImplicitCastInputTypes
    with CodegenFallback {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val codes = left.eval(input)
    val table = right.eval(input)
    if (codes == null || table == null) return java.lang.Double.valueOf(0.0)
    val ca = codes.asInstanceOf[ArrayData]
    val ta = table.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    val m = ca.numElements()
    while (j < m) {
      s += ta.getFloat(j * ksub + ca.getInt(j))
      j += 1
    }
    java.lang.Double.valueOf(s)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqLookup = copy(left = l, right = r)
  override def prettyName: String = "pq_lookup"
}
