package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with the
  * decode / feature-extract step stubbed deterministically (image/audio
  * codecs aren't in this container — the Spark-side plumbing is the real
  * deliverable: schema, batched per-partition execution, partitioning).
  *
  * Two execution shapes:
  *  1. Expression-level metadata extraction (`metadata`) — codegen'd, used
  *     by the oracle-checked query.
  *  2. `decodeBatched` — the mapPartitions shape a real decoder plugs into
  *     (the Scala analogue of a Pandas-UDF-over-mapInPandas pipeline):
  *     rows stream through per partition, the decoder sees a whole
  *     iterator so it can amortize codec init, and output is a typed
  *     Dataset. The stub "decode" derives deterministic fake
  *     width/height/frames from the payload bytes.
  */
object Multimodal {

  /** Payload column: the fixture documents' text as binary (stand-in for
    * real image/audio bytes).
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Expression-level metadata: byte length, lowercase-hex header preview,
    * deterministic fake decode dims. Everything integer/string-exact.
    */
  def metadata(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withPayload(docs, textCol).select(
      col(idCol).as("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
      (octet_length(col("payload")) % 640 + 1).as("width"),
      (octet_length(col("payload")) * 7 % 480 + 1).as("height"),
      (octet_length(col("payload")) % 30 + 1).as("n_frames"),
      when(octet_length(col("payload")) % 3 === 0, "img")
        .when(octet_length(col("payload")) % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  final case class DecodedMedia(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  /** Batched per-partition decode plumbing. `decodeOne` is the pluggable
    * codec; the default stub derives deterministic values from the bytes
    * (a real impl would decode pixels/samples here). Repartition upstream
    * by size/key if payloads are skewed; each partition is one codec
    * session.
    */
  def decodeBatched(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      decodeOne: Array[Byte] => (Int, Int, Int) = stubDecode): Dataset[DecodedMedia] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec init" happens once here
        rows.map { case (id, bytes) =>
          val (w, h, f) = decodeOne(bytes)
          DecodedMedia(id, bytes.length, w, h, f,
            bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
        }
      }
  }

  /** Deterministic fake decoder: dims from byte stats (no codec libs in
    * the container; marks the seam where a real decoder goes).
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int) =
    (bytes.length % 640 + 1, bytes.length * 7 % 480 + 1, bytes.length % 30 + 1)

  /** Frame sampling: every `stride`-th frame index per video payload,
    * exploded to (doc_id, frame_idx, frame_id) rows — the fan-out shape of
    * a video-frame extraction stage (each output row is one decode-work
    * unit downstream). Expression-level and exact: `sequence` explode, a
    * deterministic per-frame fingerprint, no UDF; the frame PIXEL decode
    * belongs in [[decodeBatched]]'s seam, not here. Fan-out is bounded by
    * n_frames/stride per row — partition counts scale with output, not
    * input.
    */
  def frameSample(docs: DataFrame, idCol: String, textCol: String,
      stride: Int): DataFrame =
    metadata(docs, idCol, textCol)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_id",
        Dedup.tokenHash(concat_ws(":", col("doc_id"), col("frame_idx"))))

  /** aHash geometry: 16 sampled "pixels" per frame, one hash bit each.
    * Pixel k of frame f is the char code at 1-based position
    * `1 + (f*16 + k*7) % n_px` of the payload (the stub for an 8×8
    * gray block; the ASCII fixture makes char code ≡ byte in both
    * engines); bit k is set iff pixel_k ≥ mean, tested as the integer
    * cross-multiplication `pixel_k · 16 ≥ Σ pixels` — the classic
    * average-hash construction, integer-exact end to end.
    */
  val AHashBits = 16
  private def pixelSql(k: Int, textExpr: String, idxExpr: String, nPxExpr: String): String =
    s"ascii(substr($textExpr, 1 + ($idxExpr * $AHashBits + $k * 7) % $nPxExpr, 1))"
  private def aHashSql(textExpr: String, idxExpr: String, nPxExpr: String): String = {
    val px = (0 until AHashBits).map(pixelSql(_, textExpr, idxExpr, nPxExpr))
    val sum = px.mkString("(", " + ", ")")
    (0 until AHashBits).map { k =>
      s"(CASE WHEN ${px(k)} * $AHashBits >= $sum THEN ${1L << k} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Per-frame 16-bit average hash over the sampled video frames (the
    * [[frameSample]] population at the same `stride`): one row per
    * (doc, frame) with `fkey = doc_id·64 + frame_idx` (frame_idx < 30
    * < 64, so the packing is collision-free) and the integer `phash`.
    * Pure codegen'd expressions — the image-dedup code every multimodal
    * pipeline computes before training.
    */
  def frameAHash(docs: DataFrame, idCol: String, textCol: String,
      stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_t"))
      .withColumn("n_px", length(col("_t")))
      .filter(col("n_px") % 3 === 2) // media_type 'video' (see metadata)
      .select(col("doc_id"), col("_t"), col("n_px"),
        explode(sequence(lit(0), col("n_px") % 30, lit(stride))) // 0..n_frames-1
          .as("frame_idx"))
      .select(
        (col("doc_id") * 64 + col("frame_idx")).as("fkey"),
        expr(aHashSql("_t", "frame_idx", "n_px")).cast("long").as("phash"))
  }

  /** DuckDB closed form of [[frameAHash]]'s hash expression, rendered
    * from the SAME pixel/threshold constants so the two engines cannot
    * drift one-sided (`text`/`u.i`/`n_px` are the oracle CTE's columns).
    */
  def aHashSqlDuck(textExpr: String, idxExpr: String, nPxExpr: String): String =
    aHashSql(textExpr, idxExpr, nPxExpr)

  /** Cross-document near-duplicate frame pairs with Hamming distance ≤
    * `maxHd` over the aHash codes, by pigeonhole chunk blocking (the
    * [[Dedup.simhashPairs]] shape) run at the CODE level, not the frame
    * level: the aHash space is bounded (2^16 values), so the distinct
    * code table — and therefore all candidate generation — is
    * corpus-size-INDEPENDENT. Blocking a corpus-scale frame table
    * directly would funnel N frames through ≤ 2^⌈16/(maxHd+1)⌉ block
    * keys (~128 for maxHd 2) and go quadratic in N; here the quadratic
    * work is confined to the ≤ 65536-row code table, and frames re-enter
    * only through two hash joins on the verified (code_a, code_b) pairs.
    * Same-doc pairs (trivially similar strips) are excluded; each
    * unordered frame pair is emitted exactly once (fkey order).
    */
  /** Verified near-dup DISTINCT-code pairs (pa < pb, hd ≤ maxHd) by
    * pigeonhole chunk blocking over the ≤ 2^16-row code table — shared
    * by the pair and cluster paths; bit_count is paid on the bounded
    * candidates only.
    */
  private def nearDupCodePairs(codeVals: DataFrame, maxHd: Int): DataFrame = {
    require(maxHd >= 0, s"maxHd must be >= 0, got $maxHd")
    val nChunks = maxHd + 1
    val bitsPer = AHashBits / nChunks
    val chunks = (0 until nChunks).map { c =>
      val width = if (c == nChunks - 1) AHashBits - bitsPer * (nChunks - 1) else bitsPer
      struct(lit(c).as("ci"),
        ((col("phash") / (1L << (c * bitsPer))).cast("long") % (1L << width)).as("cv"))
    }
    val blocked = codeVals.select(col("phash"), explode(array(chunks: _*)).as("ch"))
      .select(col("phash"), col("ch.ci"), col("ch.cv"))
    blocked.as("x")
      .join(blocked.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.phash") < col("y.phash"))
      .select(col("x.phash").as("pa"), col("y.phash").as("pb"))
      .distinct()
      .withColumn("hd", bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hd") <= maxHd)
  }

  def phashNearDupPairs(codes: DataFrame, maxHd: Int): DataFrame = {
    val codeVals = codes.select("phash").distinct()
    val half = nearDupCodePairs(codeVals, maxHd)
    // symmetrize + the equal-code pair so the frame joins below see every
    // (code_a, code_b) direction; the three legs are disjoint by
    // construction (pa<pb, pa>pb, pa=pb)
    val codePairs = half
      .unionByName(half.select(col("pb").as("pa"), col("pa").as("pb"), col("hd")))
      .unionByName(codeVals.select(col("phash").as("pa"),
        col("phash").as("pb"), lit(0).cast("int").as("hd")))
    codes.select(col("fkey").as("frame_a"), col("phash").as("pa"))
      .join(codePairs, Seq("pa"))
      .join(codes.select(col("fkey").as("frame_b"), col("phash").as("pb")),
        Seq("pb"))
      .filter(col("frame_a") < col("frame_b") &&
        (col("frame_a") / 64).cast("long") =!= (col("frame_b") / 64).cast("long"))
      .select("frame_a", "frame_b", "hd")
  }

  /** Frame near-dup CLUSTERS over the perceptual-hash pair graph: the
    * image-dedup endgame — transitive closure of [[phashNearDupPairs]]
    * via [[Dedup.connectedComponents]], one row per cluster with its
    * size. The cluster id IS the representative (min-label convention =
    * min frame key — the canonical frame a multimodal pipeline keeps,
    * discarding the near-copies). Singleton frames don't appear: at
    * 100 TB the interesting output is the dup groups, and the keep-set
    * is derivable by anti-join.
    *
    * Uses the star-contraction CC (same (vertex, min-id) contract as
    * min-label): a Hamming-ball graph at these parameters is DENSE
    * (~60 edges/frame at sf0.1) with near-complete giant components, so
    * min-label's O(diameter) rounds each re-join the full edge set,
    * while star rounds contract it geometrically and the bounded
    * union-find finish absorbs the tail.
    */
  /** Frame near-dup clusters, computed ENTIRELY at the code level: the
    * frame graph never materializes. Equivalence argument (exact, not
    * heuristic): a frame edge exists between codes a, b (hd ≤ maxHd,
    * possibly a = b) iff some frame of a and some frame of b sit in
    * DIFFERENT docs — i.e. unless both codes are confined to the same
    * single doc (`nd_a = 1 ∧ nd_b = 1 ∧ mind_a = mind_b`). When the
    * edge exists, ALL frames of both codes land in one component: two
    * frames of a multi-doc code connect directly (different docs) or
    * via its third frame in another doc; a single-doc code's frames
    * all connect cross-doc to the realized partner. So CC over the
    * REALIZED code graph (plus self-pairs for multi-doc codes, which
    * keep lone hub codes) partitions frames exactly as CC over the
    * frame graph — with the vertex set bounded by 2^16 codes however
    * many frames the corpus holds, and the per-code frame population
    * folded back arithmetically. (Was CC over frame pairs: ~2× slower
    * at sf0.1 and frame-population-sized where this is code-bounded.)
    */
  def frameDupClusters(codes: DataFrame, maxHd: Int): DataFrame = {
    val stats = graft.util.Materialize.stable(
      codes.select(col("fkey"), col("phash"),
          expr("fkey div 64").as("_doc"))
        .groupBy("phash")
        .agg(count(lit(1)).as("nf"), countDistinct("_doc").as("nd"),
          min("_doc").as("mind"), min("fkey").as("minf")))
    val half = nearDupCodePairs(stats.select("phash"), maxHd)
      .select("pa", "pb")
    val realized = half
      .join(stats.select(col("phash").as("pa"), col("nd").as("nda"),
        col("mind").as("minda")), "pa")
      .join(stats.select(col("phash").as("pb"), col("nd").as("ndb"),
        col("mind").as("mindb")), "pb")
      .filter(col("nda") > 1 || col("ndb") > 1 ||
        col("minda") =!= col("mindb"))
      .select("pa", "pb")
    val selfPairs = stats.filter(col("nd") > 1)
      .select(col("phash").as("pa"), col("phash").as("pb"))
    graft.llm.Dedup.connectedComponentsStars(
      realized.unionByName(selfPairs), "pa", "pb")
      .join(stats, col("doc_id") === stats("phash"))
      .groupBy(col("cluster_id"))
      .agg(min("minf").as("_cluster"), sum("nf").as("n_frames"))
      .select(col("_cluster").as("cluster_id"), col("n_frames"))
  }

  final case class ResizedMedia(
      doc_id: Long, src_width: Int, src_height: Int,
      width: Int, height: Int, payload: Array[Byte])

  /** Audio leg: per-window ENERGY profile + silence trim over the
    * payload's stub PCM — the VAD-ish preprocessing every speech
    * pipeline runs before training. Sample t (of nWindows·winLen) is
    * the centered byte `ascii(payload[1 + (t·stride) mod n_px]) − 96`
    * (the ASCII fixture stands in for int16 PCM exactly as the aHash
    * pixels stand in for gray blocks); window j's energy is the integer
    * Σ s², and a window is VOICED iff `energy · nWindows > Σ energies`
    * (strict cross-multiplied mean test — an all-equal profile has no
    * voiced windows, matching a silence-only clip). Output one row per
    * audio doc: (doc_id, n_voiced, first_voiced_w, last_voiced_w,
    * total_energy) — the trim decision columns.
    *
    * Scale shape: one explode (nWindows·winLen rows per doc, a
    * constant), one (doc, window) partial-agg, one doc-partitioned
    * window for the mean test — no corpus-wide exchange beyond the
    * doc-keyed aggregates; everything is codegen'd integer arithmetic.
    */
  def audioEnergyProfile(docs: DataFrame, idCol: String, textCol: String,
      nWindows: Int = 16, winLen: Int = 64, stride: Int = 5): DataFrame = {
    require(nWindows > 0 && winLen > 0 && stride > 0, "positive geometry")
    import org.apache.spark.sql.expressions.Window
    val n = nWindows * winLen
    val energies = docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_t"))
      .withColumn("n_px", length(col("_t")))
      .filter(col("n_px") % 3 === 1) // media_type 'audio' (see metadata)
      .select(col("doc_id"), col("_t"), col("n_px"),
        explode(sequence(lit(0), lit(n - 1))).as("t"))
      .select(col("doc_id"), expr("t div " + winLen).as("w"),
        expr(s"ascii(substr(_t, 1 + ((t * $stride) % n_px), 1)) - 96").as("s"))
      .groupBy("doc_id", "w").agg(sum(expr("s * s")).as("energy"))
    val withTotal = energies.withColumn("total",
      sum("energy").over(Window.partitionBy("doc_id")))
    val voiced = col("energy") * nWindows > col("total")
    withTotal.groupBy("doc_id")
      .agg(sum(when(voiced, 1L).otherwise(0L)).as("n_voiced"),
        min(when(voiced, col("w"))).as("first_voiced_w"),
        max(when(voiced, col("w"))).as("last_voiced_w"),
        max("total").as("total_energy"))
  }

  /** DuckDB closed form of [[audioEnergyProfile]] (same geometry
    * constants interpolated — the engines cannot drift one-sided).
    */
  def audioEnergySqlDuck(nWindows: Int = 16, winLen: Int = 64,
      stride: Int = 5): String = {
    val n = nWindows * winLen
    s"""WITH a AS (SELECT doc_id, text AS txt, length(text) AS n_px
       |  FROM documents WHERE length(text) % 3 = 1),
       |s AS (SELECT doc_id, u.t // $winLen AS w,
       |    (ascii(substr(txt, 1 + ((u.t * $stride) % n_px), 1)) - 96) AS sv
       |  FROM a, unnest(range(0, $n)) AS u(t)),
       |e AS (SELECT doc_id, w, CAST(sum(sv * sv) AS BIGINT) AS energy
       |  FROM s GROUP BY 1, 2),
       |tot AS (SELECT doc_id, CAST(sum(energy) AS BIGINT) AS total
       |  FROM e GROUP BY 1)
       |SELECT e.doc_id,
       |  CAST(sum(CASE WHEN energy * $nWindows > total THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_voiced,
       |  min(CASE WHEN energy * $nWindows > total THEN w END) AS first_voiced_w,
       |  max(CASE WHEN energy * $nWindows > total THEN w END) AS last_voiced_w,
       |  max(total) AS total_energy
       |FROM e JOIN tot USING (doc_id) GROUP BY e.doc_id"""
      .stripMargin.replace("\n", " ")
  }

  /** Resize plumbing: batched per-partition transform emitting a
    * target-dims payload per media row (aspect-preserving fit inside
    * `maxW`×`maxH`, never upscaled). The pixel resample is the stub —
    * deterministic byte subsampling proportional to the area ratio — but
    * the pipeline shape is the deliverable: typed in/out schema, one
    * library/session init per partition, output directly re-ingestable by
    * the decode/feature stages (same `payload` contract).
    */
  def resizeBatched(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      maxW: Int, maxH: Int,
      resizeOne: (Array[Byte], Int, Int, Int, Int) => Array[Byte] = stubResize)
      : Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (sw, sh, _) = stubDecode(bytes)
          // aspect-preserving integer fit, never upscale (scale in per-mille)
          val scale = math.min(1000L, math.min(maxW * 1000L / sw, maxH * 1000L / sh))
          val (w, h) = (math.max(1, (sw * scale / 1000).toInt),
            math.max(1, (sh * scale / 1000).toInt))
          ResizedMedia(id, sw, sh, w, h, resizeOne(bytes, sw, sh, w, h))
        }
      }
  }

  /** Deterministic fake resampler: keeps every k-th byte so payload size
    * tracks the area ratio (a real impl decodes + resamples pixels here).
    */
  def stubResize(bytes: Array[Byte], sw: Int, sh: Int, w: Int, h: Int): Array[Byte] = {
    val keepRatio = math.max(1L, sw.toLong * sh / (w.toLong * h))
    bytes.zipWithIndex.collect { case (b, i) if i % keepRatio == 0 => b }
  }

  final case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  /** Feature-extraction seam: per-partition batched "model inference"
    * emitting a fixed-dim embedding per payload — the plumbing (schema,
    * batch shape, amortized per-partition init) that a real vision/audio
    * encoder plugs into; output is directly consumable by the
    * [[Similarity]] ANN/near-dup operators (same `embedding` column
    * contract). Stub: deterministic rolling-hash features.
    */
  def extractFeatures(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      dim: Int = 8,
      embedOne: (Array[Byte], Int) => Array[Float] = stubEmbed): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model/session init amortizes here
        rows.map { case (id, bytes) => MediaFeatures(id, embedOne(bytes, dim)) }
      }
  }

  // ------------------------------------------------ cross-modal towers

  /** Cross-modal two-tower stub (round-16 verdict #4) — the CLIP-shaped
    * seam: an IMAGE tower over the binary payload and a TEXT tower over
    * the text, emitting vectors in ONE shared space with the
    * `(vec_id, embedding)` contract the [[Similarity]] ANN family
    * consumes. Both towers are pure codegen'd expressions (the
    * [[aHashSql]] sampled-pixel discipline: dim `d` sums the
    * [[EmbedSamples]] sampled char codes at positions
    * `1 + (d·16 + k·7) % n`), so the DuckDB oracle computes the
    * identical vectors; the TEXT tower adds a small deterministic
    * modality perturbation (`(doc_id + d) % 7`), making the two views
    * of one document near-parallel but not equal — text→image top-1 is
    * the counterpart image without being an identity lookup. A real
    * CLIP encoder replaces both towers through the [[extractFeatures]]
    * mapPartitions seam (same output contract — spec-pinned); these
    * closed forms are what make the gate ORACLE-checkable.
    *
    * Image-side vec_ids are offset by [[ImgIdOffset]] so the shared id
    * space stays collision-free and the counterpart image survives the
    * ANN family's self-match exclusion (`cid <> qid`).
    */
  val EmbedDim = 8
  val EmbedSamples = 16
  val ImgIdOffset = 1000000L

  private def towerDim(text: org.apache.spark.sql.Column, d: Int,
      perturb: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = length(text)
    (0 until EmbedSamples).map { k =>
      ascii(text.substr(lit(d * EmbedSamples + k * 7) % n + 1, lit(1)))
    }.reduce(_ + _) + perturb
  }

  /** IMAGE tower: (vec_id = doc_id + offset, embedding: array<long>)
    * over the payload bytes (== char codes on the ASCII fixture — the
    * [[aHashSql]] equivalence).
    */
  def imageTower(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0).select(
      (col(idCol) + ImgIdOffset).as("vec_id"),
      array((0 until EmbedDim).map(d =>
        towerDim(col(textCol), d, lit(0)).cast("long")): _*).as("embedding"))

  /** TEXT tower: same content features + the per-(doc, dim) modality
    * perturbation; ids stay in doc_id space.
    */
  def textTower(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) > 0).select(
      col(idCol).as("vec_id"),
      array((0 until EmbedDim).map(d =>
        towerDim(col(textCol), d,
          pmod(col(idCol) + lit(d), lit(7))).cast("long")): _*).as("embedding"))

  /** DuckDB twins: the tower expression as a list literal over `text`,
    * for injection into the cross-modal oracle CTEs.
    */
  private def towerDimSqlDuck(d: Int, perturbSql: String): String = {
    val terms = (0 until EmbedSamples).map { k =>
      s"ascii(substr(text, 1 + ((${d * EmbedSamples + k * 7}) % length(text)), 1))"
    }
    s"CAST(${terms.mkString("(", " + ", ")")} + $perturbSql AS BIGINT)"
  }
  def imageTowerSqlDuck: String =
    (0 until EmbedDim).map(towerDimSqlDuck(_, "0")).mkString("[", ", ", "]")
  def textTowerSqlDuck: String =
    (0 until EmbedDim).map(d => towerDimSqlDuck(d, s"((doc_id + $d) % 7)"))
      .mkString("[", ", ", "]")

  /** Deterministic fake encoder (rolling hash per dimension, unit-free). */
  def stubEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      acc(d) = acc(d) * 31 + (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => ((v % 2000L) - 1000L) / 1000.0f)
  }
}
