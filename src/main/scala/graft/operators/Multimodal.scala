package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.plans.Checkpoints.StableSyntax

/** Multimodal-column plumbing (SURVEY.md §2): media as opaque binary
  * columns with typed metadata, and a batched per-partition feature
  * extractor. The container has no image/audio codecs, so the decode
  * step is a clearly-marked deterministic stub — the Spark plumbing
  * (binary schema, batch shape, partition-parallel extraction, typed
  * Dataset output) is the real deliverable.
  */
object Multimodal {

  /** One ingested blob row. The synthetic corpus carries its text as
    * the blob payload; a real pipeline reads image/audio/video bytes.
    */
  case class Blob(doc_id: Long, kind: String, data: Array[Byte])

  /** Extracted per-blob features (stub-decoded). */
  case class Features(doc_id: Long, kind: String, byte_len: Int,
                      head_byte: Int, tail_byte: Int, checksum: Long)

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Binary-column ingest: blob + typed metadata (byte length, sha256,
    * modality kind). Everything is codegen'd column math over the scan;
    * at scale this is the schema you'd write partitioned-by-kind
    * parquet from (Tables.writePartitioned).
    */
  def mmIngest(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      octet_length(col("text")).cast("long").as("byte_len"),
      sha2(col("text"), 256).as("sha256"))
      .orderBy(col("doc_id"))

  val mmIngestSql: String =
    """SELECT doc_id,
      |  ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  strlen(text) AS byte_len,
      |  sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Content-addressed blob store inventory: blobs keyed by digest,
    * byte-identical copies collapsing onto the minimum doc_id
    * regardless of declared modality kind (a content store keys on the
    * digest, not the label). One row per DISTINCT blob with its copy
    * count and the bytes dedup elides — the accounting a CAS-backed
    * 100 TB media lake runs continuously (non-vacuous at every SF:
    * unique corpora report n_copies = 1 rows; the sf0.1 corpus carries
    * 8 real byte-identical copies). A single grouped aggregation on
    * the digest — no join, no window: digest keys cannot skew
    * (collision-resistance ⇒ uniform) and per-group state is
    * (min, count, len), all map-side combinable.
    */
  def mmDedupBlob(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("sha256"),
        octet_length(col("text")).cast("long").as("byte_len"))
      .groupBy(col("sha256"))
      .agg(min(col("doc_id")).as("canon_id"), count(lit(1)).as("n_copies"),
        min(col("byte_len")).as("byte_len"))
      .select(col("canon_id"), col("n_copies"), col("byte_len"),
        ((col("n_copies") - 1) * col("byte_len")).as("bytes_saved"))
      .orderBy(col("canon_id"))

  val mmDedupBlobSql: String =
    """WITH b AS (SELECT doc_id, sha256(text) AS sha, strlen(text) AS byte_len
      |  FROM documents),
      |g AS (SELECT sha, min(doc_id) AS canon_id, count(*) AS n_copies,
      |    min(byte_len) AS byte_len
      |  FROM b GROUP BY sha)
      |SELECT canon_id, CAST(n_copies AS BIGINT) AS n_copies,
      |  CAST(byte_len AS BIGINT) AS byte_len,
      |  CAST((n_copies - 1) * byte_len AS BIGINT) AS bytes_saved
      |FROM g ORDER BY canon_id""".stripMargin

  /** Stub decoder — deterministic stand-in for the real image/audio
    * codec call (absent in this environment). Consumes a whole batch,
    * like a vectorized decode would.
    */
  private def decodeBatch(batch: Seq[Blob]): Seq[Features] =
    batch.map { b =>
      val d = b.data
      Features(b.doc_id, b.kind, d.length,
        if (d.nonEmpty) d.head & 0xff else 0, // ascii('') = 0 in the oracle
        if (d.nonEmpty) d.last & 0xff else 0,
        d.foldLeft(0L)((acc, x) => (acc * 31 + (x & 0xff)) % 997))
    }

  /** Batched feature extraction over blobs via the COLUMNAR decode
    * operator ([[graft.plans.MmDecode]], r3): the decode emits
    * 64-row ColumnarBatches — the shape a vectorized codec produces —
    * that flow into downstream codegen through one ColumnarToRow
    * boundary, instead of paying a typed-encoder round trip per row.
    * The r2 typed-mapPartitions form survives as
    * [[mmBatchExtractTyped]] for the spec cross-check.
    */
  def mmBatchExtract(s: SparkSession, dir: String): DataFrame = {
    val blobs = docs(s, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("data"))
    graft.plans.MmOps.decode(blobs).orderBy(col("doc_id"))
  }

  /** Spec-only cross-check: the r2 typed mapPartitions decode — same
    * kernel, encoder-based plumbing; pins the columnar operator
    * bit-for-bit.
    */
  def mmBatchExtractTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = docs(s, dir).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("data")).as[Blob]
    blobs.mapPartitions(it =>
        it.grouped(64).flatMap(batch => decodeBatch(batch)))
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Resize planning over image blobs — the preprocessing math every
    * vision pipeline runs before the model: stub-decoded source
    * dimensions (content-derived from the byte length, standing in
    * for the codec's header read), aspect-preserving fit into the
    * 224×224 model input box, never upscaled. All EXACT integer
    * arithmetic (scale in ppm, floor divisions) so both engines emit
    * identical plans; the actual pixel resample is the stubbed codec
    * step — the Spark-side schema, scan shape, and scale math are the
    * real plumbing.
    *
    * == Scale design ==
    * Pure column math inside whole-stage codegen over one
    * kind-filtered scan — embarrassingly parallel at any scale, the
    * shape you'd hand `mapInPandas` batches to when the real decoder
    * exists.
    */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    val w = (lit(160L) + pmod(octet_length(col("text")).cast("long"), lit(1760L))).as("w")
    val h = (lit(120L) + pmod(octet_length(col("text")).cast("long") * 7L, lit(960L))).as("h")
    docs(s, dir)
      .filter(col("doc_id") % 3 === 0) // 'image' kind
      .select(col("doc_id"), w, h)
      .withColumn("scale_ppm",
        least(lit(1000000L), expr("224000000 div w"), expr("224000000 div h")))
      .select(col("doc_id"), col("w"), col("h"),
        expr("w * scale_ppm div 1000000").as("out_w"),
        expr("h * scale_ppm div 1000000").as("out_h"),
        col("scale_ppm"))
      .orderBy(col("doc_id"))
  }

  val mmResizeSql: String =
    """WITH i AS (SELECT doc_id,
      |    160 + strlen(text) % 1760 AS w,
      |    120 + (strlen(text) * 7) % 960 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |s AS (SELECT doc_id, w, h,
      |    least(1000000, 224000000 // w, 224000000 // h) AS scale_ppm
      |  FROM i)
      |SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
      |  CAST(w * scale_ppm // 1000000 AS BIGINT) AS out_w,
      |  CAST(h * scale_ppm // 1000000 AS BIGINT) AS out_h,
      |  CAST(scale_ppm AS BIGINT) AS scale_ppm
      |FROM s ORDER BY doc_id""".stripMargin

  /** One sampled frame of a "video" blob. */
  case class Frame(doc_id: Long, frame_idx: Long, frame_off: Long,
                   frame_checksum: Long)

  /** Frame sampling over video blobs: fixed 32-byte "frames", every
    * 4th sampled — the partition-parallel decode-and-sample shape a
    * real video pipeline has (codec stubbed: frames are byte slices,
    * features are rolling checksums). Typed flatMap keeps the
    * per-blob loop tight and the fan-out streaming (no giant array
    * materialization per row).
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .filter(col("doc_id") % 3 === 2) // 'video' kind
      .select(col("doc_id"), col("text").cast("binary").as("data"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, data) =>
        val nFrames = data.length / 32
        (0 until nFrames by 4).iterator.map { f =>
          val off = f * 32
          var cs = 0L
          var i = off
          while (i < off + 32) { cs = (cs * 31 + (data(i) & 0xff)) % 997; i += 1 }
          Frame(id, f.toLong, off.toLong, cs)
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Oracle: pure-ASCII corpus ⇒ byte slices are substrings; frames
    * replayed with range(0, nf, 4) and the same rolling checksum.
    */
  val mmFrameSampleSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, strlen(text) // 32 AS nf FROM documents
      |  WHERE doc_id % 3 = 2),
      |fr AS (SELECT doc_id, text, unnest(range(0, nf, 4)) AS f FROM v)
      |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
      |  CAST(f * 32 AS BIGINT) AS frame_off,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(substr(text, CAST(f*32 + 1 AS INT), 32), ''), c -> CAST(ascii(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 997) AS frame_checksum
      |FROM fr ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------------- scene-cut detect
  /** Video scene-cut detection (r14 wave 18) — the temporal-structure
    * face of the video family: [[mmFrameSample]] plans WHICH frames to
    * decode, this one segments the stream into SCENES, the unit a
    * training pipeline actually samples clips from. Per 'video'-kind
    * blob, EVERY 32-byte frame gets a 16-bit ordinal signature (bit j
    * set iff frame byte 2j > byte 2j+1 — the rank-order feature family
    * real perceptual hashes use, deterministic on the fake decode);
    * a cut opens where the Hamming distance to the PREVIOUS frame's
    * signature reaches 12 of 16 bits (uncorrelated frames measure
    * ~Binomial(16, ½) ≈ 8, so 12 is a ~4 % tail — on this synthetic
    * corpus scenes are noise-cut segments, and the spec plants a real
    * repeated-frame fixture to pin boundary exactness). Output is the
    * per-scene ledger: frame span, length, and the opening cut's
    * distance. The signature, distance, and segmentation are all pure
    * SQL expressions — unlike the sibling faces this one needs no
    * typed escape, so it stays in whole-stage codegen end to end.
    *
    * == Scale design ==
    * One corpus scan; the frame fan-out is an explode over
    * length/32 positions with the signature computed map-side; the
    * only shuffle is the (doc)-keyed lag/cumsum window — partitioned
    * on doc_id, P-way parallel at any scale; the ledger collapses
    * frames to O(scenes).
    */
  /** Level-based audio segmentation (r14 wave 35 — the VAD face
    * beside [[mmSceneCut]]'s CHANGE detection: speech pipelines chunk
    * on loud-vs-quiet RUNS, not on content cuts): audio-kind blobs
    * split into 32-byte frames, each frame's energy = the exact
    * integer byte sum, a frame is `quiet` iff its energy is below the
    * blob's own mean — compared as the cross product
    * energy·n_frames < total_energy, no division — and maximal
    * same-state runs become the segments (run id = cumulative
    * state-change count). Per run: the quiet flag, frame span, and
    * energy mass — voiced runs are the transcription units, the
    * quiet-run length distribution is the silence-trim dial. The
    * byte-energy proxy is the stubbed-decode convention of the whole
    * mm family (§6): the run algebra, thresholding and windows are
    * the real deliverable.
    *
    * == Scale design ==
    * One corpus scan; the frame explode is blob-bounded, both windows
    * ride the per-blob partitioning, and the run rollup is map-side
    * combinable on (doc, run).
    */
  def mmSilenceChunks(s: SparkSession, dir: String): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy(col("doc_id")).orderBy(col("f"))
    docs(s, dir)
      .filter(col("doc_id") % 3 === 1) // 'audio' kind
      .select(col("doc_id"), col("text"),
        expr("length(text) div 32").as("nf"))
      .filter(col("nf") >= 1)
      .select(col("doc_id"), col("nf"), col("text"),
        explode(expr("sequence(CAST(0 AS BIGINT), nf - 1)")).as("f"))
      .withColumn("energy", expr(
        """aggregate(transform(sequence(0, 31), j ->
          |  CAST(ascii(substr(text, CAST(f*32 + j + 1 AS INT), 1)) AS BIGINT)),
          |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
      .withColumn("tot", sum(col("energy")).over(W.partitionBy(col("doc_id"))))
      .withColumn("quiet",
        (col("energy") * col("nf") < col("tot")).cast("long"))
      .withColumn("chg", when(lag(col("quiet"), 1).over(w).isNull ||
        lag(col("quiet"), 1).over(w) =!= col("quiet"), 1L).otherwise(0L))
      .withColumn("run_id",
        sum(col("chg")).over(w.rowsBetween(W.unboundedPreceding, 0)) - 1L)
      .groupBy(col("doc_id"), col("run_id"))
      .agg(max(col("quiet")).as("quiet"),
        min(col("f")).as("start_frame"), max(col("f")).as("end_frame"),
        count(lit(1)).as("n_frames"), sum(col("energy")).as("energy"))
      .orderBy(col("doc_id"), col("run_id"))
  }

  /** Oracle: pure-ASCII corpus ⇒ frame bytes are chars; same energy
    * fold, same cross-product threshold, same run algebra. */
  val mmSilenceChunksSql: String =
    """WITH a AS (SELECT doc_id, text, strlen(text) // 32 AS nf FROM documents
      |  WHERE doc_id % 3 = 1 AND strlen(text) >= 32),
      |fr AS (SELECT doc_id, nf, text, unnest(range(0, nf)) AS f FROM a),
      |en AS (SELECT doc_id, nf, f,
      |    list_sum(list_transform(range(0, 32), j ->
      |      CAST(ascii(substr(text, CAST(f*32 + j + 1 AS INT), 1)) AS BIGINT))) AS energy
      |  FROM fr),
      |qt AS (SELECT doc_id, f, energy,
      |    CASE WHEN energy * nf < sum(energy) OVER (PARTITION BY doc_id)
      |      THEN 1 ELSE 0 END AS quiet
      |  FROM en),
      |ch AS (SELECT doc_id, f, energy, quiet,
      |    CASE WHEN lag(quiet) OVER (PARTITION BY doc_id ORDER BY f) IS NULL
      |           OR lag(quiet) OVER (PARTITION BY doc_id ORDER BY f) <> quiet
      |         THEN 1 ELSE 0 END AS chg
      |  FROM qt),
      |rn AS (SELECT doc_id, f, energy, quiet,
      |    CAST(sum(chg) OVER (PARTITION BY doc_id ORDER BY f
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS run_id
      |  FROM ch)
      |SELECT doc_id, run_id, CAST(max(quiet) AS BIGINT) AS quiet,
      |  CAST(min(f) AS BIGINT) AS start_frame,
      |  CAST(max(f) AS BIGINT) AS end_frame,
      |  count(*) AS n_frames, CAST(sum(energy) AS BIGINT) AS energy
      |FROM rn GROUP BY 1, 2 ORDER BY doc_id, run_id""".stripMargin

  def mmSceneCut(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("f"))
    val wRun = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    docs(s, dir)
      .filter(col("doc_id") % 3 === 2) // 'video' kind
      .select(col("doc_id"), col("text"),
        expr("length(text) div 32").as("nf"))
      .filter(col("nf") >= 1)
      .select(col("doc_id"), col("text"),
        explode(expr("sequence(CAST(0 AS BIGINT), nf - 1)")).as("f"))
      .withColumn("sig", expr(
        """aggregate(transform(sequence(0, 15), j ->
          |  IF(ascii(substr(text, CAST(f*32 + 2*j + 1 AS INT), 1))
          |     > ascii(substr(text, CAST(f*32 + 2*j + 2 AS INT), 1)),
          |     shiftleft(1, j), 0)), 0, (a, x) -> a + x)""".stripMargin)
        .cast("long"))
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("dist", expr(
        "bit_count(CAST(sig AS INT) ^ CAST(prev AS INT))").cast("long"))
      .withColumn("cut",
        when(col("prev").isNotNull && col("dist") >= 12L, 1L).otherwise(0L))
      .withColumn("scene_id", sum(col("cut")).over(wRun))
      .groupBy(col("doc_id"), col("scene_id"))
      .agg(min(col("f")).as("start_frame"), max(col("f")).as("end_frame"),
        count(lit(1)).as("n_frames"),
        max(when(col("cut") === 1L, col("dist"))).as("cut_dist"))
      .orderBy(col("doc_id"), col("scene_id"))
  }

  /** Oracle: pure-ASCII corpus ⇒ frame bytes are chars; same ordinal
    * signature, same lag distance, same running cut sum. */
  val mmSceneCutSql: String =
    """WITH v AS (SELECT doc_id, text, strlen(text) // 32 AS nf FROM documents
      |  WHERE doc_id % 3 = 2 AND strlen(text) >= 32),
      |fr AS (SELECT doc_id, text, unnest(range(0, nf)) AS f FROM v),
      |sg AS (SELECT doc_id, f,
      |    list_sum(list_transform(range(0, 16), j ->
      |      CASE WHEN ascii(substr(text, CAST(f*32 + 2*j + 1 AS INT), 1))
      |           > ascii(substr(text, CAST(f*32 + 2*j + 2 AS INT), 1))
      |      THEN 1 << CAST(j AS INT) ELSE 0 END)) AS sig
      |  FROM fr),
      |lg AS (SELECT doc_id, f, sig,
      |    lag(sig) OVER (PARTITION BY doc_id ORDER BY f) AS prev FROM sg),
      |ct AS (SELECT doc_id, f,
      |    CASE WHEN prev IS NULL THEN NULL
      |         ELSE bit_count(xor(CAST(sig AS INT), CAST(prev AS INT))) END AS dist,
      |    CASE WHEN prev IS NOT NULL
      |          AND bit_count(xor(CAST(sig AS INT), CAST(prev AS INT))) >= 12
      |         THEN 1 ELSE 0 END AS cut
      |  FROM lg),
      |sc AS (SELECT doc_id, f, dist, cut,
      |    CAST(sum(cut) OVER (PARTITION BY doc_id ORDER BY f
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_id
      |  FROM ct)
      |SELECT doc_id, scene_id,
      |  CAST(min(f) AS BIGINT) AS start_frame,
      |  CAST(max(f) AS BIGINT) AS end_frame,
      |  CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(max(CASE WHEN cut = 1 THEN dist END) AS BIGINT) AS cut_dist
      |FROM sc GROUP BY 1, 2 ORDER BY doc_id, scene_id""".stripMargin

  // ---------------------------------------------------- CDC chunk dedup
  /** Sub-blob dedup accounting via content-defined chunking: every blob
    * splits at Rabin-style rolling-hash boundaries
    * ([[graft.functions.CdcKernel]] — codegen'd, one kernel call per
    * row), and byte-identical CHUNKS shared across different blobs are
    * counted with the bytes a chunk store would elide. This is the
    * finer-grained sibling of [[mmDedupBlob]]: whole-blob dedup misses
    * near-identical media (same content, shifted bytes); CDC boundaries
    * re-align after an edit within one 8-byte window, so shared runs
    * still collapse.
    *
    * == Scale design ==
    * One corpus scan; the kernel emits packed (hash·2²⁰+len) longs so
    * the explode carries a primitive array, and the accounting is a
    * single map-side-combinable groupBy on the descriptor. Hash keys
    * are uniform by construction (no skew).
    *
    * ACCOUNTING BOUND: chunk identity here is the (31-bit rolling
    * hash, 20-bit length) descriptor, NOT the chunk bytes — two
    * different chunks of equal length collide with p≈2⁻³¹, so by the
    * birthday bound the expected first false "shared chunk" appears
    * around ~2¹⁵ distinct chunks per length class and the saved-bytes
    * estimate OVERSTATES dedup beyond that. This face is the
    * accounting ESTIMATE; a production chunk store keyed on these
    * descriptors would widen identity to a cryptographic digest of the
    * chunk bytes (exactly what [[mmDedupBlob]] does per blob), turning
    * collisions from silent overcounts into impossibilities. The DuckDB
    * oracle replays the same descriptor identity, so the hash match
    * verifies the splitter, not the collision-freeness.
    *
    * The DuckDB oracle replays
    * the splitter DECLARATIVELY — one row per byte, window-hash
    * per position, prefix-sum chunk ids — the formulation the codegen
    * kernel exists to avoid at scale, and the two must agree exactly.
    */
  def mmCdcChunks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val ch = GraftSqlShim.column(
      graft.functions.CdcChunks(GraftSqlShim.expression(col("text"))))
    docs(s, dir)
      .select(explode(ch).as("d"))
      .select(shiftright(col("d"), 20).as("chunk_hash"),
        col("d").bitwiseAND(lit(1048575L)).as("chunk_len"))
      .groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(count(lit(1)).as("n_refs"))
      .filter(col("n_refs") >= 2)
      .select(col("chunk_hash"), col("chunk_len"), col("n_refs"),
        ((col("n_refs") - 1) * col("chunk_len")).as("bytes_saved"))
      .orderBy(col("n_refs").desc, col("chunk_hash"), col("chunk_len"))
  }

  /** DuckDB twin: the declarative splitter — per-byte rows, an 8-byte
    * window fold per position, boundary prefix-sums as chunk ids, and
    * an ordered per-chunk byte fold. Corpus is pure ASCII so character
    * folds equal the kernel's byte folds.
    */
  val mmCdcChunksSql: String =
    """WITH pos AS (SELECT doc_id, text,
      |    unnest(range(1, strlen(text)+1)) AS i FROM documents),
      |b AS (SELECT doc_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS byte,
      |    CASE WHEN i >= 8 THEN
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(CAST(i-7 AS INT), CAST(i+1 AS INT)),
      |          j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
      |        (a, c) -> (a*31 + c) % 2147483647)
      |    ELSE NULL END AS w
      |  FROM pos),
      |m AS (SELECT doc_id, i, byte,
      |    CASE WHEN w IS NOT NULL AND w % 64 = 0 THEN 1 ELSE 0 END AS bnd
      |  FROM b),
      |c AS (SELECT doc_id, i, byte,
      |    COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
      |  FROM m),
      |ch AS (SELECT doc_id, cid,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list(CAST(byte AS BIGINT) ORDER BY i)),
      |      (a, x) -> (a*31 + x) % 2147483647) AS hash,
      |    count(*) AS len
      |  FROM c GROUP BY 1, 2)
      |SELECT hash AS chunk_hash, len AS chunk_len, count(*) AS n_refs,
      |  (count(*) - 1) * len AS bytes_saved
      |FROM ch GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY n_refs DESC, chunk_hash, chunk_len""".stripMargin

  /** Chunk-STORE bill per modality kind (r14 wave 24 — the
    * execute-side ledger [[mmCdcChunks]]' per-chunk accounting feeds:
    * what the storage invoice looks like after content-defined dedup):
    * every blob's chunk references are charged raw; each DISTINCT
    * chunk is stored once, charged to the kind of its FIRST reference
    * (min doc_id — the "first writer pays" convention that makes the
    * per-kind stored bytes sum EXACTLY to the global store size, the
    * conservation the spec pins). Output per kind: blobs, chunk refs,
    * raw bytes, chunks owned, stored bytes, bytes saved, and the
    * stored/raw ratio in exact ppm. Chunk identity is the same
    * (hash, len) descriptor as the parent face — the birthday-bound
    * caveat there applies verbatim.
    *
    * == Scale design ==
    * ONE corpus scan through the codegen'd splitter kernel folds to
    * the per-ref relation (stableCheckpointed — it feeds both the
    * owner fold and the raw rollup); owners are one
    * map-side-combinable groupBy on uniform hash keys; both ledgers
    * are O(kinds) = 3 rows.
    */
  def mmCdcDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val ch = GraftSqlShim.column(
      graft.functions.CdcChunks(GraftSqlShim.expression(col("text"))))
    def kindOf(id: Column): Column =
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (id % 3 + 1).cast("int"))
    val refs = docs(s, dir)
      .filter(octet_length(col("text")) > 0)
      .select(col("doc_id"), kindOf(col("doc_id")).as("kind"), explode(ch).as("d"))
      .select(col("doc_id"), col("kind"),
        shiftright(col("d"), 20).as("chunk_hash"),
        col("d").bitwiseAND(lit(1048575L)).as("chunk_len"))
      .stableCheckpoint()
    val raw = refs.groupBy(col("kind")).agg(
      countDistinct(col("doc_id")).as("n_blobs"),
      count(lit(1)).as("n_chunk_refs"),
      sum(col("chunk_len")).as("raw_bytes"))
    val stored = refs.groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(min(col("doc_id")).as("owner_doc"))
      .groupBy(kindOf(col("owner_doc")).as("kind"))
      .agg(count(lit(1)).as("n_chunks_owned"),
        sum(col("chunk_len")).as("stored_bytes"))
    raw.join(stored, Seq("kind"), "left_outer")
      .select(col("kind"), col("n_blobs"), col("n_chunk_refs"), col("raw_bytes"),
        coalesce(col("n_chunks_owned"), lit(0L)).as("n_chunks_owned"),
        coalesce(col("stored_bytes"), lit(0L)).as("stored_bytes"),
        (col("raw_bytes") - coalesce(col("stored_bytes"), lit(0L))).as("bytes_saved"),
        expr("1000000 * coalesce(stored_bytes, 0) div raw_bytes").as("stored_ppm"))
      .orderBy(col("kind"))
  }

  /** DuckDB twin: the parent face's declarative splitter CTEs kept
    * per-doc, then the same owner/raw rollups. */
  val mmCdcDedupSql: String =
    """WITH pos AS (SELECT doc_id, text,
      |    unnest(range(1, strlen(text)+1)) AS i FROM documents
      |  WHERE strlen(text) > 0),
      |b AS (SELECT doc_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS byte,
      |    CASE WHEN i >= 8 THEN
      |      list_reduce(list_prepend(CAST(0 AS BIGINT),
      |        list_transform(range(CAST(i-7 AS INT), CAST(i+1 AS INT)),
      |          j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
      |        (a, c) -> (a*31 + c) % 2147483647)
      |    ELSE NULL END AS w
      |  FROM pos),
      |m AS (SELECT doc_id, i, byte,
      |    CASE WHEN w IS NOT NULL AND w % 64 = 0 THEN 1 ELSE 0 END AS bnd
      |  FROM b),
      |c AS (SELECT doc_id, i, byte,
      |    COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
      |  FROM m),
      |ch AS (SELECT doc_id, cid,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list(CAST(byte AS BIGINT) ORDER BY i)),
      |      (a, x) -> (a*31 + x) % 2147483647) AS hash,
      |    count(*) AS len
      |  FROM c GROUP BY 1, 2),
      |refs AS (SELECT doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    hash, len FROM ch),
      |raw AS (SELECT kind, count(DISTINCT doc_id) AS n_blobs,
      |    count(*) AS n_chunk_refs, CAST(sum(len) AS BIGINT) AS raw_bytes
      |  FROM refs GROUP BY 1),
      |own AS (SELECT hash, len, min(doc_id) AS owner_doc
      |  FROM refs GROUP BY 1, 2),
      |st AS (SELECT ['image', 'audio', 'video'][CAST(owner_doc % 3 + 1 AS INT)] AS kind,
      |    count(*) AS n_chunks_owned, CAST(sum(len) AS BIGINT) AS stored_bytes
      |  FROM own GROUP BY 1)
      |SELECT raw.kind, n_blobs, n_chunk_refs, raw_bytes,
      |  COALESCE(n_chunks_owned, 0) AS n_chunks_owned,
      |  COALESCE(stored_bytes, 0) AS stored_bytes,
      |  raw_bytes - COALESCE(stored_bytes, 0) AS bytes_saved,
      |  1000000 * COALESCE(stored_bytes, 0) // raw_bytes AS stored_ppm
      |FROM raw LEFT JOIN st USING (kind) ORDER BY kind""".stripMargin

  // ------------------------------------------------- perceptual hash
  /** Per-blob perceptual signature — the average-hash (aHash) skeleton
    * every image near-dup pipeline computes after decode: downscale to
    * a fixed grid of block means, set bit j iff block j's mean exceeds
    * the global mean, pack to one integer. The decode is the stubbed
    * step (no codecs in this container), but the block-mean downscale
    * IS the real resample math — cell j of 60 averages the byte range
    * [⌊j·len/60⌋, ⌊(j+1)·len/60⌋), exactly a 1×60 box filter over the
    * payload — so the Spark-side signature plumbing is the genuine
    * deliverable. All comparisons are EXACT integer cross-products
    * (cellSum·len > totalSum·cellLen ⇔ cellMean > globalMean), no
    * float division, so both engines agree bitwise. 60 bits (not
    * aHash's 64) to share [[Dedup.dedupSimhash]]'s 4×15 band geometry
    * and stay in positive Long territory on both engines.
    *
    * Unlike the word-set signatures (MinHash, SimHash), this is a
    * POSITIONAL byte-layout signal: two blobs hash close when their
    * byte mass is distributed the same way along the stream — the
    * modality-agnostic analogue of "the images look alike" rather
    * than "the captions share words".
    *
    * == Scale design ==
    * One corpus scan, O(1) work per byte, and the output is a
    * 16-byte/blob signature relation — the thin-relation shape every
    * downstream near-dup pass joins against. Embarrassingly parallel;
    * no shuffle before the display sort.
    */
  private def phashSigs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .filter(octet_length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, t) =>
          val len = t.length
          val cs = new Array[Long](60)
          val cl = new Array[Long](60)
          var ts = 0L
          var i = 0
          while (i < len) {
            val b = (i.toLong * 60L / len).toInt
            val v = t.charAt(i).toLong // pure-ASCII corpus: char == byte
            cs(b) += v; cl(b) += 1L; ts += v
            i += 1
          }
          var ph = 0L
          var j = 0
          while (j < 60) {
            if (cs(j) * len > ts * cl(j)) ph |= (1L << j)
            j += 1
          }
          (id, ph)
        }
      }
      .toDF("doc_id", "phash")
  }

  /** Registered signature face: (doc_id, phash) for every blob. */
  def mmPhash(s: SparkSession, dir: String): DataFrame =
    phashSigs(s, dir).orderBy(col("doc_id"))

  /** DuckDB twin: per-byte rows, block sums grouped by ⌊i·60/len⌋, the
    * same integer cross-product threshold, bits summed as powers of
    * two. The declarative per-byte formulation the tight partition
    * loop exists to avoid at scale — and the two must agree exactly.
    */
  val mmPhashSql: String =
    """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents
      |  WHERE strlen(text) > 0),
      |ch AS (SELECT doc_id, unnest(range(0, len)) AS i FROM d),
      |b AS (SELECT ch.doc_id, d.len, (i * 60) // d.len AS bin,
      |    ascii(substr(d.text, CAST(i + 1 AS INT), 1)) AS byte
      |  FROM ch JOIN d USING (doc_id)),
      |cell AS (SELECT doc_id, len, bin, sum(byte) AS cs, count(*) AS cl
      |  FROM b GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(cs) AS ts FROM cell GROUP BY 1)
      |SELECT cell.doc_id,
      |  CAST(sum(CASE WHEN cs * len > ts * cl
      |    THEN (CAST(1 AS BIGINT) << CAST(bin AS INT)) ELSE 0 END) AS BIGINT)
      |    AS phash
      |FROM cell JOIN tot USING (doc_id)
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** Blob near-dup pairs by perceptual-hash distance — the multimodal
    * counterpart of [[Dedup.dedupSimhash]]: [[mmPhash]] signatures
    * banded into 4×15-bit chunks (pigeonhole guarantees a clean band
    * only below 4 differing bits; at the ≤ 10 threshold banding is
    * the standard recall-trading LSH prune, same trade as
    * dedup_simhash's), then exact Hamming verify ≤ 10 and distinct. Whole-blob sha dedup
    * ([[mmDedupBlob]]) catches byte-identical copies only; this face
    * surfaces the near-identical media a content store cannot key on.
    * Measured at sf0.01: candidate Hamming continuum 8..28+, the ≤ 10
    * survivors carry word-Jaccard ≈ 0.4–0.45 vs the corpus's random
    * baseline — real layout near-dups, not band-collision noise.
    *
    * == Scale design ==
    * The join runs on the 16-byte signature relation, never the
    * corpus. Band keys are hash-uniform (no skew); bucket sizes are
    * ~N/2¹⁵ per band so within-bucket work is the same Σbucket² bound
    * already accepted for [[Dedup.dedupSimhash]]; the Hamming filter
    * prunes candidates BEFORE the distinct shuffle.
    */
  def mmDedupPhash(s: SparkSession, dir: String): DataFrame = {
    val sigs = phashSigs(s, dir)
    val chunkCols = (0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftright(col("phash"), c * 15).bitwiseAND(lit(32767L)).as("bv")))
    val banded = sigs.select(col("doc_id"), col("phash"),
      explode(array(chunkCols: _*)).as("cc"))
      .select(col("doc_id"), col("phash"), col("cc.band"), col("cc.bv"))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv")
        && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= 10)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin: the phash CTE, the same 4×15 banding via
    * shift-and-mask, exact Hamming via bit_count(xor). */
  val mmDedupPhashSql: String =
    """WITH d AS (SELECT doc_id, text, strlen(text) AS len FROM documents
      |  WHERE strlen(text) > 0),
      |chx AS (SELECT doc_id, unnest(range(0, len)) AS i FROM d),
      |bb AS (SELECT chx.doc_id, d.len, (i * 60) // d.len AS bin,
      |    ascii(substr(d.text, CAST(i + 1 AS INT), 1)) AS byte
      |  FROM chx JOIN d USING (doc_id)),
      |cell AS (SELECT doc_id, len, bin, sum(byte) AS cs, count(*) AS cl
      |  FROM bb GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(cs) AS ts FROM cell GROUP BY 1),
      |ph AS (SELECT cell.doc_id,
      |    CAST(sum(CASE WHEN cs * len > ts * cl
      |      THEN (CAST(1 AS BIGINT) << CAST(bin AS INT)) ELSE 0 END) AS BIGINT)
      |      AS phash
      |  FROM cell JOIN tot USING (doc_id) GROUP BY 1),
      |bands AS (SELECT doc_id, phash, b AS band,
      |    (phash >> CAST(b * 15 AS INT)) & 32767 AS bv
      |  FROM ph, unnest(range(0, 4)) t(b)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |    CAST(bit_count(xor(a.phash, b2.phash)) AS INTEGER) AS hamming
      |  FROM bands a JOIN bands b2
      |    ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id
      |  WHERE bit_count(xor(a.phash, b2.phash)) <= 10)
      |SELECT doc_a, doc_b, hamming FROM cand ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------- composed media build
  /** The composed media-curation pipeline (r15) — the multimodal twin
    * of the text side's pretrain/eval/incremental/feature builds
    * ([[Curate.pipelinePretrainBuild]]): every stage is a REGISTERED
    * face, chained with marginal accounting so each kind's ingest
    * count decomposes exactly into what each stage removed plus what
    * survived (`n_ingested = n_blob_dup + n_phash_dup + n_admitted`,
    * the identity the spec pins):
    *
    *   1. ingest — [[mmIngest]]'s typed-metadata relation (kind,
    *      byte length, sha256); the only stage that hashes raw bytes.
    *   2. CAS blob dedup — [[mmDedupBlob]]'s rule: byte-identical
    *      copies collapse onto the minimum doc_id; non-canonical
    *      copies drop, charged to their OWN declared kind.
    *   3. perceptual near-dup cut — [[mmDedupPhash]]'s banded pair
    *      list verbatim; any survivor appearing as the HIGHER-id
    *      endpoint of a qualifying pair drops (the corpus_semdedup
    *      convention).
    *   4. CDC storage bill — [[mmCdcDedup]]'s chunk machinery over
    *      the ADMITTED set only: raw chunk-ref bytes per kind, stored
    *      bytes under first-writer-pays owner attribution, and the
    *      stored/raw ratio in exact ppm.
    *
    * == Scale design ==
    * Each stage materializes a THIN relation (ids + kind + metadata;
    * checkpointed), so the composed DAG never moves blob payloads
    * between stages — text/bytes are read only inside stage 1's hash
    * fold, stage 3's signature build, and stage 4's chunk split, each
    * a single corpus scan behind its checkpoint. The final ledger is
    * O(kinds) = 3 rows; every join past the scans is on those bounded
    * relations.
    */
  def pipelineMediaBuild(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    // [1] ingest — typed metadata only past this checkpoint (just the
    // columns the stages consume: id, kind, digest — byte accounting
    // happens in stage 4's chunk refs, not here)
    val ing = docs(s, dir).select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        sha2(col("text"), 256).as("sha256"))
      .stableCheckpoint()
    // [2] CAS survivors: min doc_id per digest
    val canon = ing.groupBy(col("sha256")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val surv = ing.join(canon, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("kind"))
    // [3] the registered phash pair list; higher-id endpoints drop
    val pdrop = mmDedupPhash(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
      .stableCheckpoint()
    val adm = surv.join(pdrop, Seq("doc_id"), "left_anti")
    // [4] CDC chunk refs over the admitted set only
    val ch = GraftSqlShim.column(
      graft.functions.CdcChunks(GraftSqlShim.expression(col("text"))))
    val refs = docs(s, dir)
      .join(adm, Seq("doc_id"))
      .filter(octet_length(col("text")) > 0)
      .select(col("doc_id"), col("kind"), explode(ch).as("d"))
      .select(col("doc_id"), col("kind"),
        shiftright(col("d"), 20).as("chunk_hash"),
        col("d").bitwiseAND(lit(1048575L)).as("chunk_len"))
      .stableCheckpoint()
    // marginal stage ledgers, all O(kinds)
    val ingC = ing.groupBy(col("kind")).agg(count(lit(1)).as("n_ingested"))
    val blobC = ing.join(canon, Seq("doc_id"), "left_anti")
      .groupBy(col("kind")).agg(count(lit(1)).as("n_blob_dup"))
    val phashC = surv.join(pdrop, Seq("doc_id"), "left_semi")
      .groupBy(col("kind")).agg(count(lit(1)).as("n_phash_dup"))
    val admC = adm.groupBy(col("kind")).agg(count(lit(1)).as("n_admitted"))
    val raw = refs.groupBy(col("kind")).agg(sum(col("chunk_len")).as("raw_bytes"))
    val st = refs.groupBy(col("chunk_hash"), col("chunk_len"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(adm, Seq("doc_id"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_chunks_owned"), sum(col("chunk_len")).as("stored_bytes"))
    ingC
      .join(blobC, Seq("kind"), "left_outer")
      .join(phashC, Seq("kind"), "left_outer")
      .join(admC, Seq("kind"), "left_outer")
      .join(raw, Seq("kind"), "left_outer")
      .join(st, Seq("kind"), "left_outer")
      .select(col("kind"), col("n_ingested"),
        coalesce(col("n_blob_dup"), lit(0L)).as("n_blob_dup"),
        coalesce(col("n_phash_dup"), lit(0L)).as("n_phash_dup"),
        coalesce(col("n_admitted"), lit(0L)).as("n_admitted"),
        coalesce(col("raw_bytes"), lit(0L)).as("raw_bytes"),
        coalesce(col("n_chunks_owned"), lit(0L)).as("n_chunks_owned"),
        coalesce(col("stored_bytes"), lit(0L)).as("stored_bytes"),
        (coalesce(col("raw_bytes"), lit(0L)) - coalesce(col("stored_bytes"), lit(0L)))
          .as("bytes_saved"),
        expr("1000000 * coalesce(stored_bytes, 0) div greatest(coalesce(raw_bytes, 0), 1)")
          .as("stored_ppm"))
      .orderBy(col("kind"))
  }

  // ------------------------------------------ cross-modal dedup link
  /** Cross-modal dedup (r20 — r19 verdict gap #3): for every VERIFIED
    * text near-dup pair ([[Dedup.dedupMinhashLsh]]'s banded+jaccard
    * face verbatim), the media relationship of the two docs' blobs on
    * the shared doc spine — `exact` (byte-identical blobs: CAS sha
    * equal), `near` (in [[mmDedupPhash]]'s banded perceptual pair
    * list), or `distinct` (textually near-dup docs whose media
    * genuinely differs — the pairs a multimodal dedup policy must NOT
    * collapse blindly). Pure join face: the text pair relation, the
    * per-doc sha projection, and the phash pair relation are each an
    * already-verified face's output; no new similarity machinery.
    *
    * == Scale design ==
    * The pair relations are the (bounded) near-dup candidate sets,
    * never the corpus cross product; the sha projection is one
    * column-pruned scan; all joins are id-keyed equi-joins. At 100 TB
    * this face costs what its two parent dedup faces cost — the link
    * itself is O(verified pairs).
    */
  def mmDedupCrossmodal(s: SparkSession, dir: String): DataFrame = {
    val tp = Dedup.dedupMinhashLsh(s, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val sha = docs(s, dir).select(col("doc_id"), sha2(col("text"), 256).as("sha"))
    val ph = mmDedupPhash(s, dir)
      .select(col("doc_a").as("pa"), col("doc_b").as("pb"), lit(1L).as("phit"))
    tp.join(sha.select(col("doc_id").as("doc_a"), col("sha").as("sha_a")), Seq("doc_a"))
      .join(sha.select(col("doc_id").as("doc_b"), col("sha").as("sha_b")), Seq("doc_b"))
      .join(ph, col("doc_a") === col("pa") && col("doc_b") === col("pb"), "left")
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        when(col("sha_a") === col("sha_b"), lit("exact"))
          .when(col("phit").isNotNull, lit("near"))
          .otherwise(lit("distinct")).as("media_rel"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB twin: both parent pair faces inlined as derived tables,
    * the same sha projection, the same precedence (exact > near). */
  lazy val mmDedupCrossmodalSql: String =
    s"""WITH tp AS (SELECT doc_a, doc_b, jaccard FROM (${Dedup.dedupMinhashLshSql})),
       |shx AS (SELECT doc_id, sha256(text) AS sha FROM documents),
       |phx AS (SELECT doc_a AS pa, doc_b AS pb FROM ($mmDedupPhashSql))
       |SELECT tp.doc_a, tp.doc_b, tp.jaccard,
       |  CASE WHEN sa.sha = sb.sha THEN 'exact'
       |       WHEN phx.pa IS NOT NULL THEN 'near'
       |       ELSE 'distinct' END AS media_rel
       |FROM tp
       |JOIN shx sa ON sa.doc_id = tp.doc_a
       |JOIN shx sb ON sb.doc_id = tp.doc_b
       |LEFT JOIN phx ON phx.pa = tp.doc_a AND phx.pb = tp.doc_b
       |ORDER BY tp.doc_a, tp.doc_b""".stripMargin

  // ------------------------------- composed multimodal pretrain mix
  /** The interleaved text+media TRAINING-MIX build (r20) — the one
    * composed pipeline a multimodal-model data team asks for next
    * (r19 verdict gap #2): join the text build's admitted docs to the
    * media build's admitted blobs on the shared doc spine, classify
    * every document into its mix class, and apply a JOINT
    * token+patch budget over the multimodal examples.
    *
    * Stage reuse (each stage's registered face is the contract):
    *   - TEXT admission + subword mass are
    *     [[Curate.pipelinePretrainBuild]]'s stages 1–4 verbatim
    *     (quality gate ≥ 0.5, exemplar drop, dedup-aware bucket < 90,
    *     trained-BPE subword rollup) — the spec pins this face's text
    *     totals to that build's shard ledger;
    *   - MEDIA admission is [[pipelineMediaBuild]]'s stages 1–3
    *     verbatim (CAS canon, phash higher-id drop) — the spec pins
    *     per-kind media totals to that build's `n_admitted`;
    *   - the PATCH measure is `(blob_bytes + 63) div 64` per admitted
    *     blob — the fixed-grid patch-count proxy over the opaque
    *     payload (the container has no codecs, §6; a real pipeline
    *     substitutes decoded H·W/p² here and nothing else changes).
    *
    * Mix classes on the FULL OUTER doc spine: `joint` (admitted on
    * both sides — the multimodal example, kind-labeled), `text_only`
    * (text admitted, media dropped its blob), `media_only` (blob
    * admitted but the caption failed the text gate — unusable for
    * caption-conditioned pretraining, reported as the loss it is).
    * The joint budget keeps multimodal examples in epoch-0 shuffle
    * order while their running joint cost (subwords + patches) stays
    * within 80% of the class's total mass — integer arithmetic
    * (cum·5 ≤ total·4), exact on both engines.
    *
    * == Scale design ==
    * Both admission legs are THIN id relations behind checkpoints
    * (payloads never cross a stage boundary — the media leg's
    * contract); the spine join is id-keyed, the budget rides the
    * two-phase range-partitioned prefix sum (no single-task sort),
    * and the ledger is O(mix·kinds) = 7 rows.
    */
  /** MEDIA admission leg of [[pipelineMmPretrain]] —
    * [[pipelineMediaBuild]] stages 1–3 plus the fixed-grid patch
    * measure, as one relation (doc_id, kind, n_patches). Extracted so
    * the composed build reads it as a shared per-corpus artifact
    * (the text leg's [[graft.operators.Curate.pretrainAdmittedShared]]
    * symmetry); the registered media build keeps its own fresh chain.
    */
  private def mediaAdmittedRel(s: SparkSession, dir: String): DataFrame = {
    val ing = docs(s, dir).select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        sha2(col("text"), 256).as("sha256"))
    val canon = ing.groupBy(col("sha256")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val surv = ing.join(canon, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("kind"))
    val pdrop = mmDedupPhash(s, dir)
      .select(col("doc_b").as("doc_id")).distinct()
    surv.join(pdrop, Seq("doc_id"), "left_anti")
      .join(docs(s, dir).select(col("doc_id"),
        expr("(octet_length(text) + 63) div 64").as("n_patches")), Seq("doc_id"))
  }

  private def mediaAdmittedShared(s: SparkSession, dir: String): DataFrame =
    graft.plans.SharedRel(s, "mediaAdmitted|" + dir,
      graft.plans.SharedRel.corpusSig(s, dir, "documents")) {
      mediaAdmittedRel(s, dir)
    }

  def pipelineMmPretrain(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // TEXT leg — pipelinePretrainBuild stages 1-4, read as the shared
    // admitted-set artifact (r20 verdict item 5: the two admission
    // legs re-scanned their corpora; production reads the persisted
    // admitted relations)
    val text = Curate.pretrainAdmittedShared(s, dir)
    // MEDIA leg — pipelineMediaBuild stages 1-3 + the patch measure,
    // same shared-artifact read
    val adm = mediaAdmittedShared(s, dir)
    // the doc spine classifies the mix
    val spine = text.join(adm, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("n_subwords").isNotNull && col("kind").isNotNull, lit("joint"))
          .when(col("n_subwords").isNotNull, lit("text_only"))
          .otherwise(lit("media_only")).as("mix"),
        coalesce(col("kind"), lit("text")).as("kind"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        coalesce(col("n_patches"), lit(0L)).as("n_patches"))
      .stableCheckpoint()
    // joint budget: epoch-0 shuffle order, two-phase prefix sum, 80% cut
    val joint = spine.filter(col("mix") === "joint")
      .select(col("doc_id"),
        (col("n_subwords") + col("n_patches")).as("cost"),
        Curate.epochHash(0).as("hk"))
    val pos = Analytics.globalRowPos(joint, Seq.empty,
      Seq(col("hk"), col("doc_id")), "pos", "__n")
    val bktd = pos.withColumn("bkt", expr("(pos - 1) div 64"))
    val intra = Window.partitionBy(col("bkt")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bktd.withColumn("cum_in", sum(col("cost")).over(intra))
    val prefixes = bktd.groupBy(col("bkt")).agg(sum(col("cost")).as("bt"))
      .withColumn("bp", coalesce(sum(col("bt")).over(
        Window.orderBy(col("bkt")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("bp"))
    val total = joint.agg(sum(col("cost")).as("tc"))
    val sel = cum.join(broadcast(prefixes), "bkt")
      .crossJoin(broadcast(total))
      .filter((col("bp") + col("cum_in")) * 5L <= col("tc") * 4L)
      .select(col("doc_id"), lit(1L).as("selflag"))
    spine.join(sel, Seq("doc_id"), "left")
      .groupBy(col("mix"), col("kind"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_patches")).as("n_patches"),
        sum(col("n_subwords") + col("n_patches")).as("joint_cost"),
        sum(when(col("selflag").isNotNull, 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("selflag").isNotNull, col("n_subwords") + col("n_patches"))
          .otherwise(0L)).as("sel_cost"))
      .withColumn("share_ppm",
        expr("1000000 * joint_cost div sum(joint_cost) over ()"))
      .orderBy(col("mix"), col("kind"))
  }

  /** DuckDB twin: the text build's CTE chain (shared recursive
    * components + quality + segments), the media build's admission
    * chain, the FULL OUTER spine, the same epoch-0 hash rank and
    * running-sum budget cut, rolled up per (mix, kind). */
  lazy val pipelineMmPretrainSql: String =
    s"""WITH RECURSIVE ${Dedup.componentCtes},
       |${Curate.qualityCte},
       |sv AS (SELECT word, n_syms FROM (${TextOps.tokenizeBpeSegmentsSql})),
       |fb AS (SELECT doc_id,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007) % 100 AS own_bucket
       |  FROM documents),
       |keep AS (
       |  SELECT q.doc_id FROM q JOIN fb USING (doc_id)
       |  WHERE q.quality_score >= 0.5
       |    AND NOT EXISTS (SELECT 1 FROM comp
       |                    WHERE comp.doc_id = q.doc_id AND comp.component <> q.doc_id)
       |    AND fb.own_bucket < 90),
       |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
       |dc AS (SELECT dw.doc_id, CAST(sum(n_syms) AS BIGINT) AS n_subwords
       |  FROM dw JOIN sv ON sv.word = dw.w JOIN keep ON keep.doc_id = dw.doc_id
       |  WHERE w <> '' GROUP BY dw.doc_id),
       |ing AS (SELECT doc_id,
       |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
       |    sha256(text) AS sha256 FROM documents),
       |canon AS (SELECT min(doc_id) AS doc_id FROM ing GROUP BY sha256),
       |surv AS (SELECT i.doc_id, i.kind FROM ing i
       |  WHERE EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = i.doc_id)),
       |pdrop AS (SELECT DISTINCT doc_b AS doc_id FROM ($mmDedupPhashSql)),
       |admp AS (SELECT s2.doc_id, s2.kind,
       |    (strlen(d.text) + 63) // 64 AS n_patches
       |  FROM surv s2 JOIN documents d USING (doc_id)
       |  WHERE NOT EXISTS (SELECT 1 FROM pdrop p WHERE p.doc_id = s2.doc_id)),
       |spine AS (SELECT COALESCE(t.doc_id, m.doc_id) AS doc_id,
       |    CASE WHEN t.doc_id IS NOT NULL AND m.doc_id IS NOT NULL THEN 'joint'
       |         WHEN t.doc_id IS NOT NULL THEN 'text_only'
       |         ELSE 'media_only' END AS mix,
       |    COALESCE(m.kind, 'text') AS kind,
       |    COALESCE(t.n_subwords, 0) AS n_subwords,
       |    COALESCE(m.n_patches, 0) AS n_patches
       |  FROM dc t FULL OUTER JOIN admp m ON m.doc_id = t.doc_id),
       |jt AS (SELECT doc_id, n_subwords + n_patches AS cost,
       |    ${Curate.epochHashSql(0)} AS hk
       |  FROM spine WHERE mix = 'joint'),
       |rk AS (SELECT doc_id, sum(cost) OVER (ORDER BY hk, doc_id) AS cum FROM jt),
       |tc AS (SELECT CAST(sum(cost) AS BIGINT) AS tc FROM jt),
       |sel AS (SELECT doc_id FROM rk CROSS JOIN tc WHERE cum * 5 <= tc * 4),
       |led AS (SELECT mix, kind, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
       |    CAST(sum(n_patches) AS BIGINT) AS n_patches,
       |    CAST(sum(n_subwords + n_patches) AS BIGINT) AS joint_cost,
       |    CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM sel WHERE sel.doc_id = spine.doc_id)
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |    CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM sel WHERE sel.doc_id = spine.doc_id)
       |      THEN n_subwords + n_patches ELSE 0 END) AS BIGINT) AS sel_cost
       |  FROM spine GROUP BY mix, kind)
       |SELECT mix, kind, n_docs, n_subwords, n_patches, joint_cost, n_selected, sel_cost,
       |  1000000 * joint_cost // CAST(sum(joint_cost) OVER () AS BIGINT) AS share_ppm
       |FROM led ORDER BY mix, kind""".stripMargin

  /** DuckDB twin: the stage oracles chained — ingest metadata, CAS
    * canon filter, the phash pair face inlined as a derived table,
    * then the CDC chunk chain restricted to the admitted set and the
    * same O(kinds) rollups. */
  lazy val pipelineMediaBuildSql: String =
    s"""WITH ing AS (SELECT doc_id,
       |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
       |    sha256(text) AS sha256 FROM documents),
       |canon AS (SELECT min(doc_id) AS doc_id FROM ing GROUP BY sha256),
       |surv AS (SELECT i.doc_id, i.kind FROM ing i
       |  WHERE EXISTS (SELECT 1 FROM canon c WHERE c.doc_id = i.doc_id)),
       |pdrop AS (SELECT DISTINCT doc_b AS doc_id FROM ($mmDedupPhashSql)),
       |adm AS (SELECT s.doc_id, s.kind FROM surv s
       |  WHERE NOT EXISTS (SELECT 1 FROM pdrop p WHERE p.doc_id = s.doc_id)),
       |pos AS (SELECT d.doc_id, d.text, unnest(range(1, strlen(d.text)+1)) AS i
       |  FROM documents d JOIN adm ON adm.doc_id = d.doc_id
       |  WHERE strlen(d.text) > 0),
       |b AS (SELECT doc_id, i, ascii(substr(text, CAST(i AS INT), 1)) AS byte,
       |    CASE WHEN i >= 8 THEN
       |      list_reduce(list_prepend(CAST(0 AS BIGINT),
       |        list_transform(range(CAST(i-7 AS INT), CAST(i+1 AS INT)),
       |          j -> CAST(ascii(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
       |        (a, c) -> (a*31 + c) % 2147483647)
       |    ELSE NULL END AS w
       |  FROM pos),
       |m AS (SELECT doc_id, i, byte,
       |    CASE WHEN w IS NOT NULL AND w % 64 = 0 THEN 1 ELSE 0 END AS bnd
       |  FROM b),
       |c AS (SELECT doc_id, i, byte,
       |    COALESCE(sum(bnd) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cid
       |  FROM m),
       |ch AS (SELECT doc_id, cid,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list(CAST(byte AS BIGINT) ORDER BY i)),
       |      (a, x) -> (a*31 + x) % 2147483647) AS hash,
       |    count(*) AS len
       |  FROM c GROUP BY 1, 2),
       |refs AS (SELECT ch.doc_id, adm.kind, hash, len
       |  FROM ch JOIN adm USING (doc_id)),
       |ingc AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_ingested FROM ing GROUP BY 1),
       |blobc AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_blob_dup FROM ing i
       |  WHERE NOT EXISTS (SELECT 1 FROM canon c2 WHERE c2.doc_id = i.doc_id) GROUP BY 1),
       |phashc AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_phash_dup FROM surv s
       |  WHERE EXISTS (SELECT 1 FROM pdrop p WHERE p.doc_id = s.doc_id) GROUP BY 1),
       |admc AS (SELECT kind, CAST(count(*) AS BIGINT) AS n_admitted FROM adm GROUP BY 1),
       |raw AS (SELECT kind, CAST(sum(len) AS BIGINT) AS raw_bytes FROM refs GROUP BY 1),
       |own AS (SELECT hash, len, min(doc_id) AS doc_id FROM refs GROUP BY 1, 2),
       |st AS (SELECT adm.kind, CAST(count(*) AS BIGINT) AS n_chunks_owned,
       |    CAST(sum(own.len) AS BIGINT) AS stored_bytes
       |  FROM own JOIN adm USING (doc_id) GROUP BY 1)
       |SELECT ingc.kind, ingc.n_ingested,
       |  COALESCE(blobc.n_blob_dup, 0) AS n_blob_dup,
       |  COALESCE(phashc.n_phash_dup, 0) AS n_phash_dup,
       |  COALESCE(admc.n_admitted, 0) AS n_admitted,
       |  COALESCE(raw.raw_bytes, 0) AS raw_bytes,
       |  COALESCE(st.n_chunks_owned, 0) AS n_chunks_owned,
       |  COALESCE(st.stored_bytes, 0) AS stored_bytes,
       |  COALESCE(raw.raw_bytes, 0) - COALESCE(st.stored_bytes, 0) AS bytes_saved,
       |  1000000 * COALESCE(st.stored_bytes, 0) // greatest(COALESCE(raw.raw_bytes, 0), 1) AS stored_ppm
       |FROM ingc
       |LEFT JOIN blobc USING (kind)
       |LEFT JOIN phashc USING (kind)
       |LEFT JOIN admc USING (kind)
       |LEFT JOIN raw USING (kind)
       |LEFT JOIN st USING (kind)
       |ORDER BY ingc.kind""".stripMargin

  // ------------------------------------------ incremental media build
  /** Incremental media ingest (r16) — [[pipelineMediaBuild]]'s
    * delta-ingest twin, completing the media side's build symmetry the
    * way [[graft.operators.Curate.pipelineIncrementalBuild]] completes
    * the text side's: today's arriving batch (source = 'src1', the
    * [[graft.operators.Dedup.dedupIncremental]] orientation) is checked
    * against the STANDING corpus (every other source), never corpus ×
    * corpus:
    *
    *   1. CAS check — an arriving blob drops as `blob_dup` when its
    *      sha256 already exists in the standing store OR a smaller-id
    *      blob in the same batch carries it (within-batch min-id
    *      canonicalization, [[mmDedupBlob]]'s rule).
    *   2. perceptual cut — a CAS survivor drops as `phash_dup` when
    *      its [[mmPhash]] signature has a banded-candidate (4×15) pair
    *      at Hamming ≤ 10 with ANY standing blob, or with a smaller-id
    *      CAS survivor in the same batch ([[mmDedupPhash]]'s higher-id
    *      endpoint convention applied within the delta).
    *   3. ledger — per kind: n_arrived = n_blob_dup + n_phash_dup +
    *      n_admitted (the marginal identity, spec-pinned) + exact-ppm
    *      admitted share.
    *
    * == Scale design ==
    * The delta is ingest-batch-sized, so every delta relation
    * BROADCASTS (digest probe set, banded delta signatures); the
    * standing corpus streams through one metadata scan and one
    * signature scan — the nightly O(delta × standing-bucket) shape,
    * never a standing self-join. Matched standing digests collapse to
    * a ≤|delta| relation before rejoining the batch; signatures are
    * checkpointed thin (16 B/blob); the ledger is O(kinds).
    */
  def pipelineMediaIncremental(s: SparkSession, dir: String): DataFrame = {
    val meta = docs(s, dir).select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("source"),
        sha2(col("text"), 256).as("sha256"))
      .stableCheckpoint()
    val delta = meta.filter(col("source") === "src1")
      .select(col("doc_id"), col("kind"), col("sha256"))
    val standing = meta.filter(col("source") =!= "src1")
    // [1] CAS: standing digests matching the batch collapse to a
    // <=|delta| relation (standing streams, delta probe broadcast)
    val hitSha = standing
      .join(broadcast(delta.select(col("sha256")).distinct()), Seq("sha256"), "left_semi")
      .select(col("sha256")).distinct()
    val canon = delta.groupBy(col("sha256")).agg(min(col("doc_id")).as("canon_id"))
    val flagged = delta
      .join(broadcast(canon), Seq("sha256"))
      .join(broadcast(hitSha.withColumn("in_standing", lit(1L))), Seq("sha256"), "left_outer")
      .select(col("doc_id"), col("kind"),
        when(col("in_standing").isNotNull || col("doc_id") =!= col("canon_id"), 1L)
          .otherwise(0L).as("blob_dup"))
    val surv = flagged.filter(col("blob_dup") === 0L).select(col("doc_id"))
    // [2] perceptual cut: banded signatures, delta side broadcast
    val sigs = phashSigs(s, dir).stableCheckpoint()
    val chunkCols = (0 until 4).map(c =>
      struct(lit(c).as("band"),
        shiftright(col("phash"), c * 15).bitwiseAND(lit(32767L)).as("bv")))
    val banded = sigs.select(col("doc_id"), col("phash"),
        explode(array(chunkCols: _*)).as("cc"))
      .select(col("doc_id"), col("phash"), col("cc.band"), col("cc.bv"))
    val bDelta = banded.join(broadcast(surv), Seq("doc_id"))
    val bStand = banded.join(
      broadcast(delta.select(col("doc_id"))), Seq("doc_id"), "left_anti")
    val a = bDelta.alias("a")
    val dropVsStanding = bStand.alias("b")
      .join(broadcast(a), col("a.band") === col("b.band") && col("a.bv") === col("b.bv"))
      .filter(bit_count(col("a.phash").bitwiseXOR(col("b.phash"))) <= 10)
      .select(col("a.doc_id").as("doc_id"))
    val dropWithin = bDelta.alias("b2")
      .join(broadcast(a), col("a.band") === col("b2.band") && col("a.bv") === col("b2.bv")
        && col("a.doc_id") < col("b2.doc_id"))
      .filter(bit_count(col("a.phash").bitwiseXOR(col("b2.phash"))) <= 10)
      .select(col("b2.doc_id").as("doc_id"))
    val pdrop = dropVsStanding.unionByName(dropWithin).distinct()
      .withColumn("pd", lit(1L))
    // [3] marginal ledger, O(kinds)
    flagged
      .join(broadcast(pdrop), Seq("doc_id"), "left_outer")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_arrived"),
        sum(col("blob_dup")).as("n_blob_dup"),
        sum(when(col("blob_dup") === 0L && col("pd").isNotNull, 1L).otherwise(0L))
          .as("n_phash_dup"),
        sum(when(col("blob_dup") === 0L && col("pd").isNull, 1L).otherwise(0L))
          .as("n_admitted"))
      .select(col("kind"), col("n_arrived"), col("n_blob_dup"),
        col("n_phash_dup"), col("n_admitted"),
        expr("1000000 * n_admitted div n_arrived").as("admitted_ppm"))
      .orderBy(col("kind"))
  }

  /** DuckDB twin: the metadata CTE with source split, the shared phash
    * chain, delta-vs-standing and within-delta banded candidate joins,
    * then the same O(kinds) rollup. */
  lazy val pipelineMediaIncrementalSql: String =
    """WITH m AS (SELECT doc_id,
      |    ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |    source, sha256(text) AS sha256 FROM documents),
      |del AS (SELECT doc_id, kind, sha256 FROM m WHERE source = 'src1'),
      |hit AS (SELECT DISTINCT s.sha256 FROM m s
      |  WHERE s.source <> 'src1'
      |    AND EXISTS (SELECT 1 FROM del WHERE del.sha256 = s.sha256)),
      |canon AS (SELECT sha256, min(doc_id) AS canon_id FROM del GROUP BY 1),
      |flag AS (SELECT del.doc_id, del.kind,
      |    CASE WHEN hit.sha256 IS NOT NULL OR del.doc_id <> canon.canon_id
      |      THEN 1 ELSE 0 END AS blob_dup
      |  FROM del JOIN canon USING (sha256) LEFT JOIN hit USING (sha256)),
      |surv AS (SELECT doc_id FROM flag WHERE blob_dup = 0),
      |d2 AS (SELECT doc_id, text, strlen(text) AS len FROM documents
      |  WHERE strlen(text) > 0),
      |chx AS (SELECT doc_id, unnest(range(0, len)) AS i FROM d2),
      |bb AS (SELECT chx.doc_id, d2.len, (i * 60) // d2.len AS bin,
      |    ascii(substr(d2.text, CAST(i + 1 AS INT), 1)) AS byte
      |  FROM chx JOIN d2 USING (doc_id)),
      |cell AS (SELECT doc_id, len, bin, sum(byte) AS cs, count(*) AS cl
      |  FROM bb GROUP BY 1, 2, 3),
      |tot AS (SELECT doc_id, sum(cs) AS ts FROM cell GROUP BY 1),
      |ph AS (SELECT cell.doc_id,
      |    CAST(sum(CASE WHEN cs * len > ts * cl
      |      THEN (CAST(1 AS BIGINT) << CAST(bin AS INT)) ELSE 0 END) AS BIGINT)
      |      AS phash
      |  FROM cell JOIN tot USING (doc_id) GROUP BY 1),
      |bands AS (SELECT doc_id, phash, b AS band,
      |    (phash >> CAST(b * 15 AS INT)) & 32767 AS bv
      |  FROM ph, unnest(range(0, 4)) t(b)),
      |bdel AS (SELECT bands.* FROM bands JOIN surv USING (doc_id)),
      |bstand AS (SELECT bands.* FROM bands
      |  WHERE NOT EXISTS (SELECT 1 FROM del WHERE del.doc_id = bands.doc_id)),
      |pdrop AS (
      |  SELECT DISTINCT a.doc_id FROM bdel a JOIN bstand b2
      |    ON a.band = b2.band AND a.bv = b2.bv
      |  WHERE bit_count(xor(a.phash, b2.phash)) <= 10
      |  UNION
      |  SELECT DISTINCT b2.doc_id FROM bdel a JOIN bdel b2
      |    ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id
      |  WHERE bit_count(xor(a.phash, b2.phash)) <= 10)
      |SELECT f.kind, count(*) AS n_arrived,
      |  CAST(sum(f.blob_dup) AS BIGINT) AS n_blob_dup,
      |  CAST(sum(CASE WHEN f.blob_dup = 0 AND p.doc_id IS NOT NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_phash_dup,
      |  CAST(sum(CASE WHEN f.blob_dup = 0 AND p.doc_id IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
      |  1000000 * CAST(sum(CASE WHEN f.blob_dup = 0 AND p.doc_id IS NULL
      |    THEN 1 ELSE 0 END) AS BIGINT) // count(*) AS admitted_ppm
      |FROM flag f LEFT JOIN pdrop p ON p.doc_id = f.doc_id
      |GROUP BY f.kind ORDER BY f.kind""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_media_incremental" -> pipelineMediaIncremental,
    "pipeline_media_build" -> pipelineMediaBuild,
    "pipeline_mm_pretrain" -> pipelineMmPretrain,
    "mm_dedup_crossmodal" -> mmDedupCrossmodal,
    "mm_ingest" -> mmIngest,
    "mm_dedup_blob" -> mmDedupBlob,
    "mm_cdc_chunks" -> mmCdcChunks,
    "mm_cdc_dedup" -> mmCdcDedup,
    "mm_batch_extract" -> mmBatchExtract,
    "mm_frame_sample" -> mmFrameSample,
    "mm_scene_cut" -> mmSceneCut,
    "mm_silence_chunks" -> mmSilenceChunks,
    "mm_resize" -> mmResize,
    "mm_audio_chunks" -> mmAudioChunks,
    "mm_phash" -> mmPhash,
    "mm_dedup_phash" -> mmDedupPhash)

  /** DuckDB twin of the stub decoder: the corpus is pure ASCII, so
    * byte-level features equal character-level ones and the rolling
    * checksum folds identically over ascii codes.
    */
  val mmBatchExtractSql: String =
    """SELECT doc_id,
      |  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
      |  CAST(strlen(text) AS INT) AS byte_len,
      |  ascii(substr(text, 1, 1)) AS head_byte,
      |  ascii(substr(text, CAST(strlen(text) AS INT), 1)) AS tail_byte,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 997) AS checksum
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Audio segmentation planning — the chunker an ASR/audio-embedding
    * pipeline runs before decode: each audio blob is split into
    * 30-second analysis windows advanced by a 20-second hop (10 s
    * overlap, the common ASR chunking), planned in EXACT integer
    * sample arithmetic from the stream's sample rate so chunk
    * boundaries are bit-reproducible. Source params (sample rate ∈
    * {8, 12, 16} kHz, stream length) are stub-decoded from the blob —
    * content-derived stand-ins for the codec header read, which is
    * the one step this container cannot run. The final chunk is
    * truncated at the stream end, never padded.
    *
    * == Scale design ==
    * Kind-filtered scan + a bounded per-row `sequence` explode (fan-out
    * = chunks per blob, duration-bounded) — pure codegen column math,
    * no shuffle until the display orderBy. Embarrassingly parallel at
    * any corpus size.
    */
  def mmAudioChunks(s: SparkSession, dir: String): DataFrame = {
    val rate = (lit(8000L) + pmod(col("doc_id"), lit(3)) * 4000L).as("sample_rate")
    val nSamples = (octet_length(col("text")).cast("long") * 64L).as("n_samples")
    docs(s, dir)
      .filter(col("doc_id") % 3 === 1) // 'audio' kind
      // a zero-length blob has no samples to chunk — without the guard
      // it would emit one degenerate start=end=0 chunk (mmPhash's rule)
      .filter(octet_length(col("text")) > 0)
      .select(col("doc_id"), rate, nSamples)
      .withColumn("hop", col("sample_rate") * 20L)
      .withColumn("chunk_idx",
        explode(expr("sequence(0L, (n_samples - 1) div hop)")))
      .select(col("doc_id"), col("sample_rate"), col("n_samples"), col("chunk_idx"),
        (col("chunk_idx") * col("hop")).as("start_sample"),
        least(col("chunk_idx") * col("hop") + col("sample_rate") * 30L,
          col("n_samples")).as("end_sample"))
      .withColumn("start_ms", expr("start_sample * 1000 div sample_rate"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** DuckDB twin: same stub params, same integer chunk plan. */
  val mmAudioChunksSql: String =
    """WITH a AS (SELECT doc_id,
      |    8000 + (doc_id % 3) * 4000 AS sample_rate,
      |    strlen(text) * 64 AS n_samples
      |  FROM documents WHERE doc_id % 3 = 1 AND strlen(text) > 0),
      |h AS (SELECT *, sample_rate * 20 AS hop FROM a),
      |x AS (SELECT doc_id, sample_rate, n_samples,
      |    unnest(range(0, (n_samples - 1) // hop + 1)) AS chunk_idx, hop
      |  FROM h)
      |SELECT doc_id, CAST(sample_rate AS BIGINT) AS sample_rate,
      |  CAST(n_samples AS BIGINT) AS n_samples,
      |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(chunk_idx * hop AS BIGINT) AS start_sample,
      |  CAST(least(chunk_idx * hop + sample_rate * 30, n_samples) AS BIGINT) AS end_sample,
      |  CAST((chunk_idx * hop) * 1000 // sample_rate AS BIGINT) AS start_ms
      |FROM x ORDER BY doc_id, chunk_idx""".stripMargin

  val oracles: Map[String, String] = Map(
    "pipeline_media_incremental" -> pipelineMediaIncrementalSql,
    "pipeline_media_build" -> pipelineMediaBuildSql,
    "pipeline_mm_pretrain" -> pipelineMmPretrainSql,
    "mm_dedup_crossmodal" -> mmDedupCrossmodalSql,
    "mm_ingest" -> mmIngestSql,
    "mm_dedup_blob" -> mmDedupBlobSql,
    "mm_cdc_chunks" -> mmCdcChunksSql,
    "mm_cdc_dedup" -> mmCdcDedupSql,
    "mm_batch_extract" -> mmBatchExtractSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_scene_cut" -> mmSceneCutSql,
    "mm_silence_chunks" -> mmSilenceChunksSql,
    "mm_resize" -> mmResizeSql,
    "mm_audio_chunks" -> mmAudioChunksSql,
    "mm_phash" -> mmPhashSql,
    "mm_dedup_phash" -> mmDedupPhashSql)
}
