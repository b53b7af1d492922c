package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decode/feature/frame-sample stages.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic stub (see [[graft.multimodal.Multimodal]])
  * — but the Spark-side contract is real: binary payloads, per-row
  * metadata structs, bounded row explosion for frame sampling, and a
  * batched mapPartitions decode path.
  *
  * The `documents` table stands in as the payload source (text bytes as
  * the blob) so the queries stay oracle-checkable.
  */
object MultimodalQueries {

  private val payloadMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Shared pattern-payload substrate (r18 verdict ask #3 — the
    * mm_phash_dedup floor profile, PLANS.md §r19): the fixture
    * corpus' PNG payloads — one per doc, 8×8 md5-bit pattern at
    * px∈{1,2,3} block scales — encoded ONCE per (session, dir) and
    * pinned via localCheckpoint. The encode hop is payload SYNTHESIS
    * (in production the bytes arrive as data; the operator under test
    * is decode→feature→rollup), so sharing it is the dedup-substrate /
    * bucketed-warehouse attribution discipline: each mm_* query now
    * times its own decode plan, and the one-time synth cost is paid at
    * Bench warm-up. ProfPhash measured the split at sf0.1: encode
    * ≈3.3 s, decode+hash ≈2.2 s, rollup ≈0.45 s. */
  private[graft] def patternPayloads(s: SparkSession, d: String): DataFrame =
    payloadMemo.computeIfAbsent((s, d), { _ =>
      import s.implicits._
      val meta = documents(s, d).select($"doc_id",
        ($"doc_id" % 3 + 1).cast("int").as("px"),
        substring(md5(($"doc_id" % 40).cast("string").cast("binary")), 1, 16)
          .as("bits_hex"))
      // r20: the documents scan is ONE file at gate SFs → one input
      // partition, which serialized every ImageIO encode/decode pass
      // onto a single task. Key the fixture rows by doc_id across the
      // session's parallelism before the codec seam so the substrate
      // (and every downstream decode that reads its partitioning)
      // fans out over all cores.
      graft.multimodal.Multimodal.encodePatternPayloads(
        meta.select($"doc_id", ($"px" * 8).cast("int").as("scale"), $"bits_hex")
          .repartition(s.sparkContext.defaultParallelism, $"doc_id"))
        .localCheckpoint()
    })
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Opaque binary + typed metadata: byte length, checksum, and
    // deterministic pseudo-dimensions (what a real decoder would emit).
    "mm_binary_meta" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select($"doc_id", $"text".cast("binary").as("blob"))
        .select(
          $"doc_id",
          length($"blob").cast("long").as("n_bytes"),
          md5($"blob").as("checksum"),
          (length($"blob") % 640 + 1).cast("long").as("width"),
          ((length($"blob") * 7) % 480 + 1).cast("long").as("height"),
          lit(3L).as("channels"))
        .orderBy($"doc_id")
    }),

    // Frame sampling: derive a frame count per asset, emit every 10th
    // frame index with its byte offset — bounded explode (≤10 rows/asset),
    // shuffle-free.
    "mm_frame_sample" -> ((s, d) => {
      import s.implicits._
      documents(s, d)
        .select($"doc_id", ($"n_chars" % 100 + 1).cast("int").as("n_frames"))
        .select($"doc_id", $"n_frames",
          explode(sequence(lit(0), $"n_frames" - 1, lit(10))).as("frame_idx"))
        .select($"doc_id", $"n_frames".cast("long").as("n_frames"),
          $"frame_idx".cast("long").as("frame_idx"),
          ($"frame_idx" * 1024L).as("byte_offset"))
        .orderBy($"doc_id", $"frame_idx")
    }),

    // Resize planning: aspect-preserving fit into 224×224, never
    // upscaling — the metadata math a real resize kernel would follow
    // (the pixel transform itself lives behind the stubbed codec, like
    // decode). Same IEEE expression tree on both engines → exact oracle.
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      val blobLen = length($"text".cast("binary"))
      documents(s, d)
        .select($"doc_id",
          (blobLen % 640 + 1).cast("long").as("src_w"),
          ((blobLen * 7) % 480 + 1).cast("long").as("src_h"))
        .withColumn("scale",
          least(lit(224.0) / $"src_w", lit(224.0) / $"src_h", lit(1.0)))
        .select($"doc_id", $"src_w", $"src_h",
          greatest(floor($"src_w" * $"scale"), lit(1L)).as("dst_w"),
          greatest(floor($"src_h" * $"scale"), lit(1L)).as("dst_h"),
          $"scale")
        .orderBy($"doc_id")
    }),

    // REAL codec round-trip through the batched mapPartitions contract:
    // synthesize a deterministic PNG per document (dims from n_chars,
    // solid RGB from md5(doc_id) — all Catalyst-computable), encode it
    // with the JDK ImageIO PNG writer, then DECODE the bytes back to
    // pixels in Multimodal.decodeFeatures and extract width/height/
    // channel means. The in-query cross-check pins the decoded
    // dimensions and means against the generation parameters (PNG is
    // lossless, solid fill ⇒ mean == fill exactly), so the oracle's
    // `features_match = TRUE` hash-verifies actual bytes→pixels work —
    // encoder, decoder, batching, and null handling. Both hops are
    // zero-shuffle mapPartitions; a 100 TB corpus decodes embarrassingly
    // parallel with `batchSize` payloads in flight per task.
    "mm_decode_features" -> ((s, d) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string").cast("binary"))
      val meta = documents(s, d).select($"doc_id",
        ($"n_chars" % 64 + 1).cast("int").as("exp_w"),
        (($"n_chars" * 7) % 48 + 1).cast("int").as("exp_h"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("exp_r"),
        conv(substring(h, 3, 2), 16, 10).cast("int").as("exp_g"),
        conv(substring(h, 5, 2), 16, 10).cast("int").as("exp_b"))
      val payloads = graft.multimodal.Multimodal.encodePayloads(
        meta.select($"doc_id", $"exp_w", $"exp_h", $"exp_r", $"exp_g", $"exp_b")
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")) // r20: codec runs on all cores
      val decoded = graft.multimodal.Multimodal.decodeFeatures(payloads)
      decoded.join(meta, Seq("doc_id"))
        .withColumn("features_match",
          $"n_bytes" > 0 && $"width" === $"exp_w" && $"height" === $"exp_h" &&
            $"mean_r" === $"exp_r" && $"mean_g" === $"exp_g" && $"mean_b" === $"exp_b")
        .select($"doc_id", $"exp_w".as("width"), $"exp_h".as("height"), $"features_match")
        .orderBy($"doc_id")
    }),

    // JPEG TWIN of the codec round-trip (r19 verdict ask #6 — the
    // production corpus is overwhelmingly JPEG; prove decode→feature
    // is CODEC-AGNOSTIC): the same fixture parameters as
    // mm_decode_features render through the JDK's ImageIO JPEG writer
    // instead of PNG, decode through the SAME Multimodal.decodeFeatures
    // seam (ImageIO sniffs the container — zero code change on the
    // decode side, which is the codec-agnosticism being certified),
    // and the lossy determinism is handled the mm_decode_features way:
    // dimensions must match EXACTLY (JPEG is lossless in geometry),
    // channel means within the ±4 band that bounds solid-fill JPEG
    // loss (RGB→YCbCr rounding + DC quantization; measured ≤3 across
    // the fixture space — a constant block has no AC energy to ring),
    // and the payload must actually be JPEG (FFD8 magic — a codec
    // silently falling back to PNG would fail here, not just produce
    // suspiciously exact means). features_match=TRUE hash-pins all of
    // it. Both hops stay zero-shuffle batched mapPartitions.
    "mm_jpeg_decode" -> ((s, d) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string").cast("binary"))
      val meta = documents(s, d).select($"doc_id",
        ($"n_chars" % 64 + 1).cast("int").as("exp_w"),
        (($"n_chars" * 7) % 48 + 1).cast("int").as("exp_h"),
        conv(substring(h, 1, 2), 16, 10).cast("int").as("exp_r"),
        conv(substring(h, 3, 2), 16, 10).cast("int").as("exp_g"),
        conv(substring(h, 5, 2), 16, 10).cast("int").as("exp_b"))
      val payloads = graft.multimodal.Multimodal.encodeJpegPayloads(
        meta.select($"doc_id", $"exp_w", $"exp_h", $"exp_r", $"exp_g", $"exp_b")
          .repartition(s.sparkContext.defaultParallelism, $"doc_id")) // r20: codec runs on all cores
        .withColumn("is_jpeg", hex(substring($"payload", 1, 2)) === "FFD8")
      val decoded = graft.multimodal.Multimodal.decodeFeatures(
        payloads.select($"doc_id", $"payload"))
      decoded.join(payloads.select($"doc_id", $"is_jpeg"), Seq("doc_id"))
        .join(meta, Seq("doc_id"))
        .withColumn("features_match",
          $"is_jpeg" && $"n_bytes" > 0 &&
            $"width" === $"exp_w" && $"height" === $"exp_h" &&
            abs($"mean_r" - $"exp_r") <= 4 &&
            abs($"mean_g" - $"exp_g") <= 4 &&
            abs($"mean_b" - $"exp_b") <= 4)
        .select($"doc_id", $"exp_w".as("width"), $"exp_h".as("height"),
          $"features_match")
        .orderBy($"doc_id")
    }),

    // PERCEPTUAL-HASH image dedup — the visual-duplicate operator a
    // multimodal curation pass runs after exact byte dedup: the same
    // image content re-encoded at a different resolution has different
    // bytes but must land in the same cluster. Each doc renders one of
    // 40 visual classes (an 8×8 block pattern from md5 bits) at one of
    // THREE pixel scales (8/16/24 px per block — different PNGs, same
    // content); the decode side box-downsamples to 8×8 and takes the
    // average hash with exact integer comparisons. aHash(pattern at
    // any scale) == the pattern's own md5 bits, so clusters — and the
    // fact that every cluster contains multiple encode sizes — are
    // fully hash-verified against SQL-computable expectations: if the
    // real decode→resample→threshold path drifted one bit, the phash
    // groups would not match the oracle. Decode rides the shared
    // payload substrate (r19: the encode hop is fixture synthesis,
    // memoized in [[patternPayloads]]); the decode hop stays a
    // zero-shuffle batched mapPartitions and the cluster rollup one
    // keyed groupBy on the 64-bit hash — the same shape at 100 TB.
    "mm_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val meta = documents(s, d).select($"doc_id",
        ($"doc_id" % 3 + 1).cast("int").as("px"),
        substring(md5(($"doc_id" % 40).cast("string").cast("binary")), 1, 16)
          .as("bits_hex"))
      val hashed = graft.multimodal.Multimodal.phashFeatures(patternPayloads(s, d))
      hashed.join(meta, Seq("doc_id"))
        .groupBy($"phash")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct($"px").as("n_sizes"),
          min($"doc_id").as("sample_doc"),
          min(($"phash" === $"bits_hex").cast("int")).as("all_match"))
        .select($"phash", $"n_docs", $"n_sizes", $"sample_doc",
          ($"all_match" === 1).as("all_match"))
        .orderBy($"phash")
    }),

    // ViT-style PATCH GRID over really-decoded pixels: every fixture
    // image (the phash pattern corpus — 8×8 blocks of 192/64 gray at
    // px∈{1,2,3} block scales) is decoded through the real PNG codec
    // and tiled into block-aligned patches; per-patch exact r+g+b
    // energy sums yield the light-patch census and the max/min patch
    // energies. Every output has a CLOSED FORM in the fixture params
    // (n_light = popcount of the md5-derived bit pattern; energies =
    // 576/192·ps²), so the oracle hash-pins the bytes→pixels→patches
    // path end to end — the patchification plumbing a ViT ingest
    // pipeline runs, as one zero-shuffle mapPartitions pass.
    "mm_patch_grid" -> ((s, d) => {
      import s.implicits._
      // deterministic 20% asset sample: the patchification cost is
      // pure per-image codec work (encode+decode+tile ≈ 2.7 ms/image),
      // so the fixture corpus is sampled to keep the bench proportional
      // — the op itself is embarrassingly parallel at any volume
      val meta = documents(s, d).filter($"doc_id" % 5 === 0)
        .select($"doc_id",
        ($"doc_id" % 3 + 1).cast("int").as("px"),
        substring(md5(($"doc_id" % 40).cast("string").cast("binary")), 1, 16)
          .as("bits_hex"))
      // the sample JOIN against the shared substrate both selects the
      // 20% subset and carries px in (r19 substrate reshape)
      val stats = graft.multimodal.Multimodal.patchFeatures(
        patternPayloads(s, d).join(meta, Seq("doc_id"))
          .select($"doc_id", $"payload", ($"px" * 8).cast("int").as("ps")))
      stats.orderBy($"doc_id")
    }),

    // VIDEO SCENE-CUT detection plumbing — the temporal multimodal op
    // beyond mm_frame_sample's static sampling: each doc becomes a
    // short "video" (3–5 frames, scene changing every 2 frames, frame
    // colors md5-derived per scene), every frame is REALLY encoded
    // and decoded through the PNG codec, and cuts are detected where
    // the decoded inter-frame channel delta is nonzero — a per-asset
    // keyed window over frame order, never a global sort. Frames ride
    // a composite key (doc_id·16 + frame_idx) through the unchanged
    // batched codec seam; expected cuts have the closed form
    // (n_frames−1) div 2, so the oracle's cuts_match=TRUE hash-pins
    // the decode→delta→threshold path end to end.
    "mm_scene_cuts" -> ((s, d) => {
      import s.implicits._
      val frames = documents(s, d)
        .select($"doc_id", ($"doc_id" % 3 + 3).cast("int").as("n_frames"))
        .select($"doc_id", $"n_frames",
          explode(sequence(lit(0), $"n_frames" - 1)).as("f"))
        .withColumn("hh", md5(concat_ws("#",
          $"doc_id", expr("f div 2")).cast("binary")))
      val payloads = graft.multimodal.Multimodal.encodePayloads(
        frames.repartition(s.sparkContext.defaultParallelism, $"doc_id", $"f") // r20: codec runs on all cores
          .select(($"doc_id" * 16 + $"f").as("doc_id"),
          lit(8).as("w"), lit(8).as("h"),
          conv(substring($"hh", 1, 2), 16, 10).cast("int").as("r"),
          conv(substring($"hh", 3, 2), 16, 10).cast("int").as("g"),
          conv(substring($"hh", 5, 2), 16, 10).cast("int").as("b")))
      val dec = graft.multimodal.Multimodal.decodeFeatures(payloads)
        .select(expr("doc_id div 16").as("doc_id"),
          pmod($"doc_id", lit(16)).cast("int").as("f"),
          $"mean_r", $"mean_g", $"mean_b")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"f")
      val cuts = dec
        .withColumn("cut",
          when(abs($"mean_r" - lag($"mean_r", 1).over(w)) +
            abs($"mean_g" - lag($"mean_g", 1).over(w)) +
            abs($"mean_b" - lag($"mean_b", 1).over(w)) > 0, 1L).otherwise(0L))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_frames"), sum($"cut").as("n_cuts"))
      cuts
        .withColumn("cuts_match",
          $"n_cuts" === expr("CAST((n_frames - 1) div 2 AS BIGINT)"))
        .select($"doc_id", $"n_frames", $"n_cuts", $"cuts_match")
        .orderBy($"doc_id")
    }),

    // REAL audio codec round-trip — the WAV twin of mm_decode_features:
    // synthesize a deterministic 16-bit mono PCM square wave per doc
    // (length/period from n_chars, amplitude from md5(doc_id) — all
    // Catalyst-computable), write it through the JDK's javax.sound
    // WAV encoder, then DECODE the container back to samples and
    // extract n_samples / sample rate / peak / Σ|x| / zero crossings.
    // Square fill ⇒ every feature has an exact closed form (peak = A,
    // Σ|x| = n·A, crossings = (n−1) div halfPeriod), so the oracle's
    // `features_match = TRUE` hash-verifies actual bytes→samples work.
    // Both hops are zero-shuffle batched mapPartitions — a 100 TB
    // audio corpus decodes embarrassingly parallel.
    "mm_wav_features" -> ((s, d) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string").cast("binary"))
      val meta = documents(s, d).select($"doc_id",
        ($"n_chars" % 800 + 100).cast("int").as("exp_n"),
        ($"n_chars" % 20 + 2).cast("int").as("half_p"),
        (conv(substring(h, 1, 4), 16, 10).cast("int") % 8000 + 1).as("amp"))
        .withColumn("exp_zc", expr("CAST((exp_n - 1) div half_p AS BIGINT)"))
      val payloads = graft.multimodal.Multimodal.encodeWavPayloads(
        meta.select($"doc_id", $"exp_n", $"half_p", $"amp"))
      val decoded = graft.multimodal.Multimodal.wavFeatures(payloads)
      decoded.join(meta, Seq("doc_id"))
        .withColumn("features_match",
          $"n_samples" === $"exp_n" && $"sample_rate" === 8000 &&
            $"peak" === $"amp" && $"sum_abs" === $"exp_n".cast("long") * $"amp" &&
            $"zero_crossings" === $"exp_zc")
        .select($"doc_id", $"n_samples", $"sample_rate",
          ($"n_samples" * 125L).as("duration_us"), $"zero_crossings",
          $"features_match")
        .orderBy($"doc_id")
    }),

    // Energy-based VOICE-ACTIVITY DETECTION plumbing on the real WAV
    // codec: deterministic tone-burst clips (alternating tone/silence
    // segments, segment length a multiple of the 80-sample/10 ms
    // analysis frame) are really encoded and re-decoded, framed, and
    // gated on exact integer frame energy (Σ|x| > 500·80); maximal
    // active runs merge into segments. Because bursts align to frames,
    // frame/activity/segment counts have exact closed forms, cross-
    // checked in-query (`vad_match`) and hash-pinned by the oracle —
    // same zero-shuffle batched mapPartitions contract as every
    // decode path here; the audio analog of mm_scene_cuts' cut logic.
    "mm_audio_vad" -> ((s, d) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string").cast("binary"))
      val meta = documents(s, d).select($"doc_id",
        (($"n_chars" % 3 + 1) * 160).cast("int").as("seg_len"),
        ($"n_chars" % 6 + 2).cast("int").as("n_segs"),
        ($"n_chars" % 10 + 2).cast("int").as("half_p"),
        (conv(substring(h, 1, 4), 16, 10).cast("int") % 6000 + 2000).as("amp"))
      val payloads = graft.multimodal.Multimodal.encodeWavBurstPayloads(
        meta.select($"doc_id", ($"seg_len" * $"n_segs").cast("int").as("n_samples"),
          $"half_p", $"amp", $"seg_len"))
      val vad = graft.multimodal.Multimodal.vadFeatures(payloads, 80, 500L * 80)
      vad.join(meta, Seq("doc_id"))
        .withColumn("vad_match",
          $"n_frames" === expr("CAST((seg_len * n_segs) DIV 80 AS BIGINT)") &&
            $"n_active" ===
              expr("CAST((seg_len DIV 80) * ((n_segs + 1) DIV 2) AS BIGINT)") &&
            $"n_segments" === expr("CAST((n_segs + 1) DIV 2 AS BIGINT)"))
        .select($"doc_id", $"n_frames", $"n_active", $"n_segments", $"vad_match")
        .orderBy($"doc_id")
    }),

    // 4-BIN LUMINANCE HISTOGRAM through the real PNG codec — the
    // dark-image / blank-asset color-profiling gate. Pattern fixtures
    // put every pixel at exactly 64 or 192 grey (sums 192/576 → bins
    // 1 and 3), so the histogram has a bit_count closed form the
    // oracle hash-pins — certifying the decode→bucket path end to
    // end. 25% deterministic sample (codec CPU, embarrassingly
    // parallel); zero-shuffle batched mapPartitions as all decodes.
    "mm_luma_histogram" -> ((s, d) => {
      import s.implicits._
      // 25% slice of the shared payload substrate (r19 reshape)
      val hist = graft.multimodal.Multimodal.lumaHistFeatures(
        patternPayloads(s, d).filter($"doc_id" % 4 === 1))
      hist.selectExpr("doc_id", "width", "height", "b0", "b1", "b2", "b3",
          "b3 * 10000 DIV (b0 + b1 + b2 + b3) AS light_share_bp")
        .orderBy($"doc_id")
    }),

    // EDGE / GRADIENT ENERGY through the real PNG codec — the
    // blur/blank-asset detector. Pattern fixtures are flat inside
    // each 8×8 cell, so ALL energy sits on cell boundaries:
    // energy = 128·scale·(# adjacent differing cell pairs), a pure
    // bit-adjacency closed form the oracle computes from the md5
    // pattern — certifying the decode→gradient path end to end.
    // Same 25% deterministic sample + zero-shuffle batched seam.
    "mm_edge_energy" -> ((s, d) => {
      import s.implicits._
      // 25% slice of the shared payload substrate (r19 reshape)
      val edges = graft.multimodal.Multimodal.edgeEnergyFeatures(
        patternPayloads(s, d).filter($"doc_id" % 4 === 2))
      edges.selectExpr("doc_id", "width", "h_energy", "v_energy",
          "h_energy + v_energy AS total_energy",
          "h_energy + v_energy = 0 AS is_flat")
        .orderBy($"doc_id")
    }),

    // FORMAT SNIFFING on the binary column — the ingestion-edge audit
    // that routes mixed media payloads by MAGIC BYTES, not by trusted
    // extensions. A deterministic three-way corpus (real PNG via
    // ImageIO / real WAV via javax.sound / raw text bytes, keyed by
    // doc_id mod 3) is sniffed on its first four bytes; the census
    // has a mod-3 closed form the oracle pins, so a codec emitting
    // wrong magic would go red. One zero-shuffle encode pass + one
    // keyed census.
    "mm_format_sniff" -> ((s, d) => {
      import s.implicits._
      val base = documents(s, d).filter($"doc_id" % 4 === 3)
        .select($"doc_id", $"text")
      val png = graft.multimodal.Multimodal.encodePatternPayloads(
        base.filter($"doc_id" % 3 === 0)
          .select($"doc_id", lit(8).as("scale"),
            substring(md5(($"doc_id" % 40).cast("string").cast("binary")), 1, 16)
              .as("bits_hex")))
      val wav = graft.multimodal.Multimodal.encodeWavPayloads(
        base.filter($"doc_id" % 3 === 1)
          .select($"doc_id", lit(160).as("n_samples"),
            lit(4).as("half_period"), lit(3000).as("amplitude")))
      val raw = base.filter($"doc_id" % 3 === 2)
        .select($"doc_id", $"text".cast("binary").as("payload"))
      png.unionByName(wav).unionByName(raw)
        .selectExpr("doc_id",
          """CASE hex(substring(payload, 1, 4))
            | WHEN '89504E47' THEN 'png'
            | WHEN '52494646' THEN 'riff'
            | ELSE 'other' END AS format""".stripMargin)
        .groupBy($"format")
        .agg(count(lit(1)).as("n_assets"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"format")
    }),

    // AUDIO FINGERPRINT through the real WAV codec — the Shazam-shaped
    // peak-constellation primitive (Wang 2003): Goertzel power at a
    // fixed candidate-bin set, argmax = the clip's spectral landmark.
    // Each doc renders one of 8 tone classes (md5-derived half-period
    // → fundamental 4000/h Hz); all candidates are EXACT DFT bins of
    // the 400-sample frame (integer cycle counts → zero leakage), and
    // a square wave's fundamental beats any odd harmonic landing on
    // another candidate by ≥ 25× power, so the argmax has a closed
    // form the oracle hash-pins: `features_match` certifies the real
    // bytes→samples→Goertzel→argmax path, and the per-class census
    // certifies the fingerprint clusters. Both hops are zero-shuffle
    // batched mapPartitions; the rollup is one keyed groupBy — the
    // same shape at 100 TB.
    "mm_audio_fingerprint" -> ((s, d) => {
      import s.implicits._
      val h = md5($"doc_id".cast("string").cast("binary"))
      val halfPeriods = Seq(4, 5, 8, 10, 20, 25, 40, 50)
      val meta = documents(s, d).select($"doc_id",
        element_at(array(halfPeriods.map(lit): _*),
          (conv(substring(h, 1, 2), 16, 10).cast("int") % 8) + 1)
          .as("half_period"))
      val payloads = graft.multimodal.Multimodal.encodeWavPayloads(
        meta.select($"doc_id", lit(400).cast("int").as("n_samples"),
          $"half_period".cast("int"), lit(10000).cast("int").as("amplitude")))
      val peaks = graft.multimodal.Multimodal.audioPeakHz(
        payloads, halfPeriods.map(4000 / _), 400)
      peaks.join(meta, Seq("doc_id"))
        .withColumn("exp_hz", expr("4000 DIV half_period"))
        .select($"doc_id", $"exp_hz".as("freq_hz"),
          ($"peak_hz" === $"exp_hz").as("features_match"))
        .orderBy($"doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id,
        | octet_length(CAST(text AS BLOB)) AS n_bytes,
        | md5(text) AS checksum,
        | octet_length(CAST(text AS BLOB)) % 640 + 1 AS width,
        | (octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS height,
        | 3 AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_resize" ->
      """SELECT doc_id, src_w, src_h,
        | greatest(CAST(floor(src_w * scale) AS BIGINT), 1) AS dst_w,
        | greatest(CAST(floor(src_h * scale) AS BIGINT), 1) AS dst_h,
        | scale
        |FROM (
        | SELECT doc_id, src_w, src_h,
        |  least(224.0 / src_w, 224.0 / src_h, 1.0) AS scale
        | FROM (
        |  SELECT doc_id,
        |   octet_length(CAST(text AS BLOB)) % 640 + 1 AS src_w,
        |   (octet_length(CAST(text AS BLOB)) * 7) % 480 + 1 AS src_h
        |  FROM documents))
        |ORDER BY doc_id""".stripMargin,

    "mm_frame_sample" ->
      """SELECT doc_id, n_frames, frame_idx, frame_idx * 1024 AS byte_offset FROM (
        | SELECT doc_id, n_chars % 100 + 1 AS n_frames,
        |  unnest(range(0, n_chars % 100 + 1, 10)) AS frame_idx
        | FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "mm_decode_features" ->
      """SELECT doc_id,
        | n_chars % 64 + 1 AS width,
        | (n_chars * 7) % 48 + 1 AS height,
        | TRUE AS features_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_jpeg_decode" ->
      """SELECT doc_id,
        | n_chars % 64 + 1 AS width,
        | (n_chars * 7) % 48 + 1 AS height,
        | TRUE AS features_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_phash_dedup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    substring(md5(CAST(doc_id % 40 AS VARCHAR)), 1, 16) AS phash,
        |    doc_id % 3 + 1 AS px
        |  FROM documents)
        |SELECT phash, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT px) AS BIGINT) AS n_sizes,
        |  CAST(min(doc_id) AS BIGINT) AS sample_doc,
        |  TRUE AS all_match
        |FROM m GROUP BY phash
        |ORDER BY phash""".stripMargin,

    "mm_patch_grid" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 3 + 1 AS BIGINT) AS px,
        |    substring(md5(CAST(doc_id % 40 AS VARCHAR)), 1, 16) AS bits_hex
        |  FROM documents WHERE doc_id % 5 = 0),
        |pop AS (
        |  SELECT m.doc_id,
        |    CAST(SUM(bit_count(CAST(strpos('0123456789abcdef',
        |      substring(m.bits_hex, g.i, 1)) - 1 AS INTEGER))) AS BIGINT) AS n_light
        |  FROM m, generate_series(1, 16) AS g(i)
        |  GROUP BY m.doc_id)
        |SELECT m.doc_id,
        |  CAST(m.px * 64 AS INTEGER) AS width,
        |  CAST(m.px * 64 AS INTEGER) AS height,
        |  CAST(8 AS INTEGER) AS np_x, CAST(8 AS INTEGER) AS np_y,
        |  CAST(64 AS INTEGER) AS n_patches,
        |  p.n_light,
        |  CAST(CASE WHEN p.n_light > 0 THEN 36864 * m.px * m.px
        |            ELSE 12288 * m.px * m.px END AS BIGINT) AS max_patch_sum,
        |  CAST(CASE WHEN p.n_light < 64 THEN 12288 * m.px * m.px
        |            ELSE 36864 * m.px * m.px END AS BIGINT) AS min_patch_sum
        |FROM m JOIN pop p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "mm_scene_cuts" ->
      """SELECT doc_id,
        | CAST(doc_id % 3 + 3 AS BIGINT) AS n_frames,
        | CAST((doc_id % 3 + 3 - 1) // 2 AS BIGINT) AS n_cuts,
        | TRUE AS cuts_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_wav_features" ->
      """SELECT doc_id,
        | CAST(n_chars % 800 + 100 AS BIGINT) AS n_samples,
        | 8000 AS sample_rate,
        | CAST((n_chars % 800 + 100) * 125 AS BIGINT) AS duration_us,
        | CAST((n_chars % 800 + 100 - 1) // (n_chars % 20 + 2) AS BIGINT)
        |   AS zero_crossings,
        | TRUE AS features_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_audio_vad" ->
      """SELECT doc_id,
        | CAST(((n_chars % 3 + 1) * 160 * (n_chars % 6 + 2)) // 80 AS BIGINT)
        |   AS n_frames,
        | CAST((n_chars % 3 + 1) * 2 * ((n_chars % 6 + 2 + 1) // 2) AS BIGINT)
        |   AS n_active,
        | CAST((n_chars % 6 + 2 + 1) // 2 AS BIGINT) AS n_segments,
        | TRUE AS vad_match
        |FROM documents ORDER BY doc_id""".stripMargin,

    "mm_luma_histogram" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 3 + 1 AS BIGINT) AS px,
        |    substring(md5(CAST(doc_id % 40 AS VARCHAR)), 1, 16) AS bits_hex
        |  FROM documents WHERE doc_id % 4 = 1),
        |pop AS (
        |  SELECT m.doc_id,
        |    CAST(SUM(bit_count(CAST(strpos('0123456789abcdef',
        |      substring(m.bits_hex, g.i, 1)) - 1 AS INTEGER))) AS BIGINT) AS n_light
        |  FROM m, generate_series(1, 16) AS g(i)
        |  GROUP BY m.doc_id)
        |SELECT m.doc_id,
        |  CAST(m.px * 64 AS INTEGER) AS width,
        |  CAST(m.px * 64 AS INTEGER) AS height,
        |  CAST(0 AS BIGINT) AS b0,
        |  CAST((64 - p.n_light) * 64 * m.px * m.px AS BIGINT) AS b1,
        |  CAST(0 AS BIGINT) AS b2,
        |  CAST(p.n_light * 64 * m.px * m.px AS BIGINT) AS b3,
        |  CAST(p.n_light * 64 * m.px * m.px AS BIGINT) * 10000
        |    // CAST(4096 * m.px * m.px AS BIGINT) AS light_share_bp
        |FROM m JOIN pop p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "mm_edge_energy" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(doc_id % 3 + 1 AS BIGINT) AS px,
        |    substring(md5(CAST(doc_id % 40 AS VARCHAR)), 1, 16) AS bits_hex
        |  FROM documents WHERE doc_id % 4 = 2),
        |pos AS (
        |  SELECT m.doc_id, m.px,
        |    g.p // 8 AS by, g.p % 8 AS bx,
        |    (CAST(strpos('0123456789abcdef',
        |       substring(m.bits_hex, g.p // 4 + 1, 1)) - 1 AS INTEGER)
        |     // CAST(power(2, 3 - g.p % 4) AS INTEGER)) % 2 AS val
        |  FROM m, (SELECT range AS p FROM range(0, 64)) g),
        |hp AS (
        |  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS h_pairs
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND a.by = b.by AND b.bx = a.bx + 1
        |     AND a.val <> b.val
        |  GROUP BY a.doc_id),
        |vp AS (
        |  SELECT a.doc_id, CAST(count(*) AS BIGINT) AS v_pairs
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND a.bx = b.bx AND b.by = a.by + 1
        |     AND a.val <> b.val
        |  GROUP BY a.doc_id)
        |SELECT m.doc_id,
        |  CAST(m.px * 64 AS INTEGER) AS width,
        |  CAST(128 * m.px * 8 * COALESCE(hp.h_pairs, 0) AS BIGINT) AS h_energy,
        |  CAST(128 * m.px * 8 * COALESCE(vp.v_pairs, 0) AS BIGINT) AS v_energy,
        |  CAST(128 * m.px * 8 * (COALESCE(hp.h_pairs, 0) + COALESCE(vp.v_pairs, 0)) AS BIGINT)
        |    AS total_energy,
        |  128 * m.px * 8 * (COALESCE(hp.h_pairs, 0) + COALESCE(vp.v_pairs, 0)) = 0 AS is_flat
        |FROM m LEFT JOIN hp USING (doc_id) LEFT JOIN vp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "mm_format_sniff" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'riff'
        |      -- raw branch: apply the SAME magic-bytes rule the sniffer
        |      -- uses, not a hard-coded 'other' — a fixture whose text
        |      -- happens to start with ASCII 'RIFF' must land in 'riff'
        |      -- on both sides (PNG magic 0x89 cannot occur in text)
        |      ELSE (CASE WHEN text LIKE 'RIFF%' THEN 'riff' ELSE 'other' END)
        |      END AS format
        |  FROM documents WHERE doc_id % 4 = 3)
        |SELECT format, CAST(count(*) AS BIGINT) AS n_assets,
        |  CAST(MIN(doc_id) AS BIGINT) AS min_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS max_doc
        |FROM base GROUP BY format ORDER BY format""".stripMargin,

    "mm_audio_fingerprint" ->
      """SELECT doc_id,
        | CAST(4000 // ([4, 5, 8, 10, 20, 25, 40, 50][
        |   (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
        |      AS INTEGER) % 8) + 1]) AS BIGINT) AS freq_hz,
        | TRUE AS features_match
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
