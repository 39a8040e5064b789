package graft.gates

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkEntry._
import graft.engine.UpsertStream
import graft.functions.{OracleSql, TextHash}
import graft.ops.TextAnalysis.LangProfiles
import graft.model.{IngestConfig, TargetTable}
import graft.multimodal.Multimodal
import graft.ops.{BatchSplit, Dedup, Html, NearDup, Similarity, TextAnalysis}
import graft.sink.Merge
import graft.gates.GateOracleShared._

/** Multimodal gates: real PNG/GIF/BMP/JPEG pixel decode, WAV/MP4/TIFF walks (mm_*).
  *
  * Split from the monolithic SparkEntry registry (r10); see
  * [[graft.SparkEntry]] for the oracle-safety conventions and the
  * duplicate-refusing merge. Shared oracle CTEs live in
  * [[GateOracleShared]]. */
private[graft] object MultimodalGates {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- Multimodal: opaque-binary decode plumbing (stub kernel) ----
    "mm_decode_meta" -> ((s, dir) => {
      val d = t(s, dir, "documents").select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("mtype"),
        col("text").cast("binary").as("content"))
      Multimodal.decodeFrame(d, "doc_id", "content", "mtype")
    }),

    // ---- Multimodal: full metadata pipeline (decode → resize plan →
    //      frame sampling → stub features), video payloads ----
    "mm_pipeline" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .filter(col("doc_id") % 3 === 2) // the video rows of mm_decode_meta
        .select(col("doc_id"), lit("video").as("mtype"),
          col("text").cast("binary").as("content"))
      val meta = Multimodal.decodeFrame(d, "doc_id", "content", "mtype")
      val planned = Multimodal.featurePlan(
        Multimodal.frameSamplePlan(Multimodal.resizePlan(meta, 320, 240), 5), 2)
      planned.select(col("id"), col("out_w"), col("out_h"),
        col("f0"), col("f1"),
        posexplode(col("frame_idx")).as(Seq("frame_pos", "frame_idx")))
        .withColumn("frame_pos", col("frame_pos").cast("long"))
    }),

    // ---- Multimodal: REAL container parse — synthesize valid
    //      PNG/WAV/GIF/JPEG bytes with dimensions spliced into the
    //      correct header offsets, decode with the pure-JVM header
    //      parsers, and the arithmetic oracle predicts the round-trip.
    //      (The unknown-codec fallback path stays gated by
    //      mm_decode_meta; this gate proves the codec itself.) ----
    "mm_decode_headers" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(
        id,
        (id % 4).as("cls"),
        when(id % 4 === 0, MediaFixtures.pngHex(id % 640 + 1L, id % 480 + 1L))
          .when(id % 4 === 1, MediaFixtures.wavHex(
            id % 2 + 1L, (id % 5 + 1L) * 8000L, id % 200 + 1L))
          .when(id % 4 === 2, MediaFixtures.gifHex(
            id % 320 + 1L, id % 200 + 1L, id % 5 + 1L))
          .otherwise(MediaFixtures.jpegHex(id % 600 + 1L, id % 400 + 1L))
          .as("hx"))
        .select(id,
          when(col("cls") === 1, "audio").when(col("cls") === 2, "video")
            .otherwise("image").as("mtype"),
          unhex(col("hx")).as("content"))
      Multimodal.decodeFrame(d, "doc_id", "content", "mtype")
        .select(col("id"), col("mediaType"), col("nBytes"),
          col("width"), col("height"), col("nFrames"))
    }),

    // ---- Multimodal: perceptual near-dup — aHash 8×8 fingerprints
    //      from REAL decoded PNG pixels (zlib inflate + all five
    //      scanline filters; the fixture splices a closed-form raster
    //      the oracle replays arithmetically), 16-bit band join, exact
    //      popcount verify; never all-pairs ----
    "mm_ahash_neardup" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.aHashNearDup(
        Multimodal.perceptualHashes(d, "doc_id", "content"),
        "id", maxHamming = 6)
    }),

    // ---- Multimodal: perceptual DCT hash (pHash) — frequency-domain
    //      fingerprints over the REAL decoded 8×8 area-averaged luma
    //      grid, exact integer DCT with a driver-literal quantized
    //      basis, median-of-AC cut ----
    "mm_phash" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.perceptualHashes(d, "doc_id", "content")
        .select(col("id"), col("phash_lo"), col("phash_hi"))
    }),

    // ---- Multimodal: difference hash (dHash) — horizontal-gradient
    //      sign bits over the REAL decoded 9×8 luma grid;
    //      brightness-shift-immune, same decode kernel as aHash/pHash ----
    "mm_dhash" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.perceptualHashes(d, "doc_id", "content")
        .select(col("id"), col("dhash_lo"), col("dhash_hi"))
    }),

    // ---- Multimodal: exotic-stream rejection posture — REAL Adam7-
    //      interlaced PNGs and progressive-marked JPEGs (the two
    //      documented decoder rejections) yield NULL rows through the
    //      same hash plan that still decodes the interleaved PNG
    //      controls; a task failure or a dropped row fails the gate ----
    "mm_reject_exotic" -> ((s, dir) => {
      val d = exoticFixture(s, dir)
      Multimodal.perceptualHashes(d, "doc_id", "content")
        .select(col("id"), col("width"), col("height"),
          col("ahash_lo").isNull.as("rejected"))
    }),

    // ---- Multimodal: decoded-pixel quality stats — exact luma moments
    //      + L1-gradient edge density (the blur/flat-image filter signal)
    //      over REAL decoded PNG rasters ----
    "mm_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: luma-histogram Shannon entropy — the
    //      information-content quality signal over decoded rasters
    //      (quantized-ln exact-integer discipline) ----
    "mm_luma_entropy" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.lumaEntropy(d, "doc_id", "content")
    }),

    // ---- Multimodal: REAL area-average thumbnail — decode, box-mean
    //      downsample to 6×5, fingerprint the resized raster (rolling
    //      polynomial hash the oracle replays from the closed form) ----
    "mm_resize_pixels" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = pngFixture(s, dir)
      Multimodal.resizePixels(d, "doc_id", "content", outW = 6, outH = 5)
    }),

    // ---- Multimodal: GIF pixel decode — the SECOND real image codec.
    //      The fixture is a complete valid GIF89a (gray-ramp palette,
    //      genuine 9-bit LZW sub-blocks); the engine must LZW-decode
    //      the bytes while the oracle replays the closed-form raster.
    //      Dims differ from the PNG gates on purpose: a dispatcher
    //      falling through to the wrong codec cannot match. ----
    "mm_gif_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = gifFixture(s, dir)
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: GIF thumbnail — LZW decode + exact area-average
    //      box means to 5×4, rolling-hash fingerprint of the resized
    //      raster (the full-raster proof: every grid cell must match) ----
    "mm_gif_resize" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = gifFixture(s, dir)
      Multimodal.resizePixels(d, "doc_id", "content", outW = 5, outH = 4)
    }),

    // ---- Multimodal: mixed-codec corpus — docs rotate PNG / GIF / BMP
    //      by id, SAME raster formula. One binary column, per-row codec
    //      sniffing: an engine that routes by anything but the BYTES
    //      (or decodes only some codecs) cannot match the oracle, which
    //      replays the formula codec-blind. ----
    "mm_mixed_codec_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = mixedCodecFixture(s, dir)
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: FOUR-codec corpus — PNG / GIF / BMP / JPEG
    //      rotate by id in one binary column. JPEG carries the
    //      flat-block formula (entropy-coded data can't splice an
    //      arbitrary raster exactly), the other three the pixel
    //      formula, so the oracle picks the replay per id — the
    //      engine side still sees only bytes and must sniff all four,
    //      including the FFD8 path the 3-codec gate predates. ----
    "mm_mixed_codec4_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", { id =>
          val (w, h, sd) = ((id % 17 + 9).toInt, (id % 10 + 8).toInt, id % 61)
          (id % 4) match {
            case 0 => MediaFixtures.pngPixelBytes(w, h, sd)
            case 1 => MediaFixtures.gifPixelBytes(w, h, sd)
            case 2 => MediaFixtures.bmpPixelBytes(w, h, sd)
            case _ => MediaFixtures.jpegPixelBytes(w, h, sd)
          }
        })
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: Netpbm P5/P6 decode — the SIXTH codec, the only
    //      one with a free-form ASCII header (#-comments legal between
    //      tokens); P5 gray and P6 gray-RGB alternate per row over the
    //      same raster, so the oracle is codec-blind ----
    "mm_pnm_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", { id =>
          val (w, h, sd) = ((id % 20 + 9).toInt, (id % 13 + 7).toInt, id % 43)
          if (id % 2 == 0) MediaFixtures.pgmPixelBytes(w, h, sd)
          else MediaFixtures.ppmPixelBytes(w, h, sd)
        })
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: FIVE-codec dispatch — PNG/GIF/BMP/JPEG/QOI
    //      rotating per row through one binary column; the oracle is
    //      per-id formula replay, so only an engine that sniffs and
    //      decodes all five codecs can match every row ----
    "mm_mixed_codec5_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", { id =>
          val (w, h, sd) = ((id % 15 + 9).toInt, (id % 9 + 8).toInt, id % 53)
          (id % 5) match {
            case 0 => MediaFixtures.pngPixelBytes(w, h, sd)
            case 1 => MediaFixtures.gifPixelBytes(w, h, sd)
            case 2 => MediaFixtures.bmpPixelBytes(w, h, sd)
            case 3 => MediaFixtures.jpegPixelBytes(w, h, sd)
            case _ => MediaFixtures.qoiPixelBytes(w, h, sd)
          }
        })
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: BMP thumbnail — the third codec alone: bottom-up
    //      row reversal + padding walk, box means to 7×3, rolling-hash
    //      fingerprint (full-raster proof per codec, like the PNG and
    //      GIF twins) ----
    "mm_bmp_resize" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(t(s, dir, "documents"),
        "doc_id", id => MediaFixtures.bmpPixelBytes(
          (id % 18 + 9).toInt, (id % 7 + 6).toInt, id % 79))
      Multimodal.resizePixels(d, "doc_id", "content", outW = 7, outH = 3)
    }),

    // ---- Multimodal: baseline JPEG pixel decode — the FOURTH real
    //      codec, and the first entropy-coded one with huffman + IDCT.
    //      The fixture is a complete valid grayscale JPEG whose blocks
    //      are DC-only (IDCT output = F₀₀·Q₀₀/8, an exact integer), so
    //      the engine must huffman-decode real entropy data while the
    //      oracle replays the flat-block closed form. Dims differ from
    //      every other codec gate: fall-through cannot match. ----
    "mm_jpeg_pixel_stats" -> ((s, dir) => {
      val d = jpegFixture(s, dir)
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: JPEG restart markers — DRI interval 2, RSTn
    //      every two MCUs with DC-prediction resets. A decoder that
    //      does not reset (or mis-aligns at the marker) mismatches
    //      every block after the first restart. ----
    "mm_jpeg_restart_stats" -> ((s, dir) => {
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id",
        id => graft.multimodal.MediaFixtures.jpegPixelBytes(
          (id % 20 + 12).toInt, (id % 9 + 10).toInt, id % 67,
          restartInterval = 2))
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: 4:2:0 color JPEG thumbnail — each MCU
    //      interleaves 2×2 Y blocks + Cb + Cr; the engine must walk the
    //      T.81 interleave order, decode (and discard) chroma to keep
    //      the bitstream aligned, and crop the 16-pixel MCU padding.
    //      Same DC-only luma closed form as the grayscale twin. ----
    "mm_jpeg420_resize" -> ((s, dir) => {
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id",
        id => graft.multimodal.MediaFixtures.jpeg420PixelBytes(
          (id % 23 + 17).toInt, (id % 13 + 16).toInt, id % 71))
      Multimodal.resizePixels(d, "doc_id", "content", outW = 6, outH = 4)
    }),

    // ---- Multimodal: MP4/ISO-BMFF box walk — the VIDEO container:
    //      ftyp brand, mvhd timescale/duration (+ exact integer ms),
    //      per-trak tkhd 16.16 dims MAXed over tracks (odd ids carry a
    //      0×0 audio trak a first-match reader would trip on) ----
    "mm_mp4_meta" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id",
        id => MediaFixtures.mp4Bytes(
          (id % 33 + 16).toInt, (id % 19 + 12).toInt,
          1000L * (id % 3 + 1), id % 9000 + 100,
          audioTrack = id % 2 == 1))
      Multimodal.mp4MetaPlan(d, "doc_id", "content")
    }),

    // ---- Multimodal: animated-GIF frame sampling + scene-change
    //      detection — decode every frame of a multi-frame GIF (LZW per
    //      frame, GCE extensions between descriptors), aHash each
    //      raster, hamming distance between consecutive frames. The
    //      fixture cuts every 2 frames, so holds (0) and cuts (large)
    //      both appear and the oracle predicts each frame exactly. ----
    "mm_gif_scene_change" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = graft.multimodal.MediaFixtures.withFixtureBytes(t(s, dir, "documents"),
        "doc_id", id => MediaFixtures.gifAnimBytes(
          (id % 14 + 8).toInt, (id % 9 + 8).toInt, (id % 4 + 2).toInt,
          id % 73))
      Multimodal.frameSceneChange(d, "doc_id", "content", maxFrames = 8)
    }),

    // ---- Multimodal: windowed PCM energy — REAL 16-bit sample decode
    //      from synthesized RIFF/WAVE payloads (exact integer Σv² per
    //      64-sample window; the oracle predicts the sawtooth closed
    //      form the data chunk actually carries) ----
    "mm_audio_energy" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        unhex(MediaFixtures.wavPcmHex(id % 2 + 1L, (id % 5 + 1L) * 8000L,
          id % 200 + 1L, id % 97)).as("content"))
      Multimodal.wavWindowEnergy(d, "doc_id", "content", window = 64)
    }),

    // ---- Multimodal: patch extraction (the ViT patchify stage) —
    //      non-overlapping 5×5 tiles of the decoded raster, exact mean
    //      + rolling fingerprint per tile (tile-level dedup feed);
    //      partial edge tiles dropped by contract ----
    "mm_patchify" -> ((s, dir) =>
      Multimodal.patchify(pngFixture(s, dir), "doc_id", "content",
        patch = 5)),

    // ---- Multimodal: animation timing walk — frame count + Σ GCE
    //      delays (per-frame delays VARY as 3+f centiseconds, so only a
    //      real extension walk sums them); header-level, no LZW. The
    //      number a frame-sampling policy divides by. ----
    "mm_gif_duration" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.gifAnimBytes((id % 14 + 8).toInt,
            (id % 9 + 8).toInt, (id % 4 + 2).toInt, id % 73))
      Multimodal.gifTiming(d, "doc_id", "content")
    }),

    // ---- Multimodal: corpus-wide duplicate-TILE detection — patchify
    //      feeds a fingerprint group-by (the watermark/letterbox/sky
    //      detector): tiles appearing ≥2 times across the corpus, with
    //      occurrence and distinct-doc counts. Fixture seeds repeat
    //      every 97 docs, so identical tiles genuinely recur. ----
    "mm_patch_dedup" -> ((s, dir) => {
      val p = Multimodal.patchify(pngFixture(s, dir), "doc_id", "content",
        patch = 5)
      p.where(col("patch_fp").isNotNull)
        .groupBy(col("patch_fp"))
        .agg(count(lit(1)).as("n_tiles"),
          countDistinct(col("id")).as("n_docs"))
        .where(col("n_tiles") >= 2L)
    }),

    // ---- Multimodal: TIFF/EXIF metadata parse — the routing pass
    //      before pixel work (orientation-normalize, dims sanity).
    //      Fixture alternates little/big endian per row and exercises
    //      inline AND offset ASCII values; the oracle predicts the
    //      tags in closed form, so only a real IFD walk matches. ----
    "mm_exif" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", { id =>
          val make =
            if (id % 5 == 0) "c" + (id % 10) else "cam" + (id % 10)
          MediaFixtures.tiffBytes(id % 2 == 0,
            id % 500 + 1, id % 400 + 1, (id % 8 + 1).toInt, make)
        })
      Multimodal.exifMeta(d, "doc_id", "content")
    }),

    // ---- Multimodal: silence trimming — every third 64-sample window
    //      of the gated fixture is silent; the op reports the crop plan
    //      (first/last voiced window) from the exact Σ|v| test ----
    "mm_audio_trim" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.wavPcmGatedBytes((id % 2 + 1).toInt,
            (id % 5 + 1) * 8000L, (id % 200 + 1).toInt, id % 97))
      Multimodal.wavTrimSilence(d, "doc_id", "content", window = 64,
        meanAbsThreshold = 16L)
    }),

    // ---- Multimodal: windowed quantized-DFT filterbank — exact
    //      integer correlations against the driver-literal cos/sin
    //      basis per 64-sample window and bins {1,2,4,8}; power is the
    //      one fixed-shape IEEE readout ----
    "mm_audio_spectrum" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        unhex(MediaFixtures.wavPcmHex(id % 2 + 1L, (id % 5 + 1L) * 8000L,
          id % 200 + 1L, id % 97)).as("content"))
      Multimodal.wavWindowSpectrum(d, "doc_id", "content", window = 64,
        bins = Seq(1, 2, 4, 8))
    }),

    // ---- Multimodal: rational 2/3 PCM resample (48k→32k shape) —
    //      exact integer linear interpolation at source position
    //      j·3/2 with FLOOR division (negative samples round like the
    //      oracle's //); output summarized as Σ|v| + rolling
    //      fingerprint over the full resampled stream ----
    // ---- Multimodal: STEREO PCM16 WAV — the interleaving test: per-
    //      channel moments + the cross-channel product sum; a mono
    //      misread or channel swap cannot cancel ----
    "mm_wav_stereo" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.stereoWavBytes((id % 60 + 30).toInt, id % 97))
      Multimodal.wavStereoStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: ICO icon directory — TWO codecs behind one
    //      directory (a real PNG and the headerless doubled-height
    //      BMP-in-ICO with its AND mask); per-image rows + quarantine ----
    "mm_ico_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.icoBytes(
            (id % 13 + 8).toInt, (id % 9 + 7).toInt, id % 59,
            (id % 17 + 9).toInt, (id % 7 + 6).toInt, id % 67))
      Multimodal.icoPixelStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: Motion-JPEG AVI — the first video container
    //      whose FRAMES are decoded (RIFF walk + the real baseline-JPEG
    //      decoder per 00dc chunk); per-frame luma rows, frame-level
    //      quarantine, idx1 skipped cleanly ----
    "mm_avi_frame_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.aviMjpegBytes(
            (id % 18 + 10).toInt, (id % 11 + 9).toInt,
            (id % 3 + 2).toInt, id % 101, 40000L + (id % 5) * 1000L))
      Multimodal.aviFrameStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: TGA truecolor decode — the SEVENTH codec, first
    //      footer-dispatched one, covering both uncompressed and RLE
    //      image types, BGR channel order (three DIFFERENT channel
    //      formulas so a swap can't cancel), and both row orders ----
    "mm_tga_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.tgaPixelBytes(
            (id % 21 + 8).toInt, (id % 11 + 6).toInt, id % 83,
            rle = id % 2 == 1, topDown = id % 4 < 2))
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: PCX 8-bpp decode — the EIGHTH codec, the only
    //      one with a TRAILING palette (0x0C-marked VGA block after the
    //      RLE data) and even bytesPerLine padding the decoder must
    //      drop; three distinct palette-channel formulas so a channel
    //      swap can't cancel ----
    // ---- Multimodal: BI_RLE8 compressed BMP — the run-length branch
    //      of the BMP decoder (runs, end-of-line/bitmap escapes, and
    //      ABSOLUTE mode with its word-alignment pad on every third
    //      row); same luma == formula contract as the uncompressed gate ----
    "mm_bmp_rle_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.bmpRlePixelBytes(
            (id % 17 + 8).toInt, (id % 9 + 7).toInt, id % 73))
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    "mm_pcx_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.pcxPixelBytes(
            (id % 19 + 7).toInt, (id % 13 + 6).toInt, id % 89))
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: PCX COLOR statistics — the first color-space
    //      readout: distinct palette indices, dominant color
    //      (background detector), exact per-channel sums ----
    "mm_pcx_color_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.pcxPixelBytes(
            (id % 19 + 7).toInt, (id % 13 + 6).toInt, id % 89))
      Multimodal.pcxColorStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: Otsu automatic threshold over decoded rasters —
    //      histogram binarization with exact integer between-class
    //      variance (BigInt intermediates mirror the oracle's HUGEINT),
    //      floored-quotient comparison, ties to the smaller t ----
    "mm_otsu_threshold" -> ((s, dir) =>
      Multimodal.otsuThreshold(pngFixture(s, dir), "doc_id", "content")),

    // ---- Multimodal: Sobel gradient energy — the 3x3 edge operator
    //      as an exact L1 integer aggregate over the decoded interior;
    //      the sharpness/structure readout for image filtering ----
    "mm_sobel_energy" -> ((s, dir) =>
      Multimodal.sobelEnergy(pngFixture(s, dir), "doc_id", "content",
        strongThreshold = 160)),

    // ---- Multimodal: AIFF container — the big-endian WAV sibling,
    //      with an IFF chunk walk (odd-size padding), a COMM chunk
    //      carrying the 80-bit extended-float sample rate (decoded
    //      exactly), and PCM16 BE samples in SSND ----
    "mm_audio_aiff" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", MediaFixtures.aiffBytes)
      Multimodal.aiffStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: WebP container dims — the NINTH image container
    //      (RIFF form): lossy "VP8 " start-code + 14-bit LE dims vs
    //      lossless "VP8L" packed w−1/h−1 bit fields, with a corrupted
    //      start code as the rejection path (id%3==2 → NULL row) ----
    "mm_webp_dims" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", MediaFixtures.webpBytes)
      Multimodal.webpMeta(d, "doc_id", "content")
    }),

    // ---- Multimodal: SubRip (SRT) subtitle cue census — the video
    //      text-track side: cue count, Σ duration, consecutive-overlap
    //      count, span, longest cue; a swapped-timestamp block (id%7==0)
    //      is the malformed rejection path ----
    "mm_srt_cues" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", MediaFixtures.srtBytes)
      Multimodal.srtCues(d, "doc_id", "content")
    }),

    // ---- Multimodal: ID3v2 tag extraction — synchsafe sizes, the
    //      v2.3 (BE32) / v2.4 (synchsafe) frame-size split per parity,
    //      ISO-8859-1 text frames, padding/trailing-audio boundaries ----
    "mm_id3_tags" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", MediaFixtures.id3Bytes)
      Multimodal.id3Tags(d, "doc_id", "content")
    }),

    // ---- Multimodal: Sun AU (.au/.snd) container — the third audio
    //      container shape: big-endian header, annotation-padding skip,
    //      "unknown size" sentinel, and THREE encodings (mu-law,
    //      signed-8, 16-bit BE) behind one dispatch ----
    "mm_audio_au" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", MediaFixtures.auBytes)
      Multimodal.auStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: dual-tone keypad detection (DTMF-shaped) by
    //      quadrature square-wave correlation — the exact-integer
    //      Goertzel stand-in; argmax per frequency group decodes the
    //      4x4 keypad digit ----
    "mm_audio_dtmf" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents").filter(col("doc_id") % 8 === 0),
        "doc_id", id =>
          MediaFixtures.toneBytes(id, DtmfLowPeriods, DtmfHighPeriods))
      Multimodal.toneDetect(d, "doc_id", "content",
        DtmfLowPeriods, DtmfHighPeriods)
    }),

    // ---- Multimodal: G.711 μ-LAW decode — the telephony audio byte
    //      format (one log-companded byte per 8 kHz sample, no
    //      container): the kernel expands each byte with the public
    //      closed form and emits exact integer energy/peak stats; the
    //      oracle replays byte formula AND expansion per sample ----
    "mm_audio_mulaw" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          Array.tabulate(((id % 50) + 20).toInt)(i =>
            ((7L * i + 13L * id + i.toLong * i) % 256L).toByte))
      Multimodal.mulawStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: G.711 A-LAW audio — μ-law's European twin,
    //      same fixture byte formula through the other companding law
    //      (post-XOR sign bit means POSITIVE — the classic trap both
    //      engines must agree on) ----
    "mm_audio_alaw" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          Array.tabulate(((id % 50) + 20).toInt)(i =>
            ((7L * i + 13L * id + i.toLong * i) % 256L).toByte))
      Multimodal.alawStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: IMA ADPCM audio — the 4-bit predictor/step-index
    //      STATE MACHINE (first sequentially-stateful audio codec on
    //      the board); the oracle replays the walk as a recursive CTE
    //      and the gate pins the final (predictor, index) state, which
    //      no aggregate-only check could fake ----
    "mm_audio_adpcm" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          Array.tabulate(((id % 40) + 10).toInt)(i =>
            ((11L * i + 17L * id + i.toLong * i * i) % 256L).toByte))
      Multimodal.adpcmStats(d, "doc_id", "content")
    }),

    // ---- Multimodal: QOI pixel decode — the FIFTH codec, first with
    //      a running-palette op set (INDEX/DIFF/LUMA/RUN/RGB chunks);
    //      the fixture is a real greedy encode of the gray formula
    //      raster (div-3 quantized so runs exist), the oracle replays
    //      the formula closed-form with no QOI decoder ----
    "mm_qoi_pixel_stats" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.qoiPixelBytes(
            (id % 23 + 10).toInt, (id % 12 + 7).toInt, id % 71))
      Multimodal.pixelStats(d, "doc_id", "content", edgeThreshold = 24)
    }),

    // ---- Multimodal: IMA ADPCM in its REAL WAV container (format
    //      tag 0x0011) — per-block 4-byte state headers reseed the
    //      decoder (the format's seek feature), header predictor IS
    //      the first sample; container walk + block walk + state
    //      machine in one gate, final predictor pinned ----
    "mm_audio_adpcm_wav" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val d = MediaFixtures.withFixtureBytes(
        t(s, dir, "documents"), "doc_id", id =>
          MediaFixtures.wavAdpcmBytes(
            (id % 3 + 1).toInt, (12 + (id % 2) * 4).toInt, id % 101))
      Multimodal.adpcmWavStats(d, "doc_id", "content")
    }),

    "mm_audio_resample" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        unhex(MediaFixtures.wavPcmHex(id % 2 + 1L, (id % 5 + 1L) * 8000L,
          id % 200 + 1L, id % 97)).as("content"))
      Multimodal.wavResample(d, "doc_id", "content", upL = 2, downM = 3)
    }),

    // ---- Multimodal: windowed PCM zero-crossing count + amplitude
    //      envelope — the voiced/silence discriminator beside energy;
    //      exact sign-flip counts, peak |v|, Σ|v| per 64-sample window
    //      over the same decoded sawtooth ----
    "mm_audio_zcr" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        unhex(MediaFixtures.wavPcmHex(id % 2 + 1L, (id % 5 + 1L) * 8000L,
          id % 200 + 1L, id % 97)).as("content"))
      Multimodal.wavWindowZcr(d, "doc_id", "content", window = 64)
    }),

    // ---- Multimodal: exact blob dedup — BinaryType groupBy over the
    //      synthesized frames (same params ⇒ same bytes; dims spliced
    //      into real headers make distinct params distinct bytes) ----
    "mm_dedup_exact" -> ((s, dir) => {
      import graft.multimodal.MediaFixtures
      val id = col("doc_id")
      val d = t(s, dir, "documents").select(id,
        unhex(MediaFixtures.pngHex(id % 50 + 1L, id % 30 + 1L))
          .as("content"))
      d.groupBy(col("content"))
        .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
        .select(col("keep_id"), col("n_copies"))
    }),
  )

  /** Candidate period tables for the dual-tone gate — shared by the
    * fixture, the detector, and the oracle SQL so they cannot drift.
    * Multiples of 4 (integer quarter-phase shift for the quadrature
    * correlator); rows = low group, columns = high group. */
  private[graft] val DtmfLowPeriods = Array(40, 36, 32, 28)
  private[graft] val DtmfHighPeriods = Array(20, 16, 12, 8)

  def oracles: Map[String, String] = {
    val mmJpegPx = "2 * ((17 * (xx // 8) + 29 * (yy // 8) + " +
      "13 * (xx // 8) * (yy // 8) + s) % 120 - 60) + 128"
    def mmPixelStatsSql(wE: String, hE: String, sE: String,
        pxE: String = mmPngPx): String =
      s"WITH m AS (SELECT doc_id AS id, $wE AS w, " +
        s"$hE AS h, $sE AS s FROM documents), " +
        "px AS (SELECT id, w, h, flatten(list_transform(range(0, h), " +
        "yy -> list_transform(range(0, w), xx -> " +
        s"$pxE))) AS l " +
        "FROM m), " +
        "eg AS (SELECT id, w, h, l, " +
        "list_sum(flatten(list_transform(range(0, h - 1), yy -> " +
        "list_transform(range(0, w - 1), xx -> " +
        "CASE WHEN abs(l[yy * w + xx + 2] - l[yy * w + xx + 1]) + " +
        "abs(l[(yy + 1) * w + xx + 1] - l[yy * w + xx + 1]) > 24 " +
        "THEN 1 ELSE 0 END)))) AS ec FROM px) " +
        "SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
        "CAST(w * h AS BIGINT) AS n_px, " +
        "CAST(list_sum(l) AS BIGINT) AS luma_sum, " +
        "CAST(list_sum(l) * 1000 // (w * h) AS BIGINT) AS luma_mean_q, " +
        "CAST(list_min(l) AS BIGINT) AS luma_min, " +
        "CAST(list_max(l) AS BIGINT) AS luma_max, " +
        "CAST(ec AS BIGINT) AS edge_count, " +
        "CAST(ec * 1000000 // ((w - 1) * (h - 1)) AS BIGINT) " +
        "AS edge_density_q FROM eg"
    val mmSql =
      "WITH m AS (SELECT doc_id AS id, " +
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS mt, " +
        s"CAST(length(text) AS BIGINT) AS nb, ${OracleSql.asciiChecksum("text")} AS checksum " +
        "FROM documents) " +
        "SELECT id, mt AS \"mediaType\", nb AS \"nBytes\", checksum, " +
        "CAST(checksum % 640 + 1 AS INT) AS width, " +
        "CAST((checksum // 640) % 480 + 1 AS INT) AS height, " +
        "CAST(CASE mt WHEN 'video' THEN checksum % 240 + 1 " +
        "WHEN 'audio' THEN checksum % 48000 + 1 ELSE 1 END AS INT) AS \"nFrames\" FROM m"
    val mmPipeline =
      s"WITH m AS (SELECT doc_id AS id, ${OracleSql.asciiChecksum("text")} AS ck " +
        "FROM documents WHERE doc_id % 3 = 2), " +
        "v AS (SELECT id, ck, CAST(ck % 240 + 1 AS BIGINT) AS n, " +
        "ck % 640 + 1 AS w, (ck // 640) % 480 + 1 AS h FROM m), " +
        "r AS (SELECT *, least(320000 // w, 240000 // h, 1000) AS scale FROM v), " +
        "d AS (SELECT id, n, CAST(greatest(1, w * scale // 1000) AS INT) AS out_w, " +
        "CAST(greatest(1, h * scale // 1000) AS INT) AS out_h, " +
        "CAST((ck * 1 + 12345) % 1000000007 AS DOUBLE) / 1000000007 AS f0, " +
        "CAST((ck * 3 + 24690) % 1000000007 AS DOUBLE) / 1000000007 AS f1 FROM r) " +
        "SELECT id, out_w, out_h, f0, f1, CAST(g.i AS BIGINT) AS frame_pos, " +
        "CAST(CASE WHEN n <= 5 THEN g.i ELSE g.i * (n-1) // 4 END AS BIGINT) AS frame_idx " +
        "FROM d CROSS JOIN (SELECT unnest(range(5)) AS i) g " +
        "WHERE g.i < CASE WHEN n <= 5 THEN n ELSE 5 END"
    Map(
      "mm_pipeline" -> mmPipeline,
      "mm_dedup_exact" ->
        // Same synth params ⇒ byte-identical frames, so the binary
        // groupBy is exactly the parameter-pair groupBy.
        ("SELECT min(doc_id) AS keep_id, " +
          "CAST(count(*) AS BIGINT) AS n_copies FROM documents " +
          "GROUP BY doc_id % 50, doc_id % 30"),
      "mm_ahash_neardup" ->
        // The ENGINE inflates + unfilters the fixture PNG and
        // area-averages real pixels; the oracle replays the closed-form
        // raster the fixture spliced in (MediaFixtures.pixelFormula) —
        // equality proves the byte-level decode. Same packing, 16-bit
        // bands, popcount verify as before.
        ("WITH " + mmAHashCtes + ", " +
          "rp AS (SELECT min(id) AS id, lo, hi FROM hsh GROUP BY lo, hi), " +
          "e AS (SELECT id, lo, hi, u.bi AS bi, u.bv AS bv FROM (" +
          "SELECT id, lo, hi, unnest([" +
          "{'bi': 0, 'bv': lo % 65536}, {'bi': 1, 'bv': lo // 65536}, " +
          "{'bi': 2, 'bv': hi % 65536}, {'bi': 3, 'bv': hi // 65536}]) " +
          "AS u FROM rp)) " +
          "SELECT * FROM (SELECT DISTINCT x.id AS doc_a, y.id AS doc_b, " +
          "CAST(bit_count(xor(x.lo, y.lo)) + " +
          "bit_count(xor(x.hi, y.hi)) AS BIGINT) AS hamming " +
          "FROM e x JOIN e y ON x.bi = y.bi AND x.bv = y.bv " +
          "AND x.id < y.id) WHERE hamming BETWEEN 1 AND 6"),
      "mm_phash" -> {
        val tq = graft.multimodal.Multimodal.dctTableQ.mkString("[", ", ", "]")
        // Same replayed real-pixel luma grid as mm_ahash_neardup; DCT
        // replayed with the identical quantized basis literals. The
        // basis list is HOISTED into a one-row CTE (`dctm.t`): inlined,
        // DuckDB re-constructs the 64-element literal per (k, g)
        // element — >900 s over the 10× replica vs 32 s hoisted.
        // Integer sums, so the restructure is value-identical.
        s"WITH dctm AS (SELECT $tq AS t), " + mmLumaCte(8, 8) + ", " +
          s"cf AS (SELECT id, list_transform(range(0, 64), k -> " +
          "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "list_transform(range(0, 64), g -> " +
          s"lum[g + 1] * dctm.t[(k // 8) * 8 + (g % 8) + 1] * " +
          s"dctm.t[(k % 8) * 8 + (g // 8) + 1])), " +
          "(a, b) -> a + b)) AS coef FROM l CROSS JOIN dctm), " +
          "md AS (SELECT id, coef, " +
          "list_sort(coef[2:64])[32] AS med FROM cf) " +
          "SELECT id, " +
          "CAST(list_sum(list_transform(range(0, 32), k -> " +
          "CASE WHEN coef[k + 1] > med THEN (CAST(1 AS BIGINT) << k) " +
          "ELSE 0 END)) AS BIGINT) AS phash_lo, " +
          "CAST(list_sum(list_transform(range(32, 64), k -> " +
          "CASE WHEN coef[k + 1] > med THEN (CAST(1 AS BIGINT) << (k - 32)) " +
          "ELSE 0 END)) AS BIGINT) AS phash_hi FROM md"
      },
      "mm_pixel_stats" ->
        // Full-raster replay of the closed form: exact luma moments and
        // the L1-gradient edge count over the interior.
        mmPixelStatsSql("doc_id % 24 + 9", "doc_id % 16 + 8", "doc_id % 97"),
      "mm_qoi_pixel_stats" ->
        // The QOI fixture's gray raster is the div-3-quantized formula
        // (runs exist by construction); BT.601 luma of gray is exact,
        // so the replay needs no codec at all.
        mmPixelStatsSql("doc_id % 23 + 10", "doc_id % 12 + 7",
          "doc_id % 71",
          "(31 * (xx // 3) + 47 * yy + 7 * (xx // 3) * yy + 101 * s) % 256"),
      "mm_reject_exotic" ->
        // Closed-form replay of the rejection posture: interlaced PNG
        // (0 mod 3) and progressive JPEG (1 mod 3) rows survive as
        // NULL-dims rejected rows; the PNG controls carry their dims.
        ("SELECT doc_id AS id, " +
          "CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 24 + 9 END " +
          "AS INT) AS width, " +
          "CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 16 + 8 END " +
          "AS INT) AS height, " +
          "doc_id % 3 <> 2 AS rejected FROM documents"),
      "mm_mixed_codec_stats" ->
        // Codec-BLIND replay over the mixed PNG/GIF/BMP column's dims:
        // all three fixtures carry the same formula raster, so the
        // oracle never mentions a codec — only an engine that sniffs
        // and decodes ALL THREE per row can match.
        mmPixelStatsSql("doc_id % 19 + 8", "doc_id % 11 + 7", "doc_id % 83"),
      "mm_mixed_codec4_stats" ->
        // Per-id replay: rows 0/1/2 mod 4 carry the PNG/GIF/BMP pixel
        // formula, rows 3 mod 4 the JPEG flat-block formula — the
        // engine saw only bytes and had to sniff + decode all four.
        mmPixelStatsSql("doc_id % 17 + 9", "doc_id % 10 + 8",
          "doc_id % 61",
          s"CASE WHEN id % 4 = 3 THEN $mmJpegPx ELSE $mmPngPx END"),
      "mm_pnm_pixel_stats" ->
        // Codec-blind replay: P5 and P6 rows carry the same formula
        // raster (P6 as gray RGB, BT.601-exact).
        mmPixelStatsSql("doc_id % 20 + 9", "doc_id % 13 + 7",
          "doc_id % 43"),
      "mm_wav_stereo" -> {
        // Per-channel sawtooth replay over the frame index; the engine
        // had to walk RIFF and de-interleave [L, R] pairs.
        val l = "(((j * 2477 + s) % 4096) - 2048)"
        val r = "(((j * 1931 + 7 * s) % 4096) - 2048)"
        "WITH m AS (SELECT doc_id AS id, doc_id % 60 + 30 AS n, " +
          "doc_id % 97 AS s FROM documents), " +
          "v AS (SELECT id, n, s, " +
          s"list_transform(range(0, n), j -> $l) AS lv, " +
          s"list_transform(range(0, n), j -> $r) AS rv FROM m) " +
          "SELECT id, CAST(n AS BIGINT) AS n_frames, " +
          "CAST(8000 AS BIGINT) AS sample_rate, " +
          "CAST(list_sum(list_transform(lv, x -> abs(x))) AS BIGINT) " +
          "AS l_sum_abs, " +
          "CAST(list_sum(list_transform(lv, x -> x * x)) AS BIGINT) " +
          "AS l_energy, " +
          "CAST(list_sum(list_transform(rv, x -> abs(x))) AS BIGINT) " +
          "AS r_sum_abs, " +
          "CAST(list_sum(list_transform(rv, x -> x * x)) AS BIGINT) " +
          "AS r_energy, " +
          "CAST(list_sum(list_transform(range(0, n), j -> " +
          s"$l * $r)) AS BIGINT) AS cross FROM v"
      },
      "mm_ico_pixel_stats" -> {
        // Both payloads carry the same grid formula at different
        // (w, h, s): the PNG through zlib+unfilter, the BMP-in-ICO
        // through palette + doubled height + AND-mask accounting —
        // one codec-blind replay covers both rows.
        val px = "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256"
        "WITH m AS (SELECT doc_id AS id, doc_id % 13 + 8 AS wp, " +
          "doc_id % 9 + 7 AS hp, doc_id % 59 AS sp, " +
          "doc_id % 17 + 9 AS wb, doc_id % 7 + 6 AS hb, " +
          "doc_id % 67 AS sb FROM documents), " +
          "u AS (SELECT id, 0 AS image, wp AS w, hp AS h, sp AS s, " +
          "TRUE AS is_png FROM m " +
          "UNION ALL SELECT id, 1, wb, hb, sb, FALSE FROM m), " +
          "px AS (SELECT id, image, w, h, is_png, " +
          "list_sum(flatten(list_transform(range(0, h), yy -> " +
          s"list_transform(range(0, w), xx -> $px)))) AS ls FROM u) " +
          "SELECT id, CAST(image AS BIGINT) AS image, " +
          "CAST(w AS INT) AS width, CAST(h AS INT) AS height, is_png, " +
          "CAST(w * h AS BIGINT) AS n_px, " +
          "CAST(ls AS BIGINT) AS luma_sum FROM px"
      },
      "mm_avi_frame_stats" -> {
        // Frame f of doc id carries the DC-only formula at seed s0+f:
        // the oracle replays every frame's raster closed-form; the
        // engine had to walk the RIFF tree and huffman-decode each one.
        val px = "2 * ((17 * (xx // 8) + 29 * (yy // 8) + " +
          "13 * (xx // 8) * (yy // 8) + (s0 + f)) % 120 - 60) + 128"
        "WITH m AS (SELECT doc_id AS id, doc_id % 18 + 10 AS w, " +
          "doc_id % 11 + 9 AS h, doc_id % 3 + 2 AS nf, " +
          "doc_id % 101 AS s0, 40000 + (doc_id % 5) * 1000 AS upf " +
          "FROM documents), " +
          "fr AS (SELECT id, w, h, nf, s0, upf, " +
          "unnest(range(0, nf)) AS f FROM m), " +
          "px AS (SELECT id, f, w, h, upf, nf, " +
          "list_sum(flatten(list_transform(range(0, h), yy -> " +
          s"list_transform(range(0, w), xx -> $px)))) AS ls FROM fr) " +
          "SELECT id, CAST(f AS BIGINT) AS frame, CAST(w AS INT) AS width, " +
          "CAST(h AS INT) AS height, CAST(upf AS BIGINT) AS us_per_frame, " +
          "CAST(nf AS BIGINT) AS n_frames_declared, " +
          "CAST(w * h AS BIGINT) AS n_px, " +
          "CAST(ls AS BIGINT) AS luma_sum FROM px"
      },
      "mm_tga_pixel_stats" -> {
        // Three distinct channel formulas through the BT.601 integer
        // luma — the engine recovered them from BGR bytes (RLE packets
        // for odd ids, which also quantize x by 3 so runs exist); the
        // stats are row-order invariant, so one replay covers both the
        // top-down and bottom-up fixtures.
        val q = "(CASE WHEN id % 2 = 1 THEN xx // 3 ELSE xx END)"
        val rC = s"((17 * $q + 71 * yy + 3 * $q * yy + 59 * s) % 256)"
        val gC = s"((53 * $q + 29 * yy + 11 * $q * yy + 97 * s) % 256)"
        val bC = s"((31 * $q + 47 * yy + 7 * $q * yy + 101 * s) % 256)"
        mmPixelStatsSql("doc_id % 21 + 8", "doc_id % 11 + 6",
          "doc_id % 83", s"(77 * $rC + 150 * $gC + 29 * $bC) // 256")
      },
      "mm_sobel_energy" -> {
        // Sobel replay over the closed-form PNG raster: 1-indexed list
        // lookups, pixel (x,y) at l[y*w + x + 1].
        val gx = "(l[(yy - 1) * w + xx + 2] + 2 * l[yy * w + xx + 2] + " +
          "l[(yy + 1) * w + xx + 2]) - (l[(yy - 1) * w + xx] + " +
          "2 * l[yy * w + xx] + l[(yy + 1) * w + xx])"
        val gy = "(l[(yy + 1) * w + xx] + 2 * l[(yy + 1) * w + xx + 1] + " +
          "l[(yy + 1) * w + xx + 2]) - (l[(yy - 1) * w + xx] + " +
          "2 * l[(yy - 1) * w + xx + 1] + l[(yy - 1) * w + xx + 2])"
        "WITH m AS (SELECT doc_id AS id, doc_id % 24 + 9 AS w, " +
          "doc_id % 16 + 8 AS h, doc_id % 97 AS s FROM documents), " +
          "px AS (SELECT id, w, h, flatten(list_transform(range(0, h), " +
          s"yy -> list_transform(range(0, w), xx -> $mmPngPx))) AS l " +
          "FROM m), " +
          "gr AS (SELECT id, w, h, " +
          "flatten(list_transform(range(1, h - 1), yy -> " +
          "list_transform(range(1, w - 1), xx -> " +
          s"abs($gx) + abs($gy)))) AS es FROM px) " +
          "SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
          "CAST((w - 2) * (h - 2) AS BIGINT) AS n_interior, " +
          "CAST(list_sum(es) AS BIGINT) AS sobel_energy, " +
          "CAST(len(list_filter(es, e -> e > 160)) AS BIGINT) " +
          "AS strong_edges, " +
          "CAST(list_sum(es) * 1000 // ((w - 2) * (h - 2)) AS BIGINT) " +
          "AS energy_mean_q FROM gr"
      },
      // Closed-form replay of the WebP fixture arithmetic — the engine
      // had to walk the RIFF form, check the VP8 start code / VP8L
      // signature, and unpack the 14-bit fields to agree; the corrupted
      // start code (id%3==2) must surface as the NULL row.
      "mm_webp_dims" ->
        ("SELECT doc_id AS id, " +
          "CASE WHEN doc_id % 3 = 0 THEN 'VP8' " +
          "WHEN doc_id % 3 = 1 THEN 'VP8L' END AS codec, " +
          "CASE WHEN doc_id % 3 <= 1 THEN CAST(doc_id % 24 + 9 AS BIGINT) " +
          "END AS width, " +
          "CASE WHEN doc_id % 3 <= 1 THEN CAST(doc_id % 16 + 8 AS BIGINT) " +
          "END AS height FROM documents"),
      // Closed-form replay of the SRT fixture arithmetic (cue durations
      // 800 + 137·((id+i)%9), overlap gaps at (id+i)%4==0) — the engine
      // had to parse every timestamp block to agree; the swapped block
      // (id%7==0) must surface as the NULL row.
      "mm_srt_cues" ->
        ("WITH p AS (SELECT doc_id, doc_id % 5 + 2 AS n FROM documents), " +
          "c AS (SELECT doc_id, n, list_transform(range(0, n), " +
          "i -> 800 + 137 * ((doc_id + i) % 9)) AS durs FROM p), " +
          "st AS (SELECT doc_id, n, " +
          "CAST(list_aggregate(durs, 'sum') AS BIGINT) AS tot, " +
          "CAST(len(list_filter(range(1, n), " +
          "i -> (doc_id + i - 1) % 4 = 0)) AS BIGINT) AS ovl, " +
          "CAST(list_aggregate(durs, 'sum') + " +
          "list_aggregate(list_transform(range(1, n), " +
          "i -> CASE WHEN (doc_id + i - 1) % 4 = 0 THEN -200 ELSE 300 END), " +
          "'sum') AS BIGINT) AS span, " +
          "CAST(list_aggregate(durs, 'max') AS BIGINT) AS mx FROM c) " +
          "SELECT doc_id AS id, " +
          "CASE WHEN doc_id % 7 <> 0 THEN CAST(n AS BIGINT) END AS n_cues, " +
          "CASE WHEN doc_id % 7 <> 0 THEN tot END AS total_dur_ms, " +
          "CASE WHEN doc_id % 7 <> 0 THEN ovl END AS n_overlaps, " +
          "CASE WHEN doc_id % 7 <> 0 THEN span END AS span_ms, " +
          "CASE WHEN doc_id % 7 <> 0 THEN mx END AS max_cue_ms FROM st"),
      "mm_id3_tags" ->
        // Closed-form replay: the same strings the fixture wrote; the
        // engine had to parse the synchsafe header and per-version
        // frame sizes to agree. tag_size = 4 frames x (10 hdr + 1 enc)
        // + text lengths.
        ("SELECT doc_id AS id, " +
          "CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 4 END AS BIGINT) " +
          "AS version, " +
          "CAST(44 + 19 + length(CAST(doc_id % 100 AS VARCHAR)) + " +
          "length(CAST(doc_id % 10 AS VARCHAR)) + " +
          "length(CAST(doc_id % 7 AS VARCHAR)) + " +
          "length(CAST(doc_id % 20 + 1 AS VARCHAR)) AS BIGINT) " +
          "AS tag_size, " +
          "'Title ' || CAST(doc_id % 100 AS VARCHAR) AS title, " +
          "'Artist ' || CAST(doc_id % 10 AS VARCHAR) AS artist, " +
          "'Album ' || CAST(doc_id % 7 AS VARCHAR) AS album, " +
          "CAST(doc_id % 20 + 1 AS BIGINT) AS track FROM documents"),
      "mm_audio_aiff" -> {
        // Sample replay: the same PCM16 formula the fixture wrote; the
        // engine had to walk the IFF chunks (odd-size pad), read the
        // big-endian COMM, and decode the 80-bit extended rate to agree.
        val raw = "((7 * i + 13 * id + i * i) % 65536)"
        val pcm = s"CASE WHEN $raw >= 32768 THEN $raw - 65536 ELSE $raw END"
        "WITH m AS (SELECT doc_id AS id, doc_id % 2 + 1 AS ch, " +
          "list_extract([8000, 11025, 22050, 44100], " +
          "CAST(doc_id % 4 + 1 AS INT)) AS rate, " +
          "doc_id % 40 + 20 AS frames FROM documents), " +
          "v AS (SELECT id, ch, rate, frames, ch * frames AS n, " +
          s"list_transform(range(0, ch * frames), i -> $pcm) AS pcm " +
          "FROM m) " +
          "SELECT id, CAST(ch AS BIGINT) AS channels, " +
          "CAST(rate AS BIGINT) AS sample_rate, " +
          "CAST(frames AS BIGINT) AS n_frames_declared, " +
          "CAST(n AS BIGINT) AS n_samples, " +
          "CAST(list_sum(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS sum_abs, " +
          "CAST(list_max(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS peak_abs, " +
          "CAST(list_sum(list_transform(pcm, x -> x * x)) AS BIGINT) " +
          "AS energy FROM v"
      },
      "mm_pcx_color_stats" -> {
        // Index-raster replay: count per palette index, dominant by
        // (count DESC, index), channel sums through the three distinct
        // palette formulas.
        val ix = "((13 * (xx // 3) + 29 * yy + 7 * (xx // 3) * yy + s) % 256)"
        "WITH m AS (SELECT doc_id AS id, doc_id % 19 + 7 AS w, " +
          "doc_id % 13 + 6 AS h, doc_id % 89 AS s FROM documents), " +
          "px AS (SELECT id, w, h, s, unnest(flatten(list_transform(" +
          "range(0, h), yy -> list_transform(range(0, w), xx -> " +
          s"$ix)))) AS ix FROM m), " +
          "cnt AS (SELECT id, w, h, s, ix, CAST(count(*) AS BIGINT) AS c " +
          "FROM px GROUP BY 1, 2, 3, 4, 5), " +
          "dom AS (SELECT id, ix AS dominant_index, c AS dominant_count " +
          "FROM (SELECT id, ix, c, row_number() OVER (PARTITION BY id " +
          "ORDER BY c DESC, ix) AS rn FROM cnt) WHERE rn = 1), " +
          "agg AS (SELECT id, w, h, CAST(count(*) AS BIGINT) AS nd, " +
          "CAST(sum(c * ((37 * ix + 11 * s) % 256)) AS BIGINT) AS sum_r, " +
          "CAST(sum(c * ((23 * ix + 5 * s) % 256)) AS BIGINT) AS sum_g, " +
          "CAST(sum(c * ((53 * ix + 3 * s) % 256)) AS BIGINT) AS sum_b " +
          "FROM cnt GROUP BY id, w, h, s) " +
          "SELECT agg.id, CAST(w AS INT) AS width, CAST(h AS INT) " +
          "AS height, CAST(w * h AS BIGINT) AS n_px, " +
          "nd AS n_distinct_colors, " +
          "CAST(dominant_index AS BIGINT) AS dominant_index, " +
          "dominant_count, sum_r, sum_g, sum_b " +
          "FROM agg JOIN dom ON dom.id = agg.id"
      },
      // Gray palette: decoded luma == the raw pixelFormulaV index
      // (299v+587v+114v)/1000 = v — so the oracle replays the formula
      // raster directly; the engine had to walk the RLE stream (runs,
      // EOL/EOB escapes, absolute mode + pad) to agree.
      "mm_bmp_rle_stats" ->
        mmPixelStatsSql("doc_id % 17 + 8", "doc_id % 9 + 7",
          "doc_id % 73",
          "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256"),
      "mm_pcx_pixel_stats" -> {
        // Palette-indexed replay: index raster (x quantized by 3 so RLE
        // runs exist) looked up through the three distinct channel
        // formulas, then the shared BT.601 integer luma.
        val q = "(xx // 3)"
        val ix = s"((13 * $q + 29 * yy + 7 * $q * yy + s) % 256)"
        val rr = s"((37 * $ix + 11 * s) % 256)"
        val gg = s"((23 * $ix + 5 * s) % 256)"
        val bb2 = s"((53 * $ix + 3 * s) % 256)"
        mmPixelStatsSql("doc_id % 19 + 7", "doc_id % 13 + 6",
          "doc_id % 89", s"(77 * $rr + 150 * $gg + 29 * $bb2) // 256")
      },
      "mm_otsu_threshold" ->
        // Histogram replay over the PNG formula raster: cumulative
        // class moments by luma value (present values only — between
        // two present values the engine's score is constant and its
        // first-wins scan lands on the present one), HUGEINT products
        // mirroring the engine's BigInt, floored-quotient key, ties to
        // the smaller threshold.
        ("WITH m AS (SELECT doc_id AS id, doc_id % 24 + 9 AS w, " +
          "doc_id % 16 + 8 AS h, doc_id % 97 AS s FROM documents), " +
          "px AS (SELECT id, w, h, flatten(list_transform(range(0, h), " +
          s"yy -> list_transform(range(0, w), xx -> $mmPngPx))) AS l " +
          "FROM m), " +
          "pr AS (SELECT id, w, h, unnest(l) AS v FROM px), " +
          "hc AS (SELECT id, w, h, v, count(*) AS c FROM pr " +
          "GROUP BY 1, 2, 3, 4), " +
          "cm AS (SELECT id, w, h, v, " +
          "sum(c) OVER (PARTITION BY id ORDER BY v) AS wb, " +
          "sum(v * c) OVER (PARTITION BY id ORDER BY v) AS sumb, " +
          "sum(c) OVER (PARTITION BY id) AS n, " +
          "sum(v * c) OVER (PARTITION BY id) AS sumt FROM hc), " +
          "sc AS (SELECT id, w, h, v, wb, n, " +
          "(sumb * n - sumt * wb) * (sumb * n - sumt * wb) // " +
          "(wb * (n - wb)) AS score FROM cm " +
          "WHERE v <= 254 AND wb < n), " +
          "rk AS (SELECT *, row_number() OVER (PARTITION BY id " +
          "ORDER BY score DESC, v) AS rn FROM sc) " +
          "SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
          "CAST(v AS BIGINT) AS threshold, CAST(wb AS BIGINT) AS n_below, " +
          "CAST(n - wb AS BIGINT) AS n_above, " +
          "CAST(score AS BIGINT) AS score FROM rk WHERE rn = 1"),
      "mm_audio_au" -> {
        // Per-encoding sample replay: the same byte formulas the
        // fixture wrote, expanded through mu-law / signed-8 / signed-16
        // closed forms — the engine had to parse the big-endian header
        // (and skip the annotation pad) to know which one applies.
        val f1 = "((7 * i + 13 * id + i * i) % 256)"
        val f2 = "((11 * i + 17 * id) % 256)"
        val u = s"(255 - $f1)"
        val mag = s"(((2 * ($u % 16) + 33) << (($u // 16) % 8)) - 33)"
        val mulaw = s"CASE WHEN $u >= 128 THEN -$mag ELSE $mag END"
        val lin8 = s"CASE WHEN $f1 >= 128 THEN $f1 - 256 ELSE $f1 END"
        val raw16 = s"($f1 * 256 + $f2)"
        val lin16 =
          s"CASE WHEN $raw16 >= 32768 THEN $raw16 - 65536 ELSE $raw16 END"
        "WITH m AS (SELECT doc_id AS id, doc_id % 3 + 1 AS enc, " +
          "doc_id % 50 + 20 AS n FROM documents), " +
          "v AS (SELECT id, enc, n, list_transform(range(0, n), i -> " +
          s"CASE WHEN enc = 1 THEN $mulaw WHEN enc = 2 THEN $lin8 " +
          s"ELSE $lin16 END) AS pcm FROM m) " +
          "SELECT id, CAST(enc AS BIGINT) AS encoding, " +
          "CAST(8000 AS BIGINT) AS sample_rate, " +
          "CAST(1 AS BIGINT) AS channels, CAST(n AS BIGINT) AS n_samples, " +
          "CAST(list_sum(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS sum_abs, " +
          "CAST(list_max(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS peak_abs, " +
          "CAST(list_sum(list_transform(pcm, x -> x * x)) AS BIGINT) " +
          "AS energy FROM v"
      },
      "mm_audio_dtmf" -> {
        // Full quadrature-bank replay: regenerate the integer square
        // tones closed-form, correlate against all eight candidate
        // periods, first-wins argmax per group — every quantity an
        // exact integer, so no Goertzel-style libm hazard exists.
        val pls = DtmfLowPeriods; val phs = DtmfHighPeriods
        def corr(p: Int, quad: Boolean): String = {
          val idx = if (quad) s"(i + ${p / 4}) % $p" else s"i % $p"
          "list_sum(list_transform(range(0, n), i -> " +
            s"x[CAST(i AS INT) + 1] * " +
            s"(CASE WHEN $idx < ${p / 2} THEN 1 ELSE -1 END)))"
        }
        val ipCols = (pls ++ phs).map(p =>
          s"${corr(p, quad = false)} AS ip$p, " +
            s"${corr(p, quad = true)} AS qp$p").mkString(", ")
        val scCols = (pls ++ phs).map(p =>
          s"(ip$p * ip$p + qp$p * qp$p) AS s$p").mkString(", ")
        def amax(ps: Array[Int]): String = {
          val arms = ps.indices.init.map { j =>
            val conds = (j + 1 until ps.length)
              .map(k => s"s${ps(j)} >= s${ps(k)}").mkString(" AND ")
            s"WHEN $conds THEN $j"
          }.mkString(" ")
          s"CASE $arms ELSE ${ps.length - 1} END"
        }
        def pick(ps: Array[Int], ix: String, of: Int => String): String = {
          val arms = ps.indices.init
            .map(j => s"WHEN $j THEN ${of(ps(j))}").mkString(" ")
          s"CASE $ix $arms ELSE ${of(ps.last)} END"
        }
        val pl = pick(pls.indices.toArray.map(pls), "dg // 4", _.toString)
        val ph = pick(phs.indices.toArray.map(phs), "dg % 4", _.toString)
        "WITH m AS (SELECT doc_id AS id, 200 + (doc_id % 7) * 40 AS n, " +
          "doc_id % 16 AS dg FROM documents WHERE doc_id % 8 = 0), " +
          s"tp AS (SELECT id, n, $pl AS pl, $ph AS ph FROM m), " +
          "sm AS (SELECT id, n, list_transform(range(0, n), i -> " +
          "(CASE WHEN i % pl < pl // 2 THEN 100 ELSE -100 END) + " +
          "(CASE WHEN i % ph < ph // 2 THEN 100 ELSE -100 END)) AS x " +
          "FROM tp), " +
          s"cr AS (SELECT id, n, $ipCols FROM sm), " +
          s"sc AS (SELECT id, n, $scCols FROM cr), " +
          s"ax AS (SELECT id, n, ${amax(pls)} AS li, ${amax(phs)} AS hi " +
          "FROM sc), " +
          "j AS (SELECT sc.id, sc.n, ax.li, ax.hi, " +
          s"${pick(pls, "ax.li", p => s"sc.s$p")} AS sl, " +
          s"${pick(phs, "ax.hi", p => s"sc.s$p")} AS sh, " +
          s"${pick(pls, "ax.li", _.toString)} AS lp, " +
          s"${pick(phs, "ax.hi", _.toString)} AS hp " +
          "FROM sc JOIN ax ON sc.id = ax.id) " +
          "SELECT id, CAST(n AS BIGINT) AS n_samples, " +
          "CAST(lp AS BIGINT) AS low_period, " +
          "CAST(hp AS BIGINT) AS high_period, " +
          "CAST(li * 4 + hi AS BIGINT) AS digit, " +
          "CAST(sl AS BIGINT) AS score_low, " +
          "CAST(sh AS BIGINT) AS score_high FROM j"
      },
      "mm_mixed_codec5_stats" ->
        // Five-way replay: JPEG rows the flat-block formula, QOI rows
        // the div-3-quantized gray formula, PNG/GIF/BMP rows the
        // shared raster formula.
        mmPixelStatsSql("doc_id % 15 + 9", "doc_id % 9 + 8",
          "doc_id % 53",
          s"CASE WHEN id % 5 = 3 THEN $mmJpegPx WHEN id % 5 = 4 THEN " +
            "(31 * (xx // 3) + 47 * yy + 7 * (xx // 3) * yy + 101 * s) " +
            s"% 256 ELSE $mmPngPx END"),
      "mm_mp4_meta" ->
        // Pure closed-form replay of the fixture's box parameters —
        // the engine had to WALK real BMFF bytes to recover them.
        ("SELECT doc_id AS id, 'isom' AS brand, " +
          "CAST(1000 * (doc_id % 3 + 1) AS BIGINT) AS timescale, " +
          "CAST(doc_id % 9000 + 100 AS BIGINT) AS duration, " +
          "CAST((doc_id % 9000 + 100) * 1000 // " +
          "(1000 * (doc_id % 3 + 1)) AS BIGINT) AS duration_ms, " +
          "CAST(doc_id % 33 + 16 AS INT) AS width, " +
          "CAST(doc_id % 19 + 12 AS INT) AS height, " +
          "CAST(1 + doc_id % 2 AS INT) AS n_tracks FROM documents"),
      "mm_jpeg_pixel_stats" ->
        // Flat-block replay over the grayscale JPEG dims: the ENGINE
        // side had to huffman-decode + IDCT; the oracle replays the
        // DC-only closed form (pixel = 2·coef(bx,by) + 128).
        mmPixelStatsSql("doc_id % 26 + 10", "doc_id % 15 + 9",
          "doc_id % 101", mmJpegPx),
      "mm_jpeg_restart_stats" ->
        // Same flat-block replay over the restart-marker fixture's dims
        // — the oracle is restart-blind; only a decoder that consumes
        // RSTn and resets DC prediction reproduces the raster.
        mmPixelStatsSql("doc_id % 20 + 12", "doc_id % 9 + 10",
          "doc_id % 67", mmJpegPx),
      "mm_jpeg420_resize" ->
        // 6×4 box-mean grid over the 4:2:0 fixture's luma + the rolling
        // fingerprint — interleave-order and MCU-crop proof.
        ("WITH " + mmLumaCteDims(6, 4, "doc_id % 23 + 17",
          "doc_id % 13 + 16", "doc_id % 71", mmJpegPx) + " " +
          "SELECT l.id, CAST(m.w AS INT) AS width, " +
          "CAST(m.h AS INT) AS height, " +
          "CAST(6 AS INT) AS out_w, CAST(4 AS INT) AS out_h, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lum), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS resized_fp " +
          "FROM l JOIN m ON l.id = m.id"),
      "mm_bmp_resize" ->
        // 7×3 box-mean grid over the BMP dims + the rolling fingerprint.
        ("WITH " + mmLumaCteDims(7, 3, "doc_id % 18 + 9",
          "doc_id % 7 + 6", "doc_id % 79") + " " +
          "SELECT l.id, CAST(m.w AS INT) AS width, " +
          "CAST(m.h AS INT) AS height, " +
          "CAST(7 AS INT) AS out_w, CAST(3 AS INT) AS out_h, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lum), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS resized_fp " +
          "FROM l JOIN m ON l.id = m.id"),
      "mm_gif_scene_change" ->
        // Per-frame aHash replay (seed steps 17 every SECOND frame —
        // hold, hold, cut, …) + lag-window hamming via bit_count(xor).
        ("WITH m AS (SELECT doc_id AS id, doc_id % 14 + 8 AS w, " +
          "doc_id % 9 + 8 AS h, doc_id % 4 + 2 AS nf, " +
          "doc_id % 73 AS s FROM documents), " +
          "mf AS (SELECT id, w, h, s + 17 * (g.f // 2) AS fs, " +
          "CAST(g.f AS INT) AS frame FROM m CROSS JOIN " +
          "(SELECT unnest(range(8)) AS f) g WHERE g.f < nf), " +
          "l AS (SELECT id, frame, w, h, list_transform(range(0, 64), g -> " +
          "list_sum(flatten(list_transform(" +
          "range((g // 8) * h // 8, ((g // 8) + 1) * h // 8), yy -> " +
          "list_transform(range((g % 8) * w // 8, ((g % 8) + 1) * w // 8), " +
          "xx -> (31 * xx + 47 * yy + 7 * xx * yy + 101 * fs) % 256)))) // " +
          "((((g % 8) + 1) * w // 8 - (g % 8) * w // 8) * " +
          "(((g // 8) + 1) * h // 8 - (g // 8) * h // 8))) AS lum FROM mf), " +
          "sm AS (SELECT id, frame, w, h, lum, " +
          "list_sum(lum) // 64 AS mn FROM l), " +
          "hsh AS (SELECT id, frame, CAST(w AS INT) AS width, " +
          "CAST(h AS INT) AS height, " +
          "CAST(list_sum(list_transform(range(0, 32), g -> " +
          "CASE WHEN lum[g + 1] > mn THEN (CAST(1 AS BIGINT) << g) " +
          "ELSE 0 END)) AS BIGINT) AS ahash_lo, " +
          "CAST(list_sum(list_transform(range(32, 64), g -> " +
          "CASE WHEN lum[g + 1] > mn THEN (CAST(1 AS BIGINT) << (g - 32)) " +
          "ELSE 0 END)) AS BIGINT) AS ahash_hi FROM sm) " +
          "SELECT id, frame, width, height, ahash_lo, ahash_hi, " +
          "CAST(bit_count(xor(ahash_lo, lag(ahash_lo) OVER w)) + " +
          "bit_count(xor(ahash_hi, lag(ahash_hi) OVER w)) AS BIGINT) " +
          "AS hamming_prev FROM hsh " +
          "WINDOW w AS (PARTITION BY id ORDER BY frame)"),
      "mm_gif_pixel_stats" ->
        // Same full-raster moment replay as mm_pixel_stats, over the
        // GIF fixture's dims — the ENGINE side had to LZW-decode.
        mmPixelStatsSql("doc_id % 21 + 7", "doc_id % 13 + 6", "doc_id % 89"),
      "mm_gif_resize" ->
        // 5×4 box-mean grid over the GIF dims + the rolling fingerprint.
        ("WITH " + mmLumaCteDims(5, 4, "doc_id % 21 + 7",
          "doc_id % 13 + 6", "doc_id % 89") + " " +
          "SELECT l.id, CAST(m.w AS INT) AS width, " +
          "CAST(m.h AS INT) AS height, " +
          "CAST(5 AS INT) AS out_w, CAST(4 AS INT) AS out_h, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lum), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS resized_fp " +
          "FROM l JOIN m ON l.id = m.id"),
      "mm_luma_entropy" ->
        // 16-bin histogram replay + the quantized-ln entropy identity
        // H_q = (n·lnq(n) − Σ c·lnq(c)) div n, all exact BIGINTs.
        ("WITH m AS (SELECT doc_id AS id, doc_id % 24 + 9 AS w, " +
          "doc_id % 16 + 8 AS h, doc_id % 97 AS s FROM documents), " +
          "px AS (SELECT id, w, h, flatten(list_transform(range(0, h), " +
          "yy -> list_transform(range(0, w), xx -> " +
          "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256))) AS l " +
          "FROM m), " +
          "hb AS (SELECT id, w, h, len(l) AS n, " +
          "list_transform(range(0, 16), b -> " +
          "len(list_filter(l, v -> v // 16 = b))) AS hist FROM px), " +
          "e AS (SELECT id, w, h, n, " +
          "len(list_filter(hist, c -> c > 0)) AS nz, " +
          "list_sum(list_transform(hist, c -> CASE WHEN c > 0 THEN " +
          "c * CAST(round(ln(c) * 100000000, 0) AS BIGINT) " +
          "ELSE 0 END)) AS sq FROM hb) " +
          "SELECT id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, " +
          "CAST(n AS BIGINT) AS n_px, CAST(nz AS BIGINT) AS n_bins_nonzero, " +
          "CAST((n * CAST(round(ln(n) * 100000000, 0) AS BIGINT) - sq) " +
          "// n AS BIGINT) AS entropy_q FROM e"),
      "mm_resize_pixels" ->
        // 6×5 box-mean grid replay + the rolling polynomial fingerprint.
        ("WITH " + mmLumaCte(6, 5) + " " +
          "SELECT l.id, CAST(m.w AS INT) AS width, " +
          "CAST(m.h AS INT) AS height, " +
          "CAST(6 AS INT) AS out_w, CAST(5 AS INT) AS out_h, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), lum), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS resized_fp " +
          "FROM l JOIN m ON l.id = m.id"),
      "mm_dhash" ->
        // 9×8 real-pixel luma replay, gradient-sign bits.
        ("WITH " + mmLumaCte(9, 8) + " " +
          "SELECT id, " +
          "CAST(list_sum(list_transform(range(0, 32), k -> " +
          "CASE WHEN lum[(k // 8) * 9 + (k % 8) + 2] > " +
          "lum[(k // 8) * 9 + (k % 8) + 1] THEN " +
          "(CAST(1 AS BIGINT) << k) ELSE 0 END)) AS BIGINT) AS dhash_lo, " +
          "CAST(list_sum(list_transform(range(32, 64), k -> " +
          "CASE WHEN lum[(k // 8) * 9 + (k % 8) + 2] > " +
          "lum[(k // 8) * 9 + (k % 8) + 1] THEN " +
          "(CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)) AS BIGINT) " +
          "AS dhash_hi FROM l"),
      "mm_audio_energy" ->
        // The engine PARSES the data chunk; the oracle predicts the
        // sawtooth the fixture spliced in: v(i) = ((i·2477 + seed) mod
        // 4096) − 2048 over samples·channels flat samples, 64/window.
        ("WITH p AS (SELECT doc_id, (doc_id % 2) + 1 AS ch, " +
          "(doc_id % 200) + 1 AS smp, doc_id % 97 AS seed " +
          "FROM documents), " +
          "s AS (SELECT doc_id, seed, " +
          "unnest(range(0, smp * ch)) AS i FROM p), " +
          "v AS (SELECT doc_id, i // 64 AS win, " +
          "((i * 2477 + seed) % 4096) - 2048 AS x FROM s) " +
          "SELECT doc_id AS id, CAST(win AS BIGINT) AS win, " +
          "CAST(count(*) AS BIGINT) AS n_samples, " +
          "CAST(sum(x * x) AS BIGINT) AS sum_sq, " +
          "sqrt(CAST(sum(x * x) AS DOUBLE) / CAST(count(*) AS DOUBLE)) " +
          "AS rms FROM v GROUP BY 1, 2"),
      // Per-sample replay: fixture byte formula -> complement ->
      // sign/exponent/mantissa -> ((2m+33)<<e)-33, exact integers.
      "mm_audio_mulaw" -> {
        val mag = "(((2 * (u % 16) + 33) << ((u // 16) % 8)) - 33)"
        val pcm = s"CASE WHEN u >= 128 THEN -$mag ELSE $mag END"
        "WITH m AS (SELECT doc_id AS id, doc_id % 50 + 20 AS n " +
          "FROM documents), " +
          "p AS (SELECT id, n, list_transform(range(0, n), i -> " +
          "255 - ((7 * i + 13 * id + i * i) % 256)) AS us FROM m), " +
          s"v AS (SELECT id, n, list_transform(us, u -> $pcm) AS pcm " +
          "FROM p) " +
          "SELECT id, CAST(n AS BIGINT) AS n_samples, " +
          "CAST(list_sum(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS sum_abs, " +
          "CAST(list_max(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS peak_abs, " +
          "CAST(list_sum(list_transform(pcm, x -> x * x)) AS BIGINT) " +
          "AS energy FROM v"
      },

      // Per-sample replay of the ITU A-law closed form: byte XOR 0x55
      // -> segment/mantissa -> (16m+8) or (16m+264)<<(seg-1); the
      // POST-XOR sign bit SET means positive. All intermediates
      // non-negative, so // and % replay exactly.
      "mm_audio_alaw" -> {
        val mag = "(CASE WHEN (u // 16) % 8 = 0 THEN 16 * (u % 16) + 8 " +
          "ELSE (16 * (u % 16) + 264) << (((u // 16) % 8) - 1) END)"
        val pcm = s"CASE WHEN u >= 128 THEN $mag ELSE -$mag END"
        "WITH m AS (SELECT doc_id AS id, doc_id % 50 + 20 AS n " +
          "FROM documents), " +
          "p AS (SELECT id, n, list_transform(range(0, n), i -> " +
          "xor((7 * i + 13 * id + i * i) % 256, 85)) AS us FROM m), " +
          s"v AS (SELECT id, n, list_transform(us, u -> $pcm) AS pcm " +
          "FROM p) " +
          "SELECT id, CAST(n AS BIGINT) AS n_samples, " +
          "CAST(list_sum(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS sum_abs, " +
          "CAST(list_max(list_transform(pcm, x -> abs(x))) AS BIGINT) " +
          "AS peak_abs, " +
          "CAST(list_sum(list_transform(pcm, x -> x * x)) AS BIGINT) " +
          "AS energy FROM v"
      },

      // Per-(id, block) recursive replay of the WAV-contained walk:
      // each block reseeds (predictor, index) from its header formula,
      // pos 0 emits the header predictor itself, the nibble for the
      // row at pos+1 is nibble index s.pos (low first). Validated
      // against an independent Python decode before wiring.
      "mm_audio_adpcm_wav" -> {
        val stepTab = graft.functions.NativeKernels.AdpcmStepTable
          .mkString("[", ", ", "]")
        val idxTab = graft.functions.NativeKernels.AdpcmIndexTable
          .mkString("[", ", ", "]")
        val nib = "(CASE WHEN s.pos % 2 = 0 " +
          "THEN m.bs[s.pos // 2 + 1] % 16 " +
          "ELSE m.bs[s.pos // 2 + 1] // 16 END)"
        val step = s"($stepTab)[s.idx + 1]"
        val diff = s"($step // 8 " +
          s"+ CASE WHEN $nib % 8 >= 4 THEN $step ELSE 0 END " +
          s"+ CASE WHEN $nib % 4 >= 2 THEN $step // 2 ELSE 0 END " +
          s"+ CASE WHEN $nib % 2 = 1 THEN $step // 4 ELSE 0 END)"
        val rawPred = s"(CASE WHEN $nib >= 8 THEN s.pred - $diff " +
          s"ELSE s.pred + $diff END)"
        val newPred = s"greatest(-32768, least(32767, $rawPred))"
        val newIdx = s"greatest(0, least(88, s.idx + ($idxTab)[$nib + 1]))"
        "WITH RECURSIVE m AS (SELECT doc_id AS id, bk.k AS blk, " +
          "(7 * (doc_id % 101) + 13 * bk.k) % 4096 - 2048 AS pred0, " +
          "((doc_id % 101) + 3 * bk.k) % 89 AS idx0, " +
          "12 + (doc_id % 2) * 4 AS ba, " +
          "doc_id % 3 + 1 AS nb, " +
          "list_transform(range(0, 12 + (doc_id % 2) * 4 - 4), i -> " +
          "(11 * i + 17 * (doc_id % 101) + 5 * bk.k) % 256) AS bs " +
          "FROM documents, (SELECT unnest(range(0, 3)) AS k) bk " +
          "WHERE bk.k < doc_id % 3 + 1), " +
          "steps AS (" +
          "SELECT id, blk, 0 AS pos, pred0 AS pred, idx0 AS idx, " +
          "CAST(pred0 AS BIGINT) AS pcm FROM m " +
          "UNION ALL " +
          s"SELECT s.id, s.blk, s.pos + 1, $newPred, $newIdx, " +
          s"CAST($newPred AS BIGINT) " +
          "FROM steps s JOIN m ON m.id = s.id AND m.blk = s.blk " +
          "WHERE s.pos < 2 * (m.ba - 4)) " +
          "SELECT id, CAST(count(pcm) AS BIGINT) AS n_samples, " +
          "CAST(sum(abs(pcm)) AS BIGINT) AS sum_abs, " +
          "CAST(max(abs(pcm)) AS BIGINT) AS peak_abs, " +
          "CAST(sum(pcm * pcm) AS BIGINT) AS energy, " +
          "CAST(max(m2.nb) AS BIGINT) AS n_blocks, " +
          "CAST(arg_max(pred, blk * 100000 + pos) AS BIGINT) " +
          "AS final_pred " +
          "FROM steps JOIN (SELECT DISTINCT id AS id2, nb FROM m) m2 " +
          "ON m2.id2 = steps.id GROUP BY id"
      },

      // Recursive-CTE replay of the IMA ADPCM state machine: one step
      // per nibble (low nibble first) carrying (predictor, index);
      // step/index tables as literal lists. UNION ALL (WITH RECURSIVE
      // set-semantics dedup must not merge identical states). The
      // divisions all act on non-negative operands (step, pos) —
      // predictor can go negative but is never divided.
      "mm_audio_adpcm" -> {
        val stepTab = graft.functions.NativeKernels.AdpcmStepTable
          .mkString("[", ", ", "]")
        val idxTab = graft.functions.NativeKernels.AdpcmIndexTable
          .mkString("[", ", ", "]")
        val nib = "(CASE WHEN s.pos % 2 = 0 " +
          "THEN m.bs[s.pos // 2 + 1] % 16 " +
          "ELSE m.bs[s.pos // 2 + 1] // 16 END)"
        val step = s"($stepTab)[s.idx + 1]"
        val diff = s"($step // 8 " +
          s"+ CASE WHEN $nib % 8 >= 4 THEN $step ELSE 0 END " +
          s"+ CASE WHEN $nib % 4 >= 2 THEN $step // 2 ELSE 0 END " +
          s"+ CASE WHEN $nib % 2 = 1 THEN $step // 4 ELSE 0 END)"
        val rawPred = s"(CASE WHEN $nib >= 8 THEN s.pred - $diff " +
          s"ELSE s.pred + $diff END)"
        val newPred = s"greatest(-32768, least(32767, $rawPred))"
        val newIdx = s"greatest(0, least(88, s.idx + ($idxTab)[$nib + 1]))"
        "WITH RECURSIVE m AS (SELECT doc_id AS id, " +
          "doc_id % 40 + 10 AS nb, " +
          "list_transform(range(0, doc_id % 40 + 10), i -> " +
          "(11 * i + 17 * doc_id + i * i * i) % 256) AS bs FROM documents), " +
          "steps AS (" +
          "SELECT id, 0 AS pos, 0 AS pred, 0 AS idx, " +
          "CAST(NULL AS BIGINT) AS pcm FROM m " +
          "UNION ALL " +
          s"SELECT s.id, s.pos + 1, $newPred, $newIdx, " +
          s"CAST($newPred AS BIGINT) " +
          "FROM steps s JOIN m ON m.id = s.id WHERE s.pos < 2 * m.nb) " +
          "SELECT id, CAST(count(pcm) AS BIGINT) AS n_samples, " +
          "CAST(sum(abs(pcm)) AS BIGINT) AS sum_abs, " +
          "CAST(max(abs(pcm)) AS BIGINT) AS peak_abs, " +
          "CAST(sum(pcm * pcm) AS BIGINT) AS energy, " +
          "CAST(arg_max(pred, pos) AS BIGINT) AS final_pred, " +
          "CAST(arg_max(idx, pos) AS BIGINT) AS final_index " +
          "FROM steps WHERE pcm IS NOT NULL GROUP BY id"
      },
      "mm_audio_resample" ->
        // Closed-form replay of the 2/3 resample over the sawtooth:
        // output j reads source p = 3j/2 — whole positions pass
        // through, half positions take the floored neighbor mean.
        ("WITH p AS (SELECT doc_id AS id, " +
          "((doc_id % 2) + 1) * ((doc_id % 200) + 1) AS n, " +
          "doc_id % 97 AS sd FROM documents), " +
          "r AS (SELECT id, n, sd, (n - 1) * 2 // 3 + 1 AS n_out FROM p), " +
          "v AS (SELECT id, n, n_out, list_transform(range(0, n_out), " +
          "j -> CASE WHEN (j * 3) % 2 = 0 THEN " +
          "((j * 3 // 2) * 2477 + sd) % 4096 - 2048 " +
          "ELSE (((j * 3 // 2) * 2477 + sd) % 4096 - 2048 + " +
          "((j * 3 // 2 + 1) * 2477 + sd) % 4096 - 2048) // 2 END) " +
          "AS vs FROM r) " +
          "SELECT id, CAST(n AS BIGINT) AS n_in, " +
          "CAST(n_out AS BIGINT) AS n_out, " +
          "CAST(list_sum(list_transform(vs, x -> abs(x))) AS BIGINT) " +
          "AS sum_abs_out, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), vs), " +
          s"(a, b) -> (a * 31 + b + 32768) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS resampled_fp FROM v"),
      "mm_patchify" ->
        // Tile replay: the patch grid is (w div 5) × (h div 5); each
        // tile's mean and row-major rolling fingerprint from the
        // closed-form raster.
        ("WITH m AS (SELECT doc_id AS id, doc_id % 24 + 9 AS w, " +
          "doc_id % 16 + 8 AS h, doc_id % 97 AS s FROM documents), " +
          "p AS (SELECT id, w, h, s, gx.px, gy.py FROM m " +
          "CROSS JOIN (SELECT unnest(range(7)) AS px) gx " +
          "CROSS JOIN (SELECT unnest(range(5)) AS py) gy " +
          "WHERE gx.px < w // 5 AND gy.py < h // 5), " +
          "t AS (SELECT id, CAST(px AS INT) AS px, CAST(py AS INT) AS py, " +
          "flatten(list_transform(range(py * 5, py * 5 + 5), yy -> " +
          "list_transform(range(px * 5, px * 5 + 5), xx -> " +
          "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256))) AS tile " +
          "FROM p) " +
          "SELECT id, px, py, " +
          "CAST(list_sum(tile) * 1000 // 25 AS BIGINT) AS patch_mean_q, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), tile), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS patch_fp FROM t"),
      "mm_gif_duration" ->
        // Closed-form timing: nf frames, delays 3, 4, …, nf+2 cs ->
        // total = 3·nf + nf·(nf−1)/2; mean ×1000 floored.
        ("WITH f AS (SELECT doc_id, doc_id % 4 + 2 AS nf FROM documents), " +
          "t AS (SELECT doc_id, nf, " +
          "nf * 3 + nf * (nf - 1) // 2 AS total FROM f) " +
          "SELECT doc_id AS id, CAST(nf AS INT) AS n_frames, " +
          "CAST(total AS BIGINT) AS total_delay_cs, " +
          "CAST(total * 1000 // nf AS BIGINT) AS mean_delay_mcs FROM t"),
      "mm_patch_dedup" ->
        // Same tile replay grouped by fingerprint; only recurring tiles
        // survive.
        ("WITH m AS (SELECT doc_id AS id, doc_id % 24 + 9 AS w, " +
          "doc_id % 16 + 8 AS h, doc_id % 97 AS s FROM documents), " +
          "p AS (SELECT id, w, h, s, gx.px, gy.py FROM m " +
          "CROSS JOIN (SELECT unnest(range(7)) AS px) gx " +
          "CROSS JOIN (SELECT unnest(range(5)) AS py) gy " +
          "WHERE gx.px < w // 5 AND gy.py < h // 5), " +
          "t AS (SELECT id, " +
          "CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), " +
          "flatten(list_transform(range(py * 5, py * 5 + 5), yy -> " +
          "list_transform(range(px * 5, px * 5 + 5), xx -> " +
          "(31 * xx + 47 * yy + 7 * xx * yy + 101 * s) % 256)))), " +
          s"(a, b) -> (a * 31 + b) % ${graft.functions.TextHash.P}) " +
          "AS BIGINT) AS patch_fp FROM p) " +
          "SELECT patch_fp, CAST(count(*) AS BIGINT) AS n_tiles, " +
          "CAST(count(DISTINCT id) AS BIGINT) AS n_docs FROM t " +
          "GROUP BY patch_fp HAVING count(*) >= 2"),
      "mm_exif" ->
        // Closed-form tag prediction — the ENGINE walked real TIFF
        // bytes (II and MM, inline and offset ASCII) to match it.
        ("SELECT doc_id AS id, " +
          "CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order, " +
          "CAST(doc_id % 500 + 1 AS BIGINT) AS width, " +
          "CAST(doc_id % 400 + 1 AS BIGINT) AS height, " +
          "CAST(doc_id % 8 + 1 AS INT) AS orientation, " +
          "CASE WHEN doc_id % 5 = 0 THEN 'c' || CAST(doc_id % 10 AS VARCHAR) " +
          "ELSE 'cam' || CAST(doc_id % 10 AS VARCHAR) END AS make, " +
          "CAST(4 AS INT) AS n_entries FROM documents"),
      "mm_audio_trim" ->
        // Gated-sawtooth replay: window w silent iff w % 3 = 0; voiced
        // = Σ|v| > 16·n (exact); min/max over voiced windows, NULL for
        // all-silent payloads (≤ 64 samples -> only window 0, silent).
        ("WITH p AS (SELECT doc_id, (doc_id % 2) + 1 AS ch, " +
          "(doc_id % 200) + 1 AS smp, doc_id % 97 AS seed " +
          "FROM documents), " +
          "s AS (SELECT doc_id, seed, " +
          "unnest(range(0, smp * ch)) AS i FROM p), " +
          "v AS (SELECT doc_id, i // 64 AS win, " +
          "CASE WHEN (i // 64) % 3 = 0 THEN 0 " +
          "ELSE ((i * 2477 + seed) % 4096) - 2048 END AS x FROM s), " +
          "w AS (SELECT doc_id, win, count(*) AS n, " +
          "sum(abs(x)) AS sa FROM v GROUP BY 1, 2) " +
          "SELECT doc_id AS id, CAST(count(*) AS BIGINT) AS n_windows, " +
          "CAST(sum(CASE WHEN sa > 16 * n THEN 1 ELSE 0 END) AS BIGINT) " +
          "AS n_voiced, " +
          "CAST(min(CASE WHEN sa > 16 * n THEN win END) AS BIGINT) " +
          "AS first_voiced, " +
          "CAST(max(CASE WHEN sa > 16 * n THEN win END) AS BIGINT) " +
          "AS last_voiced FROM w GROUP BY doc_id"),
      "mm_audio_spectrum" -> {
        // Sawtooth replay → per-window ordered sample lists → exact
        // integer correlations against the SAME quantized basis
        // literals the kernel uses (Multimodal.dftTableQ, interpolated
        // here), power as the identical IEEE expression shape.
        val bins = Seq(1, 2, 4, 8).map { k =>
          val (c, s) = Multimodal.dftTableQ(64, k)
          s"($k, ${c.mkString("[", ", ", "]")}, ${s.mkString("[", ", ", "]")})"
        }.mkString(", ")
        "WITH p AS (SELECT doc_id, (doc_id % 2) + 1 AS ch, " +
          "(doc_id % 200) + 1 AS smp, doc_id % 97 AS seed " +
          "FROM documents), " +
          "s AS (SELECT doc_id, seed, " +
          "unnest(range(0, smp * ch)) AS i FROM p), " +
          "v AS (SELECT doc_id, i // 64 AS win, i % 64 AS j, " +
          "((i * 2477 + seed) % 4096) - 2048 AS x FROM s), " +
          "g AS (SELECT doc_id, win, list(x ORDER BY j) AS vs " +
          "FROM v GROUP BY 1, 2), " +
          s"b AS (SELECT * FROM (VALUES $bins) AS t(bin, ct, st)), " +
          "r AS (SELECT doc_id, win, len(vs) AS ns, bin, " +
          "CAST(list_sum(list_transform(range(len(vs)), j -> " +
          "vs[j+1] * ct[j+1])) AS BIGINT) AS re, " +
          "CAST(list_sum(list_transform(range(len(vs)), j -> " +
          "vs[j+1] * st[j+1])) AS BIGINT) AS im " +
          "FROM g CROSS JOIN b) " +
          "SELECT doc_id AS id, CAST(win AS BIGINT) AS win, " +
          "CAST(ns AS BIGINT) AS n_samples, CAST(bin AS INT) AS bin, " +
          "re, im, CAST(re AS DOUBLE) * CAST(re AS DOUBLE) + " +
          "CAST(im AS DOUBLE) * CAST(im AS DOUBLE) AS power FROM r"
      },
      "mm_audio_zcr" ->
        // Same sawtooth replay; zero crossings are consecutive-sample
        // sign flips WITHIN a window (pairs at i % 64 = 0 cross a
        // boundary and belong to no window), plus peak |v| and Σ|v|.
        ("WITH p AS (SELECT doc_id, (doc_id % 2) + 1 AS ch, " +
          "(doc_id % 200) + 1 AS smp, doc_id % 97 AS seed " +
          "FROM documents), " +
          "s AS (SELECT doc_id, seed, " +
          "unnest(range(0, smp * ch)) AS i FROM p), " +
          "v AS (SELECT doc_id, i, i // 64 AS win, " +
          "((i * 2477 + seed) % 4096) - 2048 AS x FROM s), " +
          "w AS (SELECT doc_id, win, i, x, " +
          "lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px FROM v) " +
          "SELECT doc_id AS id, CAST(win AS BIGINT) AS win, " +
          "CAST(count(*) AS BIGINT) AS n_samples, " +
          "CAST(sum(CASE WHEN i % 64 <> 0 AND ((px < 0) <> (x < 0)) " +
          "THEN 1 ELSE 0 END) AS BIGINT) AS zc_count, " +
          "CAST(max(abs(x)) AS BIGINT) AS peak_abs, " +
          "CAST(sum(abs(x)) AS BIGINT) AS sum_abs " +
          "FROM w GROUP BY 1, 2"),
      "mm_decode_meta" -> mmSql,
      // Pure arithmetic: the Spark side must PARSE these values back out
      // of real container headers it synthesized at the documented
      // offsets; matching here means the byte-level round-trip held.
      "mm_decode_headers" ->
        ("WITH d AS (SELECT doc_id AS id, doc_id % 4 AS cls FROM documents) " +
          "SELECT id, " +
          "CASE WHEN cls = 1 THEN 'audio' WHEN cls = 2 THEN 'video' " +
          "ELSE 'image' END AS \"mediaType\", " +
          "CAST(CASE cls WHEN 0 THEN 29 " +
          "WHEN 1 THEN 44 + ((id % 200) + 1) * (((id % 2) + 1) * 2) " +
          "WHEN 2 THEN 14 + 14 * ((id % 5) + 1) " +
          "ELSE 41 END AS BIGINT) AS \"nBytes\", " +
          "CAST(CASE cls WHEN 0 THEN (id % 640) + 1 " +
          "WHEN 1 THEN (id % 2) + 1 " +
          "WHEN 2 THEN (id % 320) + 1 " +
          "ELSE (id % 600) + 1 END AS INT) AS width, " +
          "CAST(CASE cls WHEN 0 THEN (id % 480) + 1 " +
          "WHEN 1 THEN 8000 * ((id % 5) + 1) " +
          "WHEN 2 THEN (id % 200) + 1 " +
          "ELSE (id % 400) + 1 END AS INT) AS height, " +
          "CAST(CASE cls WHEN 0 THEN 1 " +
          "WHEN 1 THEN (id % 200) + 1 " +
          "WHEN 2 THEN (id % 5) + 1 " +
          "ELSE 1 END AS INT) AS \"nFrames\" FROM d"),
    )
  }
}
