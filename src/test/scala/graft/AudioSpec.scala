package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Gates for the REAL audio arm of the multimodal surface (q_audio_features
  * + MultimodalOps.{synthWav, decodeAudio, audioRms, audioFingerprint64,
  * audioFeatures}): the WAV bytes go through the JDK's own encoder and
  * decoder, so these tests pin genuine codec behavior, not the stub.
  */
class AudioSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("WAV round trip: decoded header and frame count equal the synthesis parameters") {
    for ((seed, sr, ns) <- Seq((1L, 8000, 800), (7L, 16000, 2390), (42L, 44100, 4410))) {
      val wav = MultimodalOps.synthWav(seed, sr, ns, amp = 0.6)
      val (dsr, ch, bits, frames, samples) = MultimodalOps.decodeAudio(wav).get
      assert(dsr == sr && ch == 1 && bits == 16, s"seed=$seed header $dsr/$ch/$bits")
      assert(frames == ns && samples.length == ns, s"seed=$seed frames $frames")
    }
  }

  test("decoded RMS equals the pre-quantization source RMS within 16-bit noise") {
    // Across seeds INCLUDING the degenerate f1 = f2 coherent-sum ones
    // (e.g. seed 113) that break any closed-form two-tone expectation —
    // the gate compares against the exact source waveform instead.
    for (seed <- Seq(5L, 113L, 77L); amp <- Seq(0.4, 0.8)) {
      val wav = MultimodalOps.synthWav(seed, 16000, 3200, amp)
      val rms = MultimodalOps.audioRms(MultimodalOps.decodeAudio(wav).get._5)
      val expect = MultimodalOps.audioRms(MultimodalOps.synthSamples(seed, 16000, 3200, amp))
      assert(math.abs(rms - expect) < 0.001, s"seed=$seed amp=$amp rms=$rms expect=$expect")
    }
  }

  test("energy-contour fingerprint: deterministic, volume-invariant, discriminative") {
    def fp(seed: Long, amp: Double): Long =
      MultimodalOps.audioFingerprint64(
        MultimodalOps.decodeAudio(MultimodalOps.synthWav(seed, 16000, 3200, amp)).get._5)
    // Bit-deterministic.
    assert(fp(9L, 0.6) == fp(9L, 0.6))
    // Re-levelled copies land within the hamming band the gate uses.
    for (seed <- 1L to 10L) {
      val h = java.lang.Long.bitCount(fp(seed, 0.8) ^ fp(seed, 0.4))
      assert(h <= 4, s"seed=$seed volume-scaled hamming $h")
    }
    // Different material lands far apart (spectra keyed by seed).
    val far = (1L to 10L).map(s => java.lang.Long.bitCount(fp(s, 0.6) ^ fp(s + 100L, 0.6)))
    assert(far.count(_ >= 10) >= 8, s"cross-seed hammings too close: $far")
  }

  test("decodeAudio: formats outside the assumed sample shapes fall to the stub seam") {
    // The conversion loop assumes little-endian 16-bit SIGNED / 8-bit
    // UNSIGNED PCM. AIFF is big-endian (16-bit) and signed (8-bit) — both
    // parse fine in AudioSystem but would decode to byte-swapped or offset
    // garbage, so decodeAudio must return None for them rather than a
    // decoded=true result with a wrong RMS/fingerprint.
    def encode(bits: Int, bigEndian: Boolean, signed: Boolean,
        tpe: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
      val sr = 8000
      val n = 800
      val wave = MultimodalOps.synthSamples(11L, sr, n, 0.5)
      val bytesPer = bits / 8
      val data = new Array[Byte](n * bytesPer)
      var i = 0
      while (i < n) {
        if (bits == 16) {
          val s = math.round(wave(i) * 32767.0).toInt
          if (bigEndian) { data(2 * i) = ((s >> 8) & 0xff).toByte; data(2 * i + 1) = (s & 0xff).toByte }
          else { data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = ((s >> 8) & 0xff).toByte }
        } else {
          val s = math.round(wave(i) * 127.0).toInt
          data(i) = (if (signed) s else s + 128).toByte
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(sr.toFloat, bits, 1, signed, bigEndian)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val aiffT = javax.sound.sampled.AudioFileFormat.Type.AIFF
    // Big-endian 16-bit signed AIFF: parses, wrong endianness → None.
    assert(MultimodalOps.decodeAudio(encode(16, bigEndian = true, signed = true, aiffT)).isEmpty,
      "big-endian 16-bit AIFF must fall to the stub seam")
    // Signed 8-bit AIFF: parses, wrong signedness for the 8-bit arm → None.
    assert(MultimodalOps.decodeAudio(encode(8, bigEndian = false, signed = true, aiffT)).isEmpty,
      "signed 8-bit AIFF must fall to the stub seam")
    // Control: the supported WAV shape still decodes.
    assert(MultimodalOps.decodeAudio(MultimodalOps.synthWav(11L, 8000, 800, 0.5)).isDefined)
  }

  test("audioFeatures: real WAVs decode, garbage falls back to the flagged stub") {
    val wav = MultimodalOps.synthWav(3L, 8000, 1600, 0.5)
    val junk = Array.tabulate[Byte](512)(i => (i * 37).toByte)
    val media = Seq((3L, wav), (4L, junk)).toDF("doc_id", "media")
    val out = MultimodalOps.audioFeatures(media).collect().map(f => f.doc_id -> f).toMap
    val real = out(3L)
    assert(real.decoded && real.sample_rate == 8000 && real.n_frames == 1600 &&
      real.duration_ms == 200L)
    val stub = out(4L)
    assert(!stub.decoded && stub.sample_rate == 0)
    // Stub features are deterministic (same payload → same fingerprint).
    val again = MultimodalOps.audioFeatures(media).collect().map(f => f.doc_id -> f).toMap
    assert(again(4L).fingerprint == stub.fingerprint)
  }

  test("q_dedup_audio: banded report flags true, n_docs exact") {
    val row = QueryRegistry.queries("q_dedup_audio")(spark, sfDir).collect()
    assert(row.length == 1)
    val n = Tables.documents(spark, sfDir).count()
    assert(row(0).getLong(0) == n, s"n_docs ${row(0).getLong(0)} != $n")
    assert(row(0).getBoolean(1), "planted_recall_band false")
    assert(row(0).getBoolean(2), "ball_band false")
  }

  test("q_audio_features: all banded flags true on the registered corpus") {
    val rows = QueryRegistry
      .queries("q_audio_features")(spark, sfDir)
      .select("rms_in_band", "fp_volume_invariant")
      .as[(Boolean, Boolean)]
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1), "rms out of analytic band")
    assert(rows.forall(_._2), "fingerprint not volume-invariant")
  }
}
