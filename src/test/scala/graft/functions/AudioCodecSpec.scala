package graft.functions

import graft.SparkSpec
import graft.analytics.Catalog

/** The real-WAV multimodal seat: golden samples through encode→decode
  * (exact PCM round trip, RIFF magic), loud failure on garbage and on
  * formats outside the contract, and the catalog entry re-derived
  * driver-side from the closed-form sample source at sf0.001.
  */
class AudioCodecSpec extends SparkSpec {

  test("golden samples: WAV encode -> decode round-trips exactly") {
    val golden = Array(0, 1, -1, 32767, -32768, 12345, -12345, 256, -257)
    val wav = AudioCodec.encodeWav(golden)
    // a REAL RIFF/WAVE container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (rate, back) = AudioCodec.decodeWav(wav)
    assert(rate == AudioCodec.SampleRate)
    assert(back.toSeq == golden.toSeq)
  }

  test("synthetic source round-trips bit-exactly; range stays in 16-bit") {
    val n = 777
    val id = 424242L
    val samples = Array.tabulate(n)(i => AudioCodec.synthSample(id, i))
    assert(samples.forall(v => v >= -32768 && v <= 32767))
    val (_, back) = AudioCodec.decodeWav(AudioCodec.encodeWav(samples))
    assert(back.toSeq == samples.toSeq)
  }

  test("garbage and truncated payloads fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      AudioCodec.decodeWav(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    }
    assert(e1.getMessage.contains("undecodable"))
    // a valid header with the data chunk cut mid-sample
    val wav = AudioCodec.encodeWav(Array.tabulate(50)(i => i * 11))
    val trunc = wav.take(wav.length - 1)
    intercept[Exception](AudioCodec.decodeWav(trunc)) // loud, never silent
  }

  test("mm_audio_features at sf0.001: decoded-sample stats equal the closed form") {
    val got = Catalog.queries("mm_audio_features")(spark, sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "CAST(n_chars AS INT) AS nc")
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(got.size == docs.length && docs.nonEmpty)
    docs.take(15).foreach { case (id, nc) =>
      val n = nc % 2000 + 100
      var (sum, sabs, peak) = (0L, 0L, 0L)
      (0 until n).foreach { i =>
        val v = AudioCodec.synthSample(id, i).toLong
        sum += v; sabs += math.abs(v); peak = math.max(peak, math.abs(v))
      }
      assert(got(id) == ((8000L, n.toLong, sum, sabs, peak)), s"doc $id")
    }
  }
}
