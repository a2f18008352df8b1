package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec seat for the multimodal operators: 16-bit mono PCM
  * WAV through the JDK's javax.sound.sampled — genuine RIFF/WAVE
  * container encode AND decode, no native dependency. The synthetic
  * sample source is pure integer arithmetic, and PCM is lossless, so
  * stats computed from DECODED samples are bit-identical to the closed
  * form the DuckDB oracle evaluates.
  *
  * The ImageCodec contract, carried to audio: encoded byte layout is
  * codec-owned and never oracle-gated; decoded sample values are.
  */
object AudioCodec {

  val SampleRate = 8000

  /** Deterministic signed 16-bit source: sample i of document `id`.
    * Non-negative operands before the mod, so `% 65536` agrees between
    * JVM and SQL engines; range [-32768, 32767].
    */
  def synthSample(id: Long, i: Int): Int =
    (((id * 73 + i.toLong * 131) % 65536) - 32768).toInt

  /** Real WAV bytes (RIFF header + fmt/data chunks) via the JDK writer. */
  def encodeWav(samples: Array[Int]): Array[Byte] = {
    val fmt = new AudioFormat(SampleRate.toFloat, 16, 1,
      /* signed = */ true, /* bigEndian = */ false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Real WAV decode: container parsing + format negotiation through
    * AudioSystem; fails loudly on non-audio payloads or formats outside
    * the 16-bit mono PCM contract.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"audio_codec: undecodable payload (${bytes.length} bytes)", e)
      }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
      fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && !fmt.isBigEndian,
      s"audio_codec: unsupported format $fmt (want 16-bit mono signed LE PCM)")
    val pcm = ais.readAllBytes()
    // the JDK reader silently stops at the last COMPLETE frame — compare
    // against the header's declared frame count so a truncated container
    // fails loudly instead of quietly shrinking the clip
    if (pcm.length % 2 != 0 ||
        (ais.getFrameLength >= 0 && pcm.length / 2 != ais.getFrameLength))
      throw new IllegalArgumentException(
        s"audio_codec: truncated PCM payload (${pcm.length} bytes for " +
          s"${ais.getFrameLength} declared frames)")
    val out = new Array[Int](pcm.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff))
      i += 1
    }
    (fmt.getSampleRate.toInt, out)
  }
}
