package graft.llm

import javax.sound.sampled.{AudioFileFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** Contention-free audio container io (round 13).
  *
  * `javax.sound.sampled.AudioSystem.getAudioInputStream` / `.write`
  * resolve their SPI providers through `JDK13Services.getProviders`, a
  * `static synchronized` method — ONE global lock taken on EVERY call.
  * Single-threaded that is invisible; with the round-13 fan-out of the
  * fixture builders (32 concurrent decode tasks) the audio queries got
  * 2.3× SLOWER than their single-threaded baseline — a textbook
  * amplification of a hidden global lock by added parallelism
  * (measured: q_audio_decode 2.0 s single-threaded → 4.6 s fanned
  * through AudioSystem → 0.8 s fanned through this object;
  * OPTIMIZATION_r13.md).
  *
  * The fix: load the SAME providers once per THREAD via the public
  * `ServiceLoader` SPI and iterate them exactly the way AudioSystem
  * does — first reader that does not throw
  * UnsupportedAudioFileException wins; first writer that supports the
  * file type wins. The JDK ships exactly one provider per container
  * (WAVE/AIFF/AU), so the chosen codec — and therefore every produced
  * byte — is identical to the AudioSystem path; only the lock is gone.
  */
object AudioIo {

  private val readers =
    ThreadLocal.withInitial[Seq[AudioFileReader]](() => {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[AudioFileReader]).asScala.toSeq
    })

  private val writers =
    ThreadLocal.withInitial[Seq[AudioFileWriter]](() => {
      import scala.jdk.CollectionConverters._
      java.util.ServiceLoader.load(classOf[AudioFileWriter]).asScala.toSeq
    })

  /** `AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))`
    * without the global provider lock. A fresh ByteArrayInputStream per
    * reader attempt replaces AudioSystem's mark/reset dance — same
    * accepted stream, no shared state. */
  def read(bytes: Array[Byte]): AudioInputStream = {
    val rs = readers.get()
    var i = 0
    while (i < rs.size) {
      try return rs(i).getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      catch { case _: UnsupportedAudioFileException => () }
      i += 1
    }
    throw new UnsupportedAudioFileException(
      "Stream of unsupported format (no SPI reader accepted it)")
  }

  /** `AudioSystem.write(ais, tpe, out)` without the global provider
    * lock: first SPI writer supporting the type, exactly AudioSystem's
    * own selection rule. */
  def write(ais: AudioInputStream, tpe: AudioFileFormat.Type,
            out: java.io.OutputStream): Int = {
    val ws = writers.get()
    var i = 0
    while (i < ws.size) {
      if (ws(i).isFileTypeSupported(tpe, ais)) return ws(i).write(ais, tpe, out)
      i += 1
    }
    throw new IllegalArgumentException(
      s"could not write audio file: file type not supported: $tpe")
  }
}
