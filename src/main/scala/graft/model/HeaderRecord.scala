package graft.model

/** C1/C2/C11 — per-file header machinery (driver-side, pure Scala).
  *
  * The reference parses free-form FITS `HISTORY` cards into a nested record
  * (C1, ref utils.py:9-56), derives the band frequency range from it
  * (C2, ref utils.py:58-103) and names staged outputs (C11, ref
  * utils.py:222-224). All of it is per-file scalar work: it runs once on the
  * driver and its outputs travel into Spark plans as literals (constant-folded
  * by Catalyst), never as per-row columns.
  */
object HeaderRecord {

  /** Parsed HISTORY value — mirrors the reference's dynamic coercion
    * (ref utils.py:34-49): `"1355_1435"` → numeric pair; comma/space-separated
    * numerics → list; single numeric → scalar; anything else → string.
    */
  sealed trait HVal
  final case class HPair(a: Double, b: Double) extends HVal
  final case class HNums(vs: Vector[Double]) extends HVal
  final case class HNum(v: Double) extends HVal
  final case class HStr(s: String) extends HVal

  final case class History(values: Map[String, HVal], extra: Vector[String]) {
    def apply(key: String): HVal = values(key)
    def get(key: String): Option[HVal] = values.get(key)
    def str(key: String): Option[String] = values.get(key).collect { case HStr(s) => s }
    def nums(key: String): Option[Vector[Double]] = values.get(key).collect {
      case HNums(vs) => vs
      case HNum(v)   => Vector(v)
      case HPair(a, b) => Vector(a, b)
    }
  }

  private val keyValRe = """^\s*([A-Za-z0-9_,]+(?: [A-Za-z0-9_,]+)*)\s+(.*)""".r.unanchored
  private val pairRe   = """\d+_\d+""".r
  private val numRe    = """-?\d+(\.\d+)?""".r

  /** C1 — HISTORY card parser (ref utils.py:9-56). Inline `/comment`s are
    * stripped; unparseable non-empty lines collect under `extra` (the
    * reference's `"_extra"`).
    */
  def parseHistory(entries: Seq[String]): History = {
    val parsed = scala.collection.mutable.LinkedHashMap.empty[String, HVal]
    val extras = Vector.newBuilder[String]
    entries.foreach { entry =>
      val clean = entry.split('/').headOption.getOrElse("").trim
      clean match {
        case keyValRe(key, rawVal) if clean.nonEmpty =>
          val valStr = rawVal.trim
          if (pairRe.pattern.matcher(valStr).matches()) {
            val Array(a, b) = valStr.split('_')
            parsed(key.trim) = HPair(a.toDouble, b.toDouble)
          } else {
            val parts = valStr.replace(',', ' ').split("\\s+").filter(_.nonEmpty)
            if (parts.nonEmpty && parts.forall(p => numRe.pattern.matcher(p).matches())) {
              val vals = parts.map(_.toDouble).toVector
              parsed(key.trim) = if (vals.length > 1) HNums(vals) else HNum(vals.head)
            } else parsed(key.trim) = HStr(valStr)
          }
        case _ => if (clean.nonEmpty) extras += entry.trim
      }
    }
    History(parsed.toMap, extras.result())
  }

  /** Per-file header record (ref `hdul[0].header` subset the code reads). */
  final case class Header(
      date: java.sql.Timestamp,
      obsmode: String,
      obsfreq: Double,
      obsbw: Double,
      history: History)

  final case class FreqRange(low: Double, high: Double, channelCount: Int)

  /** C2 — frequency-range derivation (ref utils.py:58-103).
    * HIRES: band center from `HIRES bands[ifnum]`, width = OBSBW;
    * LOWRES: edges straight from `RFFILTER`; unknown DATAMODE → error.
    * channelCount = stop − start + 1 from `START,STOP channels`.
    */
  def frequencyRange(h: Header, ifnum: Int): FreqRange = {
    val hist = h.history
    val ss = hist.nums("START,STOP channels")
      .getOrElse(throw new IllegalArgumentException("missing START,STOP channels"))
    val channelCount = ss(1).toInt - ss(0).toInt + 1
    hist.str("DATAMODE") match {
      case Some("HIRES") =>
        val center = hist.nums("HIRES bands")
          .getOrElse(throw new IllegalArgumentException("missing HIRES bands"))(ifnum)
        FreqRange(center - h.obsbw / 2, center + h.obsbw / 2, channelCount)
      case Some("LOWRES") =>
        val rf = hist.nums("RFFILTER")
          .getOrElse(throw new IllegalArgumentException("missing RFFILTER"))
        FreqRange(rf(0), rf(1), channelCount)
      case other =>
        throw new IllegalArgumentException(s"Unknown datamode: ${other.orNull}")
    }
  }

  /** C11 — staged output naming `{base}_{process}{ext}` (ref utils.py:222-224). */
  def stagedPath(path: String, process: String): String = {
    val dot = path.lastIndexOf('.')
    val slash = math.max(path.lastIndexOf('/'), path.lastIndexOf('\\'))
    if (dot > slash) s"${path.substring(0, dot)}_$process${path.substring(dot)}"
    else s"${path}_$process"
  }
}
