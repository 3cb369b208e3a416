package graft.llm

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mojibake (double-encoding) repair — the ftfy-style cleanup stage web
  * pipelines run before any text analysis (CCNet runs a fixed repair pass;
  * ftfy's core heuristic is exactly this class): text that was UTF-8
  * encoded but DECODED as Windows-1252 turns every non-ASCII character
  * into a 2-3 character litter sequence ("é" → "Ã©", "’" → "â€™").
  *
  * The repair is a CLOSED, ordered table of literal replacements — each
  * target character's UTF-8 bytes re-decoded through cp1252 — applied as a
  * chain of codegen'd `replace` calls. Deliberately NOT a general charset
  * sniffer: a closed table is deterministic, SQL-replayable (the DuckDB
  * oracle runs the same `replace` chain in the same order), and safe to
  * run over already-clean text (patterns start with "Ã"/"â", which real
  * prose essentially never contains; a legitimate occurrence would be
  * "repaired" — ftfy accepts the same trade and so do we, which is why
  * [[report]] also emits the `changed` audit flag).
  *
  * Table discipline: only targets whose mojibake form decodes to DEFINED
  * printable cp1252 characters are admitted (bytes 0x81/0x8D/0x8F/0x90/
  * 0x9D are unmapped and would smuggle C1 controls into the patterns —
  * enforced by a require at class-load). All patterns are 2-3 chars with
  * distinct final characters under the shared "Ã"/"â€" prefixes, so the
  * chain's order cannot change the result; both engines still apply the
  * identical order by construction (the oracle SQL is generated from this
  * same Seq).
  */
object EncodingRepair {

  private val Cp1252 = Charset.forName("windows-1252")

  /** Characters this pass restores: Latin-1 letters common in western
    * European text plus the cp1252 punctuation block that dominates
    * real-world mojibake (curly quotes, dashes, ellipsis, euro).
    */
  val Targets: Seq[String] = Seq(
    "é", "è", "ê", "ë", "á", "à", "â", "ä", "ç", "í", "î", "ï",
    "ñ", "ó", "ô", "ö", "ú", "û", "ü", "ß",
    "’", "‘", "“", "–", "—", "…", "€")

  /** (mojibake, repaired) in application order. */
  val Repairs: Seq[(String, String)] = Targets.map { t =>
    val moji = new String(t.getBytes(UTF_8), Cp1252)
    require(moji.forall(c => c >= 0x20 && c != 0x7F && !(c >= 0x80 && c <= 0x9F)),
      s"mojibake pattern for '$t' contains an unmapped/control cp1252 char")
    require(new String(moji.getBytes(Cp1252), UTF_8) == t,
      s"mojibake pattern for '$t' does not round-trip")
    moji -> t
  }

  /** The corruption-plant suffix used by the driver-contract fixture on
    * both sides (Spark query and oracle SQL build from THIS one value, so
    * the planted bytes cannot drift apart): every repair pattern, space-
    * joined, after a leading space.
    */
  val PlantSuffix: String = " " + Repairs.map(_._1).mkString(" ")

  /** The repair chain as a Column (codegen'd StringReplace per entry). */
  def fixMojibake(c: Column): Column =
    Repairs.foldLeft(c) { case (acc, (moji, fixed)) =>
      call_function("replace", acc, lit(moji), lit(fixed))
    }

  /** Per-document repair report: `(id, changed, fixed)` — the audit shape
    * (count the `changed` rows to size the corruption; feed `fixed`
    * downstream). One projection, no shuffle.
    */
  def report(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fixed = fixMojibake(col(textCol))
    df.select(col(idCol), (col(textCol) =!= fixed).as("changed"),
      fixed.as("fixed"))
  }

  /** The same chain as DuckDB SQL over `inner` (used by the oracle —
    * generated from the SAME Repairs table, same order).
    */
  def replaceChainSql(inner: String): String =
    Repairs.foldLeft(inner) { case (acc, (moji, fixed)) =>
      s"replace($acc, '$moji', '$fixed')"
    }
}
