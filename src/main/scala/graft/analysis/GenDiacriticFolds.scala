package graft.analysis

import com.ibm.icu.lang.UCharacter
import com.ibm.icu.text.Normalizer2

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Regenerates `src/main/resources/graft/analysis/diacritic_folds.tsv` —
  * the UTR#30 Diacritic Folding entries for NON-decomposable letters.
  *
  * UTR#30's published DiacriticFolding data has two populations:
  *  1. letters with canonical decompositions (é, å, ...) — handled at fold
  *     time by NFD + combining-mark strip, no table needed;
  *  2. letters whose diacritic is part of the base glyph (stroke, bar, hook,
  *     tail, ...) with NO decomposition — an explicit table.
  * Population 2 is derivable from the UCD itself (which icu4j ships): every
  * such character is named `LATIN <case> LETTER <base> WITH <modifier>`
  * where <modifier> names an attached mark. This generator enumerates the
  * Latin blocks, keeps NFD-inert letters whose name matches that shape with
  * a single ASCII base letter, and emits cp -> base. ETH (a crossed D by
  * glyph, named without WITH) is appended explicitly, as in the UTR#30 data.
  *
  * Output is COMMITTED (reviewed data, not a build step); rerun via
  * `sbt "runMain graft.analysis.GenDiacriticFolds"` after ICU upgrades.
  */
object GenDiacriticFolds {

  // attached-mark modifiers enumerated by UTR#30 diacritic folding; marks
  // that detach (ACUTE, RING ABOVE, ...) always have decompositions and
  // never reach the name check
  private val Modifiers = Set(
    "STROKE", "BAR", "HOOK", "TAIL", "CURL", "BELT", "TOPBAR", "DESCENDER",
    "DIAGONAL STROKE", "HIGH STROKE", "LONG LEG", "MIDDLE TILDE", "NOTCH",
    "FLOURISH", "CROSSED-TAIL", "SWASH TAIL", "PALATAL HOOK",
    "RETROFLEX HOOK", "LONG STROKE OVERLAY", "INVERTED LAZY S",
    "LOW RING INSIDE", "SQUIRREL TAIL", "STIRRUP", "FISHHOOK", "LOOP",
    "HORIZONTAL BAR", "SHORT STROKE OVERLAY")

  private val NameRe =
    "^LATIN (?:SMALL|CAPITAL) LETTER ([A-Z]) WITH (.+)$".r

  def entries(): Seq[(Int, Char)] = {
    val nfd = Normalizer2.getNFDInstance
    val blocks = Seq( // Latin blocks holding non-decomposable modified letters
      0x0180 to 0x024F, // Latin Extended-B
      0x0250 to 0x02AF, // IPA Extensions
      0x1D00 to 0x1D7F, // Phonetic Extensions
      0x1D80 to 0x1DBF, // Phonetic Extensions Supplement
      0x2C60 to 0x2C7F, // Latin Extended-C
      0xA720 to 0xA7FF, // Latin Extended-D
      0xAB30 to 0xAB6F, // Latin Extended-E
      Seq(0x00D8, 0x00F8, 0x0110, 0x0111, 0x0126, 0x0127, 0x0141, 0x0142,
        0x0166, 0x0167) // Latin-1 / Extended-A stroked letters
    ).flatten
    val fromNames = blocks.flatMap { cp =>
      val name = Option(UCharacter.getName(cp)).getOrElse("")
      if (nfd.getDecomposition(cp) != null) None // NFD path handles it
      else name match {
        case NameRe(base, modifier)
            if modifier.split(" AND ").forall(m => Modifiers.exists(m.contains)) =>
          Some(cp -> base.head.toLower)
        case _ => None
      }
    }
    val special = Seq( // named without WITH; folded by the UTR#30 data
      0x00D0 -> 'd', 0x00F0 -> 'd') // ETH / eth (crossed d)
    (fromNames ++ special).sortBy(_._1)
  }

  def main(args: Array[String]): Unit = {
    val out = Paths.get("src/main/resources/graft/analysis/diacritic_folds.tsv")
    Files.createDirectories(out.getParent)
    val lines = entries().map { case (cp, base) =>
      f"$cp%04X\t$base\t${UCharacter.getName(cp)}"
    }
    Files.write(out, (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    println(s"wrote ${lines.size} entries to $out")
  }
}
