package graft.tools

import graft.functions.SnowballStemmer

/** Dev probe: trace the new stemmers on sample vocabulary (used to derive
  * the spec'd expectations; kept for reproducibility). */
object StemProbe {
  def main(args: Array[String]): Unit = {
    val cases = Seq(
      "finnish" -> Seq("edeltäjistään", "edeltäjiställä", "kirjat",
        "kirjan", "kirjassa", "kirjasta", "kirjaan", "kirjalla",
        "taloissa", "talojen", "nopeasti", "nopeimmissa", "suurempi",
        "kaunein", "tyttöjen", "kysymyksiä", "aatonaatto", "eläkkeen",
        "järjestelmä", "järjestelmän", "järjestelmässä", "koko", "kokoko",
        "ihmisen", "ihmiset", "ihmisille", "voidaan", "pitäisi"),
      "romanian" -> Seq("abilitate", "abilitatea", "copiilor", "copilului",
        "frumoasă", "frumoase", "lucrează", "lucram", "lucrare",
        "lucrările", "naţional", "naţionale", "acţiune", "acţiunea",
        "studenţi", "studentul", "iubire", "iubirea", "mergând",
        "cititor", "cititorului", "creativitate", "importanţa"),
      "hungarian" -> Seq("babakocsi", "babakocsit", "babakocsival",
        "házak", "házakat", "házban", "házam", "házaim", "könyvek",
        "könyvekben", "könyvünk", "asztalon", "asztalokon", "emberek",
        "emberektől", "fákkal", "kutyákkal", "szépségé", "városokban",
        "gyerekeknek", "barátaim", "magyarország", "magyarországon"),
      "turkish" -> Seq("kitaplar", "kitabı", "kitapları", "kitaplardan",
        "evde", "evden", "evler", "evlerim", "evimizde", "arabalar",
        "arabası", "çocuklar", "çocukların", "güzeldi", "güzelmiş",
        "geliyorum", "İstanbul", "istanbulda", "okuldan", "okullarda",
        "ağaçlar", "ağacı", "köpeği", "kediler", "kedisi", "gözleri"),
      "arabic" -> Seq("الكتاب", "كتاب", "كتب", "مكتبة", "المكتبات",
        "والكتاب", "بالقلم", "المدرسة", "مدرستها", "المسلمون",
        "المسلمين", "معلمات", "سيذهب", "ذاهبون", "جميلة"),
      "greek" -> Seq("φαγια", "σκαγιων", "αδες", "παπαδες", "γιαγιαδες",
        "ομορφος", "ομορφη", "καλυτερος", "καλυτερη", "μεγαλωνοντας",
        "τρεχοντας", "γραφουμε", "γραφετε", "δουλευες", "δουλευα",
        "βιβλια", "βιβλιου", "βιβλιων", "ανθρωπος", "ανθρωποι",
        "ανθρωπων", "θαλασσες", "παιδια", "παιδιου"),
      "tamil" -> Seq("புத்தகங்கள்", "புத்தகம்",
        "வீடுகள்", "வீட்டில்", "அவர்களோ",
        "மரங்கள்", "மரத்தை", "பள்ளிக்கு",
        "நண்பர்களுடன்", "அவனும்"))
    val out = new StringBuilder
    cases.foreach { case (lang, words) =>
      out.append(s"== $lang\n")
      words.foreach { w =>
        val s = try SnowballStemmer.stem(w.toLowerCase, lang)
        catch { case e: Exception => s"ERR:${e.getMessage}" }
        out.append(f"$w%-24s -> $s%n")
      }
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/stemprobe_utf8.txt"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println("wrote /tmp/stemprobe_utf8.txt")
  }
}
