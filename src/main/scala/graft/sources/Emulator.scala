package graft.sources

import scala.util.Random

/** Deterministic stand-in for the reference's posting emulators
  * (user_posting_emulation.py / user_posting_emulation_streaming.py):
  * generates raw pin/geo/user wire records with the reference's dirty-
  * data cases (sentinels, "25k"/"3M"/"2.5k" follower counts, null names)
  * as JSON lines. Fixed seed → byte-stable fixtures for tests.
  *
  * Credentials/endpoints from the reference are deliberately NOT
  * reproduced (SURVEY.md security note) — this writes local files only.
  */
object Emulator {

  private val Categories = Seq("art", "beauty", "diy-and-crafts", "education",
    "event-planning", "finance", "tattoos", "travel", "vehicles", "quotes",
    "mens-fashion", "christmas")
  private val Countries = Seq("United States", "India", "Brazil", "Germany",
    "Japan", "Australia", "Kenya", "Peru")
  private val FirstNames = Seq("Dylan", "Ada", "Grace", "Alan", "Edsger",
    "Barbara", "Donald", "Radia")
  private val LastNames = Seq("Holmes", "Lovelace", "Hopper", "Turing",
    "Dijkstra", "Liskov", "Knuth", "Perlman")

  /** One raw record triple (pin, geo, user) as JSON strings, index i. */
  def recordTriple(i: Int, rnd: Random): (String, String, String) = {
    val cat = Categories(rnd.nextInt(Categories.length))
    val followerRaw = rnd.nextInt(10) match {
      case 0 => "User Info Error"
      case 1 => s"${rnd.nextInt(900) + 1}k"
      case 2 => s"${rnd.nextInt(9) + 1}M"
      case 3 => s"${(rnd.nextInt(90) + 10) / 10.0}k" // "2.5k" → 2 after clean (truncating cast)
      case _ => s"${rnd.nextInt(100000)}"
    }
    val title = if (rnd.nextInt(10) == 0) "No Title Data Available" else s"Post $i"
    val desc = if (rnd.nextInt(10) == 0) "No description available Story format" else s"Description of post $i"
    val poster = if (rnd.nextInt(12) == 0) "User Info Error"
      else FirstNames(rnd.nextInt(FirstNames.length))
    val tags = if (rnd.nextInt(8) == 0) "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
      else Seq.fill(3)(Categories(rnd.nextInt(Categories.length))).mkString(",")
    val img = if (rnd.nextInt(10) == 0) "Image src error." else s"https://example.test/img/$i.jpg"
    val saveLoc = if (rnd.nextInt(50) == 0) s"Local save" else s"Local save in /data/$cat"
    val pin =
      s"""{"index":$i,"unique_id":"00000000-0000-4000-8000-${f"$i%012d"}","title":"$title","description":"$desc","poster_name":"$poster","follower_count":"$followerRaw","tag_list":"$tags","is_image_or_video":"${if (rnd.nextBoolean()) "image" else "video"}","image_src":"$img","downloaded":${rnd.nextInt(2)},"save_location":"$saveLoc","category":"$cat"}"""

    val year = 2018 + rnd.nextInt(5)
    val ts = f"$year-${rnd.nextInt(12) + 1}%02d-${rnd.nextInt(28) + 1}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
    val geo =
      s"""{"ind":$i,"country":"${Countries(rnd.nextInt(Countries.length))}","latitude":${rnd.nextDouble() * 180 - 90},"longitude":${rnd.nextDouble() * 360 - 180},"timestamp":"$ts"}"""

    val joinYear = 2015 + rnd.nextInt(6)
    val joined = f"$joinYear-${rnd.nextInt(12) + 1}%02d-${rnd.nextInt(28) + 1}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
    val first = if (rnd.nextInt(20) == 0) null else FirstNames(rnd.nextInt(FirstNames.length))
    val firstJson = if (first == null) "null" else s""""$first""""
    val user =
      s"""{"ind":$i,"first_name":$firstJson,"last_name":"${LastNames(rnd.nextInt(LastNames.length))}","age":${18 + rnd.nextInt(50)},"date_joined":"$joined"}"""
    (pin, geo, user)
  }

  /** Write n record triples as JSON-lines files under dir/{pin,geo,user}.
    * `filesPer` splits each table into that many files (exercises
    * multi-file scans; the reference's flush.size=1 one-record-per-object
    * layout is the pathological extreme we do NOT copy).
    */
  def write(dir: String, n: Int, seed: Long = 42L, filesPer: Int = 4): Unit =
    writeWave(dir, start = 0, n = n, seed = seed, filesPer = filesPer)

  /** Write one wave of records with indices [start, start+n) as NEW files
    * (named by seed+start, so successive waves into the same directory
    * never clobber earlier ones — this is how the streaming tests emulate
    * late-arriving micro-batch input).
    */
  def writeWave(dir: String, start: Int, n: Int, seed: Long, filesPer: Int = 4): Unit = {
    val rnd = new Random(seed)
    val triples = (start until (start + n)).map(i => recordTriple(i, rnd))
    def dump(sub: String, rows: Seq[String]): Unit = {
      val d = new java.io.File(s"$dir/$sub"); d.mkdirs()
      rows.grouped(math.max(1, (rows.length + filesPer - 1) / filesPer)).zipWithIndex.foreach {
        case (chunk, fi) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$sub/wave-$seed-$start-part-$fi.json"),
            chunk.mkString("\n").getBytes("UTF-8"))
      }
    }
    dump("pin", triples.map(_._1))
    dump("geo", triples.map(_._2))
    dump("user", triples.map(_._3))
  }
}
