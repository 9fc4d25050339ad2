package graft.meta

/** Access bits and profiles, mirroring the reference's access model
  * (include/siri/db/access.h:8-42, src/siri/db/access.c:11-95):
  * ten single-statement bits plus four cumulative profiles
  * (read ⊂ write ⊂ modify ⊂ full). `grant`/`revoke` operate on the
  * union of the named bits; the printable form greedily folds the
  * largest profile first, exactly like siridb_access_to_str.
  */
object Access {
  val Show = 1
  val Count = 2
  val List = 4
  val Select = 8
  val Insert = 16
  val Create = 32
  val Alter = 64
  val Drop = 128
  val Grant = 256
  val Revoke = 512

  val Read: Int = Show | Count | List | Select
  val Write: Int = Read | Insert | Create
  val Modify: Int = Write | Alter | Drop
  val Full: Int = Modify | Grant | Revoke

  /** Profiles (biggest first) then bits — the repr fold order of
    * access.c:11-30. */
  private val reprs: Seq[(String, Int)] = Seq(
    "full" -> Full, "modify" -> Modify, "write" -> Write, "read" -> Read,
    "alter" -> Alter, "count" -> Count, "create" -> Create, "drop" -> Drop,
    "grant" -> Grant, "insert" -> Insert, "list" -> List,
    "revoke" -> Revoke, "select" -> Select, "show" -> Show)

  def fromKeyword(kw: String): Int =
    reprs.collectFirst { case (`kw`, b) => b }.getOrElse(0)

  def fromKeywords(kws: Seq[String]): Int =
    kws.foldLeft(0)(_ | fromKeyword(_))

  /** "a, b and c" join — siridb_access_to_str (access.c:70-95). */
  def toStr(bits0: Int): String = {
    var bits = bits0
    val parts = Seq.newBuilder[String]
    reprs.foreach { case (r, b) =>
      if (bits != 0 && (bits & b) == b) { bits -= b; parts += r }
    }
    parts.result() match {
      case Seq() => "no access"
      case Seq(one) => one
      case many => many.init.mkString(", ") + " and " + many.last
    }
  }
}
