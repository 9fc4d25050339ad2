package graft.meta

import graft.parser.QueryError

/** Entity-name and password validation with the reference's exact
  * limits and error strings (src/siri/db/group.c:15-16, tag.c:24-25,
  * user.c:19-22; messages from the respective *_set_name /
  * *_set_password functions). Every message is byte-identical to the
  * reference, including the reference's own quirk of printing
  * "at least" for an over-long user name (user.c:155).
  */
object Naming {

  /** The reference validates with strlen — UTF-8 BYTES, not UTF-16
    * chars; multibyte names must count the same way. */
  private def bytes(s: String): Int =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length

  /** group.c:81-95 (SIRIDB_MIN_GROUP_LEN=1, MAX=255). */
  def checkGroupName(name: String): Unit = {
    if (bytes(name) < 1)
      throw QueryError("Group name should be at least 1 characters.")
    if (bytes(name) > 255)
      throw QueryError("Group name should be at most 255 characters.")
  }

  /** tag.c:57-67 (SIRIDB_MIN_TAG_LEN=1, MAX=255). */
  def checkTagName(name: String): Unit = {
    if (bytes(name) < 1)
      throw QueryError("Tag name should be at least 1 characters.")
    if (bytes(name) > 255)
      throw QueryError("Tag name should be at most 255 characters.")
  }

  /** user.c:146-167: length 2..60 and xstr_is_graph (every char
    * graphical — printable ASCII, no spaces). The too-long branch
    * really does say "at least" in the reference (user.c:155). */
  def checkUserName(name: String): Unit = {
    if (bytes(name) < 2)
      throw QueryError("User name should be at least 2 characters.")
    if (bytes(name) > 60)
      throw QueryError("User name should be at least 60 characters.")
    if (!name.forall(c => c > 0x20 && c < 0x7f))
      throw QueryError(
        "User name contains illegal characters. (only graphical " +
          "characters are allowed, no spaces, tabs etc.)")
  }

  /** user.c:83-101 (SIRIDB_MIN_PASSWORD_LEN=4, MAX=128). */
  def checkPassword(pw: String): Unit = {
    if (bytes(pw) < 4)
      throw QueryError("Password should be at least 4 characters.")
    if (bytes(pw) > 128)
      throw QueryError("Password should be at most 128 characters.")
  }

  /** Compile the anchored translation of a /regex/ literal, mapping
    * compile failures to the reference's error (re.c:55-67, which
    * reports the pattern in its anchored '^…$' form). */
  def compileAnchored(anchoredPattern: String): Unit =
    try { java.util.regex.Pattern.compile(anchoredPattern); () }
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw QueryError(
          s"Cannot compile regular expression '$anchoredPattern': " +
            e.getDescription)
    }
}
