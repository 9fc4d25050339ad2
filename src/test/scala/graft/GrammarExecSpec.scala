package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import com.fasterxml.jackson.databind.ObjectMapper
import graft.parser.QueryError

/** Executes a deterministic sample of the grammar-production corpus
  * end-to-end (parse → plan → run → encode) through ApiCore over a
  * store seeded the way itest/test_grammar.py seeds its database
  * (series "000000", group `GROUP`, tag `TAG`, user "USER"). The
  * parser-level sweep (ParserFuzzSpec) covers all 30k productions;
  * this pins the EXECUTION layer: a production may answer or raise a
  * reference-style QueryError, but must never crash the planner or
  * encoder. */
class GrammarExecSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val mapper = new ObjectMapper()

  test("sampled grammar productions execute or reject cleanly") {
    val in = getClass.getResourceAsStream("/grammar_corpus.txt")
    assume(in != null)
    val corpus = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toVector
    // deterministic sample across the whole corpus (stride keeps every
    // statement family, spread over all productions); override the
    // stride for one-off densified hunts — lowering it has caught real
    // bugs twice (empty-store schema inference, r5)
    val stride = sys.env.getOrElse("GRAFT_GRAMMAR_STRIDE", "53").toInt
    val sample = corpus.indices.filter(_ % stride == 0).map(corpus)
    val dir = Files.createTempDirectory("graft-gramexec").toString
    // GRAFT_GRAMMAR_CLUSTER=1 runs the same sweep against a 2-pool
    // cluster — every production exercises the merged multi-pool env
    val api: graft.server.DbHandler =
      if (sys.env.get("GRAFT_GRAMMAR_CLUSTER").contains("1"))
        new graft.server.PoolCluster(spark, dir, initialPools = 2)
      else new graft.server.ApiCore(spark, dir)
    // itest seeding: the placeholder terminals must resolve
    api.runInsert(mapper.readTree(
      """{"000000": [[100, 1.0], [160, 2.0], [220, 3.0]]}"""), "iris")
    api.runQuery("create group `GROUP` for /0000.*/", 1L, "iris")
    api.runQuery("create group `GROUP_OR_TAG` for /00000.*/", 1L, "iris") // test_grammar.py:172
    api.runQuery("alter series '000000' tag `TAG`", 1L, "iris")
    api.runQuery("create user 'USER' set password 'PASSWORD1'", 1L, "iris")
    var answered = 0
    var rejected = 0
    sample.foreach { q =>
      try { api.runQuery(q, 1L, "iris"); answered += 1 }
      catch {
        case _: QueryError => rejected += 1
        case e: Throwable =>
          fail(s"query [$q] crashed the execution layer: ${e.getClass}: ${e.getMessage}")
      }
    }
    info(s"sample=${sample.size} answered=$answered rejected=$rejected")
    // with the itest's full seeding nearly everything answers; the
    // remaining rejections are reference-faithful errors (offset-first,
    // threshold-guarded drop-all, create-duplicate)
    assert(answered >= sample.size * 9 / 10,
      s"answered=$answered of ${sample.size}")
  }
}
