package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{Ann, Dedup, Multimodal, Pca, TextStats}

/** Driver-contract registrations for the LLM-training-data pipeline
  * operators (dedup, similarity search, text analysis, multimodal) over
  * the shipped `documents` / `embeddings` tables. Same conventions as
  * EngineQueries: ordered output, floats rounded on both sides.
  */
object DataOpsQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)

  private def ordered(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(col).toIndexedSeq: _*)

  /** Generated PII fixture — the real corpus contains no contact
    * strings, so the scrub/span oracles would verify only the no-op
    * path; this 40-doc frame plants an email per doc plus phone /
    * ipv4 / ssn strings on fixed moduli. Pure integer/string
    * construction, bit-identical in both engines (the fxPoints
    * precedent). */
  private def piiFx(s: SparkSession): DataFrame =
    s.range(40).selectExpr("id AS doc_id",
      "concat('alpha beta contact user', CAST(id AS STRING), '@example.com gamma', " +
        "CASE WHEN id % 3 = 0 THEN ' call 555-123-4567 now' ELSE '' END, " +
        "CASE WHEN id % 5 = 0 THEN concat(' node 10.0.0.', CAST(id AS STRING), ' up') ELSE '' END, " +
        "CASE WHEN id % 7 = 0 THEN ' ssn 123-45-6789' ELSE '' END, " +
        "CASE WHEN id % 4 = 0 THEN ' card 4111-1111-1111-1111 ok' ELSE '' END, " +
        "CASE WHEN id % 11 = 0 THEN ' card 4111-1111-1111-1112 bad' ELSE '' END, " +
        "CASE WHEN id % 6 = 0 THEN ' via 2001:0db8:85a3:0000:0000:8a2e:0370:7334 net' ELSE '' END, " +
        "CASE WHEN id % 9 = 0 THEN ' acct GB82WEST12345698765432 ref' ELSE '' END, " +
        "CASE WHEN id % 13 = 0 THEN ' acct GB82WEST12345698765431 ref' ELSE '' END, " +
        "' tail words') AS text")

  /** The DuckDB twin of [[piiFx]] — one CTE named `pfx`. The %11 card
    * and %13 IBAN plants FAIL their checksums (Luhn / mod-97), so the
    * span audit must drop them while the shape-based scrub still
    * counts and redacts them. */
  private val PIIFX =
    """pfx AS (SELECT i AS doc_id,
      |  'alpha beta contact user' || CAST(i AS VARCHAR) || '@example.com gamma' ||
      |  (CASE WHEN i % 3 = 0 THEN ' call 555-123-4567 now' ELSE '' END) ||
      |  (CASE WHEN i % 5 = 0 THEN ' node 10.0.0.' || CAST(i AS VARCHAR) || ' up' ELSE '' END) ||
      |  (CASE WHEN i % 7 = 0 THEN ' ssn 123-45-6789' ELSE '' END) ||
      |  (CASE WHEN i % 4 = 0 THEN ' card 4111-1111-1111-1111 ok' ELSE '' END) ||
      |  (CASE WHEN i % 11 = 0 THEN ' card 4111-1111-1111-1112 bad' ELSE '' END) ||
      |  (CASE WHEN i % 6 = 0 THEN ' via 2001:0db8:85a3:0000:0000:8a2e:0370:7334 net' ELSE '' END) ||
      |  (CASE WHEN i % 9 = 0 THEN ' acct GB82WEST12345698765432 ref' ELSE '' END) ||
      |  (CASE WHEN i % 13 = 0 THEN ' acct GB82WEST12345698765431 ref' ELSE '' END) ||
      |  ' tail words' AS text
      |  FROM range(40) t(i))""".stripMargin

  /** DuckDB twin of TextStats.luhnSql over a match expression `m`
    * (regexp_replace needs the explicit 'g' flag DuckDB requires). */
  private def duckLuhn(m: String): String =
    s"""list_sum(list_transform(range(1, length(regexp_replace($m, '[^0-9]', '', 'g')) + 1), i ->
       |  CASE WHEN i % 2 = 1 THEN CAST(substring(reverse(regexp_replace($m, '[^0-9]', '', 'g')), i, 1) AS INT)
       |       ELSE CASE WHEN CAST(substring(reverse(regexp_replace($m, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 > 9
       |            THEN CAST(substring(reverse(regexp_replace($m, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 - 9
       |            ELSE CAST(substring(reverse(regexp_replace($m, '[^0-9]', '', 'g')), i, 1) AS INT) * 2 END END)) % 10 = 0""".stripMargin

  /** DuckDB twin of TextStats.ibanSql — the same one-char-at-a-time
    * mod-97 fold, expressed as list_reduce over a 0-prepended value
    * list (letters encode as 100000+v so the lambda picks ×100). */
  private def duckIban(m: String): String =
    s"""list_reduce(list_prepend(0, list_transform(range(1, length($m) + 1), i ->
       |  CASE WHEN ascii(substring(substring($m, 5) || substring($m, 1, 4), i, 1)) >= 65
       |       THEN 100000 + ascii(substring(substring($m, 5) || substring($m, 1, 4), i, 1)) - 55
       |       ELSE ascii(substring(substring($m, 5) || substring($m, 1, 4), i, 1)) - 48 END)),
       |  (a, x) -> CASE WHEN x >= 100000 THEN (a * 100 + x - 100000) % 97 ELSE (a * 10 + x) % 97 END) = 1""".stripMargin

  /** Generated boilerplate fixture — the real corpus has no newlines,
    * so the line-level boilerplate oracles would verify only the
    * one-line no-op path; this 30-doc frame plants a header line in
    * every doc, a footer on even ids, a unique content line on
    * multiples of 3, and a whitespace-only line on multiples of 5
    * (the never-boilerplate edge). Pure integer/string construction,
    * bit-identical in both engines (the piiFx precedent). */
  private def blFx(s: SparkSession): DataFrame =
    s.range(30).selectExpr("id AS doc_id",
      "concat('subscribe to our newsletter', chr(10), " +
        "'body line ', CAST(id AS STRING), ' alpha', " +
        "CASE WHEN id % 3 = 0 THEN concat(chr(10), 'content block ', CAST(id AS STRING)) ELSE '' END, " +
        "CASE WHEN id % 5 = 0 THEN concat(chr(10), '  ') ELSE '' END, " +
        "CASE WHEN id % 2 = 0 THEN concat(chr(10), 'all rights reserved') ELSE '' END) AS text")

  /** The DuckDB twin of [[blFx]] — one CTE named `bfx`. */
  private val BLFX =
    """bfx AS (SELECT i AS doc_id,
      |  'subscribe to our newsletter' || chr(10) ||
      |  'body line ' || CAST(i AS VARCHAR) || ' alpha' ||
      |  (CASE WHEN i % 3 = 0 THEN chr(10) || 'content block ' || CAST(i AS VARCHAR) ELSE '' END) ||
      |  (CASE WHEN i % 5 = 0 THEN chr(10) || '  ' ELSE '' END) ||
      |  (CASE WHEN i % 2 = 0 THEN chr(10) || 'all rights reserved' ELSE '' END) AS text
      |  FROM range(30) t(i))""".stripMargin

  /** The boilerplate line walk's CTE chain over a source named by the
    * caller: split → position/line table → trimmed-line df (md5 key,
    * whitespace-only lines excluded) → per-line flag at minDf 2.
    * Shared by the real-corpus and fixture entries; yields a CTE
    * named `bl` with (doc_id, line_no, line, df, is_boilerplate). */
  private def blSql(src: String, normalized: Boolean = false): String = {
    val key =
      if (normalized)
        "md5(regexp_replace(regexp_replace(trim(%s), '\\s+', ' ', 'g'), '[0-9]+', '0', 'g'))"
      else "md5(trim(%s))"
    s"""base AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM $src),
       |x AS (SELECT doc_id, unnest(list_transform(range(len(ls)), j -> struct_pack(no := j, ln := ls[j+1]))) AS s FROM base),
       |l AS (SELECT doc_id, CAST(s.no AS BIGINT) AS line_no, s.ln AS line FROM x),
       |d AS (SELECT ${key.format("line")} AS lh, count(DISTINCT doc_id) AS df FROM l WHERE trim(line) <> '' GROUP BY 1),
       |bl AS (SELECT l.doc_id, l.line_no, l.line, CAST(coalesce(d.df, 0) AS BIGINT) AS df,
       |              coalesce(d.df, 0) >= 2 AS is_boilerplate
       |       FROM l LEFT JOIN d ON ${key.format("l.line")} = d.lh)""".stripMargin
  }

  /** Fixture for the NORMALIZED boilerplate variant: a shared header,
    * a per-doc unique body (letter-keyed so digit masking cannot
    * collide it), a "Page N of 30" footer that only digit masking
    * unifies, and a copyright line whose doc-0 copy is re-indented
    * (caught only after whitespace collapse — exact df 1). */
  private def nbFx(s: SparkSession): DataFrame =
    s.range(30).selectExpr("id AS doc_id",
      "concat('Top Header', chr(10), " +
        "'body ', chr(97 + CAST(id % 5 AS INT)), chr(97 + CAST(id DIV 5 AS INT)), ' keep', chr(10), " +
        "'Page ', CAST(id AS STRING), ' of 30', chr(10), " +
        "CASE WHEN id = 0 THEN '(c)  Example   Press' ELSE '(c) Example Press' END) AS text")

  /** The DuckDB twin of [[nbFx]] — one CTE named `nfx`. */
  private val NBFX =
    """nfx AS (SELECT i AS doc_id,
      |  'Top Header' || chr(10) ||
      |  'body ' || chr(CAST(97 + i % 5 AS INT)) || chr(CAST(97 + i // 5 AS INT)) || ' keep' || chr(10) ||
      |  'Page ' || CAST(i AS VARCHAR) || ' of 30' || chr(10) ||
      |  (CASE WHEN i = 0 THEN '(c)  Example   Press' ELSE '(c) Example Press' END) AS text
      |  FROM range(30) t(i))""".stripMargin

  /** The text_boilerplate_curve oracle over a caller-named source:
    * the [[blSql]] df walk once, every threshold a conditional
    * aggregate over the same line frame (sums CAST back to BIGINT —
    * DuckDB folds sum(BIGINT) to HUGEINT), stacked to rows. */
  private def blCurveSql(src: String, thresholds: Seq[Long],
      normalized: Boolean = false): String = {
    val conds = thresholds.zipWithIndex.map { case (t, i) =>
      s"""  CAST(coalesce(sum(CASE WHEN df >= $t THEN 1 END), 0) AS BIGINT) AS n$i,
         |  CAST(coalesce(sum(CASE WHEN df >= $t THEN nc END), 0) AS BIGINT) AS c$i,
         |  CAST(count(DISTINCT CASE WHEN df >= $t THEN doc_id END) AS BIGINT) AS d$i""".stripMargin
    }.mkString(",\n")
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      s"SELECT CAST($t AS BIGINT) AS min_df, n_lines, n$i AS n_flagged," +
        s" c$i AS chars_flagged, d$i AS n_docs_hit FROM a"
    }.mkString(" UNION ALL ")
    s"""WITH ${blSql(src, normalized)},
       |lf AS (SELECT doc_id, df, CAST(length(line) AS BIGINT) AS nc FROM bl),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_lines,
       |$conds
       |FROM lf)
       |SELECT * FROM ($rows) u ORDER BY ALL""".stripMargin
  }

  /** The scrub aggregation over [[blSql]]'s `bl` CTE — shared by the
    * real-corpus and fixture scrub entries. */
  private val BL_SCRUB_BODY =
    """SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(coalesce(sum(CASE WHEN is_boilerplate THEN 1 END), 0) AS BIGINT) AS n_removed,
      |  coalesce(string_agg(CASE WHEN NOT is_boilerplate THEN line END, chr(10) ORDER BY line_no), '') AS clean_text
      |FROM bl GROUP BY doc_id""".stripMargin

  /** The seven PII class patterns as DuckDB regex literals — the
    * TextStats.piiPatterns mirror, used by the per-source incidence
    * rollup (order irrelevant there; the scrub body below keeps its
    * own fixed chain order). */
  private val PII_CLASSES: Seq[(String, String)] = Seq(
    "email" -> """[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}""",
    "ipv4" -> """[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}""",
    "phone" -> "[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv6" -> "(?:[0-9a-fA-F]{1,4}:){3,7}[0-9a-fA-F]{1,4}",
    "iban" -> "[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}",
    "ccard" -> "[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{1,4}|[0-9]{13,16}")

  /** Per-source PII incidence oracle over a source named by the
    * caller (`documents` or a fixture CTE). */
  private def piiBySourceSql(src: String): String = {
    val cls = PII_CLASSES.map { case (k, p) =>
      s"CAST(len(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$k"
    }.mkString(",\n|  ")
    val anySum = PII_CLASSES.map { case (k, _) => s"n_$k" }.mkString(" + ")
    val sums = PII_CLASSES.map { case (k, _) =>
      s"CAST(sum(n_$k) AS BIGINT) AS n_$k" }.mkString(",\n|  ")
    s"""c AS (SELECT source,
       |  $cls
       | FROM $src)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN $anySum > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  $sums,
       |  CAST(sum(CASE WHEN $anySum > 0 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS pii_rate_q6
       |FROM c GROUP BY 1 ORDER BY ALL""".stripMargin
  }

  /** Per-source per-checksum-class precision (TextStats.
    * piiPrecisionBySource twin): candidates by shape, validity by the
    * [[duckLuhn]]/[[duckIban]] folds, grouped source × class. */
  private def piiPrecisionSql(src: String): String = {
    val pats = PII_CLASSES.toMap
    s"""cand AS (
       |  SELECT source, 'ccard' AS kind,
       |         unnest(regexp_extract_all(text, '${pats("ccard")}')) AS m
       |  FROM $src
       |  UNION ALL
       |  SELECT source, 'iban',
       |         unnest(regexp_extract_all(text, '${pats("iban")}')) AS m
       |  FROM $src),
       |v AS (SELECT source, kind,
       |        CASE WHEN kind = 'ccard'
       |             THEN CASE WHEN ${duckLuhn("m")} THEN 1 ELSE 0 END
       |             ELSE CASE WHEN ${duckIban("m")} THEN 1 ELSE 0 END
       |        END AS valid
       |      FROM cand)
       |SELECT source, kind, CAST(count(*) AS BIGINT) AS n_candidates,
       |  CAST(sum(valid) AS BIGINT) AS n_valid,
       |  CAST(sum(valid) * 1000000 // count(*) AS BIGINT) AS precision_q6
       |FROM v GROUP BY 1, 2 ORDER BY ALL""".stripMargin
  }

  /** The scrub's SELECT body (counts on the original text, then the
    * fixed-order redaction chain) — shared by the real-corpus entry
    * and the planted fixture twin. */
  private val PII_SCRUB_BODY =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(text, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
      |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
      |  CAST(len(regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS BIGINT) AS n_ssn,
      |  CAST(len(regexp_extract_all(text, '(?:[0-9a-fA-F]{1,4}:){3,7}[0-9a-fA-F]{1,4}')) AS BIGINT) AS n_ipv6,
      |  CAST(len(regexp_extract_all(text, '[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}')) AS BIGINT) AS n_iban,
      |  CAST(len(regexp_extract_all(text, '[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{1,4}|[0-9]{13,16}')) AS BIGINT) AS n_ccard,
      |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IPV4>', 'g'),
      |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
      |    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
      |    '(?:[0-9a-fA-F]{1,4}:){3,7}[0-9a-fA-F]{1,4}', '<IPV6>', 'g'),
      |    '[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}', '<IBAN>', 'g'),
      |    '[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{1,4}|[0-9]{13,16}', '<CCARD>', 'g') AS clean_text""".stripMargin

  /** DuckDB shingle CTE shared by the jaccard oracles. */
  private val SH =
    """toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
      |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
      |       FROM toks WHERE len(w) >= 3),
      |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
      |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |       GROUP BY 1, 2)""".stripMargin

  private val JACCARD_SQL =
    s"""WITH $SH
       |SELECT id_a, id_b, round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
       |FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5 ORDER BY ALL""".stripMargin

  /** JACCARD_SQL's capped twin (the scale path): shingles with
    * df > maxDf are dropped from the inverted index before the
    * self-join while sizes still count all shingles — shared by the
    * capped entry and the recall audit's jc columns so the capped
    * semantics can never drift from their grade. */
  private def jaccardCappedSql(maxDf: String): String =
    s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
       |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
       |       FROM toks WHERE len(w) >= 3),
       |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
       |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > $maxDf),
       |idx AS (SELECT sh.* FROM sh ANTI JOIN hot USING (shingle)),
       |it AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |       FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |       GROUP BY 1, 2)
       |SELECT id_a, id_b, round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
       |FROM it JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
       |WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5 ORDER BY ALL""".stripMargin

  /** The dedup_band_curve oracle over a caller-named source: the
    * adaptive md5 slice, ONE portable-minhash signature table (md5
    * low-60 shingle values under the [[Dedup.mhA]]/[[Dedup.mhB]]
    * affine family mod 2³¹−1 — every product < 2⁶², exact int64 in
    * both engines), per-setting band-key/candidate CTEs, and the
    * per-Jaccard-decile recall grade against the exact pair truth. */
  /** The shared WITH-body of the two portable-minhash curve oracles
    * (band / bucket): adaptive slice, shingles, md5-low-60 hash
    * values, the 128 portable affine minhashes, and the exact pair
    * truth — everything up to the per-setting candidate CTEs. */
  private def portableCurvePrefixSql(src: String): String = {
    val aList = (0 until 128).map(Dedup.mhA).mkString("[", ", ", "]")
    val bList = (0 until 128).map(Dedup.mhB).mkString("[", ", ", "]")
    s"""sdocs AS (SELECT * FROM $src
       |  WHERE (CAST(list_sum(list_transform(range(15), k ->
       |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
       |        << (4*(14-k)))) AS BIGINT))
       |    % greatest(1, (SELECT count(*) FROM $src) // 2500) = 0),
       |wtok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM sdocs),
       |shg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
       |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
       |       FROM wtok WHERE len(w) >= 3),
       |hx AS (SELECT doc_id, (CAST(list_sum(list_transform(range(15), k ->
       |      CAST(strpos('0123456789abcdef', substring(md5(shingle), k+1, 1)) - 1 AS BIGINT)
       |        << (4*(14-k)))) AS BIGINT)) % 2147483647 AS h0p FROM shg),
       |ab AS (SELECT $aList AS al, $bList AS bl),
       |mh AS (SELECT doc_id, i, min((al[i+1] * h0p + bl[i+1]) % 2147483647) AS mv
       |       FROM hx, ab, range(128) r(i) GROUP BY 1, 2),
       |tru AS (SELECT id_a, id_b, jaccard FROM (${JACCARD_SQL.replace("FROM documents", "FROM sdocs")}) j)""".stripMargin
  }

  /** One grade CTE trio (candidates → decile recall row) over a named
    * kept-band-keys CTE — shared by the band and bucket curve
    * oracles. `head` lists the setting's leading literal columns. */
  private def curveGradeSql(tag: String, keptCte: String,
      head: String): String =
    s"""cd_$tag AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM $keptCte a JOIN $keptCte b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |r_$tag AS (SELECT $head,
       |  CAST(least(floor(jaccard * 10), 9) AS BIGINT) AS band,
       |  count(*) AS n_true,
       |  CAST(count(cd_$tag.id_a) AS BIGINT) AS n_caught,
       |  count(cd_$tag.id_a) * 1000000 // count(*) AS recall_q6,
       |  (SELECT CAST(count(*) AS BIGINT) FROM cd_$tag) AS n_candidates
       |  FROM tru LEFT JOIN cd_$tag USING (id_a, id_b)
       |  GROUP BY 1, 2, 3)""".stripMargin

  private def bandKeysCteSql(tag: String, rows: Int): String =
    s"""bk_$tag AS (SELECT doc_id, i // $rows AS band,
       |  md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bkey
       |  FROM mh GROUP BY doc_id, i // $rows)""".stripMargin

  private def bandCurveSql(src: String): String = {
    val settings = Seq(16, 32, 64)
    val perSetting = settings.map { bands =>
      val rows = 128 / bands
      bandKeysCteSql(s"$bands", rows) + ",\n" +
        curveGradeSql(s"$bands", s"bk_$bands",
          s"CAST($bands AS BIGINT) AS bands, CAST($rows AS BIGINT) AS rows_per_band")
    }.mkString(",\n")
    val union = settings.map(b => s"SELECT * FROM r_$b")
      .mkString(" UNION ALL ")
    s"""WITH ${portableCurvePrefixSql(src)},
       |$perSetting
       |SELECT * FROM ($union) u ORDER BY ALL""".stripMargin
  }

  /** The dedup_bucket_curve oracle: band keys ONCE at fixed 32 bands,
    * occupancy once, each cap anti-joins over-cap buckets before the
    * shared grade. */
  private def bucketCurveSql(src: String,
      caps: Seq[Long] = Seq(0L, 4L, 16L)): String = {
    val perCap = caps.map { cap =>
      val tag = s"c$cap"
      val kept =
        if (cap <= 0L) s"kp_$tag AS (SELECT * FROM bk_32)"
        else
          s"""kp_$tag AS (SELECT bk_32.* FROM bk_32
             |  ANTI JOIN (SELECT band, bkey FROM occ WHERE m > $cap) h
             |  USING (band, bkey))""".stripMargin
      kept + ",\n" + curveGradeSql(tag, s"kp_$tag",
        s"CAST($cap AS BIGINT) AS max_bucket, CAST(32 AS BIGINT) AS bands")
    }.mkString(",\n")
    val union = caps.map(c => s"SELECT * FROM r_c$c").mkString(" UNION ALL ")
    s"""WITH ${portableCurvePrefixSql(src)},
       |${bandKeysCteSql("32", 4)},
       |occ AS (SELECT band, bkey, count(*) AS m FROM bk_32 GROUP BY 1, 2),
       |$perCap
       |SELECT * FROM ($union) u ORDER BY ALL""".stripMargin
  }

  /** 30 planted near-dup pairs at J = 13/23 (≈0.565 — the near-θ
    * decile where banding choice actually matters): docs (2k, 2k+1)
    * share a 15-token prefix (13 of 18 shingles) and differ in a
    * 5-token tail; tokens are k-keyed so cross-pair Jaccard is 0. */
  private def bcFx(s: SparkSession): DataFrame =
    s.range(60).selectExpr("id AS doc_id",
      "concat(" +
        "array_join(transform(sequence(0, 14), j -> concat('s', CAST(id DIV 2 AS STRING), 'x', CAST(j AS STRING))), ' '), " +
        "' ', " +
        "array_join(transform(sequence(0, 4), j -> concat('u', CAST(id AS STRING), 'y', CAST(j AS STRING))), ' ')) AS text")

  /** The DuckDB twin of [[bcFx]] — one CTE named `bcfx`. (No line may
    * START with `||`: this constant is re-interpolated into a
    * stripMargin template, which would eat the first pipe.) */
  private val BCFX =
    """bcfx AS (SELECT i AS doc_id,
      |  array_to_string(list_transform(range(0, 15), j -> 's' || CAST(i // 2 AS VARCHAR) || 'x' || CAST(j AS VARCHAR)), ' ') ||
      |  ' ' ||
      |  array_to_string(list_transform(range(0, 5), j -> 'u' || CAST(i AS VARCHAR) || 'y' || CAST(j AS VARCHAR)), ' ') AS text
      |  FROM range(60) t(i))""".stripMargin

  /** The bucket-cap fixture: a 20-doc identical MEGA cluster (over
    * both real caps), an 8-doc identical MID cluster (inside cap 16,
    * over cap 4), and 15 near-dup pairs at J = 15/21 ≈ 0.714 whose
    * buckets hold 2 docs (inside every cap) — the three occupancy
    * regimes a production cap must separate. */
  private def bkFx(s: SparkSession): DataFrame = {
    def cluster(from: Long, until: Long, tok: String) =
      s.range(from, until).selectExpr("id AS doc_id",
        s"array_join(transform(sequence(0, 19), j -> concat('$tok', CAST(j AS STRING))), ' ') AS text")
    val pairs = s.range(100, 130).selectExpr("id AS doc_id",
      "concat(" +
        "array_join(transform(sequence(0, 16), j -> concat('p', CAST((id - 100) DIV 2 AS STRING), 'x', CAST(j AS STRING))), ' '), " +
        "' ', " +
        "array_join(transform(sequence(0, 2), j -> concat('q', CAST(id AS STRING), 'y', CAST(j AS STRING))), ' ')) AS text")
    cluster(0L, 20L, "mega").unionAll(cluster(50L, 58L, "mid"))
      .unionAll(pairs)
  }

  /** The DuckDB twin of [[bkFx]] — one CTE named `bkfx`. (No line may
    * start with `||` — the stripMargin re-interpolation rule.) */
  private val BKFX =
    """bkfx AS (
      |  SELECT i AS doc_id,
      |    array_to_string(list_transform(range(0, 20), j -> 'mega' || CAST(j AS VARCHAR)), ' ') AS text
      |  FROM range(20) t(i)
      |  UNION ALL
      |  SELECT i AS doc_id,
      |    array_to_string(list_transform(range(0, 20), j -> 'mid' || CAST(j AS VARCHAR)), ' ') AS text
      |  FROM range(50, 58) t(i)
      |  UNION ALL
      |  SELECT i AS doc_id,
      |    array_to_string(list_transform(range(0, 17), j -> 'p' || CAST((i - 100) // 2 AS VARCHAR) || 'x' || CAST(j AS VARCHAR)), ' ') ||
      |    ' ' ||
      |    array_to_string(list_transform(range(0, 3), j -> 'q' || CAST(i AS VARCHAR) || 'y' || CAST(j AS VARCHAR)), ' ') AS text
      |  FROM range(100, 130) t(i))""".stripMargin

  /** Oracle for [[graft.llm.Dedup.semanticThetaCurve]] over `src`
    * (a table/CTE with vec_id, label, embedding): ONE celled pair
    * frame with sims kept down to min(θ) feeds every θ's conditional
    * aggregates; the slice truth is graded by θ-INDEPENDENT cell
    * sharing (hit ⇔ same cell), replaying the Spark side's exact
    * integer cells and rounded sims. */
  private def semanticThetaSql(src: String): String = {
    val ths = Seq(45 -> "0.45", 60 -> "0.60", 75 -> "0.75", 90 -> "0.90")
    val pdCols = ths.zipWithIndex.map { case ((_, th), i) =>
      s"count(*) FILTER (WHERE sim >= $th) AS pc_$i" }.mkString(", ")
    val fullCols = ths.indices.map { i =>
      s"CAST(coalesce(sum(pc_$i), 0) // 2 AS BIGINT) AS np_$i, " +
        s"CAST(count(*) FILTER (WHERE pc_$i > 0) AS BIGINT) AS nd_$i"
    }.mkString(", ")
    val sliceCols = ths.zipWithIndex.map { case ((_, th), i) =>
      s"CAST(count(*) FILTER (WHERE sim >= $th) AS BIGINT) AS nt_$i, " +
        s"CAST(count(*) FILTER (WHERE sim >= $th AND hit) AS BIGINT) AS nc_$i"
    }.mkString(", ")
    val union = ths.zipWithIndex.map { case ((q2, _), i) =>
      s"""SELECT CAST($q2 AS BIGINT) AS theta_q2, np_$i AS n_pairs,
         |  nd_$i AS n_docs_dup, nt_$i AS n_true, nc_$i AS n_caught,
         |  CASE WHEN nt_$i = 0 THEN CAST(1000000 AS BIGINT)
         |       ELSE nc_$i * 1000000 // nt_$i END AS recall_q6
         |FROM fullagg, sliceagg""".stripMargin
    }.mkString(" UNION ALL ")
    s"""WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM $src),
       |c AS (SELECT count(*) AS n, count(DISTINCT label) AS l FROM e0),
       |bsel AS (SELECT coalesce(min(b), 32) AS bits FROM range(0, 33) r(b), c
       |         WHERE l * 256 * (1::BIGINT << b) >= n),
       |n0 AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
       |        label::BIGINT * (1::BIGINT << bits) + coalesce(list_sum(
       |          list_transform(range(1, bits + 1), i ->
       |            CASE WHEN v[i] >= 0 THEN (1::BIGINT << (bits - i)) ELSE 0 END)), 0) AS cell
       |       FROM e0, bsel),
       |p AS (SELECT * FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
       |  FROM n0 a JOIN n0 b ON a.cell = b.cell AND a.vec_id < b.vec_id) WHERE sim >= 0.45),
       |ep AS (SELECT id_a AS doc_id, sim FROM p UNION ALL SELECT id_b AS doc_id, sim FROM p),
       |pd AS (SELECT doc_id, $pdCols FROM ep GROUP BY 1),
       |fullagg AS (SELECT $fullCols FROM pd),
       |semb AS (SELECT * FROM $src
       |  WHERE (CAST(list_sum(list_transform(range(15), k ->
       |      CAST(strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
       |        << (4*(14-k)))) AS BIGINT))
       |    % greatest(1, (SELECT count(*) FROM $src) // 1000) = 0),
       |se0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM semb),
       |sn AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM se0),
       |tru AS (SELECT * FROM (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
       |  FROM sn a JOIN sn b ON a.vec_id < b.vec_id) WHERE sim >= 0.45),
       |sc AS (SELECT count(*) AS n, count(DISTINCT label) AS l FROM se0),
       |sbsel AS (SELECT coalesce(min(b), 32) AS bits FROM range(0, 33) r(b), sc
       |          WHERE l * 256 * (1::BIGINT << b) >= n),
       |sn0 AS (SELECT vec_id,
       |         label::BIGINT * (1::BIGINT << bits) + coalesce(list_sum(
       |           list_transform(range(1, bits + 1), i ->
       |             CASE WHEN v[i] >= 0 THEN (1::BIGINT << (bits - i)) ELSE 0 END)), 0) AS cell
       |        FROM se0, sbsel),
       |cs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |       FROM sn0 a JOIN sn0 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
       |tf AS (SELECT tru.sim, (cs.id_a IS NOT NULL) AS hit
       |       FROM tru LEFT JOIN cs USING (id_a, id_b)),
       |sliceagg AS (SELECT $sliceCols FROM tf)
       |SELECT * FROM ($union) u ORDER BY ALL""".stripMargin
  }

  /** Planted-sim embedding fixture for the θ curve: the real corpus's
    * random vectors put almost all truth mass in the lowest band, so
    * the high-θ rows would be vacuous (the band-curve fixture
    * precedent). 18 dim-4 integer vectors plant: a 10-identical
    * cluster (sim 1.0, caught at every θ), a 0.8 pair with OPPOSITE
    * second-dim signs, a sim-1.0 pair SPLIT ACROSS LABELS (ids 12/13
    * — missed at every θ: the paper's own cross-cluster blind spot,
    * visible as recall < 1e6 clear up to θ = 0.9), and 0.707 / 0.5
    * moderate pairs that drop out as θ rises. Integer components →
    * exact doubles in both engines. */
  private def stFx(s: SparkSession): DataFrame =
    s.range(18).selectExpr("id AS vec_id",
      "CASE WHEN id <= 12 THEN 0L ELSE 1L END AS label",
      """CASE WHEN id <= 9 THEN array(1D, 0D, 0D, 0D)
        |     WHEN id = 10 THEN array(3D, 1D, 0D, 0D)
        |     WHEN id = 11 THEN array(3D, -1D, 0D, 0D)
        |     WHEN id IN (12, 13) THEN array(2D, 1D, 0D, 0D)
        |     WHEN id = 14 THEN array(1D, 1D, 0D, 0D)
        |     WHEN id = 15 THEN array(1D, 0D, 0D, 0D)
        |     WHEN id = 16 THEN array(1D, 0D, 1D, 0D)
        |     ELSE array(1D, 0D, 0D, 1D) END AS embedding""".stripMargin)

  /** The DuckDB twin of [[stFx]] — one CTE named `stfx`. (No line may
    * start with `||` — the stripMargin re-interpolation rule.) */
  private val STFX =
    """stfx AS (SELECT i AS vec_id,
      |  CASE WHEN i <= 12 THEN 0 ELSE 1 END AS label,
      |  CASE WHEN i <= 9 THEN [1.0, 0.0, 0.0, 0.0]
      |       WHEN i = 10 THEN [3.0, 1.0, 0.0, 0.0]
      |       WHEN i = 11 THEN [3.0, -1.0, 0.0, 0.0]
      |       WHEN i IN (12, 13) THEN [2.0, 1.0, 0.0, 0.0]
      |       WHEN i = 14 THEN [1.0, 1.0, 0.0, 0.0]
      |       WHEN i = 15 THEN [1.0, 0.0, 0.0, 0.0]
      |       WHEN i = 16 THEN [1.0, 0.0, 1.0, 0.0]
      |       ELSE [1.0, 0.0, 0.0, 1.0] END AS embedding
      |  FROM range(18) t(i))""".stripMargin

  /** Exact all-pairs replay of Dedup.simhashPairs (the banded search
    * has pigeonhole-complete recall at maxDist < bands, so the two
    * forms coincide) — shared by the standalone entry and the
    * dedup-recall-eval composition. */
  private val SIMHASH_PAIRS_SQL =
    """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
      |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(15), k ->
      |        CAST(strpos('0123456789abcdef', substring(md5(tok), k+1, 1)) - 1 AS BIGINT)
      |          << (4*(14-k)))) AS BIGINT) AS hv
      |      FROM t),
      |b AS (SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS tot
      |      FROM h, range(60) r(j) GROUP BY 1, 2),
      |s AS (SELECT doc_id, CAST(sum(CASE WHEN tot > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
      |      FROM b GROUP BY 1),
      |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
      |      FROM s a JOIN s b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3 ORDER BY ALL""".stripMargin

  /** DuckDB replay of Ann.kmeansIvfTopK: one CTE block per Lloyd
    * iteration (assign by round-9 cosine with lowest-cell tie-break,
    * recompute per-cell means, empty cells keep their centroid), then
    * the standard probe + exact-score + rank tail. */
  /** Oracle replay of Ann.cosineTopK — shared by the standalone entry
    * and the recall-eval composition. */
  private def exactTopSql(nQueries: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $nQueries),
       |p AS (SELECT q.query_id, n.vec_id,
       |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / (qn * nrm), 9) AS sim
       |      FROM q, n WHERE n.vec_id <> q.query_id)
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id AS neighbor_id
       |FROM p QUALIFY rank <= $k ORDER BY ALL""".stripMargin

  /** Oracle replay of Ann.mmrTopK: same candidates, same greedy fold.
    * Each of the k selection rounds is its OWN chained CTE carrying
    * the selected list as a column — inlining the previous round's
    * expression instead would blow up exponentially (the prev
    * expression appears 4× per round; verified: the inlined form did
    * not finish at k = 5, the chained form runs in ms). argmax is a
    * struct sort on (−score, vec_id), identical to the Spark fold's
    * explicit comparison. */
  private def mmrSql(nQueries: Int, k: Int, nCandidates: Int,
      lambda: Double): String = {
    val l = lambda
    val m = 1.0 - lambda
    val steps = (1 to k).map { i =>
      s"""s$i AS (SELECT query_id, cs, list_append(sel, list_sort(
         |  list_transform(
         |    list_filter(cs, c -> len(list_filter(sel, s -> s.vec_id = c.vec_id)) = 0),
         |    c -> struct_pack(
         |      nscore := -round($l * c.sim - $m * (CASE WHEN len(sel) = 0 THEN 0.0 ELSE
         |        list_max(list_transform(sel, s -> round(list_sum(list_transform(range(1, len(c.u) + 1), j -> c.u[j] * s.u[j])), 9))) END), 9),
         |      vec_id := c.vec_id, u := c.u, sim := c.sim)))[1]) AS sel
         |  FROM s${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $nQueries),
       |p AS (SELECT q.query_id, n.vec_id,
       |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / (qn * nrm), 9) AS sim,
       |        list_transform(n.v, x -> x / n.nrm) AS u
       |      FROM q, n WHERE n.vec_id <> q.query_id),
       |r AS (SELECT query_id, vec_id, sim, u,
       |       row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rk FROM p),
       |cl AS (SELECT query_id, list(struct_pack(ns := -sim, vec_id := vec_id, u := u, sim := sim) ORDER BY -sim, vec_id) AS cs
       |       FROM r WHERE rk <= $nCandidates GROUP BY 1),
       |s0 AS (SELECT query_id, cs,
       |       list_transform(list_filter(cs, c -> 1 = 0),
       |         c -> struct_pack(nscore := 0.0, vec_id := c.vec_id, u := c.u, sim := c.sim)) AS sel
       |       FROM cl),
       |$steps
       |SELECT query_id, CAST(t.rnk AS BIGINT) AS rank,
       |       sel[t.rnk].vec_id AS neighbor_id, sel[t.rnk].sim AS sim
       |FROM s$k, range(1, ${k + 1}) t(rnk)
       |WHERE sel[t.rnk].vec_id IS NOT NULL ORDER BY ALL""".stripMargin
  }

  /** CTE chain of the kmeans-IVF replay, ending at the scored-
    * candidate frame `sc$fx` — no leading WITH, no final SELECT.
    * Every CTE name carries the suffix `fx` so SEVERAL probe
    * settings can compose in one statement (the nprobe-curve
    * oracle); fx = "" reproduces the standalone oracles' text
    * unchanged. */
  private def kmeansIvfBody(nlist: Int, iters: Int, nQueries: Int,
      nprobe: Int, trainMod: Int, fx: String): String = {
    def csim(cvOwner: String) =
      s"round(list_sum(list_transform(range(1, len(v) + 1), j -> v[j] * ${cvOwner}cv[j])) / (nrm * ${cvOwner}cnrm), 9)"
    val iterBlocks = (1 to iters).map { i =>
      val prev = if (i == 1) s"c0$fx" else s"c${i - 1}$fx"
      s"""a$i$fx AS (SELECT vec_id, v, nrm, cell, ${csim("")} AS csim FROM nt$fx, $prev),
         |b$i$fx AS (SELECT vec_id, v, nrm, cell FROM a$i$fx
         |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) = 1),
         |m$i$fx AS (SELECT cell, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM b$i$fx),
         |g$i$fx AS (SELECT cell, pos, avg(x) AS cx FROM m$i$fx GROUP BY 1, 2),
         |u$i$fx AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM g$i$fx GROUP BY 1),
         |c$i$fx AS (SELECT p.cell, COALESCE(u$i$fx.cv, p.cv) AS cv,
         |         sqrt(list_sum(list_transform(COALESCE(u$i$fx.cv, p.cv), x -> x * x))) AS cnrm
         |        FROM $prev p LEFT JOIN u$i$fx ON u$i$fx.cell = p.cell)""".stripMargin
    }.mkString(",\n")
    val last = s"c$iters$fx"
    s"""e$fx AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
       |n$fx AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e$fx),
       |nt$fx AS (SELECT * FROM n$fx WHERE vec_id % $trainMod = 0),
       |c0$fx AS (SELECT CAST(vec_id // $trainMod AS INT) AS cell, v AS cv,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS cnrm FROM nt$fx WHERE vec_id < ${nlist.toLong * trainMod}),
       |$iterBlocks,
       |af$fx AS (SELECT vec_id, v, nrm, cell, ${csim("")} AS csim FROM n$fx, $last),
       |bf$fx AS (SELECT vec_id, v, nrm, cell FROM af$fx
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) = 1),
       |q$fx AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n$fx WHERE vec_id < $nQueries),
       |pr$fx AS (SELECT query_id, qv, qn, cell,
       |        round(list_sum(list_transform(range(1, len(qv) + 1), j -> qv[j] * cv[j])) / (qn * cnrm), 9) AS csim
       |       FROM q$fx, $last),
       |probes$fx AS (SELECT query_id, qv, qn, cell FROM pr$fx
       |           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cell) <= $nprobe),
       |sc$fx AS (SELECT p.query_id, b.vec_id,
       |        round(list_sum(list_transform(range(1, len(p.qv) + 1), j -> p.qv[j] * b.v[j])) / (p.qn * b.nrm), 9) AS sim
       |       FROM probes$fx p JOIN bf$fx b ON b.cell = p.cell AND b.vec_id <> p.query_id)""".stripMargin
  }

  private def kmeansIvfSql(nlist: Int, iters: Int, nQueries: Int,
      k: Int, nprobe: Int, trainMod: Int = 1): String =
    s"""WITH ${kmeansIvfBody(nlist, iters, nQueries, nprobe, trainMod, "")}
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id AS neighbor_id
       |FROM sc QUALIFY rank <= $k ORDER BY ALL""".stripMargin

  /** Oracle replay of Ann.pqTopK: per-subspace L2 Lloyd (same init,
    * round-9 distances, ties → lowest code, empty cells keep their
    * centroid), then the ADC scan with per-subspace partials quantized
    * to fixed point (×2^30) before the cross-subspace integer sum. */
  /** CTE chain of the PQ replay (subvectors → Lloyd codebooks →
    * code assignment), ending at `cod`/`bk` — no leading WITH, no
    * query stage. Shared by the top-k oracle ([[pqSql]]) and the
    * distortion-audit oracle, which reconstructs from the same codes
    * instead of scoring queries. */
  private def pqBodySql(m: Int, d: Int, nlist: Int, iters: Int,
      trainMod: Int): String = {
    val Q = "1073741824.0"
    def l2(sv: String, cv: String) =
      s"round(list_sum(list_transform(range(1, $d + 1), j -> ($sv[j] - $cv[j]) * ($sv[j] - $cv[j]))), 9)"
    val iterBlocks = (1 to iters).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}"
      s"""a$i AS (SELECT t.vec_id, t.sub, t.sv, c.cid, ${l2("t.sv", "c.cv")} AS dist
         |       FROM svt t JOIN $prev c ON c.sub = t.sub),
         |b$i AS (SELECT vec_id, sub, sv, cid FROM a$i
         |       QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
         |m$i AS (SELECT sub, cid, unnest(range(1, $d + 1)) AS pos, unnest(sv) AS x FROM b$i),
         |g$i AS (SELECT sub, cid, pos,
         |        CAST(sum(CAST(floor(x * 1073741824) AS BIGINT)) AS DOUBLE)
         |          / CAST(count(*) * 1073741824 AS DOUBLE) AS cx
         |        FROM m$i GROUP BY 1, 2, 3),
         |u$i AS (SELECT sub, cid, list(cx ORDER BY pos) AS cv FROM g$i GROUP BY 1, 2),
         |c$i AS (SELECT p.sub, p.cid, COALESCE(u$i.cv, p.cv) AS cv
         |        FROM $prev p LEFT JOIN u$i ON u$i.sub = p.sub AND u$i.cid = p.cid)""".stripMargin
    }.mkString(",\n")
    val last = s"c$iters"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
       |sv AS (SELECT vec_id, s.i AS sub, v[(s.i*$d+1):(s.i*$d+$d)] AS sv FROM e, range(0, $m) s(i)),
       |svt AS (SELECT * FROM sv WHERE vec_id % $trainMod = 0),
       |c0 AS (SELECT sub, CAST(vec_id // $trainMod AS INT) AS cid, sv AS cv FROM svt WHERE vec_id < ${nlist.toLong * trainMod}),
       |$iterBlocks,
       |bk AS (SELECT sub, cid, cv,
       |        CAST(round(list_sum(list_transform(cv, x -> x * x)) * $Q) AS BIGINT) AS cn2q FROM $last),
       |af AS (SELECT t.vec_id, t.sub, c.cid, ${l2("t.sv", "c.cv")} AS dist
       |       FROM sv t JOIN bk c ON c.sub = t.sub),
       |cod AS (SELECT vec_id, sub, cid FROM af
       |        QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1)""".stripMargin
  }

  /** One (parenthesized, self-contained) row of the ann_pq_curve
    * oracle: the [[pqBodySql]] training/assignment replay at subspace
    * count `m` plus the ann_quant_distortion q9 error blocks, folded
    * to the curve's single summary row. Parenthesized WITH subqueries
    * keep each m's CTE names private so the settings UNION cleanly. */
  private def pqCurveRowSql(m: Int, dim: Int, nlist: Int, iters: Int,
      trainMod: Int): String = {
    val d = dim / m
    s"""(WITH ${pqBodySql(m = m, d = d, nlist = nlist, iters = iters, trainMod = trainMod)},
       |perr AS (SELECT cod.vec_id,
       |  CAST(list_sum(list_transform(range(1, $d + 1),
       |    j -> CAST(floor((t.sv[j] - c.cv[j]) * (t.sv[j] - c.cv[j]) * 1e9)
       |         AS BIGINT))) AS BIGINT) AS seq
       | FROM cod JOIN bk c ON c.sub = cod.sub AND c.cid = cod.cid
       |      JOIN sv t ON t.vec_id = cod.vec_id AND t.sub = cod.sub),
       |pqv AS (SELECT vec_id, CAST(sum(seq) AS BIGINT) AS se
       |  FROM perr GROUP BY 1)
       |SELECT CAST($m AS BIGINT) AS m, CAST($nlist AS BIGINT) AS ks,
       |  CAST(count(*) AS BIGINT) AS n_vectors,
       |  CAST(${dim * 8} AS BIGINT) AS bytes_raw,
       |  CAST($m AS BIGINT) AS bytes_code,
       |  CAST(${dim * 8 / m} AS BIGINT) AS compression_x,
       |  CAST(sum(se) AS BIGINT) AS sum_se_q9,
       |  CAST(sum(se) // count(*) AS BIGINT) AS mse_q9,
       |  max(se) AS max_se_q9 FROM pqv)""".stripMargin
  }

  private def pqSql(m: Int, d: Int, nlist: Int, iters: Int,
      nQueries: Int, k: Int, trainMod: Int = 1): String = {
    val Q = "1073741824.0"
    s"""WITH ${pqBodySql(m, d, nlist, iters, trainMod)},
       |q AS (SELECT vec_id AS query_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS qn FROM e WHERE vec_id < $nQueries),
       |qs AS (SELECT query_id, s.i AS sub, v[(s.i*$d+1):(s.i*$d+$d)] AS qsv, qn FROM q, range(0, $m) s(i)),
       |pd AS (SELECT qs.query_id, cod.vec_id, qs.qn, c.cn2q,
       |       CAST(round(list_sum(list_transform(range(1, $d + 1), j -> qs.qsv[j] * c.cv[j])) * $Q) AS BIGINT) AS pdq
       |       FROM cod JOIN bk c ON c.sub = cod.sub AND c.cid = cod.cid
       |       JOIN qs ON qs.sub = cod.sub
       |       WHERE cod.vec_id <> qs.query_id),
       |sc AS (SELECT query_id, vec_id,
       |       round((sum(pdq) / $Q) / (any_value(qn) * sqrt(sum(cn2q) / $Q)), 6) AS sim
       |       FROM pd GROUP BY 1, 2)
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id AS neighbor_id
       |FROM sc QUALIFY rank <= $k ORDER BY ALL""".stripMargin
  }

  /** Oracle replay of Ann.ivfPqTopK: the coarse spherical-k-means
    * blocks of [[kmeansIvfSql]] + the per-subspace PQ blocks of
    * [[pqSql]] + probe restriction + the fixed-point ADC over
    * candidates only. */
  private def ivfPqSql(nlist: Int, iters: Int, nprobe: Int, m: Int,
      d: Int, pqNlist: Int, pqIters: Int, nQueries: Int, k: Int,
      trainMod: Int = 1): String = {
    val Q = "1073741824.0"
    def csim(cvOwner: String) =
      s"round(list_sum(list_transform(range(1, len(v) + 1), j -> v[j] * ${cvOwner}cv[j])) / (nrm * ${cvOwner}cnrm), 9)"
    val coarse = (1 to iters).map { i =>
      val prev = if (i == 1) "c0" else s"c${i - 1}"
      s"""a$i AS (SELECT vec_id, v, nrm, cell, ${csim("")} AS csim FROM nt, $prev),
         |b$i AS (SELECT vec_id, v, nrm, cell FROM a$i
         |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) = 1),
         |m$i AS (SELECT cell, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM b$i),
         |g$i AS (SELECT cell, pos, avg(x) AS cx FROM m$i GROUP BY 1, 2),
         |u$i AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM g$i GROUP BY 1),
         |c$i AS (SELECT p.cell, COALESCE(u$i.cv, p.cv) AS cv,
         |         sqrt(list_sum(list_transform(COALESCE(u$i.cv, p.cv), x -> x * x))) AS cnrm
         |        FROM $prev p LEFT JOIN u$i ON u$i.cell = p.cell)""".stripMargin
    }.mkString(",\n")
    val clast = s"c$iters"
    def l2(sv: String, cv: String) =
      s"round(list_sum(list_transform(range(1, $d + 1), j -> ($sv[j] - $cv[j]) * ($sv[j] - $cv[j]))), 9)"
    val pq = (1 to pqIters).map { i =>
      val prev = if (i == 1) "p0" else s"pc${i - 1}"
      s"""pa$i AS (SELECT t.vec_id, t.sub, t.sv, c.cid, ${l2("t.sv", "c.cv")} AS dist
         |       FROM svt t JOIN $prev c ON c.sub = t.sub),
         |pb$i AS (SELECT vec_id, sub, sv, cid FROM pa$i
         |       QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
         |pm$i AS (SELECT sub, cid, unnest(range(1, $d + 1)) AS pos, unnest(sv) AS x FROM pb$i),
         |pg$i AS (SELECT sub, cid, pos,
         |        CAST(sum(CAST(floor(x * 1073741824) AS BIGINT)) AS DOUBLE)
         |          / CAST(count(*) * 1073741824 AS DOUBLE) AS cx
         |        FROM pm$i GROUP BY 1, 2, 3),
         |pu$i AS (SELECT sub, cid, list(cx ORDER BY pos) AS cv FROM pg$i GROUP BY 1, 2),
         |pc$i AS (SELECT p.sub, p.cid, COALESCE(pu$i.cv, p.cv) AS cv
         |        FROM $prev p LEFT JOIN pu$i ON pu$i.sub = p.sub AND pu$i.cid = p.cid)""".stripMargin
    }.mkString(",\n")
    val plast = s"pc$pqIters"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
       |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
       |nt AS (SELECT * FROM n WHERE vec_id % $trainMod = 0),
       |c0 AS (SELECT CAST(vec_id // $trainMod AS INT) AS cell, v AS cv,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS cnrm FROM nt WHERE vec_id < ${nlist.toLong * trainMod}),
       |$coarse,
       |af AS (SELECT vec_id, v, nrm, cell, ${csim("")} AS csim FROM n, $clast),
       |bf AS (SELECT vec_id, cell FROM af
       |       QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) = 1),
       |sv AS (SELECT vec_id, s.i AS sub, v[(s.i*$d+1):(s.i*$d+$d)] AS sv FROM e, range(0, $m) s(i)),
       |svt AS (SELECT * FROM sv WHERE vec_id % $trainMod = 0),
       |p0 AS (SELECT sub, CAST(vec_id // $trainMod AS INT) AS cid, sv AS cv FROM svt WHERE vec_id < ${pqNlist.toLong * trainMod}),
       |$pq,
       |bk AS (SELECT sub, cid, cv,
       |        CAST(round(list_sum(list_transform(cv, x -> x * x)) * $Q) AS BIGINT) AS cn2q FROM $plast),
       |paf AS (SELECT t.vec_id, t.sub, c.cid, ${l2("t.sv", "c.cv")} AS dist
       |       FROM sv t JOIN bk c ON c.sub = t.sub),
       |cod AS (SELECT vec_id, sub, cid FROM paf
       |        QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, cid) = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < $nQueries),
       |prc AS (SELECT query_id, cell,
       |        round(list_sum(list_transform(range(1, len(qv) + 1), j -> qv[j] * cv[j])) / (qn * cnrm), 9) AS csim
       |       FROM q, $clast),
       |probes AS (SELECT query_id, cell FROM prc
       |           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cell) <= $nprobe),
       |cand AS (SELECT p.query_id, b.vec_id FROM probes p
       |         JOIN bf b ON b.cell = p.cell AND b.vec_id <> p.query_id),
       |qs AS (SELECT vec_id AS query_id, s.i AS sub, v[(s.i*$d+1):(s.i*$d+$d)] AS qsv,
       |        sqrt(list_sum(list_transform(v, x -> x * x))) AS qn
       |       FROM e, range(0, $m) s(i) WHERE vec_id < $nQueries),
       |pd AS (SELECT ca.query_id, ca.vec_id, qs.qn, c.cn2q,
       |       CAST(round(list_sum(list_transform(range(1, $d + 1), j -> qs.qsv[j] * c.cv[j])) * $Q) AS BIGINT) AS pdq
       |       FROM cand ca JOIN cod ON cod.vec_id = ca.vec_id
       |       JOIN bk c ON c.sub = cod.sub AND c.cid = cod.cid
       |       JOIN qs ON qs.query_id = ca.query_id AND qs.sub = cod.sub),
       |sc AS (SELECT query_id, vec_id,
       |       round((sum(pdq) / $Q) / (any_value(qn) * sqrt(sum(cn2q) / $Q)), 6) AS sim
       |       FROM pd GROUP BY 1, 2)
       |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id AS neighbor_id
       |FROM sc QUALIFY rank <= $k ORDER BY ALL""".stripMargin
  }

  /** The 14 engine-behavior probes the canary expects a DuckDB 1.0.0
    * oracle to pass (verified against 1.0.0 when frozen). Each probe
    * pins one arithmetic behavior the repo's fixed-point discipline
    * leans on: round half-away on doubles, round(x, 9), sequential
    * list folds, SUM/windowed-SUM/AVG accumulation, floor-of-ratio,
    * truncating integer division, ln/sqrt/pow at q9, the
    * list_reduce modular fold (the IBAN mod-97 shape), and global
    * regex extract/replace semantics (the PII/boilerplate shape). */
  private val envProbes = Seq("avg_is_sum_div_count", "floor_ratio",
    "fold_seq_absorb", "fold_tenths", "int_div_trunc", "list_reduce_fold",
    "ln_q9", "pow_q9", "regex_global", "round9", "round_half_away",
    "sqrt_q9", "sum_tenths", "win_sum_tenths")

  private val reportEnvSql: String =
    """WITH vp AS (SELECT string_split(substr(version(), 2), '.') AS parts),
      |ver AS (SELECT (CAST(parts[1] AS BIGINT) * 100 + CAST(parts[2] AS BIGINT)) * 100 AS enc FROM vp),
      |probes(name, pass) AS (VALUES
      |  ('avg_is_sum_div_count', (SELECT avg(x) FROM (SELECT unnest(list_transform(range(1000), y -> 0.1::DOUBLE)) AS x)) = (SELECT sum(x) FROM (SELECT unnest(list_transform(range(1000), y -> 0.1::DOUBLE)) AS x)) / 1000.0),
      |  ('floor_ratio', floor(49999999.0::DOUBLE / 3.0 / 512 * 1e6) = 32552082682.0),
      |  ('fold_seq_absorb', list_sum([1e16::DOUBLE, 3.0::DOUBLE, 3.0::DOUBLE, -1e16::DOUBLE]) = 8.0),
      |  ('fold_tenths', list_sum(list_transform(range(1000), x -> 0.1::DOUBLE)) = 99.9999999999986),
      |  ('int_div_trunc', (-7) // 2 = -3),
      |  ('list_reduce_fold', list_reduce(list_prepend(0, [7, 8, 9]), (a, x) -> (a * 10 + x) % 97) = 13),
      |  ('ln_q9', floor(ln(7.0::DOUBLE) * 1e9) = 1945910149.0),
      |  ('regex_global', len(regexp_extract_all('a1b22c333 4444', '[0-9]+')) = 4 AND regexp_replace('x   y  z', '\s+', ' ', 'g') = 'x y z' AND regexp_extract_all('GB82WEST12', '[A-Z]{2}[0-9]{2}')[1] = 'GB82'),
      |  ('pow_q9', floor(power(1.1::DOUBLE, 7) * 1e9) = 1948717100.0),
      |  ('round9', round(0.1234567895::DOUBLE, 9) = 0.12345679::DOUBLE AND round(2.675::DOUBLE, 2) = 2.68::DOUBLE),
      |  ('round_half_away', round(2.5::DOUBLE) = 3.0 AND round(3.5::DOUBLE) = 4.0 AND round(-2.5::DOUBLE) = -3.0),
      |  ('sqrt_q9', floor(sqrt(2.0::DOUBLE) * 1e9) = 1414213562.0),
      |  ('sum_tenths', (SELECT sum(x) FROM (SELECT unnest(list_transform(range(1000), y -> 0.1::DOUBLE)) AS x)) = 99.9999999999986),
      |  ('win_sum_tenths', (SELECT max(s) FROM (SELECT sum(x) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING) AS s FROM (SELECT unnest(range(1000)) AS i, unnest(list_transform(range(1000), y -> 0.1::DOUBLE)) AS x))) = 99.9999999999999))
      |SELECT 'duckdb:' || lpad(CAST(i AS VARCHAR), 6, '0') AS probe
      |FROM (SELECT unnest(range((SELECT enc FROM ver))) AS i)
      |UNION ALL
      |SELECT 'pass:' || name AS probe FROM probes WHERE pass
      |ORDER BY ALL""".stripMargin

  /** Driver-side quantization of the shipped mixture weights —
    * the TextStats.quantWeights mirror (same Scala arithmetic), so
    * the oracle's weight literals are the EXACT integers the Spark
    * side emits. Normalization over the PRESENT planned sources
    * (Σ_present wq) happens engine-side on both sides — exact int64,
    * so either engine computes the identical targets. */
  private val mixWeights = Seq("src0" -> 4.0, "src1" -> 2.0,
    "src2" -> 1.0, "src3" -> 1.0)
  private val mixWq: Seq[(String, Long)] = {
    val sw = mixWeights.map(_._2).sum
    mixWeights.map { case (k, v) => k -> math.floor(v / sw * 1e6).toLong }
  }
  /** Integer wq literals as a SQL CASE over `ref` (a source column) —
    * BIGINT-typed so `wq * 1000000` can never overflow INT32. */
  private def mixWqCase(ref: String): String =
    s"CASE $ref " + mixWq.map {
      case (k, q) => s"WHEN '$k' THEN CAST($q AS BIGINT)"
    }.mkString(" ") + " ELSE CAST(0 AS BIGINT) END"

  def entries: Seq[Entry] = Seq(
    // standing oracle-environment canary (the r14 driver-red trio
    // could not be reproduced against DuckDB 1.0.0 — this entry makes
    // any oracle-engine drift diagnosable in ONE round, in-band). The
    // Spark side emits the EXPECTED frame for a DuckDB 1.0.0 oracle:
    // (major·100+minor)·100 = 10 000 version rows plus the 14 probes
    // above, all of which 1.0.0 passes. The oracle derives its frame
    // from version() and live arithmetic. Green ⇒ the driver's oracle
    // engine is probe-identical to DuckDB 1.0.0. Red ⇒ oracle_rows
    // decodes the engine: (major·100 + minor)·100 + #passing probes.
    Entry("report_env", reportEnvSql) { (s, _) =>
      val vers = s.range(10000).select(
        concat(lit("duckdb:"), lpad(col("id").cast("string"), 6, "0"))
          .as("probe"))
      import s.implicits._
      val passes = envProbes.toDF("n")
        .select(concat(lit("pass:"), col("n")).as("probe"))
      ordered(vers.unionAll(passes))
    },
    // TYPE canary — the round-15 post-mortem instrumented: the oracle
    // deliberately emits ONE uncast sum()-derived column (HUGEINT in
    // DuckDB) next to its CAST twin, while Spark emits both as plain
    // BIGINT with the identical value (1000 × 1000000007). EXPECTED
    // DRIVER RESULT: rows/schema match, hash MISMATCH — the driver's
    // typed dataframe/arrow compare renders HUGEINT as
    // float64/decimal128 ("1000000007000.0" vs "1000000007000").
    // A hash MATCH here would falsify the round-15 mechanism (the
    // driver canonicalizes types) and reopen the trio diagnosis.
    // Local tools pass it by construction (fetchall + canon types) and
    // exempt it from the type lint by name (TYPE_CANARY) — the
    // asymmetry between the local green and the driver red IS the
    // measurement. Keep red forever; it guards the whole oracle suite
    // against the one bug class local replay cannot see.
    Entry("report_env_types",
      """SELECT 'hugeint_sum' AS probe,
        |       sum(x) AS uncast_q,
        |       CAST(sum(x) AS BIGINT) AS cast_q
        |FROM (SELECT 1000000007::BIGINT AS x FROM range(1000))""".stripMargin) {
      (s, _) =>
        s.range(1).select(lit("hugeint_sum").as("probe"),
          lit(1000000007000L).as("uncast_q"),
          lit(1000000007000L).as("cast_q"))
    },
    // ---- deduplication ----
    // per-doc n-gram novelty: fraction of the doc's distinct shingles
    // appearing in NO other document (df = 1), exact ratio x1e6
    Entry("text_novelty",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
        |       FROM toks WHERE len(w) >= 3),
        |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
        |SELECT sh.doc_id, count(*) AS n_shingles,
        |       CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |       CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 1000000) // count(*) AS BIGINT) AS novelty_q6
        |FROM sh JOIN df USING (shingle) GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.noveltyScore(docs(s, d), n = 3))
    },
    Entry("dedup_exact",
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.exactGroups(docs(s, d)))
    },
    Entry("dedup_exact_norm",
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        |       min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.exactGroups(docs(s, d), normalize = true))
    },
    Entry("dedup_ngram_jaccard", JACCARD_SQL) {
      (s, d) => ordered(Dedup.ngramJaccardPairs(docs(s, d), n = 3, theta = 0.5))
    },
    // the SCALE path of the inverted-index join: shingles with
    // df > maxDf are dropped before the self-join (bounding any join
    // key's fan-out at maxDf²) while sizes still count all shingles —
    // this entry pins the capped semantics exactly, not just the
    // cap-off variant above
    Entry("dedup_ngram_jaccard_capped", jaccardCappedSql("10")) {
      (s, d) => ordered(Dedup.ngramJaccardPairs(docs(s, d), n = 3, theta = 0.5,
        maxDf = 10L))
    },
    // decontamination: flag docs sharing any probe n-gram (train/test
    // leakage check); probe side broadcast, corpus side narrow
    Entry("dedup_contamination",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
        |       FROM toks WHERE len(w) >= 3),
        |ptoks AS (SELECT string_split_regex(trim(text), '\s+') AS w
        |          FROM (VALUES ('key agg row scan'), ('batch window spark')) p(text)),
        |psh AS (SELECT DISTINCT unnest(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        |        FROM ptoks WHERE len(w) >= 3)
        |SELECT doc_id, count(*) AS hits, min(shingle) AS first_hit
        |FROM sh JOIN psh USING (shingle)
        |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.contamination(docs(s, d),
        Seq("key agg row scan", "batch window spark")))
    },
    // span-level decontamination: which token positions start a
    // probe-matching n-gram (excise the span, keep the document)
    Entry("dedup_contamination_spans",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |win AS (SELECT doc_id, unnest(range(len(w) - 2)) AS pos,
        |         unnest(list_transform(range(len(w) - 2), i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        |        FROM toks WHERE len(w) >= 3),
        |ptoks AS (SELECT string_split_regex(trim(text), '\s+') AS w
        |          FROM (VALUES ('key agg row scan'), ('batch window spark')) p(text)),
        |psh AS (SELECT DISTINCT unnest(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' '))) AS shingle
        |        FROM ptoks WHERE len(w) >= 3)
        |SELECT doc_id, pos, shingle FROM win JOIN psh USING (shingle)
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.contaminationSpans(docs(s, d),
        Seq("key agg row scan", "batch window spark")))
    },
    // incremental dedup: the delta (doc_id >= 250) banded-joined
    // against the seen corpus (doc_id < 250) only — no side ever
    // self-joins; exact verify at theta 0.8, where the banded miss
    // probability is ~5e-8 for ANY qualifying pair (corpus-independent,
    // unlike the theta-0.5 entries whose bound leans on planted >= 0.9
    // similarities), so the oracle is the exact cross-boundary pair set
    Entry("dedup_incremental",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
        |       FROM toks WHERE len(w) >= 3),
        |sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |it AS (SELECT a.doc_id AS seen_id, b.doc_id AS new_id, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle
        |       WHERE a.doc_id < 250 AND b.doc_id >= 250
        |       GROUP BY 1, 2)
        |SELECT seen_id, new_id,
        |       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
        |FROM it JOIN sz sa ON sa.doc_id = seen_id JOIN sz sb ON sb.doc_id = new_id
        |WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.8
        |ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val all = docs(s, d)
        ordered(Dedup.incrementalMinhash(
          all.where(col("doc_id") >= 250), all.where(col("doc_id") < 250)))
      }
    },
    // the index-only incremental: the same seen/new split matched
    // using ONLY the standing portable signature index for history
    // (estimated-Jaccard verify = agreeing components / 128 — seen
    // text never re-read; the exact-verify entry above is its
    // correctness reference). The portable affine family is exact
    // int64 in both engines, so the oracle replays the exact
    // signatures, band collisions, AND estimates
    Entry("dedup_incremental_index", {
      val aList = (0 until 128).map(Dedup.mhA).mkString("[", ", ", "]")
      val bList = (0 until 128).map(Dedup.mhB).mkString("[", ", ", "]")
      s"""WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |shg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(len(w) - 2),
         |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
         |       FROM toks WHERE len(w) >= 3),
         |hx AS (SELECT doc_id, (CAST(list_sum(list_transform(range(15), k ->
         |      CAST(strpos('0123456789abcdef', substring(md5(shingle), k+1, 1)) - 1 AS BIGINT)
         |        << (4*(14-k)))) AS BIGINT)) % 2147483647 AS h0p FROM shg),
         |ab AS (SELECT $aList AS al, $bList AS bl),
         |mh AS (SELECT doc_id, i, min((al[i+1] * h0p + bl[i+1]) % 2147483647) AS mv
         |       FROM hx, ab, range(128) r(i) GROUP BY 1, 2),
         |bk AS (SELECT doc_id, i // 4 AS band,
         |        md5(string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i)) AS bkey
         |       FROM mh GROUP BY doc_id, i // 4),
         |cand AS (SELECT DISTINCT a.doc_id AS seen_id, b.doc_id AS new_id
         |         FROM bk a JOIN bk b ON a.band = b.band AND a.bkey = b.bkey
         |         WHERE a.doc_id < 250 AND b.doc_id >= 250),
         |ag AS (SELECT c.seen_id, c.new_id,
         |        CAST(count(*) FILTER (WHERE ma.mv = mb.mv) AS BIGINT) AS k
         |       FROM cand c
         |       JOIN mh ma ON ma.doc_id = c.seen_id
         |       JOIN mh mb ON mb.doc_id = c.new_id AND mb.i = ma.i
         |       GROUP BY 1, 2)
         |SELECT seen_id, new_id,
         |  CAST(k * 1000000 // 128 AS BIGINT) AS est_jaccard_q6
         |FROM ag WHERE k * 1000000 // 128 >= 800000 ORDER BY ALL""".stripMargin
    }) {
      (s, d) => {
        val all = docs(s, d)
        ordered(Dedup.incrementalFromIndex(
          all.where(col("doc_id") >= 250),
          Dedup.minhashIndex(all.where(col("doc_id") < 250))))
      }
    },
    // per-source duplication report: contribution + near-dup fraction
    // per source (the drop/down-weight decision table); same cluster
    // walk as dedup_clusters, counts exact, rate floor-quantized
    Entry("report_dup_rate",
      s"""WITH RECURSIVE $SH,
         |p AS (SELECT id_a, id_b FROM it
         |      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |      WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |walk(id, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst),
         |cl AS (SELECT id AS doc_id, min(lbl) AS lbl FROM walk GROUP BY 1),
         |dup AS (SELECT doc_id FROM cl WHERE doc_id <> lbl),
         |per AS (SELECT d.source, CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
         |        FROM documents d LEFT JOIN dup USING (doc_id))
         |SELECT source, count(*) AS n_docs, CAST(sum(is_dup) AS BIGINT) AS n_dups,
         |       CAST(sum(is_dup) * 1000000 // count(*) AS BIGINT) AS dup_rate_q6
         |FROM per GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.dupRateBySource(docs(s, d)))
    },
    // per-source quality rollup: the curation run's first read —
    // near-dup fraction + Gopher gate pass rate + Zipf slope per
    // source, each stage the verified operator unchanged (the oracle
    // composes the three verified walks over shared CTEs). Oracle
    // scope: the dup stage's oracle is the EXACT Jaccard pair walk,
    // while the Spark side is banded MinHash-LSH + maxBucket — the
    // pin holds because at this SF the banded pair set equals the
    // exact one (verified, not guaranteed on an arbitrary corpus;
    // Curate.sourceQualityReport's docstring carries the recall
    // bound, dedup_recall_eval measures the gap)
    Entry("text_source_quality",
      s"""WITH RECURSIVE $SH,
         |jp AS (SELECT id_a, id_b FROM it
         |      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |      WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM jp
         |      UNION SELECT id_b, id_a FROM jp),
         |walk(id, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst),
         |cl AS (SELECT id AS doc_id, min(lbl) AS lbl FROM walk GROUP BY 1),
         |dupd AS (SELECT doc_id FROM cl WHERE doc_id <> lbl),
         |duprate AS (SELECT d.source, CAST(count(*) AS BIGINT) AS dup_dups
         |       FROM dupd JOIN documents d USING (doc_id) GROUP BY 1),
         |gt AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents),
         |gtc AS (SELECT doc_id, term, count(*) AS c FROM gt GROUP BY 1, 2),
         |gd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c,
         |       count(*) AS n_distinct, sum(c * length(term)) AS char_sum
         |      FROM gtc GROUP BY 1),
         |gs AS (SELECT doc_id,
         |       (n_words BETWEEN 50 AND 100000)
         |       AND (CAST(char_sum * 1000000 // n_words AS BIGINT) BETWEEN 3000000 AND 10000000)
         |       AND CAST(n_distinct * 1000000 // n_words AS BIGINT) > 300000
         |       AND CAST(top_c * 1000000 // n_words AS BIGINT) < 200000 AS passes
         |      FROM gd),
         |gates AS (SELECT d.source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN gs.passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |       CAST(sum(CASE WHEN gs.passes THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS pass_rate_q6
         |      FROM documents d JOIN gs USING (doc_id) GROUP BY 1),
         |zt AS (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents),
         |zf AS (SELECT source, w, count(*) AS freq FROM zt GROUP BY 1, 2 HAVING count(*) >= 2),
         |zr AS (SELECT source,
         |       CAST(floor(ln(CAST(row_number() OVER (PARTITION BY source ORDER BY freq DESC, w) AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
         |       CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000.0) AS BIGINT) AS y
         |      FROM zf),
         |za AS (SELECT source, count(*) AS n_terms, CAST(sum(x) AS BIGINT) AS sx,
         |       CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
         |       CAST(sum(x * x) AS BIGINT) AS sxx FROM zr GROUP BY 1),
         |zipf AS (SELECT source, n_terms,
         |       CAST(floor(CAST(n_terms * sxy - sx * sy AS DOUBLE)
         |                  / CAST(n_terms * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT) AS slope_q6
         |      FROM za WHERE n_terms * sxx - sx * sx > 0)
         |SELECT gates.source, n_docs, n_pass, pass_rate_q6, n_terms, slope_q6,
         |       CAST(coalesce(dup_dups, 0) AS BIGINT) AS dup_dups,
         |       CAST(coalesce(dup_dups, 0) * 1000000 // n_docs AS BIGINT) AS dup_rate_q6
         |FROM gates LEFT JOIN zipf USING (source) LEFT JOIN duprate USING (source)
         |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.llm.Curate.sourceQualityReport(docs(s, d)))
    },
    // cross-source overlap matrix: source-pair shingle-set Jaccard +
    // containment over distinct (source, shingle) — where duplication
    // lives BETWEEN sources, before any doc-level dedup
    Entry("dedup_source_overlap",
      """WITH toks AS (SELECT source, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |sh0 AS (SELECT source, unnest(list_distinct(list_transform(range(len(w) - 2),
        |                i -> array_to_string(w[i+1:i+3], ' ')))) AS shingle
        |       FROM toks WHERE len(w) >= 3),
        |sh AS (SELECT DISTINCT source, shingle FROM sh0),
        |sz AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
        |it AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
        |       GROUP BY 1, 2)
        |SELECT src_a, src_b, inter,
        |       round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard,
        |       round(inter / CAST(least(sa.sz, sb.sz) AS DOUBLE), 6) AS containment
        |FROM it JOIN sz sa ON sa.source = src_a JOIN sz sb ON sb.source = src_b
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.sourceOverlap(docs(s, d)))
    },
    // LSH-bucketed scale path; candidates are exactly verified, and at
    // the planted-pair similarities (>= 0.9) the 32x4-band miss
    // probability is ~4e-8, so the output equals the exact pair set.
    Entry("dedup_minhash_lsh", JACCARD_SQL) {
      (s, d) => ordered(Dedup.minhashLshPairs(docs(s, d), n = 3,
        numHashes = 128, bands = 32, theta = 0.5))
    },
    // the skew-guarded variant (band buckets capped at 16 docs before
    // the candidate self-join — the scale run's worst term): on a
    // corpus whose duplicate groups are smaller than the cap the
    // verified pair set is EXACT, which is what the shared oracle
    // pins; the mega-group recall tradeoff is pinned by DedupSpec
    Entry("dedup_minhash_capped", JACCARD_SQL) {
      (s, d) => ordered(Dedup.minhashLshPairs(docs(s, d), n = 3,
        numHashes = 128, bands = 32, theta = 0.5, maxBucket = 16L))
    },
    // connected components over the near-dup pair set: one keeper per
    // duplicate CLUSTER (not per pair); the oracle walks the same
    // graph with a recursive CTE
    Entry("dedup_clusters",
      s"""WITH RECURSIVE $SH,
         |p AS (SELECT id_a, id_b FROM it
         |      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |      WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |walk(id, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst)
         |SELECT id AS doc_id, min(lbl) AS cluster_id, (id = min(lbl)) AS keep
         |FROM walk GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.dupClusters(
        Dedup.ngramJaccardPairs(docs(s, d), n = 3, theta = 0.5)))
    },
    // quality-aware representatives: same cluster walk, but keep the
    // LONGEST member (n_chars, ties → lowest doc_id) instead of the
    // arbitrary min-id — the selection a curation run ships; the
    // oracle's row_number tie-break is exactly the Spark side's
    // max(struct(quality, -doc_id)) argmax. Pair stage = CAPPED
    // MinHash-LSH, not the exact inverted-index join: a full-corpus
    // keeper pass hits the Σdf²-quadratic truth-join shape on any
    // duplicate-dense corpus (measured 21× wall for 10× data on the
    // replica corpus before the swap; maxBucket bounds bucket fan-out
    // by construction), and at the correctness SF the capped banded
    // pair set equals the exact one (the dedup_minhash_capped
    // argument), so the exact-walk oracle pins it unchanged
    Entry("dedup_cluster_best",
      s"""WITH RECURSIVE $SH,
         |p AS (SELECT id_a, id_b FROM it
         |      JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |      WHERE round(inter / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) >= 0.5),
         |e AS (SELECT id_a AS src, id_b AS dst FROM p
         |      UNION SELECT id_b, id_a FROM p),
         |walk(id, lbl) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst),
         |cl AS (SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY 1),
         |mq AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars AS quality
         |       FROM cl JOIN documents d USING (doc_id))
         |SELECT doc_id, cluster_id, quality,
         |       (row_number() OVER (PARTITION BY cluster_id
         |          ORDER BY quality DESC, doc_id ASC) = 1) AS keep
         |FROM mq ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.clusterRepresentatives(docs(s, d),
        Dedup.minhashLshPairs(docs(s, d), n = 3, numHashes = 128,
          bands = 32, theta = 0.5, maxBucket = 16L)))
    },
    // deterministic stratified sampling: md5(doc_id)-derived uniform
    // draw vs per-language rates — reproducible across engines, which
    // is exactly what the bit-identical oracle pins
    Entry("sample_stratified",
      """WITH h AS (SELECT doc_id, lang,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT doc_id, lang FROM h
        |WHERE CAST(hv AS DOUBLE) <
        |  (CASE lang WHEN 'zh' THEN 1.0 WHEN 'en' THEN 0.5 ELSE 0.1 END) * 1152921504606846976.0
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.sampleStratified(docs(s, d),
        Map("zh" -> 1.0, "en" -> 0.5), defaultRate = 0.1))
    },
    // weighted source mixing: rate_s = w_s*T/n_s with T = min n_s/w_s
    // computed from the corpus itself — the argmin source keeps all,
    // the rest downsample to the target proportions; same md5 draw
    Entry("sample_mixture",
      """WITH h AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents),
        |cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |wt AS (SELECT source, n,
        |        CASE source WHEN 'src0' THEN 4.0 WHEN 'src1' THEN 2.0
        |                    WHEN 'src2' THEN 1.0 WHEN 'src3' THEN 1.0
        |                    ELSE 0.0 END AS w
        |       FROM cnt),
        |t AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM wt WHERE w > 0)
        |SELECT doc_id, source FROM h JOIN wt USING (source), t
        |WHERE wt.w > 0 AND CAST(hv AS DOUBLE) <
        |      wt.w * t.t / CAST(wt.n AS DOUBLE) * 1152921504606846976.0
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.sampleMixture(docs(s, d),
        Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)))
    },
    // the sampling family's trust-gate row: replay the mixture draw
    // and report achieved-vs-target proportions per weighted source
    // (the recall@k / backtest pattern aimed at sampling)
    Entry("sample_mixture_report",
      s"""WITH h AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents),
        |cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |wt AS (SELECT source, n,
        |        CASE source WHEN 'src0' THEN 4.0 WHEN 'src1' THEN 2.0
        |                    WHEN 'src2' THEN 1.0 WHEN 'src3' THEN 1.0
        |                    ELSE 0.0 END AS w,
        |        ${mixWqCase("source")} AS wq
        |       FROM cnt),
        |t AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM wt WHERE w > 0),
        |swp AS (SELECT CAST(sum(wq) AS BIGINT) AS swqp FROM wt WHERE w > 0),
        |samp AS (SELECT h.doc_id, h.source FROM h JOIN wt USING (source), t
        |         WHERE wt.w > 0 AND CAST(hv AS DOUBLE) <
        |               wt.w * t.t / CAST(wt.n AS DOUBLE) * 1152921504606846976.0),
        |sc AS (SELECT source, count(*) AS n_sampled FROM samp GROUP BY 1),
        |tots AS (SELECT count(*) AS n_total FROM samp)
        |SELECT wt.source, wt.n AS n_docs,
        |       coalesce(sc.n_sampled, 0) AS n_sampled,
        |       CAST(wt.wq * 1000000 // swp.swqp AS BIGINT) AS target_q6,
        |       CAST(coalesce(sc.n_sampled, 0) * 1000000 // tots.n_total AS BIGINT) AS achieved_q6,
        |       CAST(coalesce(sc.n_sampled, 0) * 1000000 // tots.n_total AS BIGINT)
        |         - CAST(wt.wq * 1000000 // swp.swqp AS BIGINT) AS err_q6
        |FROM wt CROSS JOIN tots CROSS JOIN swp
        |LEFT JOIN sc ON sc.source = wt.source
        |WHERE wt.w > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.mixtureReport(docs(s, d),
        Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)))
    },
    // token-budget mixture plan for a 100k-token budget: integer wq
    // literals on BOTH sides (the quantWeights mirror above),
    // normalized over the PRESENT planned sources engine-side (exact
    // int64 — the full budget is allocated even when a planned source
    // is absent, and the flooring remainder goes to the largest-wq
    // source so the targets sum to the budget EXACTLY); allocation
    // and epochs/rate use the split floor-division identity, capped
    // AFTER the scaled division
    Entry("text_mixture_plan", {
      val inList = mixWq.map { case (k, _) => s"'$k'" }.mkString(", ")
      s"""WITH per AS (SELECT source, count(*) AS n_docs,
         |        CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tokens
         |       FROM documents GROUP BY 1),
         |wt AS (SELECT source, n_docs, n_tokens,
         |        ${mixWqCase("source")} AS wq
         |       FROM per WHERE source IN ($inList)),
         |swp AS (SELECT CAST(sum(wq) AS BIGINT) AS s FROM wt),
         |a AS (SELECT wt.*,
         |        CAST(wt.wq * 1000000 // swp.s AS BIGINT) AS target_share_q6,
         |        CAST(100000 // swp.s * wt.wq
         |          + 100000 % swp.s * wt.wq // swp.s AS BIGINT) AS target_tokens
         |      FROM wt CROSS JOIN swp),
         |al AS (SELECT CAST(coalesce(sum(target_tokens), 0) AS BIGINT) AS alloc FROM a),
         |b AS (SELECT a.*, row_number() OVER (ORDER BY wq DESC, source) AS rn FROM a),
         |b2 AS (SELECT source, n_docs, n_tokens, target_share_q6,
         |        CAST(CASE WHEN rn = 1 THEN target_tokens + 100000 - al.alloc
         |             ELSE target_tokens END AS BIGINT) AS target_tokens
         |       FROM b CROSS JOIN al),
         |g AS (SELECT b2.*,
         |        CAST(target_tokens // n_tokens * 1000000
         |          + (target_tokens % n_tokens) * 1000000 // n_tokens AS BIGINT) AS epochs_q6
         |      FROM b2)
         |SELECT source, n_docs, n_tokens, target_share_q6, target_tokens,
         |  least(epochs_q6, 1000000) AS rate_q6,
         |  epochs_q6
         |FROM g ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(TextStats.mixturePlan(docs(s, d),
        Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0),
        budgetTokens = 100000L))
    },
    // weighted sampling without replacement (Efraimidis-Spirakis
    // exponential races, weight = n_chars): smallest 50 keys win
    Entry("sample_weighted",
      """WITH h AS (SELECT doc_id, n_chars,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents),
        |k AS (SELECT doc_id, n_chars,
        |       CAST(floor(-ln((CAST(hv AS DOUBLE) + 1) / 1152921504606846976.0) / n_chars * 1e9) AS BIGINT) AS key_q9
        |      FROM h)
        |SELECT doc_id, n_chars, key_q9 FROM k
        |ORDER BY key_q9, doc_id LIMIT 50""".stripMargin) {
      (s, d) => ordered(TextStats.sampleWeighted(docs(s, d),
        weightCol = "n_chars", n = 50))
    },
    // temperature-weighted source sampling (p_s ∝ n_s^0.3): weights
    // derived from source sizes, scale cancels in the rate, smallest
    // source keeps everything
    Entry("sample_temperature",
      """WITH h AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents),
        |cnt AS (SELECT source, count(*) AS n,
        |        pow(CAST(count(*) AS DOUBLE), 0.3) AS w
        |       FROM documents GROUP BY 1),
        |t AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM cnt)
        |SELECT doc_id, source FROM h JOIN cnt USING (source), t
        |WHERE CAST(hv AS DOUBLE) <
        |      cnt.w * t.t / CAST(cnt.n AS DOUBLE) * 1152921504606846976.0
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.sampleTemperature(docs(s, d), alpha = 0.3))
    },
    // temperature (alpha) tuning curve: per setting the deterministic
    // draw replayed + achieved-vs-target shares; weights are ONE pow
    // per source normalized by the max pow before x1e9 quantization
    // (int64 at any corpus size), everything after exact `·1e6 DIV`
    Entry("sample_temperature_curve", {
      val as = Seq(0.3, 0.5, 0.7, 1.0)
      def q(a: Double) = math.round(a * 100)
      val per = as.map { a =>
        val i = q(a)
        s"""cnt_$i AS (SELECT source, count(*) AS n,
           |        pow(CAST(count(*) AS DOUBLE), $a) AS w
           |       FROM documents GROUP BY 1),
           |t_$i AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM cnt_$i),
           |wm_$i AS (SELECT max(w) AS wm FROM cnt_$i),
           |sw_$i AS (SELECT CAST(sum(CAST(floor(w / wm * 1e9) AS BIGINT)) AS BIGINT) AS swq
           |          FROM cnt_$i, wm_$i),
           |samp_$i AS (SELECT h.doc_id, h.source
           |            FROM h JOIN cnt_$i USING (source), t_$i
           |            WHERE CAST(hv AS DOUBLE) <
           |              cnt_$i.w * t_$i.t / CAST(cnt_$i.n AS DOUBLE) * 1152921504606846976.0),
           |sc_$i AS (SELECT source, count(*) AS n_sampled FROM samp_$i GROUP BY 1),
           |tot_$i AS (SELECT count(*) AS n_total FROM samp_$i),
           |r_$i AS (SELECT CAST($i AS BIGINT) AS alpha_q2, c.source,
           |  CAST(c.n AS BIGINT) AS n_docs,
           |  CAST(coalesce(sc_$i.n_sampled, 0) AS BIGINT) AS n_sampled,
           |  CAST(CAST(floor(c.w / wm_$i.wm * 1e9) AS BIGINT) * 1000000
           |    // sw_$i.swq AS BIGINT) AS target_q6,
           |  CAST(coalesce(sc_$i.n_sampled, 0) * 1000000
           |    // tot_$i.n_total AS BIGINT) AS achieved_q6
           | FROM cnt_$i c CROSS JOIN wm_$i CROSS JOIN sw_$i CROSS JOIN tot_$i
           | LEFT JOIN sc_$i ON sc_$i.source = c.source)""".stripMargin
      }.mkString(",\n")
      val union = as.map(a => s"SELECT * FROM r_${q(a)}")
        .mkString(" UNION ALL ")
      s"""WITH h AS (SELECT doc_id, source,
         |  CAST(list_sum(list_transform(range(15), k ->
         |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
         |      << (4*(14-k)))) AS BIGINT) AS hv
         |  FROM documents),
         |$per
         |SELECT alpha_q2, source, n_docs, n_sampled, target_q6, achieved_q6,
         |  achieved_q6 - target_q6 AS err_q6
         |FROM ($union) u ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(TextStats.temperatureCurve(docs(s, d),
        alphas = Seq(0.3, 0.5, 0.7, 1.0)))
    },
    // the composed curation pipeline: gates -> exact-dedup keepers ->
    // weighted mixture, each stage the verified operator unchanged;
    // the oracle replays the full chain including the stage-3 rates
    // computed from the CURATED (post-gate, post-dedup) counts
    Entry("pipeline_curate",
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c,
        |       count(*) AS n_distinct, sum(c * length(term)) AS char_sum
        |      FROM tc GROUP BY 1),
        |s AS (SELECT doc_id, n_words,
        |       CAST(char_sum * 1000000 // n_words AS BIGINT) AS mean_len_q6,
        |       CAST(n_distinct * 1000000 // n_words AS BIGINT) AS diversity_q6,
        |       CAST(top_c * 1000000 // n_words AS BIGINT) AS top_word_frac_q6
        |      FROM d),
        |gated AS (SELECT doc_id FROM s
        |          WHERE (n_words BETWEEN 50 AND 100000) AND (mean_len_q6 BETWEEN 3000000 AND 10000000)
        |            AND diversity_q6 > 300000 AND top_word_frac_q6 < 200000),
        |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
        |cur AS (SELECT doc.doc_id, doc.source FROM documents doc
        |        JOIN gated USING (doc_id) JOIN k USING (doc_id)),
        |h AS (SELECT doc_id, source,
        |  CAST(list_sum(list_transform(range(15), j ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), j+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-j)))) AS BIGINT) AS hv
        |  FROM cur),
        |cnt AS (SELECT source, count(*) AS n FROM cur GROUP BY 1),
        |wt AS (SELECT source, n,
        |        CASE source WHEN 'src0' THEN 4.0 WHEN 'src1' THEN 2.0
        |                    WHEN 'src2' THEN 1.0 WHEN 'src3' THEN 1.0
        |                    ELSE 0.0 END AS w
        |       FROM cnt),
        |tm AS (SELECT min(CAST(n AS DOUBLE) / w) AS t FROM wt WHERE w > 0)
        |SELECT doc_id, source FROM h JOIN wt USING (source), tm
        |WHERE wt.w > 0 AND CAST(hv AS DOUBLE) <
        |      wt.w * tm.t / CAST(wt.n AS DOUBLE) * 1152921504606846976.0
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(graft.llm.Curate.curate(docs(s, d),
        Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0)))
    },
    // Gopher-style combined quality gates: one explode + two hash
    // aggs per doc; every stat, gate, and the conjunction oracled
    Entry("text_gopher_gates",
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM t GROUP BY 1, 2),
        |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_c,
        |       count(*) AS n_distinct, sum(c * length(term)) AS char_sum
        |      FROM tc GROUP BY 1),
        |s AS (SELECT doc_id, n_words,
        |       CAST(char_sum * 1000000 // n_words AS BIGINT) AS mean_len_q6,
        |       CAST(n_distinct * 1000000 // n_words AS BIGINT) AS diversity_q6,
        |       CAST(top_c * 1000000 // n_words AS BIGINT) AS top_word_frac_q6
        |      FROM d)
        |SELECT doc_id, n_words, mean_len_q6, diversity_q6, top_word_frac_q6,
        |       (n_words BETWEEN 50 AND 100000) AND (mean_len_q6 BETWEEN 3000000 AND 10000000)
        |       AND diversity_q6 > 300000 AND top_word_frac_q6 < 200000 AS passes
        |FROM s ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.gopherGates(docs(s, d)))
    },
    // vocabulary induction + OOV coverage: top-100 corpus terms by
    // frequency (ties -> term asc) as the vocab, per-doc OOV rate
    Entry("text_vocab_oov",
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |cnt AS (SELECT term, count(*) AS c FROM t GROUP BY 1),
        |vocab AS (SELECT term FROM cnt
        |          QUALIFY row_number() OVER (ORDER BY c DESC, term) <= 100),
        |d AS (SELECT doc_id, count(*) AS n_tokens,
        |       CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
        |      FROM t LEFT JOIN vocab v ON v.term = t.term GROUP BY 1)
        |SELECT doc_id, n_tokens, n_oov,
        |       CAST(n_oov * 1000000 // n_tokens AS BIGINT) AS oov_rate_q6
        |FROM d ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.vocabCoverage(docs(s, d), vocabSize = 100))
    },
    // sequence-packing prep: greedy contiguous bin assignment by
    // cumulative token count within independent streams (no global
    // window — each stream packs in parallel)
    Entry("pack_bins",
      """SELECT doc_id, doc_id % 8 AS stream,
        |  CAST(floor((sum(n) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING) - n) / 512.0) AS BIGINT) AS bin,
        |  n AS n_tokens
        |FROM (SELECT doc_id,
        |      CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |      FROM documents)
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.packBins(docs(s, d), contextLen = 512))
    },
    // packing trust gate: per-stream fill rate, oversize docs, and
    // boundary straddles over the same greedy cumsum assignment
    Entry("text_pack_efficiency",
      """WITH toks AS (SELECT doc_id, doc_id % 8 AS stream,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        | FROM documents),
        |c AS (SELECT stream, n,
        |  sum(n) OVER (PARTITION BY stream ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum,
        |  CAST(floor((sum(n) OVER (PARTITION BY stream ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) - n) / 512.0) AS BIGINT) AS bin
        | FROM toks)
        |SELECT stream, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_tokens, max(bin) + 1 AS n_bins,
        |  CAST(sum(n) * 1000000 // ((max(bin) + 1) * 512)
        |    AS BIGINT) AS fill_q6,
        |  CAST(sum(CASE WHEN n > 512 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oversize,
        |  CAST(sum(CASE WHEN (cum - n) // 512 != (cum - 1) // 512
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
        |FROM c GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.packEfficiency(docs(s, d), contextLen = 512))
    },
    // deterministic train/val/test assignment + reproducible global-
    // shuffle key (same md5 draw as sample_stratified)
    Entry("sample_split",
      """WITH h AS (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(15), k ->
        |    CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |      << (4*(14-k)))) AS BIGINT) AS hv
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN CAST(hv AS DOUBLE) < 0.90 * 1152921504606846976.0 THEN 'train'
        |       WHEN CAST(hv AS DOUBLE) < 0.95 * 1152921504606846976.0 THEN 'val'
        |       ELSE 'test' END AS split,
        |  md5('shuf:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM h ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.trainValTestSplit(docs(s, d)))
    },
    // overlapping context-window chunking (64-token windows, stride 48)
    Entry("text_chunks",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |c AS (SELECT doc_id, w, r.i AS chunk_idx FROM t, range(0, 64) r(i)
        |      WHERE r.i * 48 < len(w))
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |       CAST(least(len(w) - chunk_idx*48, 64) AS BIGINT) AS n_tokens,
        |       array_to_string(w[(chunk_idx*48+1) : (chunk_idx*48+64)], ' ') AS chunk
        |FROM c ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.chunkWindows(docs(s, d), size = 64, stride = 48))
    },
    // substring-level duplication gate: 5-token windows shared by >=2
    // distinct docs, counted per document (inverted window index — no
    // self-join, no candidate-density term)
    Entry("dedup_substring_spans",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |win AS (SELECT doc_id, md5(array_to_string(w[r.i+1 : r.i+5], ' ')) AS h
        |        FROM t, range(0, 200) r(i) WHERE r.i <= len(w) - 5),
        |sh AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM win GROUP BY 1)
        |       WHERE nd >= 2),
        |dup AS (SELECT doc_id, count(*) AS dupw FROM win
        |        WHERE h IN (SELECT h FROM sh) GROUP BY 1)
        |SELECT t.doc_id, CAST(greatest(len(w) - 4, 0) AS BIGINT) AS n_windows,
        |       CAST(COALESCE(dup.dupw, 0) AS BIGINT) AS n_dup_windows
        |FROM t LEFT JOIN dup ON dup.doc_id = t.doc_id ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.dupSpans(docs(s, d), n = 5))
    },
    // simhash is fully portable (md5-derived token hashes), so the
    // oracle recomputes the identical 60-bit signature in SQL
    Entry("dedup_simhash",
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(15), k ->
        |        CAST(strpos('0123456789abcdef', substring(md5(tok), k+1, 1)) - 1 AS BIGINT)
        |          << (4*(14-k)))) AS BIGINT) AS hv
        |      FROM t),
        |b AS (SELECT doc_id, j, sum(CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS tot
        |      FROM h, range(60) r(j) GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(CASE WHEN tot > 0 THEN 1::BIGINT << j ELSE 0 END) AS BIGINT) AS simhash
        |FROM b GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.simhash(docs(s, d)))
    },

    // banded Hamming search over the simhash fingerprints: Spark
    // buckets by 15-bit bands (pigeonhole recall for hamming <= 3),
    // the oracle checks the equivalent exact all-pairs form
    Entry("dedup_simhash_pairs", SIMHASH_PAIRS_SQL) {
      (s, d) => ordered(Dedup.simhashPairs(docs(s, d), maxDist = 3, bands = 4))
    },
    // dedup-recall audit (the ann_recall_eval pattern aimed at
    // dedup): per-jaccard-band recall of the simhash candidate set
    // against the exact n-gram truth. Non-vacuous by construction —
    // simhash estimates token-multiset cosine, not shingle jaccard,
    // so band recall genuinely degrades toward theta. The audit runs
    // on an ADAPTIVE md5-sampled slice of ~2500 docs (full corpus
    // below that, so sf0.01 is unsampled) — the exact truth side is
    // pair-quadratic in duplicate density, and the slice keeps its
    // cost constant in corpus scale; the oracle replays the same
    // draw, threshold, and both pair paths over the slice.
    Entry("dedup_recall_eval",
      s"""WITH sdocs AS (SELECT * FROM documents
         |  WHERE (CAST(list_sum(list_transform(range(15), k ->
         |      CAST(strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
         |        << (4*(14-k)))) AS BIGINT))
         |    % greatest(1, (SELECT count(*) FROM documents) // 2500) = 0),
         |tru AS (SELECT id_a, id_b, jaccard FROM (${JACCARD_SQL.replace("FROM documents", "FROM sdocs")}) j),
         |cand AS (SELECT id_a, id_b FROM (${SIMHASH_PAIRS_SQL.replace("FROM documents", "FROM sdocs")}) s),
         |mcand AS (SELECT id_a, id_b FROM tru),
         |jcand AS (SELECT id_a, id_b FROM (${
      // the slice modulus thins every shingle's df ~1/mod, so the
      // graded cap scales with it: greatest(1, 10 // mod) — the
      // modulus reads the FULL corpus count (the placeholder survives
      // the sdocs rewrite, which must not touch it)
      jaccardCappedSql("greatest(1, 10 // greatest(1, __FULLCOUNT__ // 2500))")
        .replace("FROM documents", "FROM sdocs")
        .replace("__FULLCOUNT__", "(SELECT count(*) FROM documents)")}) c)
         |SELECT CAST(least(floor(jaccard * 10), 9) AS BIGINT) AS band,
         |       count(*) AS n_true,
         |       CAST(count(cand.id_a) AS BIGINT) AS n_caught,
         |       count(cand.id_a) * 1000000 // count(*) AS recall_q6,
         |       CAST(count(mcand.id_a) AS BIGINT) AS mh_caught,
         |       count(mcand.id_a) * 1000000 // count(*) AS mh_recall_q6,
         |       CAST(count(jcand.id_a) AS BIGINT) AS jc_caught,
         |       count(jcand.id_a) * 1000000 // count(*) AS jc_recall_q6
         |FROM tru LEFT JOIN cand USING (id_a, id_b)
         |         LEFT JOIN mcand USING (id_a, id_b)
         |         LEFT JOIN jcand USING (id_a, id_b)
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      // mcand = tru is the oracle's STATEMENT that uncapped 128/32
      // banded MinHash recovers the exact pair set on this corpus
      // (the dedup_minhash_lsh oracle's own property) — the Spark
      // side runs the real signature->band->verify path, so any
      // banding miss turns the entry red rather than hiding
      (s, d) => ordered(Dedup.simhashRecallAudit(docs(s, d), n = 3,
        theta = 0.5, maxDist = 3, bands = 4))
    },
    // MinHash banding curve: per (bands, rows) split of 128 PORTABLE
    // affine minhashes (md5-derived a/b mod 2^31-1 — exact int64 in
    // both engines, so the oracle recomputes the exact signatures,
    // buckets, and therefore the exact MISSES the curve exists to
    // measure), band-bucket candidate recall per Jaccard decile vs
    // the exact truth over the shared adaptive slice + the measured
    // candidate count; converts Curate's (1-J^r)^b formula caveat
    // into a measurement at the operator's own settings
    Entry("dedup_band_curve", bandCurveSql("documents")) {
      (s, d) => ordered(Dedup.bandCurve(docs(s, d), n = 3, numHashes = 128,
        bandsList = Seq(16, 32, 64), theta = 0.5))
    },
    // the planted mid-J twin: the real corpus's near-dups all sit in
    // the J>=0.9 decile where every banding catches everything, so
    // the curve's MISS measurement is vacuous there (the pii
    // precedent) — 30 planted pairs at J = 13/23 ~ 0.565 make the
    // banding contrast real: (16,8) misses most of them, (64,2)
    // catches all, and the oracle replays the exact portable-hash
    // collisions either way
    Entry("dedup_band_curve_fixture",
      s"""WITH $BCFX,
         |${bandCurveSql("bcfx").stripPrefix("WITH ")}""".stripMargin) {
      (s, _) => ordered(Dedup.bandCurve(bcFx(s), n = 3, numHashes = 128,
        bandsList = Seq(16, 32, 64), theta = 0.5))
    },
    // minhashLshPairs' OTHER knob (the maxBucket skew guard) measured
    // the same way: per cap the decile recall after dropping over-cap
    // buckets + the candidate count the cap admitted — the evidence
    // behind the production cap 16 (Curate.sourceQualityReport); band
    // keys built once, each cap an anti-join over the shared
    // occupancy table
    Entry("dedup_bucket_curve", bucketCurveSql("documents")) {
      (s, d) => ordered(Dedup.bucketCurve(docs(s, d), n = 3,
        numHashes = 128, bands = 32, caps = Seq(0L, 4L, 16L),
        theta = 0.5))
    },
    // the planted occupancy twin: 20-doc + 8-doc identical clusters +
    // occupancy-2 near-dup pairs — cap 0 catches everything, cap 16
    // drops exactly the mega cluster's 190 pairs, cap 4 drops both
    // clusters' 218 while the pair band rides through every cap
    Entry("dedup_bucket_curve_fixture",
      s"""WITH $BKFX,
         |${bucketCurveSql("bkfx").stripPrefix("WITH ")}""".stripMargin) {
      (s, _) => ordered(Dedup.bucketCurve(bkFx(s), n = 3,
        numHashes = 128, bands = 32, caps = Seq(0L, 4L, 16L),
        theta = 0.5))
    },
    // SemDeDup recall audit: exact all-pairs cosine truth vs the
    // celled pair stage over the same adaptive md5 slice, recall per
    // similarity band — the trust-gate row for the one dedup family
    // member (semantic) that had no recall measurement; the truth
    // side is pair-quadratic, so the audit samples VECTORS adaptively
    // (~1000 at any sf), the dedup_recall_eval scale argument
    Entry("dedup_semantic_recall",
      """WITH semb AS (SELECT * FROM embeddings
        |  WHERE (CAST(list_sum(list_transform(range(15), k ->
        |      CAST(strpos('0123456789abcdef', substring(md5(CAST(vec_id AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |        << (4*(14-k)))) AS BIGINT))
        |    % greatest(1, (SELECT count(*) FROM embeddings) // 1000) = 0),
        |e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM semb),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e0),
        |tru AS (SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
        |  FROM n a JOIN n b ON a.vec_id < b.vec_id) WHERE sim >= 0.45),
        |c AS (SELECT count(*) AS n, count(DISTINCT label) AS l FROM e0),
        |bsel AS (SELECT coalesce(min(b), 32) AS bits FROM range(0, 33) r(b), c
        |         WHERE l * 256 * (1::BIGINT << b) >= n),
        |n0 AS (SELECT vec_id, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |        label::BIGINT * (1::BIGINT << bits) + coalesce(list_sum(
        |          list_transform(range(1, bits + 1), i ->
        |            CASE WHEN v[i] >= 0 THEN (1::BIGINT << (bits - i)) ELSE 0 END)), 0) AS cell
        |       FROM e0, bsel),
        |cand AS (SELECT * FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS s2
        |  FROM n0 a JOIN n0 b ON a.cell = b.cell AND a.vec_id < b.vec_id) WHERE s2 >= 0.45)
        |SELECT CAST(least(floor(sim * 10), 9) AS BIGINT) AS band,
        |       count(*) AS n_true,
        |       CAST(count(cand.id_a) AS BIGINT) AS n_caught,
        |       count(cand.id_a) * 1000000 // count(*) AS recall_q6
        |FROM tru LEFT JOIN cand USING (id_a, id_b)
        |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.semanticRecallAudit(emb(s, d),
        theta = 0.45, sampleTarget = 1000L))
    },
    // SemDeDup θ tuning curve: per θ what the celled dedup would DO
    // (pairs, touched docs) and MISS (recall vs the exact slice
    // truth) — one celled pass carries every θ (conditional
    // aggregates) and cell-sharing is θ-independent on the audit
    // side, so the grid costs one join each side (the nprobe side of
    // the per-setting contrast)
    Entry("dedup_semdedup_curve", semanticThetaSql("embeddings")) {
      (s, d) => ordered(Dedup.semanticThetaCurve(emb(s, d)))
    },
    // the planted-sim twin: random corpus vectors leave the θ ≥ 0.6
    // truth bands empty, so the real-corpus row is vacuous up there
    // (the band-curve fixture precedent); 18 integer vectors plant an
    // identical cluster, a cross-LABEL sim-1.0 pair (the paper's own
    // blind spot — recall < 1e6 at every θ), and 0.8 / 0.707 / 0.5
    // pairs that drop out of the counts as θ rises
    Entry("dedup_semdedup_curve_fixture",
      s"""WITH $STFX,
         |${semanticThetaSql("stfx").stripPrefix("WITH ")}""".stripMargin) {
      (s, _) => ordered(Dedup.semanticThetaCurve(stFx(s)))
    },
    // SemDeDup (Abbas et al. 2023): the paper's actual shape —
    // cluster first (upstream k-means `label` + an adaptive
    // sign-prefix sub-block holding cells at ~256 vectors), then
    // cosine-threshold pairs WITHIN cells only, then one keeper per
    // connected component. Work is occupancy-bounded (linear in the
    // corpus at fixed cell size); cross-cell pairs are missed exactly
    // as the paper never compares across k-means clusters (true
    // duplicates share cells — DedupSpec pins recall 1.0 on planted
    // dups). The oracle recomputes the same integer cells, so the
    // approximation itself is pinned. The all-pairs exact form stays
    // below as oracle-only dedup_semantic_exact.
    Entry("dedup_semantic_clusters",
      """WITH RECURSIVE e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT count(*) AS n, count(DISTINCT label) AS l FROM e0),
        |bsel AS (SELECT coalesce(min(b), 32) AS bits FROM range(0, 33) r(b), c
        |         WHERE l * 256 * (1::BIGINT << b) >= n),
        |n0 AS (SELECT vec_id, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |        label::BIGINT * (1::BIGINT << bits) + coalesce(list_sum(
        |          list_transform(range(1, bits + 1), i ->
        |            CASE WHEN v[i] >= 0 THEN (1::BIGINT << (bits - i)) ELSE 0 END)), 0) AS cell
        |       FROM e0, bsel),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
        |      FROM n0 a JOIN n0 b ON a.cell = b.cell AND a.vec_id < b.vec_id),
        |pp AS (SELECT id_a, id_b FROM p WHERE sim >= 0.45),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pp
        |      UNION SELECT id_b, id_a FROM pp),
        |walk(id, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst)
        |SELECT id AS doc_id, min(lbl) AS cluster_id, (id = min(lbl)) AS keep
        |FROM walk GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.semanticClusters(emb(s, d), theta = 0.45))
    },
    // the exact all-pairs variant: oracle-check-only (like
    // ann_cosine_pairs), excluded from Bench.headline — O(n²) scoring
    // is the correctness reference the celled operator is judged
    // against, not a scale path
    Entry("dedup_semantic_exact",
      """WITH RECURSIVE e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e0),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id),
        |pp AS (SELECT id_a, id_b FROM p WHERE sim >= 0.45),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pp
        |      UNION SELECT id_b, id_a FROM pp),
        |walk(id, lbl) AS (
        |  SELECT src, src FROM e
        |  UNION
        |  SELECT e.src, w.lbl FROM e JOIN walk w ON w.id = e.dst)
        |SELECT id AS doc_id, min(lbl) AS cluster_id, (id = min(lbl)) AS keep
        |FROM walk GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Dedup.dupClusters(
        Ann.cosinePairs(emb(s, d), theta = 0.45)))
    },

    // ---- similarity search over embeddings ----
    Entry("ann_cosine_topk", exactTopSql(nQueries = 10, k = 5)) {
      (s, d) => ordered(Ann.cosineTopK(emb(s, d), nQueries = 10, k = 5))
    },
    // MMR diversified re-rank over the exact top-20 candidates:
    // greedy lambda*rel - (1-lambda)*max-sim-to-selected, both
    // engines folding the identical rounded scores
    Entry("ann_mmr_topk", mmrSql(nQueries = 10, k = 5,
      nCandidates = 20, lambda = 0.5)) {
      (s, d) => ordered(Ann.mmrTopK(emb(s, d), nQueries = 10, k = 5,
        nCandidates = 20, lambda = 0.5))
    },
    // cell-bounded kNN self-join (the batch kNN graph): every vector's
    // top-5 within its label × adaptive-sign-prefix cell — the oracle
    // recomputes the identical integer cells, so the within-cell
    // semantics verify exactly (cross-cell misses are the operator's
    // own documented contract, the IVF nprobe=1 analog)
    Entry("ann_knn_join",
      """WITH e0 AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT count(*) AS n, count(DISTINCT label) AS l FROM e0),
        |bsel AS (SELECT coalesce(min(b), 32) AS bits FROM range(0, 33) r(b), c
        |         WHERE l * 256 * (1::BIGINT << b) >= n),
        |n0 AS (SELECT vec_id, v,
        |        sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
        |        label::BIGINT * (1::BIGINT << bits) + coalesce(list_sum(
        |          list_transform(range(1, bits + 1), i ->
        |            CASE WHEN v[i] >= 0 THEN (1::BIGINT << (bits - i)) ELSE 0 END)), 0) AS cell
        |       FROM e0, bsel),
        |p AS (SELECT a.vec_id AS query_id, b.vec_id,
        |        round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
        |      FROM n0 a JOIN n0 b ON a.cell = b.cell AND a.vec_id <> b.vec_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM p QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.knnJoin(emb(s, d), k = 5))
    },
    Entry("ann_cosine_pairs",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |        round(list_sum(list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])) / (a.nrm * b.nrm), 9) AS sim
        |      FROM n a JOIN n b ON a.vec_id < b.vec_id)
        |SELECT id_a, id_b, sim FROM p WHERE sim >= 0.45 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.cosinePairs(emb(s, d), theta = 0.45))
    },
    // approximate search, but fully deterministic: the hyperplanes are
    // md5-derived (Ann.md5Plane) and the signature dot is a sequential
    // fold that DuckDB's list_sum reproduces bit-for-bit, so the
    // oracle recomputes the EXACT signatures, buckets, candidates and
    // ranks. Recall vs exact search is additionally pinned by AnnSpec.
    Entry("ann_lsh_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |pj0 AS (SELECT unnest(range(64 * (SELECT len(v) FROM n LIMIT 1))) AS j),
        |pj AS (SELECT j, CAST(list_sum(list_transform(range(13), k ->
        |         CAST(strpos('0123456789abcdef', substring(md5('plane:' || CAST(j AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
        |           << (4*(12-k)))) AS BIGINT) / 2251799813685248.0 - 1.0 AS p
        |       FROM pj0),
        |pl AS (SELECT list(p ORDER BY j) AS pls FROM pj),
        |sg AS (SELECT vec_id, t,
        |        list_sum(list_transform(range(4), b ->
        |          CASE WHEN list_sum(list_transform(range(1, len(v) + 1), i ->
        |            v[i] * pls[(t * 4 + b) * len(v) + i])) >= 0 THEN 1 << (3 - b) ELSE 0 END)) AS sig
        |       FROM n, pl, range(16) tt(t)),
        |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
        |         FROM sg q JOIN sg c ON q.t = c.t AND q.sig = c.sig
        |         WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        |sc AS (SELECT ca.query_id, ca.vec_id,
        |        round(list_sum(list_transform(range(1, len(qn.v) + 1), i -> qn.v[i] * cn.v[i])) / (qn.nrm * cn.nrm), 9) AS sim
        |       FROM cand ca JOIN n qn ON qn.vec_id = ca.query_id JOIN n cn ON cn.vec_id = ca.vec_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM sc QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      // explicit bits=4 pins the oracle's setting at every SF (the
      // default is the corpus-sized Ann.autoBits, which happens to
      // read 4 at the correctness SF but grows with the corpus)
      (s, d) => ordered(Ann.lshTopK(emb(s, d), nQueries = 10, k = 5,
        bits = 4))
    },
    // LSH bits tuning curve: ONE shared md5 plane list sized for the
    // max setting (each setting indexes its own (t*bits+b)*dim range
    // of the same deterministic sequence), per-setting signature +
    // bucket-join CTEs — bits is baked into the signature, so
    // re-signing per setting is the semantics (the nlist side of the
    // per-setting contrast); candidates and hits counted exactly
    Entry("ann_lsh_curve", {
      val bs = Seq(2, 4, 6, 8)
      val maxB = bs.max
      val perBits = bs.map(b =>
        s"""sg_$b AS (SELECT vec_id, t,
           |        list_sum(list_transform(range($b), bb ->
           |          CASE WHEN list_sum(list_transform(range(1, len(v) + 1), i ->
           |            v[i] * pls[(t * $b + bb) * len(v) + i])) >= 0
           |          THEN 1 << ($b - 1 - bb) ELSE 0 END)) AS sig
           |       FROM n, pl, range(16) tt$b(t)),
           |cand_$b AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS vec_id
           |         FROM sg_$b q JOIN sg_$b c ON q.t = c.t AND q.sig = c.sig
           |         WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
           |sc_$b AS (SELECT ca.query_id, ca.vec_id,
           |        round(list_sum(list_transform(range(1, len(qn.v) + 1), i -> qn.v[i] * cn.v[i])) / (qn.nrm * cn.nrm), 9) AS sim
           |       FROM cand_$b ca JOIN n qn ON qn.vec_id = ca.query_id JOIN n cn ON cn.vec_id = ca.vec_id),
           |tk_$b AS (SELECT query_id, vec_id FROM sc_$b
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY sim DESC, vec_id) <= 5),
           |r_$b AS (SELECT CAST($b AS BIGINT) AS bits,
           |  CAST(16 AS BIGINT) AS tables, CAST(10 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT) FROM cand_$b) AS n_candidates,
           |  (SELECT CAST(count(*) AS BIGINT) FROM ex JOIN tk_$b t2
           |     ON t2.query_id = ex.query_id AND t2.vec_id = ex.neighbor_id)
           |    AS n_hit)""".stripMargin).mkString(",\n")
      val union = bs.map(b => s"SELECT * FROM r_$b").mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
         |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |pj0 AS (SELECT unnest(range(16 * $maxB * (SELECT len(v) FROM n LIMIT 1))) AS j),
         |pj AS (SELECT j, CAST(list_sum(list_transform(range(13), k ->
         |         CAST(strpos('0123456789abcdef', substring(md5('plane:' || CAST(j AS VARCHAR)), k+1, 1)) - 1 AS BIGINT)
         |           << (4*(12-k)))) AS BIGINT) / 2251799813685248.0 - 1.0 AS p
         |       FROM pj0),
         |pl AS (SELECT list(p ORDER BY j) AS pls FROM pj),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |${exactTopSql(nQueries = 10, k = 5)}) x),
         |$perBits
         |SELECT bits, tables, n_queries, n_candidates, n_hit,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_truth,
         |  CAST(n_hit * 1000000 // (SELECT count(*) FROM ex) AS BIGINT) AS recall_q6
         |FROM ($union) u ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(Ann.lshCurve(emb(s, d), nQueries = 10, k = 5,
        bitsList = Seq(2, 4, 6, 8), tables = 16))
    },
    // IVF is deterministic end to end: centroids are per-cell means of
    // the label quantizer, probe selection uses round-9 sims with a
    // (csim desc, cell asc) tie-break, scoring is exact — every step
    // DuckDB-expressible, mirroring the ann_cosine_topk oracle.
    Entry("ann_ivf_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label AS cell FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, cell, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |cp AS (SELECT cell, unnest(range(1, len(v) + 1)) AS pos, unnest(v) AS x FROM n),
        |cpa AS (SELECT cell, pos, avg(x) AS cx FROM cp GROUP BY 1, 2),
        |cent AS (SELECT cell, list(cx ORDER BY pos) AS cv FROM cpa GROUP BY 1),
        |cn AS (SELECT cell, cv, sqrt(list_sum(list_transform(cv, x -> x * x))) AS cnrm FROM cent),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |pr AS (SELECT query_id, qv, qn, cell,
        |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) / (qn * cnrm), 9) AS csim
        |       FROM q, cn),
        |probes AS (SELECT query_id, qv, qn, cell FROM pr
        |           QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY csim DESC, cell) <= 3),
        |sc AS (SELECT p.query_id, n.vec_id,
        |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * n.v[i])) / (qn * n.nrm), 9) AS sim
        |       FROM probes p JOIN n ON n.cell = p.cell AND n.vec_id <> p.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM sc QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.ivfTopK(emb(s, d), nQueries = 10, k = 5))
    },

    // trained-quantizer IVF: spherical k-means replaces the label
    // cells — deterministic init (lowest vec_ids), round-9 cosine
    // assignment with lowest-cell tie-break, empty cells keep their
    // centroid — so the oracle replays the training step for step
    // trainMod=4: Lloyd rounds run on the deterministic 1/4 subsample
    // (the faiss sampled-training practice), full-corpus assignment
    // unchanged — the oracle replays the sampled training exactly
    Entry("ann_ivf_kmeans_topk", kmeansIvfSql(nlist = 8, iters = 2,
      nQueries = 10, k = 5, nprobe = 3, trainMod = 4)) {
      (s, d) => ordered(Ann.kmeansIvfTopK(emb(s, d), nQueries = 10, k = 5,
        nlist = 8, iters = 2, nprobe = 3, trainMod = 4))
    },
    // recall@5 of the kmeans-IVF probe search against the exact top-5
    // — the retrieval quality gate as a row (the sketch-stats verdict
    // pattern); both searches' full oracle SQLs compose as subqueries
    Entry("ann_recall_eval",
      s"""WITH ex AS (SELECT query_id, neighbor_id FROM (
         |${exactTopSql(nQueries = 10, k = 5)}) x),
         |iv AS (SELECT query_id, neighbor_id FROM (
         |${kmeansIvfSql(nlist = 8, iters = 2, nQueries = 10, k = 5,
            nprobe = 3, trainMod = 4)}) i)
         |SELECT ex.query_id,
         |       CAST(count(iv.neighbor_id) AS BIGINT) AS n_hit,
         |       CAST(5 AS BIGINT) AS k,
         |       round(count(iv.neighbor_id) / 5.0, 6) AS recall
         |FROM ex LEFT JOIN iv USING (query_id, neighbor_id)
         |GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.recallAtK(emb(s, d), nQueries = 10, k = 5,
        nlist = 8, iters = 2, nprobe = 3, trainMod = 4))
    },

    // the IVF tuning curve: recall@5 AND measured scan cost per
    // nprobe setting, one trained quantizer — the composed oracle
    // replays each probe setting's full candidate frame (suffixed
    // CTE bodies), so both the hit counts and the scanned-candidate
    // counts are exact
    Entry("ann_nprobe_curve", {
      val ps = Seq(1, 2, 4, 8)
      val bodies = ps.map(p =>
        kmeansIvfBody(nlist = 8, iters = 2, nQueries = 10, nprobe = p,
          trainMod = 4, fx = s"_$p")).mkString(",\n")
      val rows = ps.map(p =>
        s"""r_$p AS (SELECT CAST($p AS BIGINT) AS nprobe,
           |  CAST(10 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT) FROM sc_$p) AS n_scanned,
           |  (SELECT CAST(count(iv.neighbor_id) AS BIGINT) FROM ex
           |     LEFT JOIN (SELECT query_id, vec_id AS neighbor_id FROM sc_$p
           |       QUALIFY row_number() OVER (PARTITION BY query_id
           |         ORDER BY sim DESC, vec_id) <= 5) iv
           |     USING (query_id, neighbor_id)) AS n_hit)""".stripMargin)
        .mkString(",\n")
      s"""WITH ex AS (SELECT query_id, neighbor_id FROM (
         |${exactTopSql(nQueries = 10, k = 5)}) x),
         |$bodies,
         |$rows,
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM ex)
         |SELECT nprobe, n_queries, n_scanned, n_hit, n_truth,
         |  CAST(n_hit * 1000000 // n_truth AS BIGINT)
         |    AS recall_q6
         |FROM (${ps.map(p => s"SELECT * FROM r_$p").mkString(" UNION ALL ")}), t
         |ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(Ann.nprobeCurve(emb(s, d), nQueries = 10, k = 5,
        nlist = 8, iters = 2, trainMod = 4, nprobes = Seq(1, 2, 4, 8)))
    },

    // the nlist tuning curve: the INDEX knob's table — per cell
    // count (fixed probe fraction 1/4) the recall, measured scan
    // cost, and the training cost the setting buys; each setting
    // legitimately re-trains (nlist is baked into the quantizer), so
    // the oracle composes one full suffixed training replay per row
    Entry("ann_nlist_curve", {
      val nls = Seq(2, 4, 8, 16)
      val iters = 2
      def npOf(nl: Int) = math.max(1, math.ceil(nl * 0.25).toInt)
      val bodies = nls.map(nl =>
        kmeansIvfBody(nlist = nl, iters = iters, nQueries = 10,
          nprobe = npOf(nl), trainMod = 4, fx = s"_n$nl")).mkString(",\n")
      val rows = nls.map { nl =>
        s"""r_n$nl AS (SELECT CAST($nl AS BIGINT) AS nlist,
           |  CAST(${npOf(nl)} AS BIGINT) AS nprobe,
           |  CAST(10 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT) FROM nt_n$nl) AS n_train_vectors,
           |  (SELECT CAST(count(*) * $nl * $iters AS BIGINT) FROM nt_n$nl) AS train_pairs,
           |  (SELECT CAST(count(*) AS BIGINT) FROM sc_n$nl) AS n_scanned,
           |  (SELECT CAST(count(iv.neighbor_id) AS BIGINT) FROM ex
           |     LEFT JOIN (SELECT query_id, vec_id AS neighbor_id FROM sc_n$nl
           |       QUALIFY row_number() OVER (PARTITION BY query_id
           |         ORDER BY sim DESC, vec_id) <= 5) iv
           |     USING (query_id, neighbor_id)) AS n_hit)""".stripMargin
      }.mkString(",\n")
      s"""WITH ex AS (SELECT query_id, neighbor_id FROM (
         |${exactTopSql(nQueries = 10, k = 5)}) x),
         |$bodies,
         |$rows,
         |t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM ex)
         |SELECT nlist, nprobe, n_queries, n_train_vectors, train_pairs,
         |  n_scanned, n_hit, n_truth,
         |  CAST(n_hit * 1000000 // n_truth AS BIGINT) AS recall_q6
         |FROM (${nls.map(nl => s"SELECT * FROM r_n$nl").mkString(" UNION ALL ")}), t
         |ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(Ann.nlistCurve(emb(s, d), nQueries = 10, k = 5,
        nlists = Seq(2, 4, 8, 16), iters = 2, trainMod = 4,
        probeFrac = 0.25))
    },

    // product quantization: 4 subspaces × 8-entry L2 codebooks, ADC scan
    Entry("ann_pq_topk", pqSql(m = 4, d = 16, nlist = 8, iters = 2,
      nQueries = 10, k = 5, trainMod = 4)) {
      (s, d) => ordered(Ann.pqTopK(emb(s, d), nQueries = 10, k = 5,
        m = 4, nlist = 8, iters = 2, trainMod = 4))
    },

    // IVF-PQ: trained coarse cells restrict the scan to nprobe cells,
    // PQ codes + ADC score within them (faiss IndexIVFPQ, by_residual=false)
    Entry("ann_ivfpq_topk", ivfPqSql(nlist = 8, iters = 2, nprobe = 3,
      m = 4, d = 16, pqNlist = 8, pqIters = 2, nQueries = 10, k = 5,
      trainMod = 4)) {
      (s, d) => ordered(Ann.ivfPqTopK(emb(s, d), nQueries = 10, k = 5,
        nlist = 8, iters = 2, nprobe = 3, m = 4, pqNlist = 8, pqIters = 2,
        trainMod = 4))
    },

    // compression trust gate: corpus-wide squared reconstruction
    // error of SQ8 and PQ — per-vector errors floor-quantized x1e9
    // BEFORE the corpus sum (exact order-independent int64); the PQ
    // side replays the identical Lloyd training via the shared body
    Entry("ann_quant_distortion", {
      // the shipped embeddings are 64-dim → m=4 subspaces of d=16
      // (the ann_pq_topk parameterization)
      val d = 16
      s"""WITH ${pqBodySql(m = 4, d = d, nlist = 8, iters = 2, trainMod = 4)},
         |perr AS (SELECT cod.vec_id,
         |  CAST(list_sum(list_transform(range(1, $d + 1),
         |    j -> CAST(floor((t.sv[j] - c.cv[j]) * (t.sv[j] - c.cv[j]) * 1e9)
         |         AS BIGINT))) AS BIGINT) AS seq
         | FROM cod JOIN bk c ON c.sub = cod.sub AND c.cid = cod.cid
         |      JOIN sv t ON t.vec_id = cod.vec_id AND t.sub = cod.sub),
         |pqv AS (SELECT vec_id, CAST(sum(seq) AS BIGINT) AS se
         |  FROM perr GROUP BY 1),
         |sq AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
         |sqv AS (SELECT vec_id, CAST(list_sum(list_transform(v,
         |    x -> CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
         |         ELSE CAST(floor((x - CAST(round(x / scale) AS INT) * scale)
         |            * (x - CAST(round(x / scale) AS INT) * scale) * 1e9)
         |            AS BIGINT) END))
         |    AS BIGINT) AS se FROM sq),
         |bs AS (SELECT vec_id, v,
         |  CAST(list_sum(list_transform(v, x -> CAST(floor(abs(x) * 1073741824) AS BIGINT))) AS DOUBLE)
         |    / CAST(len(v) * 1073741824::BIGINT AS DOUBLE) AS s FROM e),
         |binv AS (SELECT vec_id, CAST(list_sum(list_transform(v, x ->
         |    CAST(floor((x - CASE WHEN x >= 0 THEN s ELSE -s END)
         |      * (x - CASE WHEN x >= 0 THEN s ELSE -s END) * 1e9) AS BIGINT)))
         |    AS BIGINT) AS se FROM bs),
         |r1 AS (SELECT 'pq' AS scheme, CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(sum(se) AS BIGINT) AS sum_se_q9,
         |  CAST(sum(se) // count(*) AS BIGINT) AS mse_q9,
         |  max(se) AS max_se_q9 FROM pqv),
         |r2 AS (SELECT 'sq8' AS scheme, CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(sum(se) AS BIGINT) AS sum_se_q9,
         |  CAST(sum(se) // count(*) AS BIGINT) AS mse_q9,
         |  max(se) AS max_se_q9 FROM sqv),
         |r3 AS (SELECT 'bin' AS scheme, CAST(count(*) AS BIGINT) AS n_vectors,
         |  CAST(sum(se) AS BIGINT) AS sum_se_q9,
         |  CAST(sum(se) // count(*) AS BIGINT) AS mse_q9,
         |  max(se) AS max_se_q9 FROM binv)
         |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
         |ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(Ann.quantDistortion(emb(s, d), m = 4, nlist = 8,
        iters = 2, trainMod = 4))
    },
    // PQ rate-distortion tuning curve: the compression knob measured
    // like the four search curves — per m the q9 reconstruction error
    // NEXT TO the bytes it buys (64 doubles → m codes); each setting
    // legitimately re-trains (m is baked into the codebook geometry —
    // the nlist side of the per-setting contrast, PlanSpec-pinned)
    Entry("ann_pq_curve",
      Seq(4, 8, 16).map(m => pqCurveRowSql(m, dim = 64, nlist = 16,
          iters = 2, trainMod = 4))
        .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY ALL")) {
      (s, d) => ordered(Ann.pqCurve(emb(s, d), mList = Seq(4, 8, 16),
        ks = 16, iters = 2, trainMod = 4))
    },

    // int8 scalar quantization (absmax), exploded to scalar rows so
    // every code is oracle-pinned
    Entry("ann_quantize_int8",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e)
        |SELECT vec_id, unnest(range(len(v))) AS pos,
        |       unnest(list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE CAST(round(x / scale) AS INT) END)) AS q,
        |       scale
        |FROM s ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.quantizeInt8(emb(s, d)))
    },

    // asymmetric SQ8 search: float queries against the reconstructed
    // int8 corpus (code × scale is exact, so the oracle reproduces
    // the quantized sims bit for bit at round-9)
    Entry("ann_quantized_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
        |c AS (SELECT vec_id, scale, list_transform(v, x -> CASE WHEN scale = 0 THEN 0 ELSE CAST(round(x / scale) AS INT) END) AS qv FROM s),
        |r AS (SELECT vec_id, list_transform(qv, cd -> cd * scale) AS v FROM c),
        |rn AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM r),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |p AS (SELECT q.query_id, rn.vec_id,
        |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / (qn * nrm), 9) AS sim
        |      FROM q, rn WHERE rn.vec_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM p QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.quantizedTopK(emb(s, d), nQueries = 10, k = 5))
    },

    // hybrid dense+lexical retrieval: per-query cosine top-20 RRF-fused
    // with the corpus BM25 top-20 for a term set; the whole fusion
    // (both rank lists + the 1/(60+r) sums + tie-breaks) is replayed
    Entry("ann_hybrid_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |p AS (SELECT q.query_id, n.vec_id AS doc_id,
        |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / (qn * nrm), 9) AS sim
        |      FROM q, n WHERE n.vec_id <> q.query_id),
        |dr AS (SELECT query_id, doc_id,
        |        row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, doc_id) AS dr
        |       FROM p QUALIFY dr <= 20),
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |d AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        |       CAST(len(list_filter(w, x -> x = 'table')) AS BIGINT) AS tf_0,
        |       CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf_1,
        |       CAST(len(list_filter(w, x -> x = 'query')) AS BIGINT) AS tf_2
        |      FROM t),
        |s AS (SELECT count(*) AS n, sum(dl) AS sdl,
        |       sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |       sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |       sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
        |      FROM d),
        |bm AS (SELECT doc_id, CAST(floor((
        |    ln(1.0::DOUBLE + (n - df_0 + 0.5::DOUBLE) / (df_0 + 0.5::DOUBLE)) * (CAST(tf_0 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_0 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  + ln(1.0::DOUBLE + (n - df_1 + 0.5::DOUBLE) / (df_1 + 0.5::DOUBLE)) * (CAST(tf_1 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_1 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  + ln(1.0::DOUBLE + (n - df_2 + 0.5::DOUBLE) / (df_2 + 0.5::DOUBLE)) * (CAST(tf_2 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_2 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  ) * 1000000) AS BIGINT) AS bm25_q6
        |FROM d, s),
        |bmr AS (SELECT doc_id, row_number() OVER (ORDER BY bm25_q6 DESC, doc_id) AS lr
        |        FROM bm QUALIFY lr <= 20),
        |lc AS (SELECT qs.query_id, bmr.doc_id, bmr.lr
        |       FROM (SELECT query_id FROM q) qs, bmr
        |       WHERE bmr.doc_id <> qs.query_id),
        |f AS (SELECT coalesce(dr.query_id, lc.query_id) AS query_id,
        |             coalesce(dr.doc_id, lc.doc_id) AS doc_id, dr.dr, lc.lr
        |      FROM dr FULL OUTER JOIN lc
        |        ON lc.query_id = dr.query_id AND lc.doc_id = dr.doc_id),
        |sc AS (SELECT query_id, doc_id,
        |        round(coalesce(1.0::DOUBLE / (60 + dr), 0.0::DOUBLE)
        |            + coalesce(1.0::DOUBLE / (60 + lr), 0.0::DOUBLE), 9) AS score
        |       FROM f)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |       doc_id
        |FROM sc QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.hybridTopK(emb(s, d), docs(s, d),
        Seq("table", "spark", "query"), nQueries = 10, k = 5, depth = 20))
    },
    // metadata-filtered search: top-k over only the vectors whose
    // paired document is English — the vector-store pre-filter shape
    Entry("ann_filtered_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |ok AS (SELECT doc_id AS vec_id FROM documents WHERE lang = 'en'),
        |c AS (SELECT n.* FROM n JOIN ok USING (vec_id)),
        |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 10),
        |p AS (SELECT q.query_id, c.vec_id,
        |        round(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * v[i])) / (qn * nrm), 9) AS sim
        |      FROM q, c WHERE c.vec_id <> q.query_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM p QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.filteredTopK(emb(s, d),
        docs(s, d).where(col("lang") === "en")
          .select(col("doc_id").as("vec_id")), nQueries = 10, k = 5))
    },
    // Matryoshka truncation to 16 dims + renorm, every value pinned
    Entry("embed_truncate_renorm",
      """WITH e AS (SELECT vec_id, embedding[1:16]::DOUBLE[] AS t FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, t, sqrt(list_sum(list_transform(t, x -> x * x))) AS n FROM e)
        |SELECT vec_id, unnest(range(len(t))) AS pos,
        |       unnest(list_transform(t, x -> CASE WHEN n = 0 THEN 0 ELSE round(x / n, 6) END)) AS x
        |FROM n ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.truncateRenorm(emb(s, d), dims = 16))
    },
    // PCA verdict entry (the ts_sketch_stats pattern): per-dim EXACT
    // integer variance moments replayed by the oracle + a global
    // pca_ok boolean claiming the eigenbasis properties (orthonormal,
    // PSD, eigenvalues ordered, top-k explained >= best-k raw dims);
    // the oracle emits literal TRUE, so a broken eigensolve mismatches
    Entry("embed_pca",
      """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |x AS (SELECT unnest(range(len(v))) AS dim,
        |             unnest(list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT))) AS xq FROM e),
        |m AS (SELECT dim, count(*) AS n, CAST(sum(xq) AS BIGINT) AS sx,
        |             CAST(sum(xq * xq) AS BIGINT) AS sxx FROM x GROUP BY 1)
        |SELECT CAST(dim AS BIGINT) AS dim, n, CAST(n * sxx - sx * sx AS BIGINT) AS var_num,
        |       TRUE AS pca_ok
        |FROM m ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Pca.varianceWithVerdict(emb(s, d), dim = 64, k = 8))
    },
    // per-label centroid table: one elementwise mean per label cell
    Entry("embed_label_centroids",
      """WITH e AS (SELECT label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |sz AS (SELECT label, count(*) AS n_vecs FROM e GROUP BY 1),
        |m AS (SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM e),
        |c AS (SELECT label, pos, round(avg(x), 6) AS cx FROM m GROUP BY 1, 2)
        |SELECT label, n_vecs, pos, cx FROM c JOIN sz USING (label)
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.labelCentroids(emb(s, d)))
    },
    // embedding outliers: per-label distance-to-centroid z-score
    // (centroid components rounded before the distance pass so both
    // engines compute identical distances; moments over ×1000-quantized
    // integer distances so mu/sd/z are bit-identical — no
    // aggregation-order ulps, no round() half-boundary exposure)
    // per-dimension drift between the first/second id halves: Welch z
    // over x1e6-floor-quantized component moments (exact int64 sums;
    // one fixed IEEE sequence per dim, spelled identically here)
    Entry("embed_drift",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |mm AS (SELECT min(vec_id) + (max(vec_id) - min(vec_id)) // 2 AS mid FROM e),
        |x0 AS (SELECT vec_id, unnest(range(len(v))) AS dim, unnest(v) AS val FROM e),
        |x AS (SELECT CASE WHEN vec_id <= (SELECT mid FROM mm) THEN 0 ELSE 1 END AS half,
        |             CAST(dim AS BIGINT) AS dim,
        |             CAST(floor(val * 1000000.0) AS BIGINT) AS q FROM x0),
        |a AS (SELECT dim, half, count(*) AS n, CAST(sum(q) AS BIGINT) AS s1,
        |       CAST(sum(q * q) AS BIGINT) AS s2 FROM x GROUP BY 1, 2),
        |p AS (SELECT dim,
        |       CAST(sum(CASE WHEN half = 0 THEN n END) AS BIGINT) AS n0,
        |       CAST(sum(CASE WHEN half = 0 THEN s1 END) AS BIGINT) AS s10,
        |       CAST(sum(CASE WHEN half = 0 THEN s2 END) AS BIGINT) AS s20,
        |       CAST(sum(CASE WHEN half = 1 THEN n END) AS BIGINT) AS n1,
        |       CAST(sum(CASE WHEN half = 1 THEN s1 END) AS BIGINT) AS s11,
        |       CAST(sum(CASE WHEN half = 1 THEN s2 END) AS BIGINT) AS s21
        |      FROM a GROUP BY 1)
        |SELECT dim, n0, n1,
        |  CAST(floor(CASE WHEN
        |    (CAST(s20 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |     - (CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE)) * (CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE))) / CAST(n0 AS DOUBLE)
        |    + (CAST(s21 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |     - (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)) * (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE))) / CAST(n1 AS DOUBLE) <= 0.0
        |    THEN CAST(NULL AS DOUBLE)
        |    ELSE (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |      / sqrt(
        |        (CAST(s20 AS DOUBLE) / CAST(n0 AS DOUBLE)
        |         - (CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE)) * (CAST(s10 AS DOUBLE) / CAST(n0 AS DOUBLE))) / CAST(n0 AS DOUBLE)
        |        + (CAST(s21 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |         - (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE)) * (CAST(s11 AS DOUBLE) / CAST(n1 AS DOUBLE))) / CAST(n1 AS DOUBLE))
        |    END * 1e6) AS BIGINT) AS z_q6
        |FROM p WHERE n0 IS NOT NULL AND n1 IS NOT NULL ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.embedDrift(emb(s, d)))
    },
    Entry("embed_outliers",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |m AS (SELECT label, unnest(range(len(v))) AS pos, unnest(v) AS x FROM e),
        |cc AS (SELECT label, pos, round(avg(x), 6) AS cx FROM m GROUP BY 1, 2),
        |cv AS (SELECT label, list(cx ORDER BY pos) AS cv FROM cc GROUP BY 1),
        |d AS (SELECT vec_id, e.label,
        |       round(sqrt(list_sum(list_transform(range(1, len(v) + 1), j -> (v[j] - cv[j]) * (v[j] - cv[j])))), 6) AS dist
        |      FROM e JOIN cv ON cv.label = e.label),
        |d2 AS (SELECT vec_id, label, dist, CAST(floor(dist * 1000 + 0.5) AS BIGINT) AS di FROM d),
        |st AS (SELECT label, count(*) AS n, sum(di) AS s1, sum(di * di) AS s2 FROM d2 GROUP BY 1),
        |f AS (SELECT vec_id, label, dist, di,
        |       s1::DOUBLE / n::DOUBLE AS mu3,
        |       sqrt(greatest(s2::DOUBLE / n::DOUBLE - (s1::DOUBLE / n::DOUBLE) * (s1::DOUBLE / n::DOUBLE), 0.0)) AS sd3
        |      FROM d2 JOIN st USING (label))
        |SELECT vec_id, label, dist,
        |       CAST(floor((CASE WHEN sd3 = 0 THEN 0.0 ELSE (di::DOUBLE - mu3) / sd3 END) * 1e6) AS BIGINT) AS zq,
        |       CASE WHEN sd3 = 0 THEN FALSE ELSE (di::DOUBLE - mu3) / sd3 > 2.0 END AS is_outlier
        |FROM f ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.embedOutliers(emb(s, d), zCut = 2.0))
    },
    // binary (sign-bit) quantization search: 32-bit packed signature
    // words, integer Hamming prefilter to the top-50 candidates, exact
    // float rerank — every word, every Hamming distance, and the
    // rerank ordering replayed by the oracle
    Entry("ann_binary_topk",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |sg AS (SELECT vec_id,
        |        CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN v[j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS w0,
        |        CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN v[32 + j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS w1
        |       FROM e),
        |q AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1 FROM sg WHERE vec_id < 10),
        |h AS (SELECT q.query_id, sg.vec_id,
        |        bit_count(xor(sg.w0, q.qw0)) + bit_count(xor(sg.w1, q.qw1)) AS ham
        |      FROM sg, q WHERE sg.vec_id <> q.query_id),
        |cand AS (SELECT query_id, vec_id FROM h
        |         QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY ham, vec_id) <= 50),
        |sc AS (SELECT c.query_id, c.vec_id,
        |        round(list_sum(list_transform(range(1, len(a.v) + 1), j -> a.v[j] * b.v[j])) / (a.nrm * b.nrm), 9) AS sim
        |       FROM cand c JOIN n a ON a.vec_id = c.query_id JOIN n b ON b.vec_id = c.vec_id)
        |SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS BIGINT) AS rank,
        |       vec_id AS neighbor_id
        |FROM sc QUALIFY rank <= 5 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Ann.binaryTopK(emb(s, d), nQueries = 10, k = 5,
        rerank = 50))
    },
    // binary rerank tuning curve (the nprobe_curve pattern aimed at
    // the sign-bit family's one knob): ONE shared Hamming ranking at
    // the max depth — every smaller depth's candidate set is a prefix
    // of the deterministic (ham, vec_id) order — with per-depth float
    // re-scores; the oracle scores the max-depth candidates once and
    // ranks each prefix
    Entry("ann_rerank_curve", {
      val ds = Seq(8, 16, 32, 64)
      val maxD = ds.max
      val perDepth = ds.map(d =>
        s"""tk_$d AS (SELECT query_id, vec_id FROM sc WHERE r <= $d
           |  QUALIFY row_number() OVER (PARTITION BY query_id
           |    ORDER BY sim DESC, vec_id) <= 5),
           |r_$d AS (SELECT CAST($d AS BIGINT) AS rerank,
           |  CAST(10 AS BIGINT) AS n_queries,
           |  (SELECT CAST(count(*) AS BIGINT) FROM rk WHERE r <= $d)
           |    AS n_float_reads,
           |  (SELECT CAST(count(*) AS BIGINT) FROM ex JOIN tk_$d t
           |     ON t.query_id = ex.query_id AND t.vec_id = ex.neighbor_id)
           |    AS n_hit)""".stripMargin).mkString(",\n")
      val union = ds.map(d => s"SELECT * FROM r_$d")
        .mkString(" UNION ALL ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE embedding IS NOT NULL),
         |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
         |sg AS (SELECT vec_id,
         |        CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN v[j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS w0,
         |        CAST(list_sum(list_transform(range(0, 32), j -> CASE WHEN v[32 + j + 1] >= 0 THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS w1
         |       FROM e),
         |q AS (SELECT vec_id AS query_id, w0 AS qw0, w1 AS qw1 FROM sg WHERE vec_id < 10),
         |h AS (SELECT q.query_id, sg.vec_id,
         |        bit_count(xor(sg.w0, q.qw0)) + bit_count(xor(sg.w1, q.qw1)) AS ham
         |      FROM sg, q WHERE sg.vec_id <> q.query_id),
         |rk AS (SELECT query_id, vec_id,
         |        row_number() OVER (PARTITION BY query_id ORDER BY ham, vec_id) AS r
         |       FROM h QUALIFY r <= $maxD),
         |sc AS (SELECT c.query_id, c.vec_id, c.r,
         |        round(list_sum(list_transform(range(1, len(a.v) + 1), j -> a.v[j] * b.v[j])) / (a.nrm * b.nrm), 9) AS sim
         |       FROM rk c JOIN n a ON a.vec_id = c.query_id JOIN n b ON b.vec_id = c.vec_id),
         |ex AS (SELECT query_id, neighbor_id FROM (
         |${exactTopSql(nQueries = 10, k = 5)}) x),
         |$perDepth
         |SELECT rerank, n_queries, n_float_reads, n_hit,
         |  (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_truth,
         |  CAST(n_hit * 1000000 // (SELECT count(*) FROM ex) AS BIGINT) AS recall_q6
         |FROM ($union) u ORDER BY ALL""".stripMargin
    }) {
      (s, d) => ordered(Ann.rerankCurve(emb(s, d), nQueries = 10, k = 5,
        reranks = Seq(8, 16, 32, 64)))
    },

    // ---- text analysis ----
    Entry("text_token_stats",
      """WITH t AS (SELECT doc_id, n_chars, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id, len(w) AS n_tokens, n_chars,
        |       CAST(CAST(list_sum(list_transform(w, s -> length(s))) AS BIGINT) * 1000000 // len(w) AS BIGINT) AS avg_token_len_q6,
        |       CAST(CAST(len(list_distinct(w)) AS BIGINT) * 1000000 // len(w) AS BIGINT) AS lexical_diversity_q6
        |FROM t ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.tokenStats(docs(s, d)))
    },
    // per-document keywords: fixed-point-quantized tf·idf rank (the
    // lm-perplexity determinism trick), ties by term
    Entry("text_tfidf_keywords",
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, CAST(floor(tf * ln(CAST(n AS DOUBLE) / df) * 1000000) AS BIGINT) AS q
        |      FROM tf JOIN dfq USING (term), n)
        |SELECT doc_id, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY q DESC, term) AS BIGINT) AS rank, term
        |FROM s QUALIFY rank <= 3 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.tfidfKeywords(docs(s, d), k = 3))
    },
    Entry("text_bpe_count",
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.bpeTokenCount(docs(s, d)))
    },
    Entry("text_lang_dist",
      """SELECT lang, count(*) AS n_docs,
        |       CAST(sum(n_chars) // count(*) * 1000000 + (sum(n_chars) % count(*)) * 1000000 // count(*) AS BIGINT) AS avg_chars_q6,
        |       max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.langDist(docs(s, d)))
    },
    Entry("text_quality",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id, CAST((CAST(len(list_distinct(w)) AS BIGINT) * 500000
        |      + least(500000, CAST(len(w) AS BIGINT) * 5000) * CAST(len(w) AS BIGINT))
        |     // CAST(len(w) AS BIGINT) AS BIGINT) AS quality_q6
        |FROM t ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.qualityScore(docs(s, d)))
    },
    Entry("text_lang_id",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |v AS (SELECT doc_id,
        |  len(list_filter(w, s -> list_contains(['the','a','of','and','in','to','is'], s))) AS v_en,
        |  len(list_filter(w, s -> list_contains(['der','die','das','und','ist','ein'], s))) AS v_de,
        |  len(list_filter(w, s -> list_contains(['el','la','de','los','y','es'], s))) AS v_es,
        |  len(list_filter(w, s -> list_contains(['le','la','les','et','est','un'], s))) AS v_fr,
        |  len(list_filter(w, s -> list_contains(['的','是','在','了'], s))) AS v_zh
        |FROM t)
        |SELECT doc_id,
        |  CASE WHEN v_en >= v_de AND v_en >= v_es AND v_en >= v_fr AND v_en >= v_zh THEN 'en'
        |       WHEN v_de >= v_es AND v_de >= v_fr AND v_de >= v_zh THEN 'de'
        |       WHEN v_es >= v_fr AND v_es >= v_zh THEN 'es'
        |       WHEN v_fr >= v_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM v ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.langId(docs(s, d)))
    },
    Entry("text_ngram_freq",
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
        |b AS (SELECT unnest(list_transform(range(len(w) - 1),
        |        i -> array_to_string(w[i+1:i+2], ' '))) AS ngram
        |      FROM t WHERE len(w) >= 2)
        |SELECT ngram, count(*) AS freq FROM b GROUP BY 1
        |HAVING count(*) >= 20 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.ngramFreq(docs(s, d), n = 2, minFreq = 20))
    },
    // Gopher repetition gates: top-2-gram fraction + duplicate-3-gram
    // fraction per document (Rae et al. 2021 §A1.1)
    Entry("text_repetition",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g2 AS (SELECT doc_id, unnest(list_transform(range(len(w) - 1),
        |         i -> array_to_string(w[i+1:i+2], ' '))) AS g
        |       FROM t WHERE len(w) >= 2),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top2_frac_q6
        |       FROM c2 GROUP BY 1),
        |g3 AS (SELECT doc_id, unnest(list_transform(range(len(w) - 2),
        |         i -> array_to_string(w[i+1:i+3], ' '))) AS g
        |       FROM t WHERE len(w) >= 3),
        |c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2),
        |s3 AS (SELECT doc_id, CAST((sum(c) - count(*)) * 1000000 // sum(c) AS BIGINT) AS dup3_frac_q6
        |       FROM c3 GROUP BY 1)
        |SELECT d.doc_id, COALESCE(s2.top2_frac_q6, 0) AS top2_frac_q6,
        |       COALESCE(s3.dup3_frac_q6, 0) AS dup3_frac_q6
        |FROM documents d LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id)
        |ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.repetition(docs(s, d)))
    },
    Entry("doc_fingerprint",
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.fingerprint(docs(s, d)))
    },
    // PII/contact scrub over the REAL corpus: verifies the regex
    // classes against arbitrary text and the no-op path (the shipped
    // corpus plants no contacts; the fixture twin below is the
    // non-vacuous redaction check)
    Entry("text_pii_scrub",
      s"""$PII_SCRUB_BODY
         |FROM documents ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.piiScrub(docs(s, d)))
    },
    Entry("text_pii_scrub_fixture",
      s"""WITH $PIIFX
         |$PII_SCRUB_BODY
         |FROM pfx ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.piiScrub(piiFx(s)))
    },
    // the span/audit half over the planted fixture: one row per
    // (doc, class, occurrence) with the matched text — idx built by
    // list_transform (unnest stays in its own CTE, no JOIN USING in
    // the same SELECT: the DuckDB 1.0.0 binder rule)
    Entry("text_pii_spans_fixture",
      s"""WITH $PIIFX,
         |cls AS (
         |  SELECT doc_id, 'email' AS kind,
         |         regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}') AS l FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'ipv4',
         |         regexp_extract_all(text, '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}') FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'phone',
         |         regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}') FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'ssn',
         |         regexp_extract_all(text, '[0-9]{3}-[0-9]{2}-[0-9]{4}') FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'ipv6',
         |         regexp_extract_all(text, '(?:[0-9a-fA-F]{1,4}:){3,7}[0-9a-fA-F]{1,4}') FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'ccard',
         |         regexp_extract_all(text, '[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{1,4}|[0-9]{13,16}') FROM pfx
         |  UNION ALL
         |  SELECT doc_id, 'iban',
         |         regexp_extract_all(text, '[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}') FROM pfx),
         |x AS (SELECT doc_id, kind,
         |        unnest(list_transform(range(len(l)), j -> struct_pack(idx := j, m := l[j+1]))) AS s
         |      FROM cls)
         |SELECT doc_id, kind, CAST(s.idx AS BIGINT) AS idx, s.m AS "match"
         |FROM x
         |WHERE kind NOT IN ('ccard', 'iban')
         |   OR (kind = 'ccard' AND ${duckLuhn("s.m")})
         |   OR (kind = 'iban' AND ${duckIban("s.m")})
         |ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.piiSpans(piiFx(s)))
    },
    // per-source PII incidence: the privacy dashboard's decision
    // table (which source needs redaction/exclusion before training);
    // the real corpus is contact-free → real per-source zeros (the
    // text_pii_scrub no-op precedent), the fixture twin below is the
    // non-vacuous check
    Entry("text_pii_by_source",
      s"""WITH ${piiBySourceSql("documents")}""".stripMargin) {
      (s, d) => ordered(TextStats.piiBySource(docs(s, d)))
    },
    Entry("text_pii_by_source_fixture",
      s"""WITH $PIIFX,
         |pfs AS (SELECT doc_id, text,
         |        'fs' || CAST(doc_id % 3 AS VARCHAR) AS source FROM pfx),
         |${piiBySourceSql("pfs")}""".stripMargin) {
      (s, _) => ordered(TextStats.piiBySource(piiFx(s)
        .withColumn("source",
          expr("concat('fs', CAST(doc_id % 3 AS STRING))"))))
    },
    // per-source PII PRECISION: of the scrub's shape candidates, how
    // many pass Luhn / mod-97 (the span audit's verdicts rolled up) —
    // the trust-gate column pair the incidence table above decides
    // redaction-vs-escalation from. Real corpus plants no candidates
    // → zero rows (the no-op path, ts_changepoint precedent); the
    // fixture twin carries valid AND checksum-failing plants
    Entry("text_pii_precision",
      s"""WITH ${piiPrecisionSql("documents")}""".stripMargin) {
      (s, d) => ordered(TextStats.piiPrecisionBySource(docs(s, d)))
    },
    Entry("text_pii_precision_fixture",
      s"""WITH $PIIFX,
         |pfs AS (SELECT doc_id, text,
         |        'fs' || CAST(doc_id % 3 AS VARCHAR) AS source FROM pfx),
         |${piiPrecisionSql("pfs")}""".stripMargin) {
      (s, _) => ordered(TextStats.piiPrecisionBySource(piiFx(s)
        .withColumn("source",
          expr("concat('fs', CAST(doc_id % 3 AS STRING))"))))
    },
    // line-level boilerplate scrub (CCNet/RefinedWeb line df pass)
    // over the REAL corpus: no newlines → every doc is one unique
    // line, so this verifies the generic walk's no-op path (the pii
    // precedent); the fixture twins below are the non-vacuous checks
    Entry("text_boilerplate_scrub",
      s"""WITH ${blSql("documents")}
         |$BL_SCRUB_BODY ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.boilerplateScrub(docs(s, d)))
    },
    // the detection half over the planted fixture: per (doc, line)
    // the corpus document-frequency and the flag — header df 30,
    // footer df 15, content/body df 1, whitespace-only line df 0
    Entry("text_boilerplate_fixture",
      s"""WITH $BLFX,
         |${blSql("bfx")}
         |SELECT doc_id, line_no, line, df, is_boilerplate
         |FROM bl ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.boilerplateLines(blFx(s)))
    },
    // the removal half over the fixture: text rebuilt from surviving
    // lines in original order (string_agg ORDER BY line_no = the
    // array_sort-by-unique-line_no rebuild)
    Entry("text_boilerplate_scrub_fixture",
      s"""WITH $BLFX,
         |${blSql("bfx")}
         |$BL_SCRUB_BODY ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.boilerplateScrub(blFx(s)))
    },
    // the daily-delta shape: NEW docs' lines flagged against the
    // seen∪new document frequency (the incrementalMinhash pattern) —
    // equivalent to the batch walk restricted to the delta, which is
    // exactly what the oracle pins; the real corpus splits on the
    // dedup_incremental boundary (single-line docs → the df is the
    // exact-dup family, so the entry is non-vacuous here too)
    Entry("text_boilerplate_incremental",
      s"""WITH ${blSql("documents")}
         |SELECT doc_id, line_no, line, df, is_boilerplate
         |FROM bl WHERE doc_id >= 250 ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val all = docs(s, d)
        ordered(TextStats.boilerplateIncremental(
          all.where(col("doc_id") >= 250), all.where(col("doc_id") < 250)))
      }
    },
    // the multi-line fixture twin: seen = docs 0-14, delta = 15-29;
    // the shared header/footer span the boundary, so a single new
    // occurrence flags against the standing df
    Entry("text_boilerplate_incr_fixture",
      s"""WITH $BLFX,
         |${blSql("bfx")}
         |SELECT doc_id, line_no, line, df, is_boilerplate
         |FROM bl WHERE doc_id >= 15 ORDER BY ALL""".stripMargin) {
      (s, _) => {
        val all = blFx(s)
        ordered(TextStats.boilerplateIncremental(
          all.where(col("doc_id") >= 15), all.where(col("doc_id") < 15)))
      }
    },
    // the daily INDEX refresh as a first-class operator: the standing
    // (lh, df) index built from the seen half is merged with the
    // delta's own index by summing dfs on the shared key — under the
    // disjoint-doc_ids contract that is EXACTLY the rebuild over
    // seen ∪ delta, which is what the oracle computes (the
    // incremental-equivalence pattern); the refresh never re-reads
    // the seen corpus, only its distinct-lines-sized index
    Entry("text_boilerplate_index_merge",
      s"""WITH ${blSql("documents")}
         |SELECT lh, CAST(df AS BIGINT) AS df FROM d ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val all = docs(s, d)
        ordered(TextStats.mergeBoilerplateIndex(
          TextStats.boilerplateIndex(all.where(col("doc_id") < 250)),
          all.where(col("doc_id") >= 250)))
      }
    },
    // the multi-line fixture twin of the merge (seen = docs 0-14,
    // delta = 15-29): header/footer dfs span the boundary, so the
    // merged counts differ from BOTH sides' own indexes — non-vacuous
    // for the sum-on-shared-key path
    Entry("text_boilerplate_merge_fixture",
      s"""WITH $BLFX,
         |${blSql("bfx")}
         |SELECT lh, CAST(df AS BIGINT) AS df FROM d ORDER BY ALL""".stripMargin) {
      (s, _) => {
        val all = blFx(s)
        ordered(TextStats.mergeBoilerplateIndex(
          TextStats.boilerplateIndex(all.where(col("doc_id") < 15)),
          all.where(col("doc_id") >= 15)))
      }
    },
    // the scrub's minDf knob measured: per threshold the flagged-line
    // count, the chars a scrub would remove, and the docs touched —
    // ALL thresholds ride the one df-join pass (conditional
    // aggregates stacked to rows, the nprobe side of the per-setting
    // contrast)
    Entry("text_boilerplate_curve",
      blCurveSql("documents", Seq(2L, 3L, 5L, 10L))) {
      (s, d) => ordered(TextStats.boilerplateCurve(docs(s, d),
        thresholds = Seq(2L, 3L, 5L, 10L)))
    },
    // the multi-line fixture twin at thresholds that BRACKET the
    // planted dfs (header 30, footer 15): 2 flags both, 16 flags the
    // header only, 31 flags nothing — the knob's full contrast on 3
    // rows
    Entry("text_boilerplate_curve_fixture",
      s"""WITH $BLFX,
         |${blCurveSql("bfx", Seq(2L, 16L, 31L)).stripPrefix("WITH ")}""".stripMargin) {
      (s, _) => ordered(TextStats.boilerplateCurve(blFx(s),
        thresholds = Seq(2L, 16L, 31L)))
    },
    // the RefinedWeb NEAR-duplicate variant: whitespace-collapsed +
    // digit-masked keys unify "Page N of 30" footers and the
    // re-indented doc-0 copyright (both exact-df 1 — the md5 key
    // alone misses them); bodies stay letter-unique
    Entry("text_boilerplate_norm_fixture",
      s"""WITH $NBFX,
         |${blSql("nfx", normalized = true)}
         |SELECT doc_id, line_no, line, df, is_boilerplate
         |FROM bl ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.boilerplateLines(nbFx(s), normalized = true))
    },
    Entry("text_boilerplate_norm_scrub_fixture",
      s"""WITH $NBFX,
         |${blSql("nfx", normalized = true)}
         |$BL_SCRUB_BODY ORDER BY ALL""".stripMargin) {
      (s, _) => ordered(TextStats.boilerplateScrub(nbFx(s), normalized = true))
    },
    // bigram-LM perplexity filter (CCNet-style): per-pair logp is
    // quantized to fixed point so the per-doc score is an exact
    // integer sum — addition-order-independent on both engines
    Entry("text_lm_perplexity",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS w1 FROM t),
        |c1t AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM c1t),
        |bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |       FROM t WHERE len(w) >= 2),
        |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
        |p AS (SELECT b.doc_id,
        |       CAST(floor(ln((c2t.c2 + 1) / CAST(c1t.c1 + vv.v AS DOUBLE)) * 1000000) AS BIGINT) AS q
        |      FROM bi b JOIN c2t ON c2t.w1 = b.w1 AND c2t.w2 = b.w2
        |                JOIN c1t ON c1t.w1 = b.w1, vv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST((-sum(q)) // count(*) AS BIGINT) AS avg_nll_q6
        |FROM p GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.lmPerplexity(docs(s, d)))
    },
    // language-ID audit: the heuristic's confusion matrix against the
    // labeled lang column (the ann_recall_eval evaluation pattern)
    Entry("text_langid_eval",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |v AS (SELECT doc_id,
        |  len(list_filter(w, s -> list_contains(['the','a','of','and','in','to','is'], s))) AS v_en,
        |  len(list_filter(w, s -> list_contains(['der','die','das','und','ist','ein'], s))) AS v_de,
        |  len(list_filter(w, s -> list_contains(['el','la','de','los','y','es'], s))) AS v_es,
        |  len(list_filter(w, s -> list_contains(['le','la','les','et','est','un'], s))) AS v_fr,
        |  len(list_filter(w, s -> list_contains(['的','是','在','了'], s))) AS v_zh
        |FROM t),
        |pr AS (SELECT doc_id,
        |  CASE WHEN v_en >= v_de AND v_en >= v_es AND v_en >= v_fr AND v_en >= v_zh THEN 'en'
        |       WHEN v_de >= v_es AND v_de >= v_fr AND v_de >= v_zh THEN 'de'
        |       WHEN v_es >= v_fr AND v_es >= v_zh THEN 'es'
        |       WHEN v_fr >= v_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM v)
        |SELECT d.lang, pr.pred_lang, count(*) AS n_docs
        |FROM pr JOIN documents d USING (doc_id) GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.langIdEval(docs(s, d)))
    },
    // CCNet head/middle/tail perplexity terciles per language: the
    // ranking key is the exact integer (-sq) // n_pairs with doc_id
    // tiebreak, so ntile(3) buckets identically in both engines
    Entry("text_ppl_buckets",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS w1 FROM t),
        |c1t AS (SELECT w1, count(*) AS c1 FROM uni GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM c1t),
        |bi AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |       FROM t WHERE len(w) >= 2),
        |c2t AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
        |p AS (SELECT b.doc_id,
        |       CAST(floor(ln((c2t.c2 + 1) / CAST(c1t.c1 + vv.v AS DOUBLE)) * 1000000) AS BIGINT) AS q
        |      FROM bi b JOIN c2t ON c2t.w1 = b.w1 AND c2t.w2 = b.w2
        |                JOIN c1t ON c1t.w1 = b.w1, vv),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
        |       CAST((-sum(q)) // count(*) AS BIGINT) AS score_q6
        |       FROM p GROUP BY 1),
        |j AS (SELECT sc.*, d.lang FROM sc JOIN documents d USING (doc_id)),
        |n AS (SELECT doc_id, lang, n_pairs, score_q6,
        |       CAST(ntile(3) OVER (PARTITION BY lang ORDER BY score_q6, doc_id) AS BIGINT) AS bucket
        |      FROM j)
        |SELECT doc_id, lang, n_pairs, score_q6, bucket,
        |       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
        |FROM n ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.pplBuckets(docs(s, d)))
    },
    // BM25 against a fixed term set: corpus stats are ONE broadcast
    // 1-row aggregate; every double derives from integer counts
    // through the same op order on both engines
    Entry("text_bm25",
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |d AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
        |       CAST(len(list_filter(w, x -> x = 'table')) AS BIGINT) AS tf_0,
        |       CAST(len(list_filter(w, x -> x = 'spark')) AS BIGINT) AS tf_1,
        |       CAST(len(list_filter(w, x -> x = 'query')) AS BIGINT) AS tf_2
        |      FROM t),
        |s AS (SELECT count(*) AS n, sum(dl) AS sdl,
        |       sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
        |       sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
        |       sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
        |      FROM d)
        |SELECT doc_id, dl, CAST(floor((
        |    ln(1.0::DOUBLE + (n - df_0 + 0.5::DOUBLE) / (df_0 + 0.5::DOUBLE)) * (CAST(tf_0 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_0 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  + ln(1.0::DOUBLE + (n - df_1 + 0.5::DOUBLE) / (df_1 + 0.5::DOUBLE)) * (CAST(tf_1 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_1 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  + ln(1.0::DOUBLE + (n - df_2 + 0.5::DOUBLE) / (df_2 + 0.5::DOUBLE)) * (CAST(tf_2 AS DOUBLE) * (1.2::DOUBLE + 1.0::DOUBLE)) / (CAST(tf_2 AS DOUBLE) + 1.2::DOUBLE * (1.0::DOUBLE - 0.75::DOUBLE + 0.75::DOUBLE * CAST(dl AS DOUBLE) / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE))))
        |  ) * 1000000) AS BIGINT) AS bm25_q6
        |FROM d, s ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.bm25(docs(s, d),
        terms = Seq("table", "spark", "query")))
    },
    // DSIR importance weights (hashed-unigram target-vs-raw log
    // ratio): distribution tables are 1024-row broadcast constants,
    // per-bucket log-ratios quantized ×1e6 BEFORE the per-doc sum so
    // every weight is an exact integer (the lm-perplexity trick)
    Entry("text_dsir_weights",
      """WITH t AS (SELECT doc_id, lang, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        |tb AS (SELECT doc_id, lang,
        |        (256 * (strpos('0123456789abcdef', substring(md5(w), 13, 1)) - 1)
        |         + 16 * (strpos('0123456789abcdef', substring(md5(w), 14, 1)) - 1)
        |         + (strpos('0123456789abcdef', substring(md5(w), 15, 1)) - 1)) % 1024 AS b
        |       FROM t),
        |db AS (SELECT doc_id, lang, b, count(*) AS k FROM tb GROUP BY 1, 2, 3),
        |raw AS (SELECT b, sum(k) AS cr FROM db GROUP BY 1),
        |tgt AS (SELECT b, sum(k) AS ct FROM db WHERE lang = 'en' GROUP BY 1),
        |tot AS (SELECT (SELECT sum(cr) FROM raw) AS tr, (SELECT sum(ct) FROM tgt) AS tt),
        |dist AS (SELECT b, CAST(floor((ln((coalesce(ct, 0) + 1) / CAST(tt + 1024 AS DOUBLE)) - ln((cr + 1) / CAST(tr + 1024 AS DOUBLE))) * 1000000) AS BIGINT) AS q
        |         FROM raw LEFT JOIN tgt USING (b), tot)
        |SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_tokens,
        |       CAST(sum(k * q) AS BIGINT) AS logw_q6
        |FROM db JOIN dist USING (b) GROUP BY 1 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.dsirWeights(docs(s, d),
        targetLang = "en", buckets = 1024))
    },
    // Zipf rank-frequency slope per language: ranks from a total
    // order (freq DESC, term), ln's floor-quantized ×1e3 PER TERM so
    // the OLS moments are exact int64 and the slope one IEEE divide
    Entry("text_zipf_fit",
      """WITH t AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents),
        |f AS (SELECT lang, w, count(*) AS freq FROM t GROUP BY 1, 2 HAVING count(*) >= 2),
        |r AS (SELECT lang,
        |       CAST(floor(ln(CAST(row_number() OVER (PARTITION BY lang ORDER BY freq DESC, w) AS DOUBLE)) * 1000.0) AS BIGINT) AS x,
        |       CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000.0) AS BIGINT) AS y
        |      FROM f),
        |a AS (SELECT lang, count(*) AS n_terms, CAST(sum(x) AS BIGINT) AS sx,
        |       CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |       CAST(sum(x * x) AS BIGINT) AS sxx FROM r GROUP BY 1)
        |SELECT lang, n_terms,
        |       CAST(floor(CAST(n_terms * sxy - sx * sy AS DOUBLE)
        |                  / CAST(n_terms * sxx - sx * sx AS DOUBLE) * 1e6) AS BIGINT) AS slope_q6
        |FROM a WHERE n_terms * sxx - sx * sx > 0 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.zipfFit(docs(s, d), minFreq = 2L))
    },
    // PMI collocation mining over frequency-pruned bigrams
    Entry("text_pmi",
      """WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS w FROM documents),
        |uni AS (SELECT unnest(w) AS tk FROM t),
        |c1t AS (SELECT tk, count(*) AS c1 FROM uni GROUP BY 1),
        |tot AS (SELECT sum(c1) AS n1 FROM c1t),
        |bi AS (SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
        |       FROM t WHERE len(w) >= 2),
        |c2t AS (SELECT w1, w2, count(*) AS freq FROM bi GROUP BY 1, 2),
        |n2t AS (SELECT count(*) AS n2 FROM bi)
        |SELECT c.w1, c.w2, c.freq,
        |  CAST(floor(ln((CAST(c.freq AS DOUBLE) * n1 * n1) / (CAST(n2 AS DOUBLE) * a.c1 * b.c1)) * 1000000) AS BIGINT) AS pmi_q6
        |FROM c2t c JOIN c1t a ON a.tk = c.w1 JOIN c1t b ON b.tk = c.w2, tot, n2t
        |WHERE c.freq >= 20 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(TextStats.pmi(docs(s, d), minFreq = 20))
    },

    // ---- multimodal: REAL JDK PNG codec round-trip (Multimodal.scala).
    // The payloads are genuine PNGs (ImageIO encode) and width/height/
    // sum_gray come from ImageIO.read's raster — the oracle recomputes
    // the deterministic pixel field, so a wrong decode fails the hash.
    Entry("mm_decode",
      """WITH src AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id*3) % 8 AS h
        |             FROM documents),
        |px AS (SELECT doc_id, w, h, t.i FROM src, range(0, 225) t(i)
        |       WHERE t.i < w*h)
        |SELECT doc_id, CAST(any_value(w) AS BIGINT) AS width,
        |       CAST(any_value(h) AS BIGINT) AS height,
        |       CAST(count(*) AS BIGINT) AS n_pixels,
        |       CAST(sum((i*31 + doc_id) % 256) AS BIGINT) AS sum_gray
        |FROM px GROUP BY doc_id ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.decodeMedia(docs(s, d)).toDF())
    },
    // 1→1 batched binary transform: decode, nearest-neighbor resample
    // to 5x5 (integer floor sampling — oracle-replayable), re-encode
    Entry("mm_resize",
      """WITH src AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id*3) % 8 AS h
        |             FROM documents),
        |px AS (SELECT doc_id, ((y.i*h)//5)*w + (x.i*w)//5 AS si
        |       FROM src, range(0,5) x(i), range(0,5) y(i))
        |SELECT doc_id, CAST(5 AS BIGINT) AS width, CAST(5 AS BIGINT) AS height,
        |       CAST(sum((si*31 + doc_id) % 256) AS BIGINT) AS sum_gray
        |FROM px GROUP BY doc_id ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.resizeMedia(docs(s, d), 5, 5).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("sum_gray")))
    },
    // perceptual dHash off the REAL decoded raster (9x8 floor-sampled
    // brighter-than bits, split hi/lo so no column carries a sign
    // bit); n_same groups equal hashes — the image-dedup step
    Entry("mm_image_dhash",
      """WITH src AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id*3) % 8 AS h
        |             FROM documents),
        |b AS (SELECT doc_id, y.i AS y, x.i AS x,
        |       CASE WHEN (((((y.i*h)//8)*w + ((x.i+1)*w)//9)*31 + doc_id) % 256) >
        |                 (((((y.i*h)//8)*w + (x.i*w)//9)*31 + doc_id) % 256)
        |            THEN 1 ELSE 0 END AS bit
        |      FROM src, range(0,8) x(i), range(0,8) y(i)),
        |hsh AS (SELECT doc_id,
        |        CAST(sum(CASE WHEN y*8+x >= 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x-32)) ELSE 0 END) AS BIGINT) AS dhash_hi,
        |        CAST(sum(CASE WHEN y*8+x < 32 THEN bit * (CAST(1 AS BIGINT) << (y*8+x)) ELSE 0 END) AS BIGINT) AS dhash_lo
        |       FROM b GROUP BY 1)
        |SELECT doc_id, dhash_hi, dhash_lo,
        |       CAST(count(*) OVER (PARTITION BY dhash_hi, dhash_lo) AS BIGINT) AS n_same
        |FROM hsh ORDER BY ALL""".stripMargin) {
      (s, d) => {
        val h = Multimodal.imageDHash(docs(s, d)).toDF()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("dhash_hi"), col("dhash_lo"))
        ordered(h.withColumn("n_same", count(lit(1)).over(w)))
      }
    },
    // 1→N REAL multi-frame decode: payloads are genuine animated GIFs
    // and every 2nd frame is seek-decoded from the container — the
    // per-frame gray-sums come from the decoded frames
    Entry("mm_frame_sample",
      """WITH f AS (SELECT doc_id, t.i AS frame_idx FROM documents, range(0, 3) t(i)
        |           WHERE t.i < 1 + doc_id % 3 AND t.i % 2 = 0),
        |px AS (SELECT doc_id, frame_idx, p.i FROM f, range(0, 64) p(i))
        |SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
        |       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |       CAST(sum((i*31 + doc_id + frame_idx*7) % 256) AS BIGINT) AS sum_gray
        |FROM px GROUP BY 1, 2 ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.sampleFrames(docs(s, d), everyN = 2).toDF())
    },
    // REAL audio decode: payloads are genuine WAV files (RIFF, 16 kHz
    // 16-bit mono PCM) parsed by javax.sound.sampled — rate, count,
    // and amplitude sum come from the decoded stream
    Entry("mm_audio_decode",
      """WITH src AS (SELECT doc_id, 64 + doc_id % 64 AS ns FROM documents),
        |sm AS (SELECT doc_id, t.i FROM src, range(0, 128) t(i) WHERE t.i < ns)
        |SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate,
        |       CAST(count(*) AS BIGINT) AS n_samples,
        |       CAST(sum(abs((i*131 + doc_id) % 4096 - 2048)) AS BIGINT) AS sum_abs
        |FROM sm GROUP BY doc_id ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.decodeAudio(docs(s, d)).toDF())
    },
    // gray-level entropy per image (16 bands over the REAL raster):
    // per-band -p*ln(p) floor-quantized x1e9 from the integer counts
    // BEFORE the sum, so the total is an exact order-independent int
    Entry("mm_image_entropy",
      """WITH src AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (doc_id*3) % 8 AS h FROM documents),
        |px AS (SELECT doc_id, ((t.i*31 + doc_id) % 256) // 16 AS bin
        |       FROM src, range(0, 225) t(i) WHERE t.i < w*h),
        |hb AS (SELECT doc_id, bin, count(*) AS c FROM px GROUP BY 1, 2),
        |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM hb GROUP BY 1)
        |SELECT hb.doc_id, nn.n AS n_pixels,
        |       CAST(sum(CAST(floor(-(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |                           * ln(CAST(c AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |                           * 1e9) AS BIGINT)) AS BIGINT) AS entropy_q9
        |FROM hb JOIN nn USING (doc_id) GROUP BY hb.doc_id, nn.n ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.imageEntropy(docs(s, d)).toDF())
    },
    // silence segmentation over the REAL decoded PCM: 16-sample
    // windows silent when sum|s| < 900·n (exact integer mean test),
    // runs merged gaps-and-islands style — a wrong decode or a wrong
    // merge both fail the hash
    Entry("mm_audio_silence",
      """WITH src AS (SELECT doc_id, 64 + doc_id % 64 AS ns FROM documents),
        |sm AS (SELECT doc_id, t.i, abs((t.i*131 + doc_id) % 4096 - 2048) AS a
        |       FROM src, range(0, 128) t(i) WHERE t.i < ns),
        |w AS (SELECT doc_id, i // 16 AS win, count(*) AS n, CAST(sum(a) AS BIGINT) AS s
        |      FROM sm GROUP BY 1, 2),
        |sil AS (SELECT doc_id, win FROM w WHERE s < 900 * n),
        |g AS (SELECT doc_id, win,
        |       win - row_number() OVER (PARTITION BY doc_id ORDER BY win) AS grp
        |      FROM sil)
        |SELECT doc_id, CAST(min(win) AS BIGINT) AS start_win,
        |       CAST(max(win) AS BIGINT) AS end_win,
        |       CAST(count(*) AS BIGINT) AS n_windows
        |FROM g GROUP BY doc_id, grp ORDER BY ALL""".stripMargin) {
      (s, d) => ordered(Multimodal.audioSilence(docs(s, d)).toDF())
    })
}
