package graft.rel

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Stable

/** Round-9 web-ingestion wave (declared surface, SURVEY §2 Part B
  * continuation) — the three remaining steps between a raw crawl and the
  * corpus the existing hygiene/dedup/quality operators consume:
  *
  *   - q151 URL canonicalization + dedup: normalize raw crawl URLs
  *          (case-folded scheme/host, default port stripped, fragment
  *          dropped, tracking parameters removed, surviving query
  *          parameters sorted) and keep one fetch per canonical URL —
  *          the cheapest dedup any crawler runs, BEFORE content ever
  *          loads (CC-style URL-level dedup).
  *   - q152 fuzzy entity dedup: blocked pairwise Levenshtein matching
  *          (entity resolution): records bucket by a stable blocking
  *          key, candidate pairs inside a block match when edit
  *          distance ≤ 2, and every record reports its cluster
  *          representative — the classic record-linkage shape (exact
  *          string dedup misses typos; token Jaccard misses short
  *          strings).
  *   - q153 HTML boilerplate extraction: strip script/style blocks,
  *          drop tags, decode entities and collapse whitespace — the
  *          trafilatura-class main-content step, here as the exact
  *          regex-chain semantics both engines can replay so every
  *          extracted byte is oracle-checked.
  *
  * Raw inputs are synthesized deterministically from doc_id in BOTH
  * engines (the q93 pattern) — the documents table carries no URL or
  * HTML column, and synthesizing in the query keeps the oracle a full
  * hash check of the entire transformation.
  *
  * Oracle discipline as in [[Queries]]: BIGINT casts everywhere,
  * deterministic ORDER BY over a unique key, pure string/integer
  * transformations for everything the hash gate sums.
  */
object WebCurationQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- q151: URL canonicalization + keep-first dedup -----------------------

  /** Raw URL synthesis: scheme/host case varies by doc_id % 7 / % 2, an
    * explicit default port appears for % 11 == 0, a trailing slash for
    * % 5 == 0, tracking params (utm_source, ref) and a fragment come and
    * go on their own moduli, and the parameter ORDER differs by % 2 —
    * every variation canonicalization must erase, on top of a canonical
    * identity fully determined by doc_id % 60 (host % 4, item % 60 and
    * id % 30 all divide 60), so ~60 canonical groups absorb all the raw
    * variants. */
  private[graft] val rawUrlExpr: String =
    """concat(
         CASE WHEN doc_id % 7 = 0 THEN 'HTTPS://' ELSE 'https://' END,
         CASE WHEN doc_id % 2 = 0
              THEN CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'Docs.Example.COM' WHEN 1 THEN 'Wiki.Example.ORG'
                     WHEN 2 THEN 'News.Example.NET' ELSE 'Blog.Example.IO' END
              ELSE CASE CAST(doc_id % 4 AS INT)
                     WHEN 0 THEN 'docs.example.com' WHEN 1 THEN 'wiki.example.org'
                     WHEN 2 THEN 'news.example.net' ELSE 'blog.example.io' END END,
         CASE WHEN doc_id % 11 = 0 THEN ':443' ELSE '' END,
         '/item/', CAST(doc_id % 60 AS STRING),
         CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END,
         '?',
         CASE WHEN doc_id % 2 = 0
              THEN concat('id=', CAST(doc_id % 30 AS STRING), '&utm_source=feed&v=2')
              ELSE concat('v=2&id=', CAST(doc_id % 30 AS STRING)) END,
         CASE WHEN doc_id % 3 = 0 THEN '&ref=rss' ELSE '' END,
         CASE WHEN doc_id % 2 = 1 THEN concat('#s', CAST(doc_id % 5 AS STRING)) ELSE '' END)"""

  /** Canonicalize raw URLs (pure string algebra: split on '#'/'?'/'/'/
    * ':', case-fold scheme+host, strip the default port and trailing
    * slash, drop utm_- and ref=-prefixed params, sort the survivors) and keep one
    * fetch per canonical URL. Output per canonical group: the canonical
    * URL, raw fetch count, distinct raw spellings, keeper (min doc_id).
    *
    * Scale shape: canonicalization is a zero-shuffle projection; the
    * dedup is ONE exchange on the canonical key whose count/min
    * aggregates are map-side combinable — a URL fetched a billion times
    * ships one partial row per map partition (the q142 keeper-election
    * argument: an aggregate, never a row_number window over the hot
    * URL key). */
  def q151UrlCanonicalDedup(s: SparkSession, dir: String): DataFrame =
    canonicalUrlDedup(
      t(s, dir, "documents").select(col("doc_id"), expr(rawUrlExpr).as("url")))

  /** Core of q151 over any (doc_id, url) frame — spec/library entry
    * point. Assumes an 8-char scheme prefix ('https://' in any casing),
    * which the raw synthesis guarantees and real crawl frontiers
    * normalize on write. */
  def canonicalUrlDedup(raw: DataFrame): DataFrame = {
    val noTracking = (p: Column) =>
      substring(p, 1, 4) =!= "utm_" && substring(p, 1, 4) =!= "ref="
    val canon = raw
      .withColumn("nofrag", element_at(split(col("url"), "#"), 1))
      .withColumn("pathpart", element_at(split(col("nofrag"), "[?]"), 1))
      .withColumn("query",
        when(size(split(col("nofrag"), "[?]")) > 1,
          element_at(split(col("nofrag"), "[?]"), 2)).otherwise(lit("")))
      .withColumn("hostraw",
        element_at(split(expr("substr(pathpart, 9)"), "/"), 1))
      .withColumn("host", lower(element_at(split(col("hostraw"), ":"), 1)))
      .withColumn("path",
        regexp_replace(expr("substr(pathpart, 9 + length(hostraw))"), "/+$", ""))
      .withColumn("pj",
        array_join(array_sort(filter(split(col("query"), "&"), noTracking)), "&"))
      .select(col("doc_id"), col("url"),
        concat(lit("https://"), col("host"), col("path"),
          when(col("pj") === "", lit("")).otherwise(concat(lit("?"), col("pj"))))
          .as("canonical_url"))
    canon.groupBy("canonical_url")
      .agg(count(lit(1)).as("n_raw"),
        countDistinct(col("url")).as("n_variants"),
        min(col("doc_id")).as("keeper_doc"))
      .select(col("canonical_url"), col("n_raw").cast("long").as("n_raw"),
        col("n_variants").cast("long").as("n_variants"),
        col("keeper_doc").cast("long").as("keeper_doc"))
      .orderBy("canonical_url")
  }

  /** DuckDB twin — literal-separator string_split vs Spark's regex
    * split is the one semantic fork ('?' needs the '[?]' spelling on
    * the Spark side; the front-door patch documents it). */
  val q151Oracle: String =
    s"""WITH raw AS (SELECT doc_id, $rawUrlExpr AS url FROM documents),
       p AS (SELECT doc_id, url, string_split(url, '#')[1] AS nofrag FROM raw),
       q AS (SELECT doc_id, url,
           string_split(nofrag, '?')[1] AS pathpart,
           CASE WHEN len(string_split(nofrag, '?')) > 1
                THEN string_split(nofrag, '?')[2] ELSE '' END AS query
         FROM p),
       h AS (SELECT doc_id, url, pathpart, query,
           string_split(substr(pathpart, 9), '/')[1] AS hostraw FROM q),
       c AS (SELECT doc_id, url,
           lower(string_split(hostraw, ':')[1]) AS host,
           regexp_replace(substr(pathpart, 9 + length(hostraw)), '/+$$', '') AS path,
           array_to_string(list_sort(list_filter(string_split(query, '&'),
             pp -> substr(pp, 1, 4) <> 'utm_' AND substr(pp, 1, 4) <> 'ref=')), '&') AS pj
         FROM h)
       SELECT concat('https://', host, path,
           CASE WHEN pj = '' THEN '' ELSE concat('?', pj) END) AS canonical_url,
         COUNT(*) AS n_raw,
         CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
         MIN(doc_id) AS keeper_doc
       FROM c GROUP BY 1 ORDER BY 1"""

  // ---- q152: blocked fuzzy entity dedup (Levenshtein) ----------------------

  /** Entity-record synthesis: 25 canonical vendor names; each record is
    * the canonical spelling (doc_id % 3 == 0), a one-char deletion at
    * position 12 (% 3 == 1) or a one-char substitution at position 14
    * (% 3 == 2) — so every record sits within edit distance 1 of its
    * canonical and within 2 of every sibling, while names from different
    * canonicals differ in the first 10 characters. */
  private[graft] val entityNameExpr: String =
    """CASE CAST(doc_id % 3 AS INT)
         WHEN 0 THEN concat('vendor-', lpad(CAST(doc_id % 25 AS STRING), 2, '0'),
                            '-global-trading')
         WHEN 1 THEN concat('vendor-', lpad(CAST(doc_id % 25 AS STRING), 2, '0'),
                            '-gobal-trading')
         ELSE concat('vendor-', lpad(CAST(doc_id % 25 AS STRING), 2, '0'),
                     '-gloxal-trading') END"""

  /** Blocked pairwise Levenshtein entity resolution: records block on
    * their first 10 characters (stable under the tail-typos the
    * synthesis injects — standard blocking-key design), candidate pairs
    * form only WITHIN a block, a pair matches when levenshtein ≤ 2, and
    * each record reports the minimum doc_id among its matches and
    * itself as cluster representative. Output per record: doc_id, name,
    * rep_id, is_rep.
    *
    * Scale shape: candidate generation is the block self-join over
    * DISTINCT SPELLINGS — pair count is Σ|distinct names in block|²,
    * never n² and never even Σ|block|² (a spelling occurring a million
    * times pairs once; records rejoin through their name class); a hot
    * block is a data-model bug surfaced by the q127-style card, and
    * salting splits it if legitimate. The per-record representative is
    * a map-side-combinable MIN aggregate over name-class edges. One-step
    * min is exact here because blocks are cliques under the ≤2 threshold
    * by construction; transitive chains beyond one hop are q81's
    * Hash-Min fixpoint, which composes on top of these edges
    * unchanged. */
  def q152FuzzyEntityDedup(s: SparkSession, dir: String): DataFrame =
    fuzzyEntityDedup(
      t(s, dir, "documents").select(col("doc_id"), expr(entityNameExpr).as("name")),
      maxDist = 2)

  /** Core of q152 over any (doc_id, name) frame — spec/library entry
    * point.
    *
    * The Levenshtein pair join runs over DISTINCT NAMES per block, not
    * records — the textbook record-linkage split: a spelling that occurs
    * a million times pairs ONCE, and records rejoin through their
    * name-class afterwards. Record-level semantics are unchanged (two
    * records match iff their names are within maxDist in one block;
    * identical names are distance 0), because a record's minimum matched
    * doc_id equals the minimum over its matched NAME classes' own
    * minimum doc_ids. This moved q152 from the suite's most expensive
    * row (4.6 s at sf0.1 — |block|² record pairs) to |distinct names per
    * block|² edit distances. */
  def fuzzyEntityDedup(recs: DataFrame, maxDist: Int): DataFrame = {
    val blocked = recs.withColumn("blk", substring(col("name"), 1, 10))
    // one row per distinct spelling, carrying its class-minimum doc_id
    val names = blocked.groupBy("blk", "name").agg(min(col("doc_id")).as("nmin"))
    val a = names.select(col("blk"), col("name").as("name_a"))
    val b = names.select(col("blk"), col("name").as("name_b"), col("nmin").as("nmin_b"))
    // distance-0 self pairs included: a name class always matches itself
    val nameReps = a.join(b, "blk")
      .where(levenshtein(col("name_a"), col("name_b")) <= maxDist)
      .groupBy(col("name_a").as("name")).agg(min(col("nmin_b")).as("rep_id"))
    blocked.join(nameReps, "name")
      .select(col("doc_id"), col("name"), col("rep_id"),
        (col("rep_id") === col("doc_id")).as("is_rep"))
      .orderBy("doc_id")
  }

  /** Verbatim-shape twin: DuckDB ships the same `levenshtein` (unit-cost
    * edit distance), so the whole match predicate is portable. */
  val q152Oracle: String =
    s"""WITH recs AS (SELECT doc_id, $entityNameExpr AS name FROM documents),
       blk AS (SELECT doc_id, name, substr(name, 1, 10) AS blk FROM recs),
       edges AS (SELECT a.doc_id AS doc_id, b.doc_id AS nbr
                 FROM blk a JOIN blk b
                   ON a.blk = b.blk AND a.doc_id <> b.doc_id
                 WHERE levenshtein(a.name, b.name) <= 2),
       reps AS (SELECT doc_id, MIN(nbr) AS rep_id
                FROM (SELECT doc_id, doc_id AS nbr FROM blk
                      UNION ALL SELECT doc_id, nbr FROM edges)
                GROUP BY doc_id)
       SELECT b.doc_id, b.name, r.rep_id, r.rep_id = b.doc_id AS is_rep
       FROM blk b JOIN reps r ON b.doc_id = r.doc_id
       ORDER BY b.doc_id"""

  // ---- q153: HTML boilerplate extraction -----------------------------------

  /** Deterministic HTML page around each document: title with an
    * entity, style/nav/script chrome, body in 12-token paragraphs. The
    * corpus alphabet is bare lowercase words, so '<', '&' and entities
    * occur exactly where the synthesis puts them. */
  private[graft] val htmlExpr: String =
    """concat(
         '<html><head><title>Doc ', CAST(doc_id AS STRING),
         ' &amp; notes</title><style>p{color:red}</style></head>',
         '<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>',
         array_join(transform(sequence(0, (size(split(text, ' ')) - 1) div 12),
           i -> concat('<p>', array_join(slice(split(text, ' '), i * 12 + 1, 12), ' '),
                       '</p>')), ''),
         '<script>var x = 1 &lt; 2;</script></body></html>')"""

  /** Main-content extraction as an exact regex chain: (1) drop
    * script/style elements with their content, (2) strip every
    * remaining tag, (3) decode the three entities the page class emits,
    * (4) collapse runs of spaces and trim. Output per document: the
    * decoded title, extracted-text md5, and its length — a full hash
    * check of every extracted byte.
    *
    * Scale shape: zero shuffles before the declared sort — the
    * every-byte-once projection pipeline (the q143/q144 class); each
    * regex is anchored to a single pass over the page and the chain
    * stays inside whole-stage codegen (built-in string expressions,
    * no UDF). */
  def q153HtmlExtract(s: SparkSession, dir: String): DataFrame =
    htmlExtract(
      t(s, dir, "documents").select(col("doc_id"), expr(htmlExpr).as("html")))

  private def decodeEntities(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(c,
      "&amp;", "&"), "&lt;", "<"), "&gt;", ">")

  /** The extraction chain as a reusable column — clean main-content text
    * from a raw HTML column (script/style removal, tag strip, entity
    * decode, whitespace collapse). The page class has no tag-spanning
    * newlines, so the lazy `.*?` element bodies need no DOTALL flag in
    * either engine. */
  def extractedText(html: Column): Column =
    trim(decodeEntities(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, "<script>.*?</script>|<style>.*?</style>", " "),
          "<[^>]*>", " "),
        " +", " ")))

  /** The decoded `<title>` content of a raw HTML column. */
  def extractedTitle(html: Column): Column =
    decodeEntities(regexp_extract(html, "<title>([^<]*)</title>", 1))

  /** Core of q153 over any (doc_id, html) frame — spec/library entry
    * point. */
  def htmlExtract(pages: DataFrame): DataFrame = {
    val text = extractedText(col("html"))
    pages
      .select(col("doc_id"),
        extractedTitle(col("html")).as("title"),
        md5(text).as("text_hash"),
        length(text).cast("long").as("n_chars"))
      .orderBy("doc_id")
  }

  /** DuckDB twin — same regex chain with the 'g' flag (RE2 and Java
    * agree on every pattern the chain uses: lazy element bodies,
    * negated char class tags, space runs). */
  val q153Oracle: String =
    s"""WITH pg AS (SELECT doc_id, $htmlOracleExpr AS html FROM documents),
       ex AS (SELECT doc_id, html,
           trim(regexp_replace(
             replace(replace(replace(
               regexp_replace(
                 regexp_replace(html, '<script>.*?</script>|<style>.*?</style>', ' ', 'g'),
                 '<[^>]*>', ' ', 'g'),
               '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
             ' +', ' ', 'g')) AS txt
         FROM pg)
       SELECT doc_id,
         replace(replace(replace(regexp_extract(html, '<title>([^<]*)</title>', 1),
           '&amp;', '&'), '&lt;', '<'), '&gt;', '>') AS title,
         md5(txt) AS text_hash,
         CAST(length(txt) AS BIGINT) AS n_chars
       FROM ex ORDER BY doc_id"""

  /** The DuckDB spelling of [[htmlExpr]] (list_transform / generate_series
    * / array_to_string / `//`). */
  private def htmlOracleExpr: String =
    """concat(
         '<html><head><title>Doc ', CAST(doc_id AS STRING),
         ' &amp; notes</title><style>p{color:red}</style></head>',
         '<body><nav><a href="/">Home</a> | <a href="/about">About</a></nav>',
         array_to_string(list_transform(
           generate_series(0, (len(string_split(text, ' ')) - 1) // 12),
           i -> concat('<p>', array_to_string(
                  list_slice(string_split(text, ' '), i * 12 + 1, i * 12 + 12), ' '),
                '</p>')), ''),
         '<script>var x = 1 &lt; 2;</script></body></html>')"""

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_url_canonical_dedup" -> (q151UrlCanonicalDedup _),
    "q152_fuzzy_entity_dedup" -> (q152FuzzyEntityDedup _),
    "q153_html_extract" -> (q153HtmlExtract _))

  val oracles: Map[String, String] = Map(
    "q151_url_canonical_dedup" -> q151Oracle,
    "q152_fuzzy_entity_dedup" -> q152Oracle,
    "q153_html_extract" -> q153Oracle)
}
