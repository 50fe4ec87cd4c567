"""Remaining SURVEY §2 operator coverage: F4/F6, A3/A7/A10, W3/W5/W7/W9/
W10/W11, T1/T5, E3/E4, C1-C3/C6/C8/C10/C11/C13/C14/C19/C21.

Same cross-engine discipline as the rest of the library (see
operators/__init__.py).  W10 and A10 are the two genuinely
non-SQL-expressible ops (ordered DP / model-selection loops) — they run as
``applyInPandas`` grouped-map kernels and carry no oracle_sql (the driver
records a rows-only check; their semantics are pinned by the pytest
parity suite instead).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ocr_spark.operators.filters import _WORDS_SQL, words
from ocr_spark.operators.tables import load

STOPWORDS = ("the", "and", "with", "from", "that", "this", "have", "for")


def f4_drop_list(spark, sf_dir):
    """F4 — configured drop-list (drop_nutrients, NFT_OCR.py:1094,1484):
    exclude configured keys with ~isin."""
    e = load(spark, sf_dir, "events")
    return (
        e.filter(~F.col("event_type").isin("heartbeat", "noop"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


F4_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events WHERE event_type NOT IN ('heartbeat', 'noop')
GROUP BY event_type
"""


def f6_lexicon_gate(spark, sf_dir):
    """F6 — document gate by lexicon-hit count (ingredients_present,
    NFT_PreProcessing.py:66-80): keep docs with >= 3 distinct marker words."""
    markers = ("data", "query", "table", "index", "join")
    w = words(spark, sf_dir)
    return (
        w.filter(F.col("word").isin(*markers))
        .groupBy("doc_id")
        .agg(F.countDistinct("word").cast("bigint").alias("n_markers"))
        .filter(F.col("n_markers") >= 3)
    )


F6_SQL = f"""
SELECT doc_id, CAST(count(DISTINCT word) AS BIGINT) AS n_markers
FROM ({_WORDS_SQL})
WHERE word IN ('data', 'query', 'table', 'index', 'join')
GROUP BY doc_id HAVING count(DISTINCT word) >= 3
"""


def a3_median(spark, sf_dir):
    """A3 — median (LineWorker.fill_region, NFT_OCR.py:375-388): exact
    percentile per group (percentile_approx at cluster scale; exact here so
    the DuckDB oracle agrees bit-for-bit)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value")
    )


A3_SQL = """
SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value
FROM events GROUP BY event_type
"""


def a7_correction_counter(spark, sf_dir):
    """A7 — correction counter (spell_correct_string,
    Ingredients_OCR.py:159-177): per-doc count of tokens that needed a
    fix (here: tokens containing digits-adjacent letters, the Omg/Og
    confusion class)."""
    w = words(spark, sf_dir)
    flag = F.when(F.col("word").rlike("[0-9][a-z]|[a-z][0-9]"), 1).otherwise(0)
    return w.groupBy("doc_id").agg(F.sum(flag).cast("bigint").alias("n_corrections"))


A7_SQL = f"""
SELECT doc_id,
       CAST(sum(CASE WHEN regexp_matches(word, '[0-9][a-z]|[a-z][0-9]')
                THEN 1 ELSE 0 END) AS BIGINT) AS n_corrections
FROM ({_WORDS_SQL}) GROUP BY doc_id
"""


def w3_top_to_bottom(spark, sf_dir):
    """W3 — top-to-bottom ordering (NFT_OCR.py:332-334): dense rank of
    events per user by timestamp."""
    e = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", F.row_number().over(win).cast("bigint").alias("order_idx")
    )


W3_SQL = """
SELECT user_id, event_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
         AS order_idx
FROM events
"""


def w5_neighbor_disambiguation(spark, sf_dir):
    """W5 — neighbor-context disambiguation (NFT_OCR.py:156-196): a token
    means something different if its predecessor is a qualifier ('total'
    fat vs fat) — lag over the reading-order window."""
    w = words(spark, sf_dir)
    win = Window.partitionBy("doc_id").orderBy("pos")
    qualified = F.lag("word", 1).over(win).isin("hash", "merge", "sort")
    return (
        w.withColumn("prev", F.lag("word", 1).over(win))
        .withColumn("is_qualified", qualified.cast("int"))
        .filter(F.col("word") == "join")
        .select("doc_id", "pos", "prev", "is_qualified")
    )


W5_SQL = f"""
WITH seq AS (
  SELECT doc_id, pos, word,
         lag(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM ({_WORDS_SQL})
)
SELECT doc_id, pos, prev,
       CAST(prev IN ('hash', 'merge', 'sort') AS INT) AS is_qualified
FROM seq WHERE word = 'join'
"""


def w7_block_truncation(spark, sf_dir):
    """W7 — block-scoped truncation (remove_calories_from,
    NFT_OCR.py:723-737): within each (user, day) block, drop events at or
    after the first 'error' — min(when(matched, pos)) over the block."""
    e = load(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    win = Window.partitionBy("user_id", "day")
    seq = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    d = e.select("user_id", day, "event_id", "ts", "event_type").withColumn(
        "pos", F.row_number().over(seq)
    )
    cut = F.min(F.when(F.col("event_type") == "error", F.col("pos"))).over(win)
    return (
        d.withColumn("cut", cut)
        .filter(F.col("cut").isNull() | (F.col("pos") < F.col("cut")))
        .select("user_id", "day", "event_id")
    )


W7_SQL = """
WITH d AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id, event_type,
         row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
                            ORDER BY ts, event_id) AS pos
  FROM events
),
c AS (
  SELECT *, min(CASE WHEN event_type = 'error' THEN pos END)
              OVER (PARTITION BY user_id, day) AS cut
  FROM d
)
SELECT user_id, day, event_id FROM c WHERE cut IS NULL OR pos < cut
"""


def w9_rightmost_preference(spark, sf_dir):
    """W9 — rightmost-language preference (find_nutrient,
    NFT_OCR.py:1336-1358): per doc take the greatest position among two
    marker words; greatest() over matched positions."""
    w = words(spark, sf_dir)
    return (
        w.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("word") == "data", F.col("pos"))).alias("p_en"),
            F.max(F.when(F.col("word") == "table", F.col("pos"))).alias("p_fr"),
        )
        .filter(F.col("p_en").isNotNull() | F.col("p_fr").isNotNull())
        .select(
            "doc_id",
            F.greatest(F.col("p_en"), F.col("p_fr")).alias("rightmost_pos"),
        )
    )


W9_SQL = f"""
WITH m AS (
  SELECT doc_id,
         max(CASE WHEN word = 'data' THEN pos END) AS p_en,
         max(CASE WHEN word = 'table' THEN pos END) AS p_fr
  FROM ({_WORDS_SQL}) GROUP BY doc_id
)
SELECT doc_id, greatest(p_en, p_fr) AS rightmost_pos
FROM m WHERE p_en IS NOT NULL OR p_fr IS NOT NULL
"""


def w11_positional_cascade(spark, sf_dir):
    """W11 — positional value/unit extraction (extract_units_and_quantities,
    NFT_OCR.py:1197-1241): value at pos+1 else pos+2 — a lead() + case
    cascade in reading order."""
    w = words(spark, sf_dir)
    win = Window.partitionBy("doc_id").orderBy("pos")
    num = r"^[0-9]+(\.[0-9]+)?$"
    d = (
        w.withColumn("n1", F.lead("word", 1).over(win))
        .withColumn("n2", F.lead("word", 2).over(win))
        .filter(F.col("word") == "value")
    )
    return d.select(
        "doc_id",
        "pos",
        F.when(F.col("n1").rlike(num), F.col("n1"))
        .when(F.col("n2").rlike(num), F.col("n2"))
        .alias("extracted_value"),
    )


W11_SQL = f"""
WITH seq AS (
  SELECT doc_id, pos, word,
         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS n1,
         lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS n2
  FROM ({_WORDS_SQL})
)
SELECT doc_id, pos,
       CASE WHEN regexp_matches(n1, '^[0-9]+(\\.[0-9]+)?$') THEN n1
            WHEN regexp_matches(n2, '^[0-9]+(\\.[0-9]+)?$') THEN n2 END
         AS extracted_value
FROM seq WHERE word = 'value'
"""


_LIS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("lis_len", IntegerType()),
    ]
)


def _lis_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """O(n log n) longest non-decreasing subsequence over the per-user
    value sequence in time order."""
    import bisect

    pdf = pdf.sort_values(["ts", "event_id"])
    tails: list[float] = []
    for v in pdf["value"]:
        i = bisect.bisect_right(tails, v)
        if i == len(tails):
            tails.append(v)
        else:
            tails[i] = v
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_events": [len(pdf)],
            "lis_len": [len(tails)],
        }
    )


def w10_longest_subsequence(spark, sf_dir):
    """W10 — longest non-decreasing subsequence (longestSubsequence,
    skeletonHelperFunctions.py:281-309): the reference's monotonicity
    constraint, as a grouped-map applyInPandas kernel (not SQL-expressible;
    rows-only driver check).  Groups are per-user, bounded size, so no
    salting is needed; at 100 TB shard long groups with overlap."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_lis_kernel, _LIS_SCHEMA)
    )


def a10_model_selection(spark, sf_dir):
    """A10 — per-group model-selection loop (splitFragmentIntoClusters,
    skeletonHelperFunctions.py:65-240): pick k minimizing a variance score;
    the iterative scoring stays in applyInPandas (rows-only check)."""

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("best_k", IntegerType()),
        ]
    )

    def pick_k(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"].sort_values().to_numpy()
        best_k, best_score = 1, float("inf")
        for k in (1, 2, 3):
            if len(vals) < k:
                break
            # contiguous equal-frequency split; score = sum of within-std
            parts = [vals[i * len(vals) // k : (i + 1) * len(vals) // k] for i in range(k)]
            score = sum(p.std() for p in parts if len(p)) + 0.05 * k
            if score < best_score:
                best_k, best_score = k, score
        return pd.DataFrame({"user_id": [int(pdf["user_id"].iloc[0])], "best_k": [best_k]})

    e = load(spark, sf_dir, "events")
    return e.select("user_id", "value").groupBy("user_id").applyInPandas(pick_k, schema)


def t1_sort_by_distance(spark, sf_dir):
    """T1 — sort-by-distance within a collection (NFT_OCR.py:81):
    array_sort over per-doc collected structs, fully JVM-side."""
    w = words(spark, sf_dir).filter(F.length("word") >= 7)
    return (
        w.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "word"))).alias("arr"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.transform("arr", lambda x: x.word)).alias("ordered_text"),
        )
    )


T1_SQL = f"""
SELECT doc_id,
       string_agg(word, ' ' ORDER BY pos) AS ordered_text
FROM ({_WORDS_SQL}) WHERE length(word) >= 7
GROUP BY doc_id
"""


def t5_leftmost_tie_break(spark, sf_dir):
    """T5 — leftmost-hit tie-break (NFT_OCR.py:153-155): min(pos) of a
    matched term per doc."""
    w = words(spark, sf_dir)
    return (
        w.filter(F.col("word") == "data")
        .groupBy("doc_id")
        .agg(F.min("pos").alias("first_pos"))
    )


T5_SQL = f"""
SELECT doc_id, min(pos) AS first_pos
FROM ({_WORDS_SQL}) WHERE word = 'data' GROUP BY doc_id
"""


def e3_union_vocab(spark, sf_dir):
    """E3 — union of vocabularies (EN + FR nutrient lists,
    NFT_OCR.py:1126-1127)."""
    c = load(spark, sf_dir, "customer").select(F.col("c_name").alias("name"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.union(s).distinct()


E3_SQL = """
SELECT c_name AS name FROM customer
UNION
SELECT s_name AS name FROM supplier
"""


def e4_levenshtein_anti(spark, sf_dir):
    """E4 — set-difference with fuzzy predicate (drop lexicon entries near
    reserved words, Ingredients_OCR.py:129-139): left_anti under
    levenshtein <= 1 against a broadcast reserved list."""
    reserved = spark.createDataFrame(
        [("table",), ("index",), ("query",)], ["reserved"]
    )
    w = words(spark, sf_dir).select("word").filter(F.length("word") >= 5).distinct()
    return w.join(
        F.broadcast(reserved),
        F.levenshtein(F.col("word"), F.col("reserved")) <= 1,
        "left_anti",
    )


E4_SQL = f"""
WITH w AS (SELECT DISTINCT word FROM ({_WORDS_SQL}) WHERE length(word) >= 5),
r AS (SELECT unnest(['table', 'index', 'query']) AS reserved)
SELECT word FROM w
WHERE NOT EXISTS (SELECT 1 FROM r WHERE levenshtein(w.word, r.reserved) <= 1)
"""


def c1_c2_c3_cleanup_chain(spark, sf_dir):
    """C1-C3 — lowercase + trim + ordered char substitutions
    (correct_bad_text, NFT_OCR.py:751-780): the order-sensitive cleanup
    chain as a single projection (kept in one expression chain so the
    whole thing stays inside WholeStageCodegen)."""
    d = load(spark, sf_dir, "documents")
    t = F.lower(F.trim(F.col("text")))
    t = F.translate(t, "é*", "e")          # é->e, * dropped
    t = F.regexp_replace(t, r"\((.*?)\)", r"$1")  # strip parens, keep body
    return d.select("doc_id", t.alias("cleaned"))


C1_SQL = r"""
SELECT doc_id,
       regexp_replace(translate(lower(trim(text)), 'é*', 'e'),
                      '\((.*?)\)', '\1', 'g') AS cleaned
FROM documents
"""


def c6_dictionary_respell(spark, sf_dir):
    """C6 — dictionary respell (correct_spelling, NFT_OCR.py:683-693):
    fixed-phrase replacements applied in declaration order."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    t = F.regexp_replace(t, r"\bdata\b", "record")
    t = F.regexp_replace(t, r"\brecords\b", "rows")
    return d.select("doc_id", t.alias("respelled"))


C6_SQL = r"""
SELECT doc_id,
       regexp_replace(regexp_replace(text, '\bdata\b', 'record', 'g'),
                      '\brecords\b', 'rows', 'g') AS respelled
FROM documents
"""


def c8_token_merge(spark, sf_dir):
    """C8 — token merging ('vitamin','a' -> 'vitamin a'; merge_vitamin,
    NFT_OCR.py:919-943): lead-based conditional concat + drop-next, as
    array ops after the merge decision."""
    w = words(spark, sf_dir)
    win = Window.partitionBy("doc_id").orderBy("pos")
    d = (
        w.withColumn("nxt", F.lead("word", 1).over(win))
        .withColumn("prv", F.lag("word", 1).over(win))
        .withColumn(
            "merged",
            F.when(
                (F.col("word") == "primary") & (F.col("nxt") == "key"),
                F.concat_ws(" ", "word", "nxt"),
            ).otherwise(F.col("word")),
        )
        # drop the absorbed right-hand token
        .filter(~((F.col("word") == "key") & (F.col("prv") == "primary")))
    )
    return d.select("doc_id", "pos", "merged")


C8_SQL = f"""
WITH seq AS (
  SELECT doc_id, pos, word,
         lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt,
         lag(word, 1)  OVER (PARTITION BY doc_id ORDER BY pos) AS prv
  FROM ({_WORDS_SQL})
)
SELECT doc_id, pos,
       CASE WHEN word = 'primary' AND nxt = 'key' THEN word || ' ' || nxt
            ELSE word END AS merged
FROM seq
WHERE NOT (word = 'key' AND prv = 'primary')
"""


def c10_unit_whitelist(spark, sf_dir):
    """C10 — unit whitelist (extract_units, NFT_OCR.py:1150-1161):
    token IN fixed set."""
    w = words(spark, sf_dir)
    return (
        w.filter(F.col("word").isin("a", "of", "the", "in"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


C10_SQL = f"""
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM ({_WORDS_SQL}) WHERE word IN ('a', 'of', 'the', 'in') GROUP BY word
"""


def c11_alpha_normalize(spark, sf_dir):
    """C11 — alpha-only normalize keeping accents (process_str,
    Ingredients_OCR.py:28-35)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-zéàèùâêîôû ]", "")
        ).alias("alpha_text"),
    )


C11_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '[^a-zéàèùâêîôû ]', '', 'g')) AS alpha_text
FROM documents
"""


def c13_fuzzy_marker_split(spark, sf_dir):
    """C13 — fuzzy-regex occurrence location (split_ingrdients,
    Ingredients_OCR.py:14-25): positions of tokens within levenshtein <= 2
    of the marker; the bilingual split point is the 2nd occurrence."""
    w = words(spark, sf_dir)
    hits = w.filter(
        (F.length("word") >= 6) & (F.levenshtein(F.col("word"), F.lit("windows")) <= 2)
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("occ", F.row_number().over(win))
        .filter(F.col("occ") == 2)
        .select("doc_id", F.col("pos").alias("split_pos"))
    )


C13_SQL = f"""
WITH hits AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS occ
  FROM ({_WORDS_SQL})
  WHERE length(word) >= 6 AND levenshtein(word, 'windows') <= 2
)
SELECT doc_id, pos AS split_pos FROM hits WHERE occ = 2
"""


def c14_word_split_filter(spark, sf_dir):
    """C14 — sentence/word split + stopword/length filter (split_to_words,
    Ingredients_OCR.py:284-292): split on punctuation, explode, filter."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), r"[,.;:() ]+")).alias("tok"),
    )
    return (
        tok.filter((F.length("tok") >= 5) & (~F.col("tok").isin(*STOPWORDS)))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_content_words"))
    )


C14_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[,.;:() ]+')) AS tok
  FROM documents
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_content_words
FROM tok
WHERE length(tok) >= 5 AND tok NOT IN {STOPWORDS!r}
GROUP BY doc_id
"""


def c19_block_assembly(spark, sf_dir):
    """C19 — hierarchical block text assembly (combine_block,
    Google_OCR_API.py:28-35): nested collect -> flatten -> concat_ws,
    rebuilding text from the (doc, line, pos) span tree."""
    w = words(spark, sf_dir).withColumn("line_id", F.col("pos") / 8)
    lines = (
        w.withColumn("line_id", F.floor("line_id"))
        .groupBy("doc_id", "line_id")
        .agg(F.concat_ws(" ", F.transform(F.sort_array(F.collect_list(F.struct("pos", "word"))), lambda x: x.word)).alias("line_text"))
    )
    return (
        lines.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("line_id", "line_text"))),
                    lambda x: x.line_text,
                ),
            ).alias("assembled")
        )
    )


C19_SQL = f"""
WITH w AS (SELECT doc_id, pos, word, CAST(floor(pos / 8) AS BIGINT) AS line_id
           FROM ({_WORDS_SQL})),
l AS (
  SELECT doc_id, line_id, string_agg(word, ' ' ORDER BY pos) AS line_text
  FROM w GROUP BY doc_id, line_id
)
SELECT doc_id, string_agg(line_text, chr(10) ORDER BY line_id) AS assembled
FROM l GROUP BY doc_id
"""


def c21_array_map_access(spark, sf_dir):
    """C21 — array/map element access (data['text'][i±1], throughout the
    reference): element_at over a per-doc collected array."""
    w = words(spark, sf_dir)
    arr = w.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "word"))).alias("arr")
    )
    return arr.select(
        "doc_id",
        # try_element_at: ANSI mode (Spark 4 default) makes element_at
        # throw on out-of-range; DuckDB's arr[3] yields NULL — match it
        F.try_element_at(F.col("arr"), F.lit(1)).word.alias("first_word"),
        F.try_element_at(F.col("arr"), F.lit(3)).word.alias("third_word"),
        F.size("arr").cast("bigint").alias("n"),
    )


C21_SQL = f"""
WITH a AS (
  SELECT doc_id, array_agg(word ORDER BY pos) AS arr
  FROM ({_WORDS_SQL}) GROUP BY doc_id
)
SELECT doc_id, arr[1] AS first_word, arr[3] AS third_word,
       CAST(len(arr) AS BIGINT) AS n
FROM a
"""


QUERIES = {
    "f4_drop_list": (f4_drop_list, F4_SQL),
    "f6_lexicon_gate": (f6_lexicon_gate, F6_SQL),
    "a3_median": (a3_median, A3_SQL),
    "a7_correction_counter": (a7_correction_counter, A7_SQL),
    "a10_model_selection": (a10_model_selection, None),
    "w3_top_to_bottom": (w3_top_to_bottom, W3_SQL),
    "w5_neighbor_disambiguation": (w5_neighbor_disambiguation, W5_SQL),
    "w7_block_truncation": (w7_block_truncation, W7_SQL),
    "w9_rightmost_preference": (w9_rightmost_preference, W9_SQL),
    "w10_longest_subsequence": (w10_longest_subsequence, None),
    "w11_positional_cascade": (w11_positional_cascade, W11_SQL),
    "t1_sort_by_distance": (t1_sort_by_distance, T1_SQL),
    "t5_leftmost_tie_break": (t5_leftmost_tie_break, T5_SQL),
    "e3_union_vocab": (e3_union_vocab, E3_SQL),
    "e4_levenshtein_anti": (e4_levenshtein_anti, E4_SQL),
    "c1_c2_c3_cleanup_chain": (c1_c2_c3_cleanup_chain, C1_SQL),
    "c6_dictionary_respell": (c6_dictionary_respell, C6_SQL),
    "c8_token_merge": (c8_token_merge, C8_SQL),
    "c10_unit_whitelist": (c10_unit_whitelist, C10_SQL),
    "c11_alpha_normalize": (c11_alpha_normalize, C11_SQL),
    "c13_fuzzy_marker_split": (c13_fuzzy_marker_split, C13_SQL),
    "c14_word_split_filter": (c14_word_split_filter, C14_SQL),
    "c19_block_assembly": (c19_block_assembly, C19_SQL),
    "c21_array_map_access": (c21_array_map_access, C21_SQL),
}
