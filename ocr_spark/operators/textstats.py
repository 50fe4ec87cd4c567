"""Text-analysis operators for training-data pipelines (documents table):
language ID, quality scoring, tokenizer-style counting, fingerprinting.
All pure JVM column expressions — whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.dedup import _hash60, _hash60_sql
from ocr_spark.operators.tables import load

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def lang_id_heuristic(spark, sf_dir):
    """n-gram/stopword language heuristic (check_language,
    Ingredients_OCR.py:197-214 generalized): marker-hit scores + verdict."""
    d = load(spark, sf_dir, "documents")
    en = F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b")).cast("bigint")
    dataish = F.regexp_count(F.col("text"), F.lit(r"\b(data|row|column)\b")).cast("bigint")
    return d.select(
        "doc_id",
        en.alias("en_score"),
        dataish.alias("data_score"),
        F.when(en > dataish, "en_heavy")
        .when(dataish > en, "data_heavy")
        .otherwise("tie")
        .alias("verdict"),
    )


LANG_ID_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\b(the|a)\b')) AS BIGINT) AS en_score,
       CAST(len(regexp_extract_all(text, '\b(data|row|column)\b')) AS BIGINT) AS data_score,
       CASE WHEN len(regexp_extract_all(text, '\b(the|a)\b'))
             > len(regexp_extract_all(text, '\b(data|row|column)\b')) THEN 'en_heavy'
            WHEN len(regexp_extract_all(text, '\b(data|row|column)\b'))
             > len(regexp_extract_all(text, '\b(the|a)\b')) THEN 'data_heavy'
            ELSE 'tie' END AS verdict
FROM documents
"""


def quality_score(spark, sf_dir):
    """Document quality scoring: length, word count, mean word length,
    stopword ratio — the length/punct/stopword heuristics of data-quality
    filtering pipelines."""
    d = load(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(F.split(F.col("text"), " ")).cast("bigint")
    stop_re = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = F.regexp_count(F.col("text"), F.lit(stop_re)).cast("bigint")
    mean_wlen = F.round(n_chars / F.greatest(n_words, F.lit(1)), 4)
    stop_ratio = F.round(n_stop / F.greatest(n_words, F.lit(1)), 4)
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        stop_ratio.alias("stop_ratio"),
        F.when((n_words >= 20) & (stop_ratio < 0.4), "keep")
        .otherwise("drop")
        .alias("quality_verdict"),
    )


QUALITY_SQL = rf"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars_m,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(text, '\b({"|".join(STOPWORDS)})\b')) AS BIGINT) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars_m, n_words,
       round(n_chars_m / greatest(n_words, 1), 4) AS mean_wlen,
       round(n_stop / greatest(n_words, 1), 4) AS stop_ratio,
       CASE WHEN n_words >= 20 AND round(n_stop / greatest(n_words, 1), 4) < 0.4
            THEN 'keep' ELSE 'drop' END AS quality_verdict
FROM q
"""


def token_count(spark, sf_dir):
    """BPE-ish token counting: runs of letters, runs of digits, and single
    punctuation marks each count as one token."""
    d = load(spark, sf_dir, "documents")
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        .cast("bigint")
        .alias("n_tokens"),
    )


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS n_tokens
FROM documents
"""


def doc_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text — the cheap exact-dup key for incremental pipelines."""
    d = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


FINGERPRINT_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def doc_winnowing(spark, sf_dir):
    """Winnowing fingerprint (the rolling-hash document sketch of
    Schleimer et al.): hash every 3-word shingle, take the min hash of
    each 4-shingle window, dedup — the selected hashes are the document's
    robust fingerprint set.  Cross-engine 60-bit hash = md5-prefix trick
    (see operators/__init__.py)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word")
    )
    seq = Window.partitionBy("doc_id").orderBy("pos")
    sh = (
        w.withColumn("w2", F.lead("word", 1).over(seq))
        .withColumn("w3", F.lead("word", 2).over(seq))
        .filter(F.col("w3").isNotNull())
        .withColumn("h", _hash60(F.concat_ws(" ", "word", "w2", "w3")))
    )
    winmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    return (
        sh.withColumn("fp", F.min("h").over(winmin))
        .select("doc_id", "fp")
        .distinct()
    )


WINNOW_SQL = f"""
WITH w AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
         unnest(string_split(text, ' ')) AS word
  FROM documents
),
sh AS (
  SELECT doc_id, pos,
         word || ' ' || lead(word, 1) OVER (PARTITION BY doc_id ORDER BY pos)
              || ' ' || lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS gram,
         lead(word, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
  FROM w
),
hashed AS (
  SELECT doc_id, pos, {_hash60_sql('gram')} AS h
  FROM sh WHERE w3 IS NOT NULL
)
SELECT DISTINCT doc_id,
       min(h) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
FROM hashed
"""


QUERIES = {
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "doc_winnowing": (doc_winnowing, WINNOW_SQL),
    "quality_score": (quality_score, QUALITY_SQL),
    "token_count": (token_count, TOKEN_COUNT_SQL),
    "doc_fingerprint": (doc_fingerprint, FINGERPRINT_SQL),
}
