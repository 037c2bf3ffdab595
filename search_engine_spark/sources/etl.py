"""Corpus ETL sources (reference ``fileparser.py``, re-expressed as
DataFrame transforms).

S3 — NPS JSON splitter (``fileparser.py:5-15``): the reference writes
one file per element of a JSON array; here the array explodes into rows
(files are an anti-pattern at 10^12 docs — rows in a table are the
unit).

S4 — IMSDB movie-script ETL (``fileparser.py:18-64``): boilerplate
strip chain + title extraction + 650-doc cap, as codegen'd
``regexp_replace``/``replace`` expressions over a text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Literal boilerplate fragments the reference strips (clean_script,
# fileparser.py:39-64) — plain string replaces, not regexes.
_SCRIPT_NOISE = [
    "Back to IMSDb",
    "<b><!--",
    "</b>",
    "<b>/*",
    "(c) 1990 The Walt Disney Company",
    "-" * 60,
    "<script>",
    "for educational use only",
    "=-" * 35 + "=",
]


def split_json_array(df: DataFrame, array_col: str, id_name: str = "doc_seq") -> DataFrame:
    """S3: one row per array element, 1-based sequence id preserved
    (the reference's ``file_num`` counter, ``fileparser.py:11-15``)."""
    return df.select(
        F.posexplode(array_col).alias("pos", "document")
    ).select((F.col("pos") + 1).alias(id_name), "document.*")


def clean_script_col(text: Column) -> Column:
    """S4 boilerplate strip (behavior of ``clean_script``)."""
    out = text
    for noise in _SCRIPT_NOISE:
        out = F.replace(out, F.lit(noise), F.lit(""))
    out = F.replace(out, F.lit(r"\r"), F.lit(""))
    return F.trim(out)


def scripts_to_docs(
    raw: DataFrame,
    text_col: str = "raw_text",
    genre_col: str = "genre",
    cap: int = 650,
) -> DataFrame:
    """S4: (title, genre, body) docs from raw script texts.

    Title = first line of the cleaned body (``fileparser.py:31-33``);
    the reference caps at 650 docs (``:25-26``) — kept as ``limit``,
    which Spark pushes into the scan.
    """
    cleaned = raw.withColumn("body", clean_script_col(F.col(text_col)))
    return cleaned.select(
        F.split(F.col("body"), "\n").getItem(0).alias("title"),
        F.col(genre_col).alias("genre"),
        "body",
    ).limit(cap)
