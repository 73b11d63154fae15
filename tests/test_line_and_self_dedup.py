"""r7 dedup-family completions: WITHIN-document substring duplication
(`self_duplicate_spans` — the other half of the Lee et al. 2022
target) and corpus-wide boilerplate line removal
(`remove_boilerplate_lines` — the C4/RefinedWeb line-grain cleaning
step). Both carry full DuckDB value oracles plus structural
contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_file_format_compare_spark.operators.dedup import (
    remove_boilerplate_lines,
    self_duplicate_spans,
)
from lakehouse_file_format_compare_spark.sources.testdata import table

from .conftest import SF_CORRECTNESS
from .oracle import duck_connection

L = 12


# --- self duplication -------------------------------------------------------

def _self_injected(spark):
    """Every doc gets its own first 15 tokens appended — a verbatim
    self-repetition at a known position."""
    docs = table(spark, SF_CORRECTNESS, "documents")
    first15 = F.array_join(
        F.slice(
            F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                     lambda t: F.length(t) > 0),
            1, 15,
        ),
        " ",
    )
    return docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), first15).alias("text")
    )


_SELF_ORACLE_SQL = f"""
WITH base AS (
    SELECT doc_id,
           list_filter(string_split_regex(trim(text), '\\s+'),
                       t -> length(t) > 0) AS bt,
           text
    FROM documents
), sd AS (
    SELECT doc_id,
           text || ' ' || array_to_string(bt[1:15], ' ') AS text
    FROM base
), lt AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       t -> length(t) > 0) AS t
    FROM sd
), gr AS (
    SELECT doc_id, i AS pos, array_to_string(t[i:i+{L - 1}], ' ') AS g
    FROM (SELECT doc_id, t, unnest(range(1, len(t) - {L} + 2)) AS i
          FROM lt WHERE len(t) >= {L})
), m AS (
    SELECT a.doc_id AS doc_id, a.pos AS pos_a, b.pos AS pos_b
    FROM gr a JOIN gr b ON a.doc_id = b.doc_id AND a.g = b.g AND a.pos < b.pos
), runs AS (
    SELECT doc_id, pos_a, pos_b, pos_a - pos_b AS diag,
           pos_a - row_number() OVER (PARTITION BY doc_id, pos_a - pos_b
                                      ORDER BY pos_a) AS grp
    FROM m
)
SELECT doc_id, MIN(pos_a) AS a_start, MIN(pos_b) AS b_start,
       COUNT(*) + {L - 1} AS span_tokens
FROM runs GROUP BY doc_id, diag, grp
"""


def test_self_spans_match_duckdb_oracle(spark):
    got = sorted(
        (r["doc_id"], r["a_start"], r["b_start"], r["span_tokens"])
        for r in self_duplicate_spans(
            _self_injected(spark), min_span_tokens=L
        ).collect()
    )
    con = duck_connection(SF_CORRECTNESS)
    want = sorted(
        tuple(int(v) for v in row)
        for row in con.execute(_SELF_ORACLE_SQL).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) >= 400  # nearly every doc has >= 15 tokens


def test_self_injected_copy_found_exactly(spark):
    """For every doc with >= 15 original tokens the appended copy is
    one maximal (1, n+1, 15) span: it cannot extend left (a_start=1)
    or right (doc ends), so span_tokens is EXACTLY 15 on that
    diagonal."""
    docs = table(spark, SF_CORRECTNESS, "documents").collect()
    n_toks = {r["doc_id"]: len(r["text"].split()) for r in docs}
    spans = {}
    for r in self_duplicate_spans(_self_injected(spark), min_span_tokens=L).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["a_start"], r["b_start"], r["span_tokens"])
        )
    checked = 0
    for did, n in n_toks.items():
        if n >= 15:
            assert (1, n + 1, 15) in spans.get(did, []), (did, n, spans.get(did))
            checked += 1
    assert checked >= 400


def test_self_span_repeated_token_cap(spark):
    """A doc degenerating to one repeated token is the quadratic
    risk; the occurrence cap drops its anchors entirely while leaving
    normal docs' spans untouched."""
    spark_df = spark.createDataFrame(
        [(1, "x " * 200), (2, "alpha beta " * 40)], ["doc_id", "text"]
    )
    capped = self_duplicate_spans(spark_df, min_span_tokens=L)
    assert capped.where(F.col("doc_id") == 1).count() == 0
    # doc 2's period-2 repetition stays UNDER the 64-occurrence cap
    # (every gram occurs ~34 times) — verify its anchors are kept
    assert capped.where(F.col("doc_id") == 2).count() > 0
    # cap=None on the real corpus equals the default (no natural doc
    # repeats an anchor > 64 times)
    a = sorted(map(tuple, self_duplicate_spans(
        _self_injected(spark), min_span_tokens=L).collect()))
    b = sorted(map(tuple, self_duplicate_spans(
        _self_injected(spark), min_span_tokens=L, max_gram_occurrences=None
    ).collect()))
    assert a == b


# --- boilerplate lines ------------------------------------------------------

_FOOTER = "footer boilerplate line"


def _line_injected(spark):
    docs = table(spark, SF_CORRECTNESS, "documents")
    return docs.select(
        "doc_id",
        F.when(
            F.pmod(F.col("doc_id"), F.lit(5)) == 0,
            F.concat("text", F.lit("\n" + _FOOTER + "\n" + _FOOTER)),
        ).otherwise(F.col("text")).alias("text"),
    )


_LINE_ORACLE_SQL = """
WITH aug AS (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN text || chr(10) || 'footer boilerplate line'
                          || chr(10) || 'footer boilerplate line'
                ELSE text END AS text
    FROM documents
), ls AS (
    SELECT doc_id, string_split(text, chr(10)) AS l FROM aug
), lines AS (
    SELECT doc_id, i AS pos, l[i] AS line
    FROM (SELECT doc_id, l, unnest(range(1, len(l) + 1)) AS i FROM ls)
), hot AS (
    SELECT line FROM lines WHERE length(line) > 0
    GROUP BY line HAVING COUNT(DISTINCT doc_id) > 2
), kept AS (
    SELECT doc_id, pos, line FROM lines
    WHERE line NOT IN (SELECT line FROM hot)
), rebuilt AS (
    SELECT doc_id, array_to_string(list(line ORDER BY pos), chr(10)) AS text
    FROM kept GROUP BY doc_id
)
SELECT a.doc_id, COALESCE(r.text, '') AS text
FROM aug a LEFT JOIN rebuilt r USING (doc_id)
"""


def test_boilerplate_line_removal_matches_duckdb_oracle(spark):
    got = sorted(
        (r["doc_id"], r["text"])
        for r in remove_boilerplate_lines(
            _line_injected(spark, ), max_line_docs=2
        ).collect()
    )
    con = duck_connection(SF_CORRECTNESS)
    want = sorted((int(d), t) for d, t in con.execute(_LINE_ORACLE_SQL).fetchall())
    con.close()
    assert got == want


def test_boilerplate_lines_stripped_everywhere_and_others_verbatim(spark):
    aug = _line_injected(spark)
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(aug, max_line_docs=2).collect()}
    original = {r["doc_id"]: r["text"] for r in aug.collect()}
    changed = 0
    for did, text in out.items():
        assert _FOOTER not in text.split("\n")
        if did % 5 == 0:
            # footer stripped, original (single-line) body intact
            assert text == original[did].split("\n")[0]
            changed += 1
        else:
            assert text == original[did]
    assert changed >= 90  # ~n/5 docs carried the footer


def test_blank_lines_and_structure_preserved(spark):
    df = spark.createDataFrame(
        [(1, "keep me\n\nand me"), (2, "solo"), (3, "hot\nhot\nhot")],
        ["doc_id", "text"],
    )
    # 'hot' appears 3x but in ONE doc -> countDistinct(doc)=1 <= 2: kept
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df, max_line_docs=2).collect()}
    assert out == {1: "keep me\n\nand me", 2: "solo", 3: "hot\nhot\nhot"}
    # same line across 3 docs -> removed from all; all-hot doc -> ''
    df2 = spark.createDataFrame(
        [(1, "spam"), (2, "spam"), (3, "spam"), (4, "a\nspam\nb")],
        ["doc_id", "text"],
    )
    out2 = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df2, max_line_docs=2).collect()}
    assert out2 == {1: "", 2: "", 3: "", 4: "a\nb"}


# --- n-gram containment (r10 late-round) ---

def test_containment_flags_planted_fragment(spark):
    """A document that is a strict prefix of another has containment
    1.0 from the short side while Jaccard stays below threshold —
    the asymmetric regime the operator exists for."""
    from lakehouse_file_format_compare_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    frag = "alpha beta gamma delta epsilon"
    long = frag + " " + " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, frag), (2, long), (3, "totally unrelated text here")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in ngram_containment_pairs(docs, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


def test_containment_duckdb_value_oracle(spark, tmp_path):
    """Exact DuckDB replay on the sf0.001 documents table: same
    shingles, same ordered-pair counts, same grid-6 ratio."""
    import duckdb

    from lakehouse_file_format_compare_spark.operators.dedup import (
        ngram_containment_pairs,
    )
    from lakehouse_file_format_compare_spark.sources.testdata import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    got = sorted(
        (r.doc_a, r.doc_b, r.containment)
        for r in ngram_containment_pairs(docs, threshold=0.3).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute("""
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), '\\s+') AS t
            FROM documents
        ), shingles AS (
            SELECT doc_id,
                   CASE WHEN len(t) >= 3 THEN
                        list_distinct(list_transform(range(1, len(t) - 1), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                        WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
                        ELSE [] END AS sh
            FROM toks
        ), exploded AS (
            SELECT doc_id AS doc, unnest(sh) AS shingle FROM shingles
        ), sizes AS (
            SELECT doc, COUNT(*) AS sz FROM exploded GROUP BY doc
        ), common AS (
            SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS c
            FROM exploded a JOIN exploded b
                 ON a.shingle = b.shingle AND a.doc <> b.doc
            GROUP BY 1, 2
        )
        , scored AS (
            SELECT doc_a, doc_b,
                   floor(c / CAST(sa.sz AS DOUBLE) * 1000000 + 0.5) / 1000000
                       AS containment
            FROM common JOIN sizes sa ON sa.doc = doc_a
        )
        SELECT doc_a, doc_b, containment FROM scored
        WHERE containment >= 0.3
        ORDER BY 1, 2
        """).fetchall()
    )
    assert got == want and len(got) > 0
