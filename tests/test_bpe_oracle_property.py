"""Property test for the text_bpe_apply oracle identity.

The DuckDB twin expresses one BPE merge pass as non-overlapping
left-to-right string replace over delimiter-wrapped symbols — a
subtle identity (overlapping self-merges like (a,a) on "aaa",
merges whose output feeds later merges, boundary adjacency) that
deserves more than the fixture corpus. Hypothesis drives random
texts from a small alphabet (maximizing merge collisions) through
BOTH engines and demands identical token streams.

The Python reference here is intentionally independent of the
operator's implementation (plain per-word loop) so the test
triangulates three formulations: operator (Arrow batches), reference
loop, and the SQL replace-chain."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import __spark_entry__ as entry

MERGES = entry.BPE_MERGES
EOW = "</w>"


def ref_encode(text: str) -> list[str]:
    toks = []
    for word in text.split(" "):
        if not word:
            continue
        symbols = list(word) + [EOW]
        for left, right in MERGES:
            i, out = 0, []
            while i < len(symbols):
                if (i + 1 < len(symbols) and symbols[i] == left
                        and symbols[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            symbols = out
        toks.extend(symbols)
    return toks


words = st.text(alphabet="aeinorst", min_size=0, max_size=6)
texts = st.lists(words, min_size=0, max_size=8).map(" ".join)


@given(st.lists(texts, min_size=1, max_size=6))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bpe_oracle_sql_matches_reference_loop(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(docs)))
    sql = entry.oracle_sql()["text_bpe_apply"]
    # the gate stringifies the token array (concat_ws ' ' — the
    # driver canonicalizer can't hash list cells); '' means no tokens
    got = {r[0]: (r[1].split(" ") if r[1] else [], r[2])
           for r in con.execute(sql).fetchall()}
    for i, text in enumerate(docs):
        want = ref_encode(text)
        assert got[i] == (want, len(want)), (text, got[i], want)


def test_bpe_spark_matches_reference_loop(spark):
    """One Spark-side sweep over adversarial fixtures (the per-example
    Spark roundtrip is too slow for hypothesis; the SQL twin above
    carries the fuzzing, and text_bpe_apply's gate pins Spark == SQL
    on the full fixture corpus)."""
    from pydin_spark.operators import text
    docs = ["the the theo", "aa aaa aaaa", "", "  ", "ee e eee",
            "in sin sing string", "onion on ion", "tthhee"]
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
           for r in text.bpe_tokenize(df, MERGES).collect()}
    for i, t in enumerate(docs):
        want = ref_encode(t)
        assert got[i] == (want, len(want)), (t, got[i], want)
