"""Cross-engine guards on a corpus that CONTAINS blank docs.

The harness corpora have no blank documents, so the all-blank-source /
zero-token edge paths (available=0 divisions, cum=0 pack ids, the 0
length bucket) are latent there.  This test manufactures a corpus with
blanks — including one source that is ENTIRELY blank — and checks the
guarded queries against their own DuckDB oracles on it, exactly the
way the driver gate would.
"""

from __future__ import annotations

import math

import duckdb
import pytest


@pytest.fixture(scope="module")
def blank_dir(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("blankdocs")
    rows = []
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "",  # blank inside a live source
        "   ",  # whitespace-only (tokenizes to zero)
        "sphinx of black quartz judge my vow",
    ]
    for i in range(40):
        src = f"s{i % 4}"
        text = "" if src == "s3" else texts[i % len(texts)]  # s3 all-blank
        rows.append((i, text, "en" if i % 2 else "de", src, len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    return str(tmp)


QUERIES = [
    "pipeline_sample_temperature",
    "pipeline_token_budget_epochs",
    "pipeline_pack_efficiency",
    "pipeline_context_length_plan",
]


@pytest.mark.parametrize("name", QUERIES)
def test_guarded_query_matches_oracle_with_blanks(spark, blank_dir, name):
    import __spark_entry__ as e

    sdf = e.queries()[name](spark, blank_dir)
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{blank_dir}/documents.parquet/*.parquet')"
    )
    orows = sorted(tuple(r) for r in con.execute(e.oracle_sql()[name]).fetchall())
    assert len(srows) == len(orows), (name, len(srows), len(orows))
    for sr, orow in zip(srows, orows):
        assert len(sr) == len(orow)
        for a, b in zip(sr, orow):
            if isinstance(a, float) or isinstance(b, float):
                assert (
                    a == b
                    or (a is not None and b is not None
                        and math.isclose(float(a), float(b), abs_tol=1e-9))
                ), (name, sr, orow)
            else:
                assert a == b, (name, sr, orow)
    # the all-blank source s3 must be EXCLUDED by the available>0 /
    # n_tokens>0 guards in the share-producing queries
    if name in ("pipeline_sample_temperature", "pipeline_token_budget_epochs"):
        assert all(r[0] != "s3" for r in srows), "all-blank source not excluded"
