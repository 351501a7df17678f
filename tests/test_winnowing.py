"""Winnowing fingerprint operator — the SIGMOD'03 guarantee, property-tested:
two documents sharing a (normalized) substring of length >= k + w - 1 share
at least one fingerprint value."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from airflow_postgres_csv_spark.operators.dedup import winnowing_fingerprints

K, W = 5, 4
GUARANTEE = K + W - 1  # any shared substring at least this long is caught

# lowercase, no whitespace: normalization is the identity, so substring
# sharing survives normalize_text verbatim
_txt = st.text(alphabet="abcd", min_size=0, max_size=40)
_shared = st.text(alphabet="abcd", min_size=GUARANTEE, max_size=24)


@given(shared=_shared, pa=_txt, sa=_txt, pb=_txt, sb=_txt)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_shared_substring_shares_fingerprint(spark, shared, pa, sa, pb, sb):
    doc_a = pa + shared + sa
    doc_b = pb + shared + sb
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = winnowing_fingerprints(df, "text", "doc_id", k=K, w=W, cap=None).collect()
    a = {r.fp for r in fps if r.doc_id == 1}
    b = {r.fp for r in fps if r.doc_id == 2}
    assert a & b, f"no shared fingerprint for shared substring {shared!r}"
    # every w-window records a print, so coverage is at least ~n/w
    assert len(a) >= (len(doc_a) - K + 1) // (W * 2)


def test_short_and_empty_docs_yield_no_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "ab"), (3, "a" * (K + W - 2))], "doc_id long, text string"
    )
    # len K+W-2 gives k-grams but fewer than w of them -> no full window
    out = winnowing_fingerprints(df, "text", "doc_id", k=K, w=W, cap=None).collect()
    assert out == []


def test_positions_are_1_based_and_in_range(spark):
    text = "abcdabcdabcdabcd"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = winnowing_fingerprints(df, "text", "doc_id", k=K, w=W, cap=None).collect()
    assert rows, "expected fingerprints"
    for r in rows:
        assert 1 <= r.pos <= len(text) - K + 1
        assert 0 <= r.fp < 1 << 32


def test_cap_guard_raises():
    import pytest

    with pytest.raises(ValueError, match="cap"):
        winnowing_fingerprints(None, cap=1 << 20)


def test_pairs_find_planted_copy_and_df_cap_drops_boilerplate(spark):
    from airflow_postgres_csv_spark.operators.dedup import winnowing_pairs

    boiler = "standardfooterline"  # shared by every doc (hub fingerprints)
    copy = "uniquecopiedpassagewithlength"  # shared by docs 1 and 2 only
    rows = [
        (1, "aaa" + copy + "bbb" + boiler),
        (2, "ccc" + copy + "ddd" + boiler),
        # distinct junction chars so 3/4 share only the boilerplate prints
        (3, "eeeunrelatedcontentxyz" + boiler),
        (4, "fffothertextgoesqrs" + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # no cap: boilerplate links every pair
    uncapped = winnowing_pairs(df, k=K, w=W, cap=None, min_shared=1).collect()
    assert len(uncapped) == 6
    # df cap 2 drops prints shared by >2 docs; only the planted copy remains
    capped = winnowing_pairs(
        df, k=K, w=W, cap=None, min_shared=1, max_doc_freq=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(1, 2)}
