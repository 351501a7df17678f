"""Property-based CSV round-trip: for arbitrary data and any dialect
(delimiter × quote × null-string × header × gzip), export → import must be
lossless — modulo the reference's own documented lossy rule that the
null-string (and empty string, NULL '' default) reads back as NULL."""

from __future__ import annotations

import pytest

import os

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from airflow_postgres_csv_spark.operators import etl

SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
    ]
)

# printable text without leading/trailing whitespace (CSV writers trim) and
# without newlines in the middle of nothing-else rows; embedded delimiters,
# quotes and unicode are exactly what the quoting contract must survive
_text = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0x24F, blacklist_categories=("Cc", "Cs")
    ),
    max_size=24,
).map(lambda s: s.strip())

_row = st.tuples(
    st.one_of(st.none(), _text),
    st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    st.one_of(st.none(), st.booleans()),
)


@given(
    rows=st.lists(_row, min_size=1, max_size=12),
    delimiter=st.sampled_from([",", ";", "|", "\t"]),
    quote_char=st.sampled_from(['"', "'"]),
    null_string=st.sampled_from(["", "NULL", "\\N"]),
    has_header=st.booleans(),
    gzip_on=st.booleans(),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@pytest.mark.slow
def test_csv_dialect_roundtrip_property(
    spark, tmp_path_factory, rows, delimiter, quote_char, null_string, has_header, gzip_on
):
    path = str(tmp_path_factory.mktemp("csv_prop") / ("f.csv" + (".gz" if gzip_on else "")))
    df = spark.createDataFrame(rows, SCHEMA)
    _, n = etl.df_to_csv(
        df,
        path,
        has_header=has_header,
        compression="gzip" if gzip_on else None,
        delimiter=delimiter,
        quote_char=quote_char,
        null_string=null_string,
    )
    assert n == len(rows)
    assert os.path.exists(path)
    back = etl.read_csv(
        spark,
        path,
        schema=SCHEMA,
        has_header=has_header,
        delimiter=delimiter,
        quote_char=quote_char,
        null_string=null_string,
    )

    def norm(s):
        # the documented lossy edge: null-string and "" read back as NULL
        return None if s in (None, "", null_string) else s

    expected_rows = [(norm(s), i, d, b) for (s, i, d, b) in rows]
    if delimiter == "\t" and null_string == "":
        # documented divergence: an all-NULL row with an empty null marker
        # serializes to a whitespace-only line, which Spark's CSV reader
        # skips (univocity line trimming) — see operators/etl.py
        expected_rows = [r for r in expected_rows if any(v is not None for v in r)]
    none_safe = lambda t: tuple((v is None, v) for v in t)
    expected = sorted(expected_rows, key=none_safe)
    got = sorted(((r.s, r.i, r.d, r.b) for r in back.collect()), key=none_safe)
    assert got == expected
