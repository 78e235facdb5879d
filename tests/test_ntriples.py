"""N-Triples sink/scan — kernel escape/unescape exactness (incl. the
replace-chain trap), JVM-escape parity, comment/blank tolerance, loud
malformed failure, and the file roundtrip through real part files."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bert_namedentityrecognition_spark.oracle.ntriples import (
    HOSTILE_LITERALS,
    format_line,
    nt_escape,
    nt_unescape,
    parse_line,
)


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200, deadline=None)
def test_escape_roundtrip_property(s):
    assert nt_unescape(nt_escape(s)) == s
    # escaped form is single-line (parseability invariant); quotes appear
    # only as the \" ECHAR, never raw (checked via a full line parse)
    e = nt_escape(s)
    assert "\n" not in e and "\r" not in e and "\t" not in e
    assert parse_line(format_line("http://a", "http://b", s)) == (
        "http://a",
        "http://b",
        s,
    )


def test_backslash_n_is_not_newline():
    """The replace-chain trap: backslash + 'n' in the source must survive,
    distinct from a real newline."""
    s1, s2 = "a\\nb", "a\nb"
    assert nt_escape(s1) == "a\\\\nb" and nt_escape(s2) == "a\\nb"
    assert nt_unescape(nt_escape(s1)) == s1 != nt_unescape(nt_escape(s2))


def test_parse_line_variants():
    s, p, o = "http://kg/e/1", "http://kg/p/0", HOSTILE_LITERALS[4] + "x"
    assert parse_line(format_line(s, p, o)) == (s, p, o)
    assert parse_line("") is None
    assert parse_line("   ") is None
    assert parse_line("# comment") is None
    with pytest.raises(ValueError, match="malformed"):
        parse_line('<a> <b> "truncated')
    with pytest.raises(ValueError, match="unknown escape"):
        nt_unescape("bad \\q escape")
    with pytest.raises(ValueError, match="dangling"):
        nt_unescape("ends with \\")


def test_sink_escape_parity_and_file_roundtrip(spark, tmp_path):
    """The sink's JVM chained-replace escape == the kernel escape, proven
    through a real write+read cycle over every hostile literal."""
    from bert_namedentityrecognition_spark.sources.readers import (
        read_ntriples,
        write_ntriples,
    )

    rows = [
        (f"http://kg/e/{i}", "http://kg/p/x", t + str(i))
        for i, t in enumerate(HOSTILE_LITERALS)
    ] + [("http://kg/e/9", "http://kg/p/x", "")]  # empty literal
    df = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    d = str(tmp_path / "nt")
    write_ntriples(df.repartition(3), d)
    # on-disk lines match the kernel formatter exactly
    import glob

    lines = set()
    for f in glob.glob(f"{d}/part-*"):
        with open(f, encoding="utf-8") as fh:
            lines |= {ln.rstrip("\n") for ln in fh if ln.strip()}
    assert lines == {format_line(*r) for r in rows}
    back = {(r["subj"], r["pred"], r["obj"]) for r in read_ntriples(spark, d).collect()}
    assert back == set(rows)
