"""Property-based tests (hypothesis) — SURVEY.md §5.4."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from pywdcollections_spark.functions.coerce import (
    find_wikilink_mentions,
    parse_coordinate_value,
)
from pywdcollections_spark.functions.text_extract import extract_text
from pywdcollections_spark.functions.wikitemplates import parse_templates
from pywdcollections_spark.testkit.generate import render_html

SAFE_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " _-.,'\"&<>=|{}[]\n°′″#:",
    max_size=400)


class TestHtmlRoundTrip:
    @given(title=st.text(max_size=50), text=st.text(max_size=500))
    @settings(max_examples=200, deadline=None)
    def test_extract_inverts_render(self, title, text):
        # generator escape chain and engine unescape chain are inverses
        # for ALL unicode text (the byte-parity invariant)
        assert extract_text(render_html(title, text)) == text


class TestTokenizerTotality:
    @given(text=SAFE_TEXT)
    @settings(max_examples=300, deadline=None)
    def test_never_raises_and_shapes_hold(self, text):
        out = parse_templates(text)
        for t in out:
            assert isinstance(t["name"], str) and t["name"]
            assert ":" not in t["name"] and not t["name"].startswith("#")
            assert all(isinstance(p, str) for p in t["params"])

    @given(name=st.text(alphabet=string.ascii_letters + " ", min_size=1, max_size=20),
           params=st.lists(st.text(alphabet=string.ascii_letters + string.digits + " ",
                                   min_size=1, max_size=30), max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_render_parse_round_trip(self, name, params):
        # serialization -> parse round-trip for clean templates
        if not name.strip():
            return
        markup = "{{" + "|".join([name] + params) + "}}"
        out = parse_templates("pre " + markup + " post")
        assert len(out) == 1
        assert out[0]["name"] == name.strip()
        assert out[0]["params"] == params


class TestCoordinates:
    @given(lat=st.floats(-90, 90, allow_nan=False),
           lon=st.floats(-180, 180, allow_nan=False))
    @settings(max_examples=200, deadline=None)
    def test_decimal_round_trip(self, lat, lon):
        got = parse_coordinate_value(f"{lat}|{lon}|0")
        assert got == (lat, lon)

    @given(d=st.integers(0, 89), m=st.integers(0, 59), s=st.integers(0, 59),
           d2=st.integers(0, 179), m2=st.integers(0, 59), s2=st.integers(0, 59),
           ns=st.sampled_from("NS"), ew=st.sampled_from("EW"))
    @settings(max_examples=200, deadline=None)
    def test_dms_matches_python_round(self, d, m, s, d2, m2, s2, ns, ew):
        got = parse_coordinate_value(f"{d}/{m}/{s}/{ns}|{d2}/{m2}/{s2}/{ew}|0")
        lat = round(d + m / 60 + s / 3600, 5) * (-1 if ns == "S" else 1)
        lon = round(d2 + m2 / 60 + s2 / 3600, 5) * (-1 if ew == "W" else 1)
        assert got == (lat, lon)


class TestWikilinks:
    @given(targets=st.lists(st.text(alphabet=string.ascii_letters + " ",
                                    min_size=1, max_size=20), max_size=5))
    @settings(max_examples=200, deadline=None)
    def test_all_plain_targets_found(self, targets):
        val = " x ".join(f"[[{t}]]" for t in targets)
        assert find_wikilink_mentions(val) == [t.strip() for t in targets]
