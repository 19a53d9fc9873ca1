"""EventBridge pattern compiler tests.

The pattern + accepted instance are verbatim from the reference corpus
(/root/reference/tests/MofkaEventbridgeTest.cpp:35-120, FIXTURES.md F4);
rejected instances mutate one clause each. Every case is checked against
BOTH implementations (python matcher and compiled Spark Column) so the
two can never drift.
"""

import json

import pytest
from pyspark.sql import functions as F

from mofka_spark.functions.eventbridge import (
    compile_pattern,
    match_event,
    _wildcard_to_regex,
)

PATTERN = {
    "a1": "a_value",
    "a2": ["a2_value_1", "a2_value_2"],
    "b1": [{"anything-but": "b1_value"}],
    "b2": [{"anything-but": ["b2_value_1", "b2_value_2"]}],
    "b3": [{"anything-but": {"prefix": "b3_prefix"}}],
    "b4": [{"anything-but": {"prefix": ["b4_prefix_1", "b4_prefix_2"]}}],
    "b5": [{"anything-but": {"prefix": {"equals-ignore-case": "b5_prefix"}}}],
    "b6": [{"anything-but": {"prefix": {"equals-ignore-case": ["b6_prefix_1", "b6_prefix_2"]}}}],
    "b7": [{"anything-but": {"suffix": "b7_suffix"}}],
    "b8": [{"anything-but": {"suffix": ["b8_suffix_1", "b8_suffix_2"]}}],
    "b9": [{"anything-but": {"suffix": {"equals-ignore-case": "b9_suffix"}}}],
    "b10": [{"anything-but": {"suffix": {"equals-ignore-case": ["b10_suffix_1", "b10_suffix_2"]}}}],
    "c1": [{"prefix": "c1_prefix"}],
    "c2": [{"prefix": ["c2_prefix_1", "c2_prefix_2"]}],
    "c3": [{"prefix": {"equals-ignore-case": "c3_prefix"}}],
    "c4": [{"prefix": {"equals-ignore-case": ["c4_prefix_1", "c4_prefix_2"]}}],
    "d1": [{"suffix": "d1_suffix"}],
    "d2": [{"suffix": ["d2_suffix_1", "d2_suffix_2"]}],
    "d3": [{"suffix": {"equals-ignore-case": "d3_suffix"}}],
    "d4": [{"suffix": {"equals-ignore-case": ["d4_suffix_1", "d4_suffix_2"]}}],
    "e1": [{"numeric": ["<", 42, ">=", 10]}],
    "e2": [{"numeric": ["<=", 42, ">", 10]}],
    "f1": [{"exists": True}],
    "f2": [{"exists": False}],
    "g1": [{"equals-ignore-case": "g1_VAluE_1"}],
    "g2": [{"equals-ignore-case": ["g2_VAluE_1", "g2_VAluE_2"]}],
    "h1": [{"wildcard": "abc*def*ghi"}],
    "i1": {"i1_1": "i1_1_value"},
    "i2.i2_1": "i2_1_value",
    "j1": [{"$or": [{"j1_1": [{"exists": True}]}, {"j2_2": [{"exists": True}]}]}],
}

ACCEPTED = {
    "a1": "a_value",
    "a2": "a2_value_2",
    "b1": "not_b1_value",
    "b2": "not_b2_value_1",
    "b3": "not_b3_prefix_value",
    "b4": "not_b4_prefix_1",
    "b5": "not_b5_PREfix",
    "b6": "not_b6_PREfix_1",
    "b7": "b7_suffix_not",
    "b8": "b8_suffix_1_not",
    "b9": "b9_SUFfix_not",
    "b10": "b10_SUFfix_1_not",
    "c1": "c1_prefix_value",
    "c2": "c2_prefix_1_value",
    "c3": "c3_PREfix_value",
    "c4": "c4_PREfix_1_value",
    "d1": "value_d1_suffix",
    "d2": "value_d2_suffix_2",
    "d3": "value_d3_SUFfix",
    "d4": "value_d4_SUFfix_2",
    "e1": 33,
    "e2": 34,
    "f1": "something",
    "g1": "g1_vaLUe_1",
    "g2": "g2_vaLUe_2",
    "h1": "abcXXXdefYYghi",
    "i1": {"i1_1": "i1_1_value"},
    "i2": {"i2_1": "i2_1_value"},
    "j1": {"j2_2": 123},
}

# one rejection per clause family (FIXTURES.md F4)
REJECTIONS = {
    "a1_wrong_exact": {"a1": "other_value"},
    "a2_not_in_list": {"a2": "a2_value_3"},
    "b1_forbidden": {"b1": "b1_value"},
    "b2_forbidden_list": {"b2": "b2_value_2"},
    "b3_forbidden_prefix": {"b3": "b3_prefix_xxx"},
    "b5_forbidden_prefix_icase": {"b5": "B5_PREFIX_xxx"},
    "b7_forbidden_suffix": {"b7": "xxx_b7_suffix"},
    "b9_forbidden_suffix_icase": {"b9": "xxx_B9_SUFFIX"},
    "c1_prefix_missing": {"c1": "xxc1_prefix"},
    "c3_prefix_case_matters_not": {"c3": "zzz_c3"},
    "d1_suffix_missing": {"d1": "d1_suffix_no"},
    "e1_too_big": {"e1": 42},
    "e1_too_small": {"e1": 9},
    "e2_too_big": {"e2": 43},
    "e2_boundary_low": {"e2": 10},
    "e1_not_numeric": {"e1": "33"},
    "f1_missing": "DROP:f1",
    "f2_present": {"f2": "anything"},
    "g1_wrong": {"g1": "g1_value_2"},
    "h1_wildcard_miss": {"h1": "abcXXXdefYYgh"},
    "i1_nested_wrong": {"i1": {"i1_1": "other"}},
    "i2_dotted_wrong": {"i2": {"i2_1": "other"}},
    "j1_neither_or": {"j1": {"j3_3": 1}},
}


def _spark_match(spark, doc: dict) -> bool:
    df = spark.createDataFrame([(json.dumps(doc),)], "metadata string")
    return df.select(compile_pattern(PATTERN).alias("ok")).first()["ok"] is True


def _mutate(mutation) -> dict:
    doc = dict(ACCEPTED)
    if isinstance(mutation, str) and mutation.startswith("DROP:"):
        del doc[mutation[len("DROP:"):]]
    else:
        doc.update(mutation)
    return doc


def test_accepted_python():
    assert match_event(PATTERN, ACCEPTED)


def test_accepted_spark(spark):
    assert _spark_match(spark, ACCEPTED)


@pytest.mark.parametrize("name", sorted(REJECTIONS))
def test_rejections_python(name):
    assert not match_event(PATTERN, _mutate(REJECTIONS[name])), name


def test_rejections_spark(spark):
    # batch all rejections into one Spark job for speed
    docs = [(name, json.dumps(_mutate(m))) for name, m in REJECTIONS.items()]
    df = spark.createDataFrame(docs, "name string, metadata string")
    bad = (
        df.filter(compile_pattern(PATTERN, "metadata"))
        .select("name")
        .collect()
    )
    assert bad == [], f"spark accepted rejected docs: {[r['name'] for r in bad]}"


def test_wildcard_regex():
    assert _wildcard_to_regex("a*b") == "^a.*b$"
    assert _wildcard_to_regex("a.c*") == r"^a\.c.*$"


@pytest.mark.parametrize(
    "pattern,doc,expected",
    [
        ({"x": [1, 2]}, {"x": 2}, True),
        ({"x": [1, 2]}, {"x": 3}, False),
        ({"x": [1.0]}, {"x": 1}, True),  # numeric equality across int/float
        ({"x": [True]}, {"x": True}, True),
        ({"x": [True]}, {"x": "true"}, False),
        ({"x": [{"numeric": ["=", 5]}]}, {"x": 5.0}, True),
        ({"x": [{"wildcard": "*"}]}, {"x": ""}, True),
        ({"$or": [{"a": [1]}, {"b": [2]}]}, {"b": 2}, True),
        ({"$or": [{"a": [1]}, {"b": [2]}]}, {"c": 3}, False),
        ({"a": {"b": {"c": [1]}}}, {"a": {"b": {"c": 1}}}, True),
        ({"a.b.c": [1]}, {"a": {"b": {"c": 1}}}, True),
        ({"x": [{"anything-but": 5}]}, {"x": 6}, True),
        ({"x": [{"anything-but": 5}]}, {"x": 5}, False),
        # anything-but on a missing field: field must exist to "not match"
        ({"x": [{"anything-but": 5}]}, {"y": 1}, False),
    ],
)
def test_small_patterns_both(spark, pattern, doc, expected):
    assert match_event(pattern, doc) is expected
    df = spark.createDataFrame([(json.dumps(doc),)], "metadata string")
    got = df.select(compile_pattern(pattern).alias("ok")).first()["ok"]
    assert (got is True) == expected


def test_property_cross_check(spark):
    """Randomized docs: python matcher and Spark compiler must agree."""
    import random

    rng = random.Random(42)
    pattern = {
        "kind": ["a", "b"],
        "n": [{"numeric": [">=", 0, "<", 50]}],
        "tag": [{"prefix": "t_"}, {"suffix": "_z"}],
        "$or": [{"u": [{"exists": True}]}, {"v": [{"exists": True}]}],
    }
    docs = []
    for _ in range(200):
        doc = {}
        if rng.random() < 0.9:
            doc["kind"] = rng.choice(["a", "b", "c"])
        if rng.random() < 0.9:
            doc["n"] = rng.choice([rng.randint(-10, 60), rng.random() * 60])
        if rng.random() < 0.9:
            doc["tag"] = rng.choice(["t_x", "q_z", "m_m", "t_", "_z"])
        if rng.random() < 0.5:
            doc["u"] = 1
        if rng.random() < 0.5:
            doc["v"] = "s"
        docs.append(doc)
    py = [match_event(pattern, d) for d in docs]
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i long, metadata string"
    )
    rows = df.select("i", compile_pattern(pattern).alias("ok")).orderBy("i").collect()
    sp = [r["ok"] is True for r in rows]
    assert py == sp


class TestExactTypeAndExistenceProbes:
    """Adversarial shapes that defeated the earlier regex/substring
    heuristics — the probes are now exact (variant schema for string
    typing, json_object_keys for existence)."""

    def _both(self, spark, pattern, doc):
        import json as _json

        py = match_event(pattern, doc)
        df = spark.createDataFrame([(_json.dumps(doc),)], ["metadata"])
        sp = df.select(compile_pattern(pattern).alias("ok")).collect()[0]["ok"] is True
        assert py == sp, f"python={py} spark={sp} for {doc}"
        return py

    def test_value_containing_quoted_key_is_not_existence(self, spark):
        # the VALUE of another field contains the text '"secret"' — the
        # old substring probe counted that as the key existing
        pattern = {"secret": [{"exists": True}]}
        assert self._both(spark, pattern, {"note": 'say "secret" aloud'}) is False
        assert self._both(spark, pattern, {"secret": None}) is True

    def test_exists_false_with_lookalike_value(self, spark):
        pattern = {"secret": [{"exists": False}]}
        assert self._both(spark, pattern, {"note": '"secret": "x"'}) is True
        assert self._both(spark, pattern, {"secret": 0}) is False

    def test_nested_repeat_key_different_type(self, spark):
        # sibling nested object repeats the key with a STRING value; the
        # top-level value is a number — the old regex saw '"k": "' in
        # the parent text and typed the number as a string
        pattern = {"k": [{"numeric": [">=", 5]}]}
        doc = {"k": 7, "inner": {"k": "seven"}}
        assert self._both(spark, pattern, doc) is True
        pattern2 = {"k": ["seven"]}
        assert self._both(spark, pattern2, doc) is False

    def test_string_rule_on_numeric_lookalike(self, spark):
        pattern = {"k": [{"prefix": "3"}]}
        assert self._both(spark, pattern, {"k": "33"}) is True
        assert self._both(spark, pattern, {"k": 33}) is False

    def test_null_value_exact_match(self, spark):
        pattern = {"k": [None]}
        assert self._both(spark, pattern, {"k": None}) is True
        assert self._both(spark, pattern, {}) is False
        assert self._both(spark, pattern, {"k": 1}) is False
