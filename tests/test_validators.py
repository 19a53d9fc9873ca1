"""Full-draft JSON-Schema validation tests (anyOf / oneOf / not /
patternProperties / additionalProperties / string facets) + fallback
subset checker + Column fast-path semantics."""

import json

import pytest
from pyspark.sql import functions as F

from mofka_spark.errors import ValidationError
from mofka_spark.functions.validators import SchemaValidator, Validator


FULL_SCHEMA = {
    "type": "object",
    "required": ["kind"],
    "properties": {
        "kind": {"enum": ["a", "b"]},
        "name": {"type": "string", "minLength": 2, "maxLength": 8, "pattern": "^[a-z]+$"},
        "size": {"type": "integer", "minimum": 0, "maximum": 100},
        "mode": {"const": "fast"},
    },
    "patternProperties": {"^x_": {"type": "number"}},
    "additionalProperties": False,
    "anyOf": [
        {"properties": {"kind": {"const": "a"}, "size": {"minimum": 10}}},
        {"properties": {"kind": {"const": "b"}}},
    ],
}


class TestFullDraft:
    def setup_method(self):
        self.v = SchemaValidator(FULL_SCHEMA)
        assert self.v._exact is not None, "jsonschema package expected here"

    def ok(self, doc):
        self.v.validate(doc)

    def bad(self, doc):
        with pytest.raises(ValidationError):
            self.v.validate(doc)

    def test_valid_docs(self):
        self.ok({"kind": "a", "size": 15})
        self.ok({"kind": "b", "name": "abc", "mode": "fast"})
        self.ok({"kind": "b", "x_ratio": 0.5})

    def test_anyof_rejects(self):
        # kind=a requires size >= 10 through the anyOf branch
        self.bad({"kind": "a", "size": 5})

    def test_pattern_properties(self):
        self.bad({"kind": "b", "x_ratio": "not-a-number"})

    def test_additional_properties(self):
        self.bad({"kind": "b", "rogue": 1})

    def test_string_facets(self):
        self.bad({"kind": "b", "name": "A"})        # pattern + minLength
        self.bad({"kind": "b", "name": "toolongname"})  # maxLength

    def test_const(self):
        self.bad({"kind": "b", "mode": "slow"})

    def test_required(self):
        self.bad({"size": 5})

    def test_oneof_and_not(self):
        v = SchemaValidator(
            {
                "oneOf": [{"type": "integer"}, {"type": "string"}],
                "not": {"const": "forbidden"},
            }
        )
        v.validate(3)
        v.validate("ok")
        with pytest.raises(ValidationError):
            v.validate(3.5)
        with pytest.raises(ValidationError):
            v.validate("forbidden")

    def test_invalid_schema_raises_at_construction(self):
        import jsonschema

        with pytest.raises(jsonschema.exceptions.SchemaError):
            SchemaValidator({"type": "not-a-type"})


class TestFallbackSubset:
    def test_subset_checker_without_jsonschema(self):
        v = SchemaValidator(
            {"required": ["k"], "properties": {"k": {"type": "integer", "minimum": 0}}}
        )
        v._exact = None  # simulate the package being absent
        v.validate({"k": 3})
        with pytest.raises(ValidationError):
            v.validate({"k": -1})
        with pytest.raises(ValidationError):
            v.validate({})


class TestColumnFastPath:
    def _passes(self, spark, validator, doc):
        df = spark.createDataFrame([(json.dumps(doc),)], ["metadata"])
        return df.filter(validator.to_column("metadata")).count() == 1

    def test_string_facets_column(self, spark):
        v = SchemaValidator(
            {"properties": {"name": {"type": "string", "minLength": 2, "pattern": "^[a-z]+$"}}}
        )
        assert self._passes(spark, v, {"name": "abc"})
        assert not self._passes(spark, v, {"name": "A"})
        assert not self._passes(spark, v, {"name": "x"})

    def test_const_column(self, spark):
        v = SchemaValidator({"properties": {"mode": {"const": "fast"}}})
        assert self._passes(spark, v, {"mode": "fast"})
        assert not self._passes(spark, v, {"mode": "slow"})
        assert self._passes(spark, v, {})  # absent -> not this keyword's job

    def test_column_is_necessary_not_sufficient(self, spark):
        # FULL_SCHEMA's anyOf branch constrains size via a bare
        # {"minimum": 10} (no type) — not safely expressible over the
        # rendered string (a string "5" and the number 5 render the
        # same), so the branch compiles from kind only and the Column
        # path admits a row the exact validator rejects — documented
        # contract
        v = SchemaValidator(FULL_SCHEMA)
        doc = {"kind": "a", "size": 5}  # fails anyOf
        assert self._passes(spark, v, doc)
        with pytest.raises(ValidationError):
            v.validate(doc)

    def test_anyof_compiles_when_all_branches_do(self, spark):
        v = SchemaValidator(
            {"properties": {"v": {"anyOf": [
                {"type": "number", "maximum": 5},
                {"type": "number", "minimum": 10},
            ]}}}
        )
        assert self._passes(spark, v, {"v": 3})
        assert self._passes(spark, v, {"v": 12})
        assert self._passes(spark, v, {})           # absent passes
        assert not self._passes(spark, v, {"v": 7})  # the anyOf gap
        with pytest.raises(ValidationError):
            v.validate({"v": 7})

    def test_oneof_compiles_as_or_of_branches(self, spark):
        # oneOf compiles to the OR (never exactly-one: branch
        # conditions over-admit, exactly-one could reject valid rows)
        v = SchemaValidator(
            {"properties": {"v": {"oneOf": [
                {"type": "integer", "minimum": 0, "maximum": 10},
                {"type": "integer", "minimum": 100},
            ]}}}
        )
        assert self._passes(spark, v, {"v": 5})
        assert self._passes(spark, v, {"v": 150})
        assert not self._passes(spark, v, {"v": 50})
        with pytest.raises(ValidationError):
            v.validate({"v": 50})

    def test_anyof_skipped_when_a_branch_is_inexpressible(self, spark):
        # one branch has nothing SQL-expressible ({} admits anything):
        # a partial OR could reject rows valid under that branch, so
        # the whole combinator must pass through
        v = SchemaValidator(
            {"properties": {"v": {"anyOf": [
                {"type": "number", "maximum": 5},
                {},
            ]}}}
        )
        assert self._passes(spark, v, {"v": 999})

    def test_allof_conjoins_branches(self, spark):
        v = SchemaValidator(
            {"properties": {"v": {"allOf": [
                {"type": "number", "minimum": 0},
                {"type": "number", "maximum": 10},
            ]}}}
        )
        assert self._passes(spark, v, {"v": 5})
        assert not self._passes(spark, v, {"v": -1})
        assert not self._passes(spark, v, {"v": 11})

    def test_root_anyof_across_properties(self, spark):
        v = SchemaValidator(
            {"anyOf": [
                {"properties": {"kind": {"const": "x"}},
                 "required": ["kind"]},
                {"properties": {"level": {"type": "integer",
                                          "minimum": 5}},
                 "required": ["level"]},
            ]}
        )
        assert self._passes(spark, v, {"kind": "x"})
        assert self._passes(spark, v, {"level": 9})
        assert not self._passes(spark, v, {"kind": "y", "level": 1})
        with pytest.raises(ValidationError):
            v.validate({"kind": "y", "level": 1})

    def test_not_required_compiles(self, spark):
        v = SchemaValidator({"not": {"required": ["legacy_id"]}})
        assert self._passes(spark, v, {"a": 1})
        assert not self._passes(spark, v, {"legacy_id": 7})
        with pytest.raises(ValidationError):
            v.validate({"legacy_id": 7})
        # a null-valued key renders NULL and over-admits (documented)
        assert self._passes(spark, v, {"legacy_id": None})
        with pytest.raises(ValidationError):
            v.validate({"legacy_id": None})

    def test_combinators_keep_necessary_contract(self, spark):
        # property sweep: every doc the exact validator ACCEPTS must
        # pass the Column filter (the Column path may only over-admit)
        v = SchemaValidator(
            {"properties": {"v": {"anyOf": [
                {"type": "number", "maximum": 5},
                {"type": "string", "minLength": 3},
            ]}},
             "not": {"required": ["forbidden"]}}
        )
        docs = [
            {"v": 1}, {"v": 9}, {"v": "abc"}, {"v": "ab"}, {"v": None},
            {}, {"forbidden": 1}, {"v": 4, "forbidden": 2},
            {"v": True}, {"v": [1, 2]}, {"v": {"x": 1}}, {"v": 5.0},
        ]
        for doc in docs:
            exact_ok = True
            try:
                v.validate(doc)
            except ValidationError:
                exact_ok = False
            if exact_ok:
                assert self._passes(spark, v, doc), f"over-rejected {doc}"

    def test_default_validator_accepts_everything(self, spark):
        v = Validator.from_metadata({"type": "default"})
        assert self._passes(spark, v, {"anything": [1, {"x": None}]})
