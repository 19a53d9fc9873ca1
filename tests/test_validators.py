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
        # combinators are python-side only: the Column path admits a row
        # the exact validator rejects — documented contract
        v = SchemaValidator(FULL_SCHEMA)
        doc = {"kind": "a", "size": 5}  # fails anyOf
        assert self._passes(spark, v, doc)
        with pytest.raises(ValidationError):
            v.validate(doc)

    def test_default_validator_accepts_everything(self, spark):
        v = Validator.from_metadata({"type": "default"})
        assert self._passes(spark, v, {"anything": [1, {"x": None}]})
