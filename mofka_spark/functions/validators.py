"""Validators (P2-P4): pluggable event admission control.

Reference: `validator.validate(metadata, data)` runs on every push before
batching; invalid events are rejected (/root/reference/src/MofkaProducer.cpp:68-69).
Two built-in validator languages (SURVEY.md P3-P4):

- ``{"type": "schema", "schema": {...}}`` — JSON-Schema validation of
  metadata (/root/reference/python/mochi/mofka/client.py:13-16).
- ``{"type": "eventbridge", "pattern": {...}}`` — EventBridge pattern
  (/root/reference/tests/MofkaEventbridgeTest.cpp).
- ``{"type": "default"}`` — accept everything.

Each validator offers BOTH a python-side ``validate(doc)`` (client push
path) and a Spark-side ``to_column(metadata_col)`` (bulk/streaming
filtering with Catalyst pushdown).
"""

from __future__ import annotations

import json
import math
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from mofka_spark.errors import MofkaError, ValidationError
from mofka_spark.functions import eventbridge


class Validator:
    """Base: accept-all (type=default)."""

    def validate(self, metadata: dict[str, Any], data: bytes | None = None) -> None:
        return None

    def to_column(self, metadata: Column | str = "metadata") -> Column:
        return F.lit(True)

    @staticmethod
    def from_metadata(config: dict[str, Any]) -> "Validator":
        """Instantiate from persisted topic config (the FromMetadata
        factory pattern, /root/reference/src/MofkaDriver.cpp:317-459)."""
        t = config.get("type", "default")
        if t == "default":
            return Validator()
        if t == "schema":
            return SchemaValidator(config.get("schema") or {})
        if t == "eventbridge":
            # the reference stores the pattern under "schema"
            # (tests/MofkaEventbridgeTest.cpp:36); accept both spellings
            return EventbridgeValidator(config.get("pattern") or config.get("schema") or {})
        raise MofkaError(f"unknown validator type {t!r}")


def _scalar_eq(s: Column, v: Any) -> Column | None:
    """Equality predicate between a get_json_object extraction and a
    scalar schema literal, or None when no reliable Column predicate
    exists (object/array/null). Numeric compare goes through double on
    both sides, so it can only ADMIT extra rows (double collisions),
    never reject a row the exact validator accepts."""
    if isinstance(v, bool):  # before int: bool is an int subclass
        return s == ("true" if v else "false")
    if isinstance(v, str):
        return s == v
    if isinstance(v, (int, float)):
        return s.try_cast("double") == F.lit(float(v))
    return None


class SchemaValidator(Validator):
    """JSON-Schema validation of event metadata.

    Python-side (the per-event push path) is FULL-DRAFT exact when the
    public ``jsonschema`` package is importable — same fidelity as the
    reference's nlohmann json-schema validation
    (/root/reference/src/JsonUtil.hpp:57-99,
    /root/reference/python/mochi/mofka/client.py:13-16); draft-7 is the
    default dialect (nlohmann's), a ``$schema`` key overrides. Without
    the package, a built-in subset checker (type / required / properties
    / enum / min / max / items) takes over.

    The Column form (bulk/streaming path) compiles the cheap
    SQL-expressible keywords (required, scalar types, enum, min/max,
    minLength/maxLength, pattern, const) to predicates — a NECESSARY
    filter with Catalyst pushdown, not the full draft. Combinators
    compile where soundness under the necessary-filter contract
    allows: ``allOf`` conjoins whatever branches compile; ``anyOf`` /
    ``oneOf`` compile to the OR of branch conditions when EVERY branch
    compiles (a valid row exactly satisfies some branch, hence that
    branch's necessary condition, hence the OR; oneOf deliberately
    does NOT compile exactly-one — branch conditions over-admit, so
    exactly-one could reject valid rows); ``not`` compiles only the
    ``{"not": {"required": [...]}}`` form (exact validity implies some
    listed key is absent; a key present with a JSON-null value renders
    NULL and over-admits, which the contract allows). Everything else
    passes through, so the Column path may admit rows the exact
    validator would reject — never the reverse. Bulk callers needing
    full fidelity re-validate per row downstream."""

    _TYPES = {
        "object": dict,
        "array": list,
        "string": str,
        "boolean": bool,
        "null": type(None),
    }

    def __init__(self, schema: dict[str, Any]):
        self.schema = schema
        self._exact = None
        try:
            import jsonschema

            cls = jsonschema.validators.validator_for(
                schema, default=jsonschema.Draft7Validator
            )
            cls.check_schema(schema)
            self._exact = cls(schema)
        except ImportError:
            self._exact = None

    def validate(self, metadata: dict[str, Any], data: bytes | None = None) -> None:
        if self._exact is not None:
            errs = sorted(
                self._exact.iter_errors(metadata), key=lambda e: list(e.absolute_path)
            )
            if errs:
                raise ValidationError(
                    "; ".join(
                        f"$.{'.'.join(str(p) for p in e.absolute_path)}: {e.message}"
                        if e.absolute_path
                        else f"$: {e.message}"
                        for e in errs[:5]
                    )
                )
            return
        errs2: list[str] = []
        self._check(self.schema, metadata, "$", errs2)
        if errs2:
            raise ValidationError("; ".join(errs2))

    def _check(self, sch: dict[str, Any], val: Any, path: str, errs: list[str]) -> None:
        t = sch.get("type")
        if t is not None:
            types = t if isinstance(t, list) else [t]
            if not any(self._is_type(val, tt) for tt in types):
                errs.append(f"{path}: expected {t}, got {type(val).__name__}")
                return
        if "enum" in sch and val not in sch["enum"]:
            errs.append(f"{path}: {val!r} not in enum")
        if isinstance(val, (int, float)) and not isinstance(val, bool):
            if "minimum" in sch and val < sch["minimum"]:
                errs.append(f"{path}: {val} < minimum {sch['minimum']}")
            if "maximum" in sch and val > sch["maximum"]:
                errs.append(f"{path}: {val} > maximum {sch['maximum']}")
        if isinstance(val, dict):
            for req in sch.get("required", []):
                if req not in val:
                    errs.append(f"{path}: missing required {req!r}")
            for k, sub in sch.get("properties", {}).items():
                if k in val:
                    self._check(sub, val[k], f"{path}.{k}", errs)
        if isinstance(val, list) and "items" in sch:
            for i, item in enumerate(val):
                self._check(sch["items"], item, f"{path}[{i}]", errs)

    @staticmethod
    def _is_type(val: Any, t: str) -> bool:
        if t == "number":
            return isinstance(val, (int, float)) and not isinstance(val, bool)
        if t == "integer":
            return (
                isinstance(val, int) and not isinstance(val, bool)
            ) or (isinstance(val, float) and not math.isnan(val) and val.is_integer())
        py = SchemaValidator._TYPES.get(t)
        return py is not None and isinstance(val, py) and not (
            t != "boolean" and isinstance(val, bool)
        )

    def to_column(self, metadata: Column | str = "metadata") -> Column:
        col = F.col(metadata) if isinstance(metadata, str) else metadata
        c = self._compile_object(self.schema, col)
        return F.lit(True) if c is None else c

    @classmethod
    def _compile_object(
        cls, sch: dict[str, Any], col: Column
    ) -> "Column | None":
        """Necessary condition for an (object-rooted) schema over the
        raw JSON string column, or None when nothing is expressible."""
        conds: list[Column] = []
        for req in sch.get("required", []):
            conds.append(F.get_json_object(col, f"$.{req}").isNotNull())
        for k, sub in sch.get("properties", {}).items():
            c = cls._compile_prop(F.get_json_object(col, f"$.{k}"), sub)
            if c is not None:
                conds.append(c)
        cls._compile_combinators(sch, conds, lambda b: cls._compile_object(b, col))
        n = sch.get("not")
        if (
            isinstance(n, dict)
            and set(n) == {"required"}
            and n["required"]
        ):
            # exact-valid ⇒ at least one listed key absent. A key
            # present with JSON null renders NULL too — over-admits,
            # which the necessary-filter contract allows.
            absent = [
                F.get_json_object(col, f"$.{k}").isNull()
                for k in n["required"]
            ]
            acc = absent[0]
            for a in absent[1:]:
                acc = acc | a
            conds.append(acc)
        return cls._conjoin(conds)

    @classmethod
    def _compile_prop(
        cls, s: Column, sub: dict[str, Any]
    ) -> "Column | None":
        """Necessary condition for one property's subschema over its
        rendered string value ``s`` (NULL = absent), or None."""
        conds: list[Column] = []
        t = sub.get("type")
        if t in ("number", "integer"):
            # try_cast, not cast: ANSI mode makes a plain cast THROW
            # on malformed input — a validator must reject the row,
            # not kill the job
            d = s.try_cast("double")
            conds.append(s.isNull() | d.isNotNull())
            if t == "integer":
                conds.append(s.isNull() | (d == F.floor(d)))
            if "minimum" in sub:
                conds.append(s.isNull() | (d >= F.lit(float(sub["minimum"]))))
            if "maximum" in sub:
                conds.append(s.isNull() | (d <= F.lit(float(sub["maximum"]))))
        elif t == "boolean":
            conds.append(s.isNull() | s.isin("true", "false"))
        elif t == "string":
            if "minLength" in sub:
                conds.append(s.isNull() | (F.length(s) >= int(sub["minLength"])))
            if "maxLength" in sub:
                conds.append(s.isNull() | (F.length(s) <= int(sub["maxLength"])))
            if "pattern" in sub:
                # JSON-Schema patterns are unanchored regex searches;
                # rlike matches anywhere — same semantics
                conds.append(s.isNull() | s.rlike(sub["pattern"]))
        if "const" in sub:
            # necessary-condition contract: the Column form may only
            # REJECT rows the exact validator also rejects. Numbers
            # compare numerically (JSON Schema: 5 == 5.0, while
            # get_json_object renders "5.0" ≠ json.dumps(5)); object/
            # array/null consts skip the Column check entirely —
            # rendered-text comparison is key-order/whitespace
            # sensitive and would drop valid rows
            eq = _scalar_eq(s, sub["const"])
            if eq is not None:
                conds.append(s.isNull() | eq)
        if "enum" in sub:
            eqs = [_scalar_eq(s, v) for v in sub["enum"]]
            if all(e is not None for e in eqs):
                any_eq = eqs[0]
                for e in eqs[1:]:
                    any_eq = any_eq | e
                conds.append(s.isNull() | any_eq)
        cls._compile_combinators(sch=sub, conds=conds,
                                 compile_branch=lambda b: cls._compile_prop(s, b))
        return cls._conjoin(conds)

    @staticmethod
    def _compile_combinators(sch, conds, compile_branch) -> None:
        """allOf: conjoin every branch that compiles (each branch's
        necessary condition is necessary for the conjunction). anyOf /
        oneOf: the OR of branch conditions, ONLY when every branch
        compiles — a branch with no expressible condition could admit
        rows failing all compiled ones, so a partial OR would reject
        valid rows. oneOf stays an OR, never exactly-one: branch
        conditions over-admit, so two of them can both hold for a row
        that exactly satisfies only one branch."""
        for branch in sch.get("allOf", []):
            c = compile_branch(branch)
            if c is not None:
                conds.append(c)
        for kw in ("anyOf", "oneOf"):
            branches = sch.get(kw)
            if not branches:
                continue
            cs = [compile_branch(b) for b in branches]
            if all(c is not None for c in cs):
                acc = cs[0]
                for c in cs[1:]:
                    acc = acc | c
                conds.append(acc)

    @staticmethod
    def _conjoin(conds: list) -> "Column | None":
        if not conds:
            return None
        acc = conds[0]
        for c in conds[1:]:
            acc = acc & c
        return acc



    # -- typed projection ---------------------------------------------------
    def spark_struct(self):
        """The schema's Spark shape (StructType) for typed metadata
        projection: JSON-Schema scalar types map to Spark types
        (integer -> long, number -> double), arrays map element-wise,
        nested objects recurse. Unconstrained / combinator-typed
        fields stay strings (the lossless fallback for from_json)."""
        from pyspark.sql import types as T

        def conv(sch):
            t = sch.get("type")
            if isinstance(t, list):  # union type -> string fallback
                t = None
            if t == "integer":
                return T.LongType()
            if t == "number":
                return T.DoubleType()
            if t == "boolean":
                return T.BooleanType()
            if t == "string":
                return T.StringType()
            if t == "array":
                return T.ArrayType(conv(sch.get("items", {})))
            if t == "object":
                props = sch.get("properties", {})
                return T.StructType(
                    [T.StructField(k, conv(v)) for k, v in props.items()]
                )
            return T.StringType()

        root = conv(self.schema)
        from pyspark.sql import types as T

        if not isinstance(root, T.StructType):
            raise ValueError(
                "spark_struct requires an object-typed root schema"
            )
        return root


class EventbridgeValidator(Validator):
    def __init__(self, pattern: dict[str, Any]):
        self.pattern = pattern

    def validate(self, metadata: dict[str, Any], data: bytes | None = None) -> None:
        if not eventbridge.match_event(self.pattern, metadata):
            raise ValidationError(
                f"metadata does not match eventbridge pattern: {metadata!r}"
            )

    def to_column(self, metadata: Column | str = "metadata") -> Column:
        return eventbridge.compile_pattern(self.pattern, metadata)
