"""Every examples/*.py must EXECUTE green against the current API —
the rot class is real: round 9 hand-fixed embedding_pipeline after
quantize_embeddings changed its output schema (commit 333bebe). Each
example's main() accepts an externally-owned SparkSession so the
smoke runs inside the suite's shared session (examples only create —
and stop — their own session when run standalone).
"""

import importlib.util
import os
import sys

import pytest

_EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
)
_EXAMPLES = sorted(
    f[:-3] for f in os.listdir(_EXAMPLES_DIR) if f.endswith(".py")
)


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(_EXAMPLES_DIR, name + ".py")
    )
    mod = importlib.util.module_from_spec(spec)
    # registered so dataclasses/pickling inside examples resolve
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_example_is_covered():
    # a new example file must get a smoke entry by existing: the
    # parametrization below reads the directory, so this guards the
    # directory being found at all
    assert len(_EXAMPLES) >= 10, _EXAMPLES


@pytest.mark.parametrize("name", _EXAMPLES)
def test_example_runs(name, spark, tmp_path, capsys):
    mod = _load(name)
    import inspect

    params = list(inspect.signature(mod.main).parameters)
    assert "spark" in params, (
        f"examples/{name}.py main() must accept spark= for the smoke"
    )
    if "root" in params:
        mod.main(str(tmp_path / "root"), spark=spark)
    else:
        mod.main(spark=spark)
    # the session the suite shares must survive the example
    assert spark.sparkContext._jsc is not None
    out = capsys.readouterr().out
    assert "Traceback" not in out
