"""Examples smoke tier (VERDICT r3 item 5): every examples/*.py main()
runs end to end on CPU at small sizes, so signature drift in the public
API surfaces in the suite instead of silently breaking the examples
(reference analogue: examples/youla.jl staying runnable)."""

import importlib.util
import os
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

# per-example kwargs to keep the smoke tier fast (each main's own defaults
# are sized for demonstration, not CI)
SMALL_ARGS = {
    "batched_scenario_lps": dict(B=8, m=12, n=20),
    "parametric_sweep": dict(steps=2),
    "sparse_banded": dict(m=1024, half_band=40),
}

ALL_EXAMPLES = sorted(
    f[:-3] for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and not f.startswith("_"))


def _load(name):
    path = os.path.join(EXAMPLES_DIR, name + ".py")
    spec = importlib.util.spec_from_file_location(f"examples_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_examples_inventory():
    # the suite must notice NEW examples appearing without a smoke test
    assert len(ALL_EXAMPLES) >= 10


@pytest.mark.parametrize("name", ALL_EXAMPLES)
def test_example_runs(name, capsys):
    mod = _load(name)
    assert hasattr(mod, "main"), f"examples/{name}.py has no main()"
    mod.main(**SMALL_ARGS.get(name, {}))
    # examples communicate through stdout; an empty run means it did nothing
    assert capsys.readouterr().out.strip()


def test_lasso_dsl_variant(capsys):
    mod = _load("lasso")
    mod.main_dsl()
    assert capsys.readouterr().out.strip()
